package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.scheduler.{JobFailed, SparkListener, SparkListenerJobEnd, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Failure surfacing for the streaming e2e harnesses: Spark silently
  * retries failed tasks and resubmits fetch-failed stages, so a harness
  * can "pass" while one of its jobs failed-and-retried internally —
  * invisible in results, very visible in wall time (a bench run once
  * recorded 4× the steady-state for one e2e with n_failed=0). Every
  * e2e wraps its streaming drive in [[scope]]; task-level failures and
  * job failures land in a process-wide queue that [[graft.Bench]]
  * drains into `bench.json` (`harness_warnings`) so a swallowed retry
  * can never hide again.
  *
  * The listener stays installed for the SparkContext's lifetime (one
  * `install` per app id — repeated scopes don't stack listeners); the
  * active label is a best-effort tag, which is exact here because the
  * harnesses drive their streams synchronously (`awaitTermination`
  * inside the scope).
  */
object HarnessGuard {

  private val installedApps =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())
  private val activeLabel = new AtomicReference[String]("")
  private val events = new ConcurrentLinkedQueue[String]()

  /** Record a harness-level failure observation (also used directly by
    * foreachBatch bodies before rethrowing).
    */
  def record(msg: String): Unit = {
    val label = activeLabel.get()
    val line = (if (label.isEmpty) "" else s"[$label] ") +
      msg.linesIterator.take(1).mkString.take(300)
    events.add(line)
    System.err.println(s"HarnessGuard: $line")
  }

  /** Snapshot and clear the captured events. */
  def drain(): Seq[String] = {
    val out = Seq.newBuilder[String]
    var e = events.poll()
    while (e != null) { out += e; e = events.poll() }
    out.result()
  }

  private class Listener extends SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = t.reason match {
      case org.apache.spark.Success => ()
      case _: org.apache.spark.TaskKilled => () // sibling-superseded
      case r => record(s"task failed (retried by Spark): " +
        r.toString.linesIterator.take(1).mkString)
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = j.jobResult match {
      case JobFailed(e) => record(s"job ${j.jobId} failed: $e")
      case _ => ()
    }
  }

  private def install(spark: SparkSession): Unit = {
    val appId = spark.sparkContext.applicationId
    if (installedApps.add(appId))
      spark.sparkContext.addSparkListener(new Listener)
  }

  /** Run `f` with failure capture attached and the label set for
    * attribution. Exceptions propagate unchanged (this surfaces what
    * Spark HIDES, it never hides what Spark surfaces).
    */
  def scope[T](spark: SparkSession, label: String)(f: => T): T = {
    install(spark)
    activeLabel.set(label)
    try f finally activeLabel.set("")
  }
}
