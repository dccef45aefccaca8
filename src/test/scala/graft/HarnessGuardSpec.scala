package graft

import org.apache.spark.sql.functions._

import graft.streaming.HarnessGuard

/** Failure surfacing for the e2e harnesses: what Spark retries
  * internally must land in the captured-event queue, attributed to the
  * active scope.
  */
class HarnessGuardSpec extends SparkSpec {
  import spark.implicits._

  test("a failing job inside a scope is captured and attributed") {
    HarnessGuard.drain() // isolate from other suites
    val boom = udf((i: Long) =>
      if (i == 3L) throw new RuntimeException("guard-spec-boom") else i)
    intercept[Exception] {
      HarnessGuard.scope(spark, "guard_spec") {
        // spark.range, not a LocalRelation: ConvertToLocalRelation would
        // evaluate the udf on the driver and no task would ever run
        spark.range(8).select(boom(col("id"))).collect()
      }
    }
    // the listener bus delivers asynchronously — poll briefly
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    var got = Seq.empty[String]
    while (got.isEmpty && System.nanoTime() < deadline) {
      got = HarnessGuard.drain()
      if (got.isEmpty) Thread.sleep(50)
    }
    assert(got.nonEmpty, "no failure captured")
    assert(got.exists(_.contains("[guard_spec]")),
      s"missing scope attribution: $got")
    assert(got.exists(m => m.contains("failed")), s"unexpected events: $got")
  }

  test("record + drain round-trips and clears") {
    HarnessGuard.drain()
    HarnessGuard.record("first\nsecond line ignored")
    val got = HarnessGuard.drain()
    assert(got == Seq("first"))
    assert(HarnessGuard.drain().isEmpty)
  }

  test("BenignLogGuard counts+suppresses ONLY the accumulator-GC ERROR") {
    import org.apache.logging.log4j.LogManager
    import graft.streaming.BenignLogGuard
    BenignLogGuard.install()
    BenignLogGuard.drainCount()
    val dag = LogManager.getLogger("org.apache.spark.scheduler.DAGScheduler")
    dag.error("Failed to update accumulator 42 (display metric)")
    assert(BenignLogGuard.drainCount() == 1)
    // a DIFFERENT DAGScheduler error must pass through uncounted
    dag.error("guard-spec: a real scheduler error (must not be eaten)")
    assert(BenignLogGuard.drainCount() == 0)
    // the benign message on a DIFFERENT logger must pass through too
    LogManager.getLogger("graft.test.NotTheScheduler")
      .error("Failed to update accumulator 7")
    assert(BenignLogGuard.drainCount() == 0)
  }
}
