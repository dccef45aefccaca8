package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-query IO/shuffle profile — the measured evidence behind
  * SCALING.md's shuffle inventory (usage:
  * `runMain graft.Profile <sfDir> [queryName...]`).
  *
  * For each query it materializes the FULL result through the `noop`
  * sink (count() would let Catalyst elide final sorts and prune
  * columns, understating the work) and reports wall seconds, task
  * count, input bytes, shuffle write/read bytes, and spill — aggregated
  * from TaskMetrics via a listener. Shuffle bytes are the number that
  * predicts 100 TB behavior: a query whose shuffle bytes scale with the
  * FACT table is a red flag unless the shuffle IS the semantic (e.g.
  * the dedup index build). Caveat: input_mb counts Hadoop-FS-statistic
  * reads; local-filesystem parquet reads bypass those statistics, so on
  * this harness the column reflects only checkpoint/shuffle-file block
  * reads — on HDFS/S3 it reports scan bytes.
  */
object Profile {

  private class Metrics extends SparkListener {
    val input = new LongAdder
    val shuffleWrite = new LongAdder
    val shuffleRead = new LongAdder
    val spill = new LongAdder
    val tasks = new LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        input.add(m.inputMetrics.bytesRead)
        shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
        spill.add(m.memoryBytesSpilled + m.diskBytesSpilled)
        tasks.add(1)
      }
    }
    def snapshot: Seq[Long] = Seq(input.sum, shuffleWrite.sum,
      shuffleRead.sum, spill.sum, tasks.sum)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
                else Seq("q1_pricing_summary", "q3_revenue_topk",
                  "gold_bars_1m", "bar_analytics", "dedup_minhash_lsh",
                  "dedup_ngram_jaccard", "dedup_clusters", "corpus_curate",
                  "ann_pq_adc", "dedup_embed_lsh", "tfidf_top_terms",
                  "trades_asof_bars")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // registry-sized generated-class cache (the round-8 lesson:
      // the 100-entry default thrashes past ~100 distinct plans)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val metrics = new Metrics
    spark.sparkContext.addSparkListener(metrics)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def mb(b: Long): String = f"${b / 1048576.0}%9.1f"
    println(f"${"query"}%-24s ${"sec"}%6s ${"tasks"}%6s ${"input_mb"}%9s " +
      f"${"shuf_w_mb"}%9s ${"shuf_r_mb"}%9s ${"spill_mb"}%9s")
    names.foreach { n =>
      val before = metrics.snapshot
      val t0 = System.nanoTime()
      val ok = try {
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        true
      } catch { case e: Throwable => println(s"$n FAILED: $e"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async (listenerBus is private[spark]); give
      // the bus a moment to drain before snapshotting — a dev tool can
      // afford the slack
      Thread.sleep(500)
      val after = metrics.snapshot
      val d = after.zip(before).map { case (a, b) => a - b }
      println(f"$n%-24s $sec%6.2f ${d(4)}%6d ${mb(d(0))} ${mb(d(1))} " +
        f"${mb(d(2))} ${mb(d(3))}  ${if (ok) "ok" else "FAILED"}")
    }
    spark.stop()
  }
}
