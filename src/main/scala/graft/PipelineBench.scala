package graft

import org.apache.spark.sql.SparkSession

/** Standalone runner for the e2e streaming pipeline — prints per-hop
  * timings (Pipeline logs them to stderr) and the sink row count.
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PipelineBench"
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional arg selects the harness: default = the three-hop gold
    // pipeline; "live"/"liveHourly" time the two live-bars upsert
    // granularities (per-bar vs per-hour sink churn)
    val run: () => Long = args.headOption match {
      case Some("live") =>
        () => graft.streaming.Pipeline.liveBarsE2E(spark, sfDir).count()
      case Some("liveHourly") =>
        () => graft.streaming.Pipeline
          .liveBarsE2E(spark, sfDir, hourly = true).count()
      case _ => () => graft.streaming.Pipeline.goldE2E(spark, sfDir).count()
    }
    val t0 = System.nanoTime()
    val n = run()
    System.err.println(
      f"[pipeline] TOTAL: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n bars")
    val warnings = graft.streaming.HarnessGuard.drain()
    if (warnings.nonEmpty)
      System.err.println(s"[pipeline] harness warnings: $warnings")
    spark.stop()
  }
}
