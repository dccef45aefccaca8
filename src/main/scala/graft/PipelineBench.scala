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
    val t0 = System.nanoTime()
    val n = graft.streaming.Pipeline.goldE2E(spark, sfDir).count()
    System.err.println(
      f"[pipeline] TOTAL: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n bars")
    spark.stop()
  }
}
