package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries (min of 2 runs, like Bench) without
  * running the whole suite.
  * Usage: runMain graft.Time <sfDir> <queryName...>
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
                else Seq("gold_bars_1m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // registry-sized generated-class cache (the round-8 lesson:
      // the 100-entry default thrashes past ~100 distinct plans)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    names.foreach { n =>
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"[time] $n: ${ts.map(_._1).min}%.2f s (${ts.head._2} rows)")
    }
    spark.stop()
  }
}
