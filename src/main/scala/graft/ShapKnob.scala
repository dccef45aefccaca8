package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: the truncated-KNN-Shapley rank knob measured as
  * fidelity/volume data (usage: `runMain graft.ShapKnob <sfDir>
  * [R...]`) — runs [[graft.operators.Valuation.shapleyTruncFidelity]]
  * at each truncation rank R and prints the corpus-level error
  * envelope (max and mean |exact − truncated| in pinned 1e-6 units,
  * top-R coverage) plus wall seconds. The ErKnob discipline for the
  * valuation family: the harmonic tail bound says per-test error ≲
  * ln(N/R)/K — this prints the REALIZED error beside the cost, so the
  * R a deployment picks is evidence, not prose.
  */
object ShapKnob {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rs = if (args.length > 1) args.toSeq.tail.map(_.toInt)
             else Seq(8, 16, 32, 64)
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
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sfDir)
    rs.foreach { r =>
      val t0 = System.nanoTime()
      val row = graft.operators.Valuation.shapleyTruncFidelity(emb, r)
        .agg(sum(col("n_points")).as("n"),
          sum(col("n_in_topr")).as("in_topr"),
          max(col("max_delta6")).as("max_d6"),
          sum(col("mean_abs_delta") * col("n_points")).as("sum_abs"))
        .collect().head
      val sec = (System.nanoTime() - t0) / 1e9
      val n = row.getAs[Long]("n")
      println(f"R=$r%-4d n_train=$n%-7d " +
        f"in_topr=${row.getAs[Long]("in_topr")}%-7d " +
        f"max_delta=${row.getAs[Long]("max_d6") / 1.0e6}%.6f " +
        f"mean_abs_delta=${row.getAs[Double]("sum_abs") / n}%.6f " +
        f"sec=$sec%.1f")
    }
    spark.stop()
  }
}
