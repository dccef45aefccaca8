package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: the bitext band-geometry knob measured as recall data
  * (usage: `runMain graft.BitextKnob <sfDir> [bitsPerBand...]`) — runs
  * [[graft.operators.Similarity.bitextRecallAudit]] at each band
  * resolution and prints recall@1 / mined-pair Jaccard / pair counts
  * and wall seconds. This is the evidence behind SCALING.md's claim
  * that raising `bitsPerBand` (16 → 256 keys per band) restores the
  * recall the per-side caps cost once buckets saturate at larger
  * corpora; the single-row collect is the audit's summary row.
  */
object BitextKnob {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bits = if (args.length > 1) args.toSeq.tail.map(_.toInt)
               else Seq(4, 8)
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
    bits.foreach { b =>
      val t0 = System.nanoTime()
      val row = graft.operators.Similarity.bitextRecallAudit(
          Tables.documents(spark, sfDir), Tables.embeddings(spark, sfDir),
          bitsPerBand = b)
        .collect().head
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"bitsPerBand=$b%-3d n_truth=${row.getAs[Long]("n_truth")}%-6d " +
        f"n_lsh=${row.getAs[Long]("n_lsh")}%-6d " +
        f"n_hit=${row.getAs[Long]("n_hit")}%-6d " +
        f"recall_at1=${row.getAs[Double]("recall_at1")}%.6f " +
        f"pair_jaccard=${row.getAs[Double]("pair_jaccard")}%.6f " +
        f"sec=$sec%.1f")
    }
    spark.stop()
  }
}
