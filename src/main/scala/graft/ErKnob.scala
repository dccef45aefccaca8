package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: the entity-resolution block-cap knob measured as
  * recall/volume data (usage: `runMain graft.ErKnob <sfDir> [cap...]`)
  * — runs [[graft.operators.EntityResolution.erEval]] at each
  * per-(key, side) block cap and prints the ThMatch operating row
  * (blocking recall, match precision/recall, predicted pairs) plus
  * wall seconds. This is the evidence behind SCALING.md's claim that
  * with fixed-cardinality blocking keys, within-block candidate
  * volume grows quadratically until the caps bite, after which volume
  * is bounded at keys·cap² and further growth is paid in BLOCKING
  * RECALL — the production remedy being finer composite keys, with
  * the cap as the skew backstop.
  */
object ErKnob {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // optional literal arg "finer" switches on the third
    // (nation, name-digit) blocking pass — the remedy under test
    val finer = args.contains("finer")
    val caps = args.toSeq.drop(1).filterNot(_ == "finer") match {
      case Nil => Seq(64, 256)
      case cs  => cs.map(_.toInt)
    }
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
    import graft.operators.EntityResolution
    val customer = Tables.customer(spark, sfDir)
    val a = EntityResolution.sourceA(customer)
    val b = EntityResolution.sourceB(customer)
    caps.foreach { cap =>
      val t0 = System.nanoTime()
      val row = EntityResolution.erEval(a, b, cap = cap,
          finerKeys = finer)
        .filter(org.apache.spark.sql.functions.col("threshold")
          === EntityResolution.ThMatch)
        .collect().head
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"finer=$finer cap=$cap%-5d " +
        f"n_pred=${row.getAs[Long]("n_pred")}%-8d " +
        f"n_tp=${row.getAs[Long]("n_tp")}%-8d " +
        f"blocking_recall=${row.getAs[Double]("blocking_recall")}%.6f " +
        f"prec=${row.getAs[Double]("prec")}%.6f " +
        f"rec=${row.getAs[Double]("rec")}%.6f sec=$sec%.1f")
    }
    spark.stop()
  }
}
