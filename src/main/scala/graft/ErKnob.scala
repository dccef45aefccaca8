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
    val caps = args.toSeq.drop(1)
      .filterNot(a => a == "finer" || a == "inc") match {
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
    import org.apache.spark.sql.functions.{col, concat, lit}
    val customer = Tables.customer(spark, sfDir)
    val a = EntityResolution.sourceA(customer)
    val b = EntityResolution.sourceB(customer)
    // literal arg "inc": measure the INCREMENTAL path instead — the
    // 80/20 history/delta split blocked under the production key set
    // (finer 3-pass at MasterCap), evaluated against the delta's true
    // links (the blocking-recall row the nightly job actually runs at)
    val inc = args.contains("inc")
    // ONE ThMatch operating-row pull for both modes (1-row fold —
    // the driver-collect ledger's ErKnob entry)
    def opRow(ev: org.apache.spark.sql.DataFrame) =
      ev.filter(col("threshold") === EntityResolution.ThMatch)
        .collect().head
    if (inc) {
      val splitH = graft.functions.TextFunctions.hash60(
        concat(lit("er_inc_"), col("rec_id").cast("string"))) % 100
      val bHist = b.filter(splitH < 80)
      val bDelta = b.filter(splitH >= 80)
      val t0 = System.nanoTime()
      val row = opRow(EntityResolution.erEvalFromIndex(
        EntityResolution.incrementalMatches(a, bHist, bDelta), bDelta))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"inc (3-pass cap=${EntityResolution.MasterCap}) " +
        f"n_pred=${row.getAs[Long]("n_pred")}%-8d " +
        f"n_tp=${row.getAs[Long]("n_tp")}%-8d " +
        f"blocking_recall=${row.getAs[Double]("blocking_recall")}%.6f " +
        f"prec=${row.getAs[Double]("prec")}%.6f " +
        f"rec=${row.getAs[Double]("rec")}%.6f sec=$sec%.1f")
    } else caps.foreach { cap =>
      val t0 = System.nanoTime()
      val row = opRow(EntityResolution.erEval(a, b, cap = cap,
        finerKeys = finer))
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
