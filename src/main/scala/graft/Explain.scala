package graft

/** Dev tool: print the formatted physical plan of registered queries,
  * plus a one-line operator census (scans/exchanges/join kinds) — the
  * ".explain(formatted) and iterate" loop as a command.
  * Usage: runMain graft.Explain <sfDir> <queryName...> [-full]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val full = args.contains("-full")
    val names = args.tail.filterNot(_ == "-full").toSeq match {
      case Nil => Seq("gold_bars_1m")
      case ns  => ns
    }
    val spark = GraftSession.builder(master = "local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val p = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      // count operators in the details section only ("(N) Name" lines) —
      // formatted mode lists every operator twice (tree + details)
      def c(s: String) = s"(?m)^\\(\\d+\\) $s".r.findAllIn(p).length
      println(s"[explain] $n: scans=${c("Scan parquet")} " +
        s"exchanges=${c("Exchange")} " +
        s"BHJ=${c("BroadcastHashJoin")} SMJ=${c("SortMergeJoin")} " +
        s"BNLJ=${c("BroadcastNestedLoopJoin")} " +
        s"hashAgg=${c("HashAggregate")} sortAgg=${c("SortAggregate")}")
      if (full) println(p)
    }
    spark.stop()
  }
}
