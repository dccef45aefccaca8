package graft

/** Dev tool: audit whole-stage-codegen health of registered queries —
  * per-stage generated-method sizes vs the JIT huge-method threshold
  * (8000 bytecode bytes, `-XX:-DontCompileHugeMethods` default) and
  * Spark's own `spark.sql.codegen.hugeMethodLimit` fallback. A stage
  * whose generated `processNext()` exceeds the JIT limit runs
  * interpreted-bytecode-only — the 10x-pathology suspect behind bench
  * outliers. Usage: runMain graft.CodegenAudit <sfDir> <queryName...>
  */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else Seq("cdc_dup_chunks")
    val spark = GraftSession.builder(master = "local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      // collect() executes THIS df's QueryExecution (a noop write would
      // spawn a fresh one, leaving this AQE plan un-finalized with no
      // codegen inserted); audit the final post-execution plan
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val stages = org.apache.spark.sql.execution.debug.codegenStringSeq(plan)
      println(s"[codegen] $n: ${stages.size} whole-stage subtrees")
      stages.zipWithIndex.foreach { case ((subtree, code, stats), i) =>
        val methodMax = stats.maxMethodCodeSize
        // -1 is ByteCodeStats.UNAVAILABLE: Janino failed to compile the
        // stage (it runs interpreted) — the worst pathology this audit
        // exists to surface, flagged louder than a huge method
        val flag = if (methodMax <= 0) "  <-- COMPILE-FAILED/UNAVAILABLE"
                   else if (methodMax > 8000) "  <-- EXCEEDS JIT HugeMethodLimit"
                   else ""
        println(f"[codegen] $n stage=$i maxMethodBytecode=$methodMax%6d " +
          f"codeLen=${code.length}%8d$flag")
        if (methodMax <= 0 || methodMax > 8000)
          println(subtree.linesIterator.take(8).mkString("\n"))
      }
    }
    spark.stop()
  }
}
