package graft

import org.apache.spark.metrics.source.CodegenMetrics
import org.apache.spark.sql.SparkSession

/** Dev tool: attributes each query's FIRST-run overhead (the bench
  * max/min spread) to its observable cold costs (usage:
  * `runMain graft.ColdAudit <sfDir> [queryName...]`).
  *
  * For each query it measures, in one warm JVM:
  *   - `plan_s`   — resolve+optimize+physical-plan time (forced via
  *                  `queryExecution.executedPlan`, no job launched);
  *   - `run1_s`   — first full execution (pays Janino compilation of
  *                  every whole-stage/expression class, broadcast
  *                  builds, and shuffle materialization);
  *   - `run2_s`   — steady-state re-run (plan + codegen caches warm);
  *   - `compiles` / `compile_ms` — Janino compilations during run1 and
  *                  their total time, from the
  *                  [[CodegenMetrics.METRIC_COMPILATION_TIME]] histogram.
  *                  The `compiles` count delta is always exact; the
  *                  millisecond sum is a delta of reservoir-snapshot
  *                  sums, and the reservoir (1028 samples) is
  *                  JVM-global and cumulative — once the warmup plus
  *                  audited queries exceed 1028 lifetime compilations,
  *                  evictions make later `compile_ms` deltas
  *                  undercount (or go slightly negative). Treat
  *                  `compile_ms` as exact only per-session while
  *                  lifetime count ≤ 1028, i.e. audit short query
  *                  lists per JVM.
  *
  * `run1 − run2 ≈ compile_ms` ⇒ the spread is Janino, irreducible per
  * JVM but proportional to the number of distinct codegen stages;
  * a large unexplained remainder ⇒ look at broadcast builds or file
  * listing instead. This is the evidence tool behind SCALING.md's
  * first-run-cost note (round-6 verdict task #5).
  */
object ColdAudit {

  private def compileSnapshot(): (Long, Double) = {
    val h = CodegenMetrics.METRIC_COMPILATION_TIME
    // snapshot values are the per-compilation millisecond samples; with a
    // default 1028-slot reservoir this is exact for per-query deltas
    (h.getCount, h.getSnapshot.getValues.map(_.toDouble).sum)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
                else Seq("cdc_dup_chunks", "price_mad_outliers",
                  "lm_score_bigram", "dedup_spans_incremental",
                  "cdc_chunks", "ann_ivf")
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
    // absorb JVM startup so the first audited query isn't charged for it
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    println(f"${"query"}%-26s ${"plan_s"}%7s ${"run1_s"}%7s ${"run2_s"}%7s " +
      f"${"spread"}%7s ${"compiles"}%8s ${"compile_s"}%9s ${"unexplained_s"}%13s")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      def time[A](a: => A): (A, Double) = {
        val t0 = System.nanoTime(); val r = a
        (r, (System.nanoTime() - t0) / 1e9)
      }
      try {
        val (df, planS) = time(fn(spark, sfDir)) match {
          case (d, _) => time { d.queryExecution.executedPlan; d }
        }
        val (c0, s0) = compileSnapshot()
        val (_, run1) = time(df.count())
        val (c1, s1) = compileSnapshot()
        val (_, run2) = time(fn(spark, sfDir).count())
        val spread = run1 - run2
        val compileS = (s1 - s0) / 1000.0
        println(f"$n%-26s $planS%7.2f $run1%7.2f $run2%7.2f $spread%7.2f " +
          f"${c1 - c0}%8d $compileS%9.2f ${spread - compileS}%13.2f")
      } catch { case e: Throwable => println(s"$n FAILED: $e") }
    }
    spark.stop()
  }
}
