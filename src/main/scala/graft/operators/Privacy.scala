package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Privacy auditing for a training-data pipeline — the compliance
  * complement of the lifecycle/takedown family: BEFORE shipping a
  * dataset, measure how re-identifiable its quasi-identifier
  * combinations are (k-anonymity), and demonstrate the
  * noise-calibrated release shape (differential privacy) for the
  * aggregate boards that leave the trust boundary.
  *
  * Both operators are deliberately oracle-exact: the k-audit is plain
  * counting, and the DP release derives its Laplace noise from a
  * SEEDED portable hash (inverse-CDF over a (0,1) uniform) — the same
  * committed-seed practice production DP systems use for replayable
  * releases, which also makes the mechanism testable bit-for-bit. The
  * privacy calculus (ε per release, composition) is policy carried in
  * the seed/ε parameters, not recomputed here.
  */
object Privacy {

  /** k-anonymity audit over a quasi-identifier tuple: for each
    * threshold k, how many QI groups (and how many ROWS — the actual
    * risk mass) fall below it. One groupBy on the QI columns + a
    * thresholds×1 summary — the group-size histogram is the only
    * shuffle, map-side combinable.
    *
    * Returns (k_threshold, n_groups_below, n_rows_below, n_groups,
    * n_rows, min_group) sorted by k_threshold.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[Column],
      thresholds: Seq[Int] = Seq(2, 5, 10)): DataFrame = {
    val groups = df.groupBy(quasiCols: _*).agg(count(lit(1)).as("cnt"))
    val aggs = thresholds.flatMap { t =>
      Seq(
        sum(when(col("cnt") < t, 1L).otherwise(0L)).as(s"g_$t"),
        sum(when(col("cnt") < t, col("cnt")).otherwise(0L)).as(s"r_$t"))
    } ++ Seq(count(lit(1)).as("n_groups"), sum(col("cnt")).as("n_rows"),
      min(col("cnt")).as("min_group"))
    val one = groups.agg(aggs.head, aggs.tail: _*)
    val stack = thresholds
      .map(t => s"$t, `g_$t`, `r_$t`").mkString(", ")
    one.select(
        expr(s"stack(${thresholds.size}, $stack)")
          .as(Seq("k_threshold", "n_groups_below", "n_rows_below")),
        col("n_groups"), col("n_rows"), col("min_group"))
      .orderBy(col("k_threshold"))
  }

  /** Laplace(0, 1/eps) noise derived from a salted hash — inverse-CDF
    * over u ∈ (0,1): −(1/ε)·sign(u−½)·ln(1−2·|u−½|). The +0.5 hash
    * offset keeps u strictly interior, so the log never sees 0. Pure
    * portable arithmetic (md5 + ln), identical in any engine.
    */
  def laplaceNoise(seedCol: Column, eps: Double): Column = {
    val u = (TextFunctions.hash60(seedCol).cast("double") + 0.5) /
      Sketches.HashRange
    val c = u - 0.5
    val s = when(c < 0, -1.0).otherwise(1.0)
    -(lit(1.0 / eps)) * s * log(lit(1.0) - lit(2.0) * abs(c))
  }

  /** DP-shaped count release: per-group counts with seeded Laplace(ε)
    * noise, clamped at 0 and rounded — the board that can leave the
    * trust boundary. The true count and absolute error ride along for
    * the audit/oracle; a real release drops them (they exist here
    * because this operator's job is to make the MECHANISM testable).
    * Sensitivity 1 assumes each underlying unit contributes one row to
    * one group — true for (event per type, day) counting.
    */
  def dpCountRelease(df: DataFrame, groupCols: Seq[String], eps: Double,
      salt: String): DataFrame = {
    val gNames = groupCols.map(col)
    val seed = concat(lit(salt) +:
      groupCols.flatMap(n => Seq(col(n).cast("string"), lit("|"))): _*)
    df.groupBy(gNames: _*)
      .agg(count(lit(1)).as("n_true"))
      .withColumn("noise",
        round(laplaceNoise(seed, eps) * lit(1.0e6), 0) / lit(1.0e6))
      .select(gNames ++ Seq(
        col("n_true"),
        greatest(lit(0.0),
          round((col("n_true") + col("noise")) * lit(1.0e4), 0) / lit(1.0e4))
          .as("n_released"),
        (round(abs(col("noise")) * lit(1.0e6), 0) / lit(1.0e6))
          .as("abs_err")): _*)
      .orderBy(gNames: _*)
  }
}
