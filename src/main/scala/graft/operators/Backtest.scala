package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic strategy backtesting over the trade stream — the
  * analytics consumer the bar/indicator family feeds: form a daily
  * cross-sectional momentum portfolio and account its PnL exactly.
  *
  * Everything after ONE pinned ln per (symbol, day) is integer
  * arithmetic, so the equity curve is bit-identical on any cluster
  * layout — the property a float-compounding backtester never has
  * (and the reason research and production backtests diverge).
  */
object Backtest {

  /** Daily close per (symbol, date): the LAST trade of the day under
    * the total order (event_time, event_id). The close itself is a
    * raw parquet double — no arithmetic, no cross-engine risk.
    */
  private def dailyClose(trades: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol"), col("event_date"))
      .orderBy(col("event_time").desc, col("event_id").desc)
    // a nonpositive print is not a price — it would blow up the log
    // return (a literal 0.0 exists in the sf0.1 corpus)
    trades.filter(col("price") > 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("symbol"), col("event_date").as("d"),
        col("price").as("close"))
  }

  /** Cross-sectional momentum backtest, fully deterministic:
    *
    *  - per (symbol, observed day): log return vs the previous
    *    OBSERVED close, pinned once as round(ln(c/prev)·1e6, 0)
    *    micro-units (the product-pin form);
    *  - momentum = the sum of the trailing `lookback` returns
    *    (ROWS lookback PRECEDING .. 1 PRECEDING — strictly prior
    *    information, and only where the window is COMPLETE);
    *  - each day, hold the `topK` symbols by (momentum DESC, symbol)
    *    — a total order — and earn the equal-weight mean of their
    *    SAME-day returns (truncating integer division by the actual
    *    holding count);
    *  - the equity curve is the exact running integer sum of
    *    portfolio log-returns, beside the all-symbol equal-weight
    *    benchmark on the same days.
    *
    * Selection at day t uses returns through t−1 only — the same
    * leakage discipline as features_pit, here enforced by the window
    * frame instead of an as-of join.
    *
    * Scale shape: one (symbol, date) reduction, symbol-keyed lag/sum
    * windows, a date-keyed rank window (|symbols| rows per day — the
    * cross-section, calendar-bounded), and date-keyed aggregates. No
    * joins beyond the final per-day assembly; no cross joins.
    */
  def momentum(trades: DataFrame, lookback: Int = 5,
               topK: Int = 3): DataFrame = {
    val bySym = Window.partitionBy(col("symbol")).orderBy(col("d"))
    val lr = dailyClose(trades)
      .withColumn("prev", lag(col("close"), 1).over(bySym))
      .filter(col("prev").isNotNull)
      .select(col("symbol"), col("d"),
        round(log(col("close") / col("prev")) * lit(1e6), 0)
          .cast("long").as("lr6"))
    val mom = lr
      .withColumn("m",
        sum(col("lr6")).over(bySym.rowsBetween(-lookback, -1)))
      .withColumn("mcnt",
        count(lit(1)).over(bySym.rowsBetween(-lookback, -1)))
      .filter(col("mcnt") === lookback)
    val byDay = Window.partitionBy(col("d"))
      .orderBy(col("m").desc, col("symbol"))
    val ranked = mom.withColumn("rk", row_number().over(byDay))
    val daily = ranked.groupBy(col("d")).agg(
      count(lit(1)).as("n_candidates"),
      sum(when(col("rk") <= topK, 1L).otherwise(0L)).as("n_held"),
      sum(when(col("rk") <= topK, col("lr6")).otherwise(0L))
        .as("port_sum6"),
      sum(col("lr6")).as("bench_sum6"))
    def micro(c: org.apache.spark.sql.Column) =
      (c * lit(new java.math.BigDecimal("0.000001")))
        .cast(DecimalType(16, 6))
    val byDate = Window.orderBy(col("d"))
      .rowsBetween(Long.MinValue, 0)
    daily
      .withColumn("port6", expr("port_sum6 div n_held"))
      .withColumn("bench6", expr("bench_sum6 div n_candidates"))
      .select(col("d"), col("n_candidates"), col("n_held"),
        micro(col("port6")).as("port_logret"),
        micro(sum(col("port6")).over(byDate)).as("cum_logret"),
        micro(col("bench6")).as("bench_logret"),
        micro(sum(col("bench6")).over(byDate)).as("cum_bench"))
      .orderBy(col("d"))
  }
}
