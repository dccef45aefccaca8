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
  /** Pairs-trading spread monitor for a given symbol pair (the
    * discovery step is the existing symbol_correlation table): hedge
    * ratio β by single-regressor OLS of log-price A on log-price B
    * over common observed days, then the demeaned spread
    * s = lnPa − β·lnPb − α and its z-score per day — the
    * stat-arb entry/exit signal, with the exact-integer discipline of
    * [[Learn.olsFit]]:
    *
    *  - log prices pinned ONCE per (symbol, day) at 1e-6 units;
    *  - β from exact integer moment sums via truncating division
    *    (driver-held BigInt, the logitFit discipline) — days are
    *    calendar-bounded so the sums stay far inside 2^53;
    *  - spread, mean, and z all in truncating integer micro-units;
    *    σ's one sqrt is IEEE exactly-rounded over an exact integer.
    *
    * Scale shape: the joined series is calendar-bounded (days), the
    * heavy work is the same (symbol, day) reduction the backtest
    * uses; three 1-row driver aggregates, no cross joins in-plan.
    */
  def pairsTrading(trades: DataFrame, symA: String = "SYM_1",
                   symB: String = "SYM_2"): DataFrame = {
    val lp = dailyClose(
        trades.filter(col("symbol").isin(symA, symB)))
      .select(col("symbol"), col("d"),
        round(log(col("close")) * lit(1e6), 0).cast("long").as("lp6"))
      .localCheckpoint(false)
    val joined = lp.filter(col("symbol") === symA)
      .select(col("d"), col("lp6").as("pa6"))
      .join(lp.filter(col("symbol") === symB)
        .select(col("d"), col("lp6").as("pb6")), Seq("d"))
      .localCheckpoint(false)

    val m = joined.agg(count(lit(1)).as("n"),
      sum(col("pa6")).as("sa"), sum(col("pb6")).as("sb"),
      sum(col("pa6") * col("pb6")).as("sab"),
      sum(col("pb6") * col("pb6")).as("sbb")).collect().head
    val n = BigInt(m.getAs[Long]("n"))
    require(n > 1, "pair has fewer than 2 common days")
    val (sa, sb) = (BigInt(m.getAs[Long]("sa")), BigInt(m.getAs[Long]("sb")))
    val den = n * BigInt(m.getAs[Long]("sbb")) - sb * sb
    require(den > 0, "degenerate pair: constant leg B")
    // β in 1e-6 units, truncating (BigInt / ≡ DuckDB //)
    val b6 = (n * BigInt(m.getAs[Long]("sab")) - sa * sb) *
      BigInt(1000000) / den

    val withS = joined.select(col("d"), col("pa6"), col("pb6"),
      (col("pa6") - expr(s"(${b6}L * pb6) div 1000000")).as("s6"))
    val t = withS.agg(sum(col("s6")).as("ss"),
      sum(col("s6") * col("s6")).as("sss")).collect().head
    val (ss, sss) = (BigInt(t.getAs[Long]("ss")), BigInt(t.getAs[Long]("sss")))
    val a6 = ss / n // truncating mean
    // σ of the spread in micro-units: exact integer variance
    // numerator (< 2^53 by the calendar bound), IEEE sqrt, half-up
    // round — identical in DuckDB's round(·, 0) for positive values
    val sd6 = BigInt(math.round(
      math.sqrt((n * sss - ss * ss).toDouble) / n.toDouble))
    require(sd6 > 0, "degenerate pair: zero spread variance")

    // micro-unit integers emitted as DOUBLE (u/1e6) — the
    // no-DECIMAL-outputs envelope
    def micro(c: org.apache.spark.sql.Column) =
      c.cast("double") / lit(1000000.0)
    withS
      .select(col("d"),
        micro(col("pa6")).as("log_price_a"),
        micro(col("pb6")).as("log_price_b"),
        micro(col("s6") - lit(a6.toLong)).as("spread"),
        micro(expr(s"((s6 - ${a6.toLong}L) * 1000000) div ${sd6.toLong}L"))
          .as("z"),
        micro(lit(b6.toLong)).as("beta"),
        lit(n.toLong).as("n_days"))
      .orderBy(col("d"))
  }

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
      c.cast("double") / lit(1000000.0)
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
