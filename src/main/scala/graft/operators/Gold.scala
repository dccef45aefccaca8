package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gold-tier OHLCV + VWAP bar aggregation (reference
  * spark/jobs/silver_to_gold_bars.py:34-66).
  *
  * Semantics preserved exactly:
  *  - tumbling event-time window per symbol (`window(event_time, bar)`, :38)
  *  - open/close via the struct-min/max argmin trick
  *    (`min(struct(event_time, price))`, :42-43) — ties on event_time
  *    tie-break on price, which we document and mirror in the oracle via
  *    `row_number() ... ORDER BY event_time, price`
  *  - high/low/volume/vwap/trades (:44-48, :62-63)
  *  - `bar_date = to_date(bar_start)` partition column (:65)
  *
  * Determinism hardening vs the reference: `sum(double)` is
  * summation-order-dependent, which breaks exact oracle comparison and is
  * nondeterministic across cluster runs. We sum exact decimals instead
  * (Decimal sums are associative) and cast back to double at the boundary,
  * so `volume`/`vwap` are bit-identical on every run and engine.
  *
  * Scale: this is a single hash aggregation keyed (symbol, window) — partial
  * (map-side) aggregation then one shuffle on the group key. State per group
  * is O(1); no windowing over sorted data, no skew risk beyond symbol
  * hot-spotting (mitigate at 100 TB by pre-partitioning on symbol,bar or AQE
  * skew handling — group count = symbols × minutes, far exceeding executor
  * count, so parallelism holds).
  */
object Gold {

  private def decSum(c: Column, t: DecimalType): Column = sum(c.cast(t))

  /** trades(symbol, event_time, price, size, ...) → 1 row per
    * (symbol, bar) with OHLCV + VWAP. Pure batch `DataFrame => DataFrame`;
    * the streaming path wraps the same expressions with a watermark
    * (graft.streaming.GoldStream).
    */
  def bars(trades: DataFrame, barWidth: String = "1 minute"): DataFrame =
    barsWindowed(trades, window(col("event_time"), barWidth))

  /** Sliding-window bars (e.g. 5-minute bars advancing every minute):
    * each trade lands in width/slide windows. Same aggregation; the
    * explode-into-windows is handled by Spark's window() expression and
    * the shuffle key stays (symbol, window), so cost scales linearly
    * with the overlap factor.
    */
  def slidingBars(trades: DataFrame, width: String = "5 minutes",
                  slide: String = "1 minute"): DataFrame =
    barsWindowed(trades, window(col("event_time"), width, slide))

  /** Resample fine bars into coarser ones (1m → 1h) FROM BARS — no
    * re-scan of the trade stream: open/close via ArgExtremum on
    * bar_start, high/low/volume/trades compose, vwap recomputed from the
    * exact decimal notional (vwap·volume). At 100 TB the multi-timeframe
    * ladder (1m→5m→1h→1d) is built tier-from-tier this way, each tier
    * ~60× smaller than the last.
    */
  def resample(bars: DataFrame, width: String = "1 hour"): DataFrame =
    bars
      .groupBy(col("symbol"), window(col("bar_start"), width).as("w"))
      .agg(
        org.apache.spark.sql.graft.ArgExtremum
          .argMin(col("open"), col("bar_start")).as("open"),
        org.apache.spark.sql.graft.ArgExtremum
          .argMax(col("close"), col("bar_start")).as("close"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        decSum(col("volume"), DecimalType(20, 6)).as("vol_d"),
        // vwap·volume reconstructs the bar's notional up to double
        // rounding; round to 6 decimals BEFORE the decimal cast so the
        // cast is exact on every engine (a raw double→decimal cast can
        // differ an ulp between engines at the 10th decimal)
        decSum(round(col("vwap") * col("volume"), 6), DecimalType(28, 8))
          .as("notional_d"),
        sum(col("trades")).as("trades"))
      .select(
        col("symbol"),
        col("w.start").as("bar_start"),
        col("w.end").as("bar_end"),
        col("open"), col("high"), col("low"), col("close"),
        col("vol_d").cast("double").as("volume"),
        (col("notional_d").cast("double") / col("vol_d").cast("double")).as("vwap"),
        col("trades"),
        to_date(col("w.start")).as("bar_date"))

  private def barsWindowed(trades: DataFrame,
                           w: org.apache.spark.sql.Column): DataFrame =
    trades
      .groupBy(col("symbol"), w.as("w"))
      .agg(
        // argmin/argmax with the struct-min tie-break (same semantics as
        // the reference's min/max(struct(event_time, price)) trick) but
        // hash-aggregable: see org.apache.spark.sql.graft.ArgExtremum —
        // a struct-typed buffer would force a SortAggregate (two extra
        // full sorts of the trade stream at scale)
        org.apache.spark.sql.graft.ArgExtremum
          .argMin(col("price"), col("event_time")).as("open"),
        org.apache.spark.sql.graft.ArgExtremum
          .argMax(col("price"), col("event_time")).as("close"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        decSum(col("size"), DecimalType(20, 6)).as("vol_d"),
        decSum(col("price") * col("size"), DecimalType(28, 10)).as("notional_d"),
        count(lit(1)).as("trades"))
      .select(
        col("symbol"),
        col("w.start").as("bar_start"),
        col("w.end").as("bar_end"),
        col("open"),
        col("high"),
        col("low"),
        col("close"),
        col("vol_d").cast("double").as("volume"),
        (col("notional_d").cast("double") / col("vol_d").cast("double")).as("vwap"),
        col("trades"),
        to_date(col("w.start")).as("bar_date"))

  // ------------------------------------------------------------------
  // Mergeable bar state — the incremental / restatement form of the
  // gold tier. `bars` is a one-shot fold of the trade stream; a real
  // deployment lands late or corrected trades AFTER a bar was
  // finalized, and re-folding 100 TB of history per correction is not
  // an option. The state rows below carry exactly what makes OHLCV
  // mergeable: the argmin/argmax KEYS (open_ts/close_ts) alongside the
  // values, and the exact-decimal volume/notional sums. Merging two
  // partial states with ArgExtremum over those keys reproduces the
  // global struct-min/max tie-break bit-for-bit (min over structs is
  // associative), and decimal sums are associative, so
  //   finalize(merge(state(A), state(B))) == bars(A ∪ B)
  // exactly — which is the oracle for both queries built on this.
  // ------------------------------------------------------------------

  /** Per-(symbol, bar) mergeable aggregation state: the bars columns in
    * pre-finalized form plus the merge carriers. Same single hash-agg
    * shuffle as `bars`; the extra columns are O(1) per group.
    */
  def barState(trades: DataFrame, barWidth: String = "1 minute"): DataFrame =
    trades
      .groupBy(col("symbol"), window(col("event_time"), barWidth).as("w"))
      .agg(
        min(col("event_time")).as("open_ts"),
        org.apache.spark.sql.graft.ArgExtremum
          .argMin(col("price"), col("event_time")).as("open"),
        max(col("event_time")).as("close_ts"),
        org.apache.spark.sql.graft.ArgExtremum
          .argMax(col("price"), col("event_time")).as("close"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        decSum(col("size"), DecimalType(20, 6)).as("vol_d"),
        decSum(col("price") * col("size"), DecimalType(28, 10)).as("notional_d"),
        count(lit(1)).as("trades"))
      .select(col("symbol"), col("w.start").as("bar_start"),
        col("w.end").as("bar_end"), col("open_ts"), col("open"),
        col("close_ts"), col("close"), col("high"), col("low"),
        col("vol_d"), col("notional_d"), col("trades"))

  /** Merge partial states for the same (symbol, bar): one hash-agg over
    * the unioned state rows. ArgExtremum's tie-break (ties on the ts key
    * take the smaller open / larger close) is exactly the struct-min/max
    * convention of `bars`, so the merge commutes with recomputation.
    */
  def mergeBarStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("symbol"), col("bar_start"))
      .agg(
        max(col("bar_end")).as("bar_end"),
        min(col("open_ts")).as("open_ts"),
        org.apache.spark.sql.graft.ArgExtremum
          .argMin(col("open"), col("open_ts")).as("open"),
        max(col("close_ts")).as("close_ts"),
        org.apache.spark.sql.graft.ArgExtremum
          .argMax(col("close"), col("close_ts")).as("close"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        sum(col("vol_d")).as("vol_d"),
        sum(col("notional_d")).as("notional_d"),
        sum(col("trades")).as("trades"))
      .select(col("symbol"), col("bar_start"), col("bar_end"),
        col("open_ts"), col("open"), col("close_ts"), col("close"),
        col("high"), col("low"), col("vol_d"), col("notional_d"),
        col("trades"))

  /** State → the public bars schema (same finalization as `bars`: cast
    * the exact decimal totals to double at the boundary, vwap from the
    * exact notional). Merged and recomputed states hold identical exact
    * decimals, so the finalized doubles are bit-identical too.
    */
  def finalizeBars(state: DataFrame): DataFrame =
    state.select(
      col("symbol"), col("bar_start"), col("bar_end"),
      col("open"), col("high"), col("low"), col("close"),
      col("vol_d").cast("double").as("volume"),
      (col("notional_d").cast("double") / col("vol_d").cast("double"))
        .as("vwap"),
      col("trades"),
      to_date(col("bar_start")).as("bar_date"))

  /** Pin the persisted-state decimal types. Spark widens decimal
    * precision per aggregation (sum(DECIMAL(20,6)) → (30,6); a merge of
    * merges → (38,6)), so a state TABLE whose partitions are written at
    * different merge depths would carry conflicting parquet decimal
    * schemas. Casting to the max-precision types makes every write
    * byte-compatible; the casts are exact (widening only).
    */
  def normalizeState(state: DataFrame): DataFrame =
    state
      .withColumn("vol_d", col("vol_d").cast(DecimalType(38, 6)))
      .withColumn("notional_d", col("notional_d").cast(DecimalType(38, 10)))
      .withColumn("trades", col("trades").cast("long"))

  /** Late-data restatement: fold a (small) delta of late/corrected
    * trades into the persisted bar state, re-aggregating ONLY the bars
    * the delta touches. The touched key set is delta-sized, so both the
    * semi and anti join against history broadcast it — history is
    * scanned once, never shuffled, and the untouched (overwhelming)
    * majority of bars passes through without re-aggregation. At 100 TB
    * the history side additionally partition-prunes on bar_date before
    * the scan (late trades cluster in recent dates).
    */
  def restateBars(histState: DataFrame, deltaTrades: DataFrame,
                  barWidth: String = "1 minute"): DataFrame = {
    val deltaState = barState(deltaTrades, barWidth)
    val touched = deltaState.select(col("symbol"), col("bar_start")).distinct()
    val touchedHist = histState.join(broadcast(touched),
      Seq("symbol", "bar_start"), "left_semi")
    val untouched = histState.join(broadcast(touched),
      Seq("symbol", "bar_start"), "left_anti")
    finalizeBars(mergeBarStates(touchedHist, deltaState)
      .unionByName(untouched))
  }
}
