package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics over gold bars: returns, rolling z-scores, anomalies, gaps,
  * top-K (reference notebooks/analysis.ipynb cells 3-5).
  *
  * Semantics preserved:
  *  - `lag(close,1)` / `lead(open,1)` over (symbol, time) for returns/gaps
  *  - trailing N-minute RANGE window over epoch-seconds EXCLUDING the
  *    current row (`rangeBetween(-60N, -1)`) — load-bearing for z-score
  *    correctness (SURVEY §2.5 W4)
  *  - sample stddev (`stddev_samp`), `when` without `otherwise` ⇒ else-NULL
  *  - anomaly flags: |z_ret| > z two-sided, z_vol > z ONE-sided (the
  *    reference's asymmetry, analysis.ipynb N4)
  *
  * Determinism: window aggregates over doubles are summation-shape-
  * dependent across engines (Spark folds the frame sequentially, DuckDB
  * uses segment trees), so every window-aggregate output is rounded to 6
  * decimals, and z-scores are computed FROM the rounded stats so the
  * division sees bit-identical operands on both engines. Pure row-local
  * arithmetic (ret, gap_pct) is IEEE-deterministic and stays unrounded.
  *
  * Scale: all window functions share ONE partitioning (symbol) and one sort
  * (ts_s) — Catalyst collapses them into a single Exchange + Sort + Window
  * chain, so adding z/vol/gap families costs no extra shuffle. Partition
  * count = |symbols|; at 100 TB with few symbols, pre-bucket bars by
  * (symbol, coarse time) or process per-date slices to restore parallelism.
  */
object Analytics {

  private val ZERO_SD = 1e-12

  /** Version-safe 6-decimal pin: round(e·1e6, 0)/1e6 — engine and
    * DuckDB oracle then round the SAME IEEE double (SCALING.md trap
    * #10); the oracle twins carry the same ·1e6 association. */
  private def r6(c: Column): Column = round(c * lit(1.0e6), 0) / lit(1.0e6)
  private def r9(c: Column): Column = round(c * lit(1.0e9), 0) / lit(1.0e9)
  private def r12(c: Column): Column =
    round(c * lit(1.0e12), 0) / lit(1.0e12)

  /** N3 prep: epoch-second sort key for the RANGE frame. */
  def withTsSeconds(bars: DataFrame): DataFrame =
    bars.withColumn("ts_s", unix_timestamp(col("bar_start")))

  private def wOrder(partCols: Seq[String]) =
    Window.partitionBy(partCols.map(col): _*).orderBy("ts_s")
  private def wTime(nMinutes: Int, partCols: Seq[String]) =
    wOrder(partCols).rangeBetween(-60L * nMinutes, -1)
  private val SymbolPart = Seq("symbol")

  /** prev_close / ret / logret (analysis.ipynb N4, lag family). */
  def withReturns(bars: DataFrame,
                  partCols: Seq[String] = SymbolPart): DataFrame =
    bars
      .withColumn("prev_close", lag(col("close"), 1).over(wOrder(partCols)))
      .withColumn("ret",
        when(col("prev_close").isNotNull && col("prev_close") =!= 0.0,
          col("close") / col("prev_close") - 1.0))
      .withColumn("logret",
        // close > 0 guard: Spark's log(0) is NULL but DuckDB's ln(0)
        // hard-errors — pin the NULL on both sides explicitly (six
        // zero-price events exist at sf0.1)
        when(col("prev_close").isNotNull && col("prev_close") > 0.0 &&
          col("close") > 0.0,
          r6(log(col("close") / col("prev_close")))))

  /** Rolling mean/sd + z for returns and volume (N4, rangeBetween family).
    * `when` guards with no `otherwise` ⇒ null where sd is null/zero.
    */
  def withRollingStats(df: DataFrame, nMinutes: Int = 30,
                       partCols: Seq[String] = SymbolPart): DataFrame = {
    val w = wTime(nMinutes, partCols)
    df
      .withColumn("ret_mu", r6(avg(col("logret")).over(w)))
      .withColumn("ret_sd", r6(stddev_samp(col("logret")).over(w)))
      .withColumn("z_ret",
        when(col("ret_sd").isNotNull && col("ret_sd") > ZERO_SD,
          r6((col("logret") - col("ret_mu")) / col("ret_sd"))))
      .withColumn("vol_mu", r6(avg(col("volume")).over(w)))
      .withColumn("vol_sd", r6(stddev_samp(col("volume")).over(w)))
      .withColumn("z_vol",
        when(col("vol_sd").isNotNull && col("vol_sd") > ZERO_SD,
          r6((col("volume") - col("vol_mu")) / col("vol_sd"))))
  }

  /** next_open / gap_pct (N4, lead family). */
  def withGaps(df: DataFrame,
               partCols: Seq[String] = SymbolPart): DataFrame =
    df
      .withColumn("next_open", lead(col("open"), 1).over(wOrder(partCols)))
      .withColumn("gap_pct",
        when(col("next_open").isNotNull && col("close") =!= 0.0,
          (col("next_open") - col("close")) / col("close")))

  /** Anomaly flags from the (rounded, hence cross-engine-identical)
    * z-scores. Volume anomaly is one-sided, mirroring the reference.
    */
  def withAnomalies(df: DataFrame, z: Double = 3.0): DataFrame =
    df
      .withColumn("is_return_anom",
        col("z_ret").isNotNull && abs(col("z_ret")) > z)
      .withColumn("is_volume_anom",
        col("z_vol").isNotNull && col("z_vol") > z)

  /** Full single-pass analytics frame: one Exchange+Sort, all families. */
  def enrich(bars: DataFrame, nMinutes: Int = 30, z: Double = 3.0): DataFrame =
    withAnomalies(withGaps(withRollingStats(withReturns(withTsSeconds(bars)), nMinutes)), z)

  /** Slice-partitioned analytics for LONG histories of FEW symbols —
    * the scale shape where partitioning by symbol alone leaves most of a
    * 1000-executor cluster idle. Each (symbol, day) slice is computed
    * independently; every row is replicated into the neighboring slice
    * whose window could need it (trailing `nMinutes` + `ctxSecs` of
    * back-context for the RANGE frame and lag, `ctxSecs` of forward
    * context for lead), then context rows are dropped. Parallelism
    * becomes |symbols| × |days| at the cost of ≤ (overlap/day) extra
    * rows (~4% for 1h context).
    *
    * Equivalent to [[enrich]] whenever consecutive bars of a symbol are
    * never more than `ctxSecs` apart (continuous markets); verified by
    * AnalyticsSpec on dense series.
    */
  def enrichSliced(bars: DataFrame, nMinutes: Int = 30, z: Double = 3.0,
                   sliceSecs: Long = 86400L, ctxSecs: Long = 3600L): DataFrame = {
    val backSecs = 60L * nMinutes + ctxSecs
    val part = Seq("symbol", "__slice")
    val base = withTsSeconds(bars)
      .withColumn("__home", expr(s"ts_s div $sliceSecs"))
    val cands = array(
      col("__home"),
      when(col("ts_s") >= (col("__home") + 1) * sliceSecs - backSecs,
        col("__home") + 1),
      when(col("ts_s") < col("__home") * sliceSecs + ctxSecs,
        col("__home") - 1))
    val exploded = base.withColumn("__slice",
      explode(filter(cands, c => c.isNotNull)))
    val full = withAnomalies(
      withGaps(
        withRollingStats(withReturns(exploded, part), nMinutes, part), part), z)
    full.filter(col("__slice") === col("__home")).drop("__home", "__slice")
  }

  /** The reference's literal join-stitch shape (N4/N5): compute the stat
    * families as separate frames and LEFT-join them back on
    * (symbol, bar_start) — J1 in the operator inventory. Semantically
    * identical to [[enrich]]; kept as the declared join capability.
    * Scale: each branch re-sorts the same data — [[enrich]] is the plan
    * you want; this exists to prove join parity.
    */
  def enrichViaJoins(bars: DataFrame, nMinutes: Int = 30, z: Double = 3.0): DataFrame = {
    val base = withTsSeconds(bars)
    val key = Seq("symbol", "bar_start")
    val stats = withRollingStats(withReturns(base), nMinutes)
    val rets = stats
      .select("symbol", "bar_start", "prev_close", "ret", "logret", "ret_mu", "ret_sd", "z_ret")
    val vols = stats
      .select("symbol", "bar_start", "vol_mu", "vol_sd", "z_vol")
    val gaps = withGaps(base).select("symbol", "bar_start", "next_open", "gap_pct")
    withAnomalies(
      base.join(rets, key, "left").join(vols, key, "left").join(gaps, key, "left"), z)
  }

  /** Top-K most recent rows, re-sorted ascending (N5:
    * `orderBy(desc).limit(K).orderBy(asc)` — plans as
    * TakeOrderedAndProject, no global sort).
    */
  /** EWMA weights for [[indicators]]: α(1-α)^i, newest-first, α=2/(K+1).
    * Serialized via Double.toString (shortest round-trip repr) so BOTH
    * engines parse literals back to bit-identical doubles.
    */
  private[graft] def ewmaWeights(k: Int): Seq[Double] = {
    val alpha = 2.0 / (k + 1)
    (0 until k).map(i => alpha * math.pow(1 - alpha, i))
  }

  /** Technical indicators per (symbol, bar) — the classic chart trio,
    * emitted only where the full lookback exists (else NULL):
    *  - Bollinger(20): 20-bar rolling mean ± 2σ of close
    *  - RSI(14): 100 − 100/(1+RS), RS = avg gain / avg loss over the
    *    last 14 close-to-close moves (all-zero losses → 100)
    *  - EWMA(20), truncated+normalized: Σ wᵢ·closeᵗ⁻ⁱ / Σ wᵢ with
    *    wᵢ = α(1−α)ⁱ — a ROWS-window weighted fold (true infinite EWMA
    *    is a recurrence no window function expresses; the 20-term tail
    *    carries (1−α)²⁰ ≈ 13% weight error bound, standard practice)
    *
    * ALL of it rides ONE symbol partition sort: three frame widths over
    * the same Exchange+Sort, no extra shuffle (same plan property as
    * [[enrich]]). Every aggregate is rounded to 6 decimals before any
    * derived arithmetic, mirrored in the oracle.
    */
  def indicators(bars: DataFrame): DataFrame = {
    val w20 = wOrder(SymbolPart).rowsBetween(-19, 0)
    val w14 = wOrder(SymbolPart).rowsBetween(-13, 0)
    val ws = ewmaWeights(20)
    val wLit = ws.map(w => java.lang.Double.toString(w) + "D")
      .mkString("array(", ", ", ")")
    val sumW = java.lang.Double.toString(ws.sum)
    withTsSeconds(bars)
      .select(col("symbol"), col("bar_start"), col("ts_s"), col("close"))
      .withColumn("n20", count(col("close")).over(w20))
      .withColumn("mid", r6(avg(col("close")).over(w20)))
      .withColumn("sd", r6(stddev_samp(col("close")).over(w20)))
      .withColumn("cl", collect_list(col("close")).over(w20))
      .withColumn("diff",
        col("close") - lag(col("close"), 1).over(wOrder(SymbolPart)))
      .withColumn("gain", when(col("diff").isNotNull,
        when(col("diff") > 0, col("diff")).otherwise(0.0)))
      .withColumn("loss", when(col("diff").isNotNull,
        when(col("diff") < 0, -col("diff")).otherwise(0.0)))
      .withColumn("nd", count(col("diff")).over(w14))
      .withColumn("ag", r6(avg(col("gain")).over(w14)))
      .withColumn("al", r6(avg(col("loss")).over(w14)))
      .select(
        col("symbol"), col("bar_start"), col("close"),
        when(col("n20") === 20, col("mid")).as("boll_mid"),
        when(col("n20") === 20, col("sd")).as("boll_sd"),
        when(col("n20") === 20, r6(col("mid") + col("sd") * 2)).as("boll_up"),
        when(col("n20") === 20, r6(col("mid") - col("sd") * 2)).as("boll_dn"),
        when(col("nd") === 14,
          when(col("al") > 0,
            r6(lit(100.0) - lit(100.0) / (lit(1.0) + col("ag") / col("al"))))
            .otherwise(100.0)).as("rsi14"),
        when(col("n20") === 20, r6(expr(
          s"""aggregate(zip_with(reverse(cl), $wLit, (x, w) -> x * w),
             |0D, (acc, v) -> acc + v) / ${sumW}D""".stripMargin)))
          .as("ewma20"))
  }

  /** Per-symbol close-price distribution profile via the rank window
    * family (ntile / percent_rank / cume_dist — the three ranking
    * functions no other query exercises): quartile membership counts
    * with each quartile's price range and rank boundaries. The window
    * order is (close, bar_start) — a total order, so every ranking
    * value is deterministic cross-engine.
    */
  def rankProfile(bars: DataFrame, buckets: Int = 4): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy(col("close"), col("bar_start"))
    bars.select(col("symbol"), col("close"),
        ntile(buckets).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .groupBy(col("symbol"), col("quartile"))
      .agg(
        count(lit(1)).as("n_bars"),
        min(col("close")).as("close_lo"),
        max(col("close")).as("close_hi"),
        r6(max(col("pr"))).as("pr_hi"),
        r6(max(col("cd"))).as("cd_hi"))
  }

  def lastK(df: DataFrame, k: Int = 180): DataFrame = {
    val recent = df.orderBy(col("bar_start").desc).limit(k)
    recent.orderBy(col("bar_start").asc)
  }

  /** Gap filling / resampling to a dense minute grid: every symbol gets
    * one row per minute between its first and last bar; missing minutes
    * carry volume 0, trades 0, and a forward-filled close (the standard
    * chart/backtest input shape). The grid is generated per symbol with
    * `sequence` + explode (no cross join against a calendar table) and
    * filled with one running-last window — a single shuffle by symbol.
    */
  def fillGaps(bars: DataFrame): DataFrame = {
    val grid = bars
      .groupBy(col("symbol"))
      .agg(min(col("bar_start")).as("t0"), max(col("bar_start")).as("t1"))
      .select(col("symbol"),
        explode(sequence(col("t0"), col("t1"),
          expr("INTERVAL 1 MINUTE"))).as("bar_start"))
    val w = Window.partitionBy("symbol").orderBy("bar_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(bars.select("symbol", "bar_start", "close", "volume", "trades"),
        Seq("symbol", "bar_start"), "left")
      .select(
        col("symbol"), col("bar_start"),
        col("close").isNotNull.as("is_real"),
        last(col("close"), ignoreNulls = true).over(w).as("close_ff"),
        coalesce(col("volume"), lit(0.0)).as("volume"),
        coalesce(col("trades"), lit(0L)).as("trades"))
  }

  /** Linear-interpolation gap fill — the IMPUTATION companion of
    * [[fillGaps]]'s forward fill: a missing minute takes the
    * time-weighted blend of its bracketing real closes instead of a
    * stale step (forward fill biases every gap toward the past — a
    * backtest entering mid-gap sees yesterday's price; interpolation
    * is the standard feature-matrix imputation). Emits BOTH fills so
    * the spread between them is itself a gap-severity signal.
    *
    * The bracket comes from two running windows (last real close+µs
    * before, first real close+µs after — no self-join against the
    * real rows). The blend is EXACT integer arithmetic in price
    * micro-units: li = (prev_µ·(n−k) + next_µ·k) DIV n over gap
    * minutes k of n — both weighted terms are positive, so truncating
    * and floor division agree and the two engines' integral divisions
    * cannot split (a naive prev + (next−prev)·k/n double blend DID
    * split them: one engine contracts the multiply-add, and values
    * landing on the half-micro boundary round apart). The one double
    * appears casting the exact 6-decimal result at the boundary.
    * Interior gaps always have both brackets (grid endpoints are real
    * bars by construction).
    *
    * Scale: same single symbol-keyed shuffle as [[fillGaps]] — the
    * grid generates per symbol via sequence+explode, four window
    * passes share the one sort.
    */
  def interpolateGaps(bars: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val grid = bars
      .groupBy(col("symbol"))
      .agg(min(col("bar_start")).as("t0"), max(col("bar_start")).as("t1"))
      .select(col("symbol"),
        explode(sequence(col("t0"), col("t1"),
          expr("INTERVAL 1 MINUTE"))).as("bar_start"))
    val wPrev = Window.partitionBy("symbol").orderBy("bar_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the forward bracket as a RUNNING frame over the reversed sort:
    // Spark evaluates first(..., ignoreNulls) over [current, +∞) by
    // rescanning to partition end per row (O(n²) — measured 162 s on
    // one symbol-month of minutes); last(...) over a DESC-ordered
    // growing frame is the O(n) running-state shape.
    val wNext = Window.partitionBy("symbol").orderBy(col("bar_start").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(bars.select(col("symbol"), col("bar_start"), col("close")),
        Seq("symbol", "bar_start"), "left")
      .withColumn("u", unix_micros(col("bar_start")))
      .withColumn("c_micro",
        round(col("close") * lit(1e6), 0).cast("long"))
      .withColumn("prev_c", last(col("close"), ignoreNulls = true)
        .over(wPrev))
      .withColumn("prev_m", last(col("c_micro"), ignoreNulls = true)
        .over(wPrev))
      .withColumn("prev_u",
        last(when(col("close").isNotNull, col("u")), ignoreNulls = true)
          .over(wPrev))
      .withColumn("next_m", last(col("c_micro"), ignoreNulls = true)
        .over(wNext))
      .withColumn("next_u",
        last(when(col("close").isNotNull, col("u")), ignoreNulls = true)
          .over(wNext))
      .withColumn("k_min",
        expr("(u - prev_u) div 60000000"))
      .withColumn("n_min",
        expr("(next_u - prev_u) div 60000000"))
      .withColumn("li_micro",
        when(col("n_min") === 0, col("c_micro")).otherwise(
          expr("(prev_m * (n_min - k_min) + next_m * k_min) div n_min")))
      .select(col("symbol"), col("bar_start"),
        col("close").isNotNull.as("is_real"),
        col("prev_c").as("close_ff"),
        (col("li_micro").cast(DecimalType(20, 0)) *
          lit(new java.math.BigDecimal("0.000001"))
            .cast(DecimalType(7, 6)))
          .cast("double").as("close_li"))
  }

  /** Exact interpolated percentiles of price per symbol (distribution
    * profile). `percentile` is Spark's exact implementation — sorts per
    * group; for 100 TB switch to `percentile_approx` (t-digest sketch,
    * mergeable map-side) and accept the approximation.
    */
  def priceQuantiles(trades: DataFrame): DataFrame =
    trades
      .groupBy(col("symbol"))
      .agg(
        round(expr("percentile(price, 0.5)"), 6).as("p50"),
        round(expr("percentile(price, 0.95)"), 6).as("p95"),
        round(expr("percentile(price, 0.99)"), 6).as("p99"),
        count(lit(1)).as("n"))
      .orderBy(col("symbol"))

  /** Pairwise log-return correlation matrix over a FIXED symbol
    * universe — the cross-asset co-movement profile every market
    * analytics stack ships. Determinism hardening: Spark's `corr`
    * aggregate merges partial (mean, M2, co-moment) states in
    * partition order, so its low bits vary run to run and cross-engine;
    * here every sum (Σx, Σy, Σxy, Σx², Σy²) is an EXACT int64 over
    * 1e-6-unit integer returns (associative — bit-stable under any
    * partitioning), and only the final textbook formula
    * (nΣxy − ΣxΣy)/√(nΣx² − (Σx)²)√(nΣy² − (Σy)²) runs in doubles,
    * each product materialized separately, with the same expression
    * shape as the oracle.
    *
    * Scale shape: returns for the chosen universe are a tiny slice
    * (symbol pushdown to the scan); the pair join is bounded by
    * |universe|² — a PARAMETER, not data — and the per-pair sums are
    * one hash agg. For an all-symbols matrix at scale, block the
    * universe and reuse the same per-pair aggregation.
    */
  def symbolCorrelation(bars: DataFrame,
                        symbols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("bar_start"))
    val r = bars.filter(col("symbol").isin(symbols: _*))
      .select(col("symbol"), col("bar_start"), col("close"))
      .withColumn("prev", lag(col("close"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > 0 &&
        col("close") > 0)
      .select(col("symbol"), col("bar_start"),
        round(log(col("close") / col("prev")) * lit(1000000.0), 0)
          .cast("long").as("r6"))
    val a = r.toDF("s1", "bar_start", "x")
    val b = r.toDF("s2", "bar_start", "y")
    // 1e-6-unit integer returns: every co-moment sum is an exact
    // int64 (per-row products ≤ ~1e13, ANSI throws rather than wraps
    // on a genuine overflow), so the normal-equation terms are the
    // SAME integers under any partitioning and in any engine. Each
    // n·Σ / Σ·Σ product is materialized as its own double column
    // before the subtraction — a single a·b − c·d double expression
    // can contract to an FMA in one engine and not the other.
    val g = a.join(b, Seq("bar_start"))
      .filter(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_bars"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    def d(c: String) = col(c).cast("double")
    val q = g.select(col("s1"), col("s2"), col("n_bars"),
      (d("n_bars") * d("sxy")).as("t1"), (d("sx") * d("sy")).as("t2"),
      (d("n_bars") * d("sxx")).as("t3"), (d("sx") * d("sx")).as("t4"),
      (d("n_bars") * d("syy")).as("t5"), (d("sy") * d("sy")).as("t6"))
    q.select(col("s1"), col("s2"), col("n_bars"),
        when(col("t3") - col("t4") > 0 && col("t5") - col("t6") > 0,
          (col("t1") - col("t2")) /
            (sqrt(col("t3") - col("t4")) * sqrt(col("t5") - col("t6"))))
          .as("corr"))
      .orderBy(col("s1"), col("s2"))
  }

  /** Per-symbol market beta: each symbol's log returns regressed on the
    * equal-weight market return (the cross-sectional mean of all
    * symbols' returns in the same bar). Same determinism discipline as
    * [[symbolCorrelation]]: returns and the market factor are 1e-6-unit
    * integers, all sums exact int64, the OLS slope
    * (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) in doubles only at the boundary,
    * each product a separate column.
    *
    * Scale shape: the market factor is a bar-cardinality aggregate
    * (one hash agg over returns), broadcast back onto returns by
    * bar_start; one more hash agg per symbol. Nothing fact-sized
    * shuffles twice.
    */
  def symbolBeta(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("bar_start"))
    val r = bars
      .select(col("symbol"), col("bar_start"), col("close"))
      .withColumn("prev", lag(col("close"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > 0 &&
        col("close") > 0)
      .select(col("symbol"), col("bar_start"),
        round(log(col("close") / col("prev")) * lit(1000000.0), 0)
          .cast("long").as("r6"))
    // the market factor is the bar-mean return re-pinned to the same
    // 1e-6 integer grid: one IEEE division of exact int64s, rounded
    // at scale 0 (both engines round the same double)
    val mkt = r.groupBy(col("bar_start"))
      .agg(sum(col("r6")).as("sr"), count(lit(1)).as("nr"))
      .select(col("bar_start"),
        round(col("sr").cast("double") / col("nr").cast("double"), 0)
          .cast("long").as("m6"))
    val g = r.join(broadcast(mkt), Seq("bar_start"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_bars"),
        sum(col("m6")).as("sx"), sum(col("r6")).as("sy"),
        sum(col("m6") * col("r6")).as("sxy"),
        sum(col("m6") * col("m6")).as("sxx"))
    def d(c: String) = col(c).cast("double")
    val q = g.select(col("symbol"), col("n_bars"),
      (d("n_bars") * d("sxy")).as("t1"), (d("sx") * d("sy")).as("t2"),
      (d("n_bars") * d("sxx")).as("t3"), (d("sx") * d("sx")).as("t4"))
    q.select(col("symbol"), col("n_bars"),
        when(col("t3") - col("t4") > 0,
          (col("t1") - col("t2")) / (col("t3") - col("t4"))).as("beta"))
      .orderBy(col("symbol"))
  }

  /** Lead–lag cross-correlation per symbol: correlation of the
    * symbol's hourly log return at t against the MARKET return at
    * t + lag for each lag in ±`maxLagHours` — [[symbolBeta]] answers
    * "how much does this symbol move with the market"; this answers
    * "does it move FIRST" (positive-lag peak = the symbol leads,
    * negative = it follows — the price-discovery question). Exact
    * decimal co-moments (Σx, Σy, Σxy, Σx², Σy²) per (symbol, lag)
    * keep the matrix bit-stable under any partitioning; the textbook
    * correlation evaluates in doubles once at the boundary, and the
    * best-lag flag ranks the ROUNDED correlations (ties to the
    * smaller lag).
    *
    * Scale shape: the lag alignment is the banded equi-join again —
    * each return row explodes its 2L+1 lag offsets and equi-joins the
    * broadcast hours-sized market series on exact µs; one
    * (symbol, lag)-keyed agg follows.
    */
  def symbolLeadLag(bars: DataFrame, maxLagHours: Int = 2): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col("symbol")).orderBy(col("bar_start"))
    val r = bars
      .select(col("symbol"), col("bar_start"), col("close"))
      .withColumn("prev", lag(col("close"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > 0 &&
        col("close") > 0)
      .select(col("symbol"), unix_micros(col("bar_start")).as("u"),
        r6(log(col("close") / col("prev")))
          .cast(DecimalType(18, 6)).as("ret"))
    val mkt = r.groupBy(col("u"))
      .agg(sum(col("ret")).as("sr"), count(lit(1)).as("nr"))
      .select(col("u").as("mu"),
        r6(col("sr").cast("double") / col("nr").cast("double"))
          .cast(DecimalType(18, 6)).as("mret"))
    val lagged = r.withColumn("lag_h",
        explode(array((-maxLagHours to maxLagHours).map(l => lit(l)): _*)))
      .withColumn("mu",
        col("u") + col("lag_h").cast("long") * lit(3600000000L))
    val g = lagged.join(broadcast(mkt), Seq("mu"))
      .groupBy(col("symbol"), col("lag_h"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("mret")).as("sx"), sum(col("ret")).as("sy"),
        sum((col("mret") * col("ret")).cast(DecimalType(38, 12)))
          .as("sxy"),
        sum((col("mret") * col("mret")).cast(DecimalType(38, 12)))
          .as("sxx"),
        sum((col("ret") * col("ret")).cast(DecimalType(38, 12)))
          .as("syy"))
    val n = col("n_obs").cast("double")
    def d(c: String) = col(c).cast("double")
    val den = (n * d("sxx") - d("sx") * d("sx")) *
      (n * d("syy") - d("sy") * d("sy"))
    val wBest = Window.partitionBy(col("symbol"))
      .orderBy(col("xcorr").desc_nulls_last, col("lag_h"))
    g.withColumn("xcorr",
        when(den > 0,
          r6((n * d("sxy") - d("sx") * d("sy")) / sqrt(den))))
      .withColumn("is_best",
        row_number().over(wBest) === 1 && col("xcorr").isNotNull)
      .select(col("symbol"), col("lag_h").as("lag_hours"),
        col("n_obs"), col("xcorr"), col("is_best"))
      .orderBy(col("symbol"), col("lag_hours"))
  }

  /** Maximum drawdown per symbol: the deepest peak-to-trough loss of
    * the close series — running cumulative max (one window pass), then
    * the per-symbol min of close/peak − 1. Map-linear; the window
    * shares the symbol partitioning with every other per-symbol pass.
    */
  def maxDrawdown(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("bar_start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bars.select(col("symbol"), col("bar_start"), col("close"))
      .withColumn("peak", max(col("close")).over(w))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_bars"),
        r6(min(col("close") / col("peak") - 1)).as("max_drawdown"))
      .orderBy(col("symbol"))
  }

  /** Order-flow imbalance per (symbol, bar): buy vs sell volume with
    * the signed imbalance ratio — the microstructure pressure signal.
    * Exact decimal volume sums; the ratio in doubles at the boundary.
    * One hash agg, same key as the bar aggregation itself.
    */
  def flowImbalance(trades: DataFrame,
                    barWidth: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def side(s: String) =
      sum(when(col("side") === s, col("size").cast(DecimalType(20, 6)))
        .otherwise(lit(0).cast(DecimalType(20, 6))))
    trades
      .groupBy(col("symbol"), window(col("event_time"), barWidth).as("w"))
      .agg(side("buy").as("buy_d"), side("sell").as("sell_d"),
        count(lit(1)).as("trades"))
      .select(col("symbol"), col("w.start").as("bar_start"),
        col("buy_d").cast("double").as("buy_vol"),
        col("sell_d").cast("double").as("sell_vol"),
        r6((col("buy_d").cast("double") - col("sell_d").cast("double"))
          / (col("buy_d").cast("double") + col("sell_d").cast("double")))
          .as("imbalance"),
        col("trades"))
      .orderBy(col("symbol"), col("bar_start"))
  }

  /** Volatility signature per symbol: realized variance (Σ r²) of log
    * returns sampled at 1/5/15/60-minute scales over the same span —
    * the microstructure-noise audit [Andersen et al.]: for a clean
    * price process RV is scale-invariant, while bid-ask bounce and
    * discreteness INFLATE it at fine scales, so the
    * `noise_ratio = RV(scale)/RV(60m)` curve tells you the finest
    * sampling the feed supports before noise dominates — the knob
    * behind every realized-vol estimator and bar-width choice
    * upstream of [[symbolVolEstimators]].
    *
    * Coarse closes come from the same ArgExtremum argmax the resample
    * ladder uses (close of the last 1-minute bar in each bucket) —
    * one 1-minute bar pass, three vocabulary-of-buckets aggregations,
    * one lag window per (symbol, scale), exact decimal Σr² sums, the
    * ratio divides doubles once at the boundary.
    */
  def volSignature(trades: DataFrame,
                   scales: Seq[Int] = Seq(1, 5, 15, 60)): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val b1 = Gold.bars(trades, "1 minute")
      .select(col("symbol"), col("bar_start"), col("close"))
    val perScale = scales.map { m =>
      val c =
        if (m == 1) b1
        else b1
          .groupBy(col("symbol"),
            window(col("bar_start"), s"$m minutes").as("w"))
          .agg(org.apache.spark.sql.graft.ArgExtremum
            .argMax(col("close"), col("bar_start")).as("close"))
          .select(col("symbol"), col("w.start").as("bar_start"),
            col("close"))
      c.withColumn("scale_minutes", lit(m))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("symbol"), col("scale_minutes"))
      .orderBy(col("bar_start"))
    // log returns pinned once at 1e-6 units (round(v·1e6, 0), never
    // round(v, 6)+decimal-cast); realized variance is the exact
    // 1e-12-unit integer Σ r6², the ratio a truncating integer
    // division — outputs are doubles from int64 units only
    val rv = perScale
      .withColumn("prev", lag(col("close"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > 0 &&
        col("close") > 0)
      .select(col("symbol"), col("scale_minutes"),
        round(log(col("close") / col("prev")) * lit(1000000.0), 0)
          .cast("long").as("r6"))
      .groupBy(col("symbol"), col("scale_minutes"))
      .agg(count(lit(1)).as("n_rets"),
        sum((col("r6") * col("r6")).cast(DecimalType(38, 0)))
          .as("s12"))
    val base = rv.filter(col("scale_minutes") === scales.max)
      .select(col("symbol"), col("s12").as("s12b"))
    rv.join(base, Seq("symbol"))
      .select(col("symbol"), col("scale_minutes"), col("n_rets"),
        (col("s12").cast("double") / lit(1.0e12)).as("rv"),
        when(col("s12b") > 0,
          expr("(s12 * 1000000) div s12b").cast("double") /
            lit(1000000.0)).as("noise_ratio"))
      .orderBy(col("symbol"), col("scale_minutes"))
  }

  /** SAX motif discovery per symbol [Lin et al. 2003, "A Symbolic
    * Representation of Time Series"]: closes are discretized to a
    * 4-letter alphabet and every `wordLen`-bar sliding word is
    * counted — the top motifs are the series' recurring shapes
    * (accumulation ramps, V-reversals, flat shelves) that no
    * variance-family statistic surfaces. This variant discretizes by
    * RANK QUARTILE (ntile over the symbol's own closes) instead of
    * Gaussian breakpoints: distribution-free, and pure integer/string
    * arithmetic end to end — no z-score, no libm, nothing to pin.
    *
    * support_bp = (count · 10000) div n_words keeps the support on an
    * exact integer basis-point grid (no double division anywhere).
    *
    * Scale shape: one value-ranked window + one time-ordered window
    * per symbol (same partition key, one exchange), a hash agg over
    * (symbol, word) — at most 4^wordLen words per symbol — and a
    * WindowGroupLimit top-k. Symbols with fewer than wordLen bars
    * emit nothing.
    */
  def saxMotifs(bars: DataFrame, wordLen: Int = 4,
                topK: Int = 10): DataFrame = {
    val byVal = Window.partitionBy(col("symbol"))
      .orderBy(col("close"), col("bar_start"))
    val byTime = Window.partitionBy(col("symbol")).orderBy(col("bar_start"))
    val worded = bars
      .select(col("symbol"), col("bar_start"), col("close"))
      .withColumn("letter", ntile(4).over(byVal).cast("string"))
      // concat null-propagates in Spark, so trailing partial windows
      // (any lead null) drop below; the oracle uses || for the same
      // semantics (DuckDB's concat() swallows NULLs — a trap)
      .withColumn("word", concat((0 until wordLen).map(i =>
        lead(col("letter"), i).over(byTime)): _*))
      .filter(col("word").isNotNull)
    val bySym = Window.partitionBy(col("symbol"))
    worded.groupBy(col("symbol"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("n_words", sum(col("cnt")).over(bySym))
      .withColumn("rank", row_number().over(
        bySym.orderBy(col("cnt").desc, col("word"))))
      .filter(col("rank") <= topK)
      .select(col("symbol"), col("rank"), col("word"), col("cnt"),
        expr("(cnt * 10000) div n_words").as("support_bp"))
      .orderBy(col("symbol"), col("rank"))
  }

  /** Hurst exponent by rescaled-range (R/S) analysis per symbol — the
    * long-memory diagnostic none of the variance-family estimators
    * see: H ≈ 0.5 is a random walk, H > 0.5 persistent trends
    * (momentum strategies have something to eat), H < 0.5
    * anti-persistent mean reversion (the spec's alternating series
    * scores exactly 0). The return series splits into complete chunks
    * of each window size (8/16/32/64 bars); per chunk
    * R = range of cumulative mean deviations (0 included, the
    * convention) and S = population std; H is the log₂-log₂ OLS slope
    * of the per-size mean R/S.
    *
    * Determinism: returns are the 6-decimal decimal convention;
    * per-chunk Σr and prefix sums stay exact decimals; μ, Z, R/S
    * evaluate as pinned double expressions rounded to 12; per-size
    * means sum those 12-decimal values as decimals; log₂(s) is the
    * EXACT integer exponent (no libm), and the one ln divides by the
    * pinned ln2 literal. OLS sums are exact (integer x, decimal y),
    * one boundary division rounded 6.
    *
    * Scale shape: sizes are a 4× in-row fan-out, chunks are keyed by
    * (symbol, size, chunk) — one sort serves the prefix and
    * full-chunk windows — then everything is chunk-count-sized.
    */
  def hurstExponent(bars: DataFrame,
                    sizes: Seq[Int] = Seq(8, 16, 32, 64)): DataFrame = {
    // the x-axis below is the EXACT integer log2 of each size; a
    // non-power-of-2 size would silently round to a wrong exponent
    // and skew the OLS slope
    require(sizes.nonEmpty && sizes.forall(s => s > 1 &&
      (s & (s - 1)) == 0), s"sizes must be powers of two > 1: $sizes")
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(28, 12)
    val wSym = Window.partitionBy(col("symbol")).orderBy(col("bar_start"))
    val rets = bars.select(col("symbol"), col("bar_start"), col("close"))
      .withColumn("prev", lag(col("close"), 1).over(wSym))
      .filter(col("prev").isNotNull && col("prev") > 0 &&
        col("close") > 0)
      .select(col("symbol"),
        row_number().over(wSym.orderBy(col("bar_start"))).as("rn"),
        r6(log(col("close") / col("prev")))
          .cast(DecimalType(18, 6)).as("r"))
    val sized = rets
      .withColumn("s", explode(array(sizes.map(lit): _*)))
      .withColumn("chunk", expr("(rn - 1) div s"))
    val part = Window.partitionBy(col("symbol"), col("s"), col("chunk"))
    val wChunk = part.orderBy(col("rn"))
    val withZ = sized
      .withColumn("cnt", count(lit(1)).over(part))
      .filter(col("cnt") === col("s"))
      .withColumn("cum", sum(col("r")).over(wChunk.rowsBetween(
        Window.unboundedPreceding, Window.currentRow)))
      .withColumn("k", row_number().over(wChunk))
      .withColumn("mu",
        r12(sum(col("r")).over(part).cast("double") / col("s")))
      .withColumn("z",
        r12(col("cum").cast("double") - col("k") * col("mu")))
    val chunks = withZ
      .groupBy(col("symbol"), col("s"), col("chunk"))
      .agg(max(col("z")).as("zmax"), min(col("z")).as("zmin"),
        sum(col("r")).as("sr"),
        sum((col("r") * col("r")).cast(DecimalType(38, 12))).as("sr2"))
      .withColumn("mu", r12(col("sr").cast("double") / col("s")))
      .withColumn("variance",
        col("sr2").cast("double") / col("s") - col("mu") * col("mu"))
      .filter(col("variance") > 0)
      .withColumn("rs",
        r12((greatest(col("zmax"), lit(0.0)) -
          least(col("zmin"), lit(0.0))) / sqrt(col("variance")))
          .cast(dec))
    val bySize = chunks.groupBy(col("symbol"), col("s"))
      .agg(count(lit(1)).as("nc"), sum(col("rs")).as("srs"))
      .withColumn("mean_rs",
        col("srs").cast("double") / col("nc").cast("double"))
      .filter(col("mean_rs") > 0)
      .withColumn("y", r12(log(col("mean_rs")) /
        lit(0.6931471805599453)).cast(dec))
      .withColumn("x", {
        // exact integer log2 per configured size — no libm in x
        val exps = sizes.map(sz =>
          sz -> (math.log(sz.toDouble) / math.log(2.0)).round)
        exps.tail.foldLeft(
          when(col("s") === exps.head._1, lit(exps.head._2))) {
          case (acc, (sz, e)) => acc.when(col("s") === sz, lit(e))
        }
      })
    val g = bySize.groupBy(col("symbol")).agg(
      count(lit(1)).as("n_sizes"),
      sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y")).as("sy"),
      // x ≤ 6: a (2,0) cast keeps the product inside 38 digits
      sum(col("x").cast(DecimalType(2, 0)) * col("y")).as("sxy"))
    val n = col("n_sizes").cast("double")
    def d(c: String) = col(c).cast("double")
    val den = n * d("sxx") - d("sx") * d("sx")
    g.filter(col("n_sizes") >= 2)
      .select(col("symbol"), col("n_sizes"),
        when(den > 0,
          r6((n * d("sxy") - d("sx") * d("sy")) / den)).as("hurst"))
      .orderBy(col("symbol"))
  }

  /** Kyle's lambda per symbol: the OLS slope of within-bar price
    * change on signed order flow (buy − sell volume) — the PRICE
    * IMPACT coefficient: how many dollars one unit of net aggression
    * moves the price. [[flowImbalance]] reports the pressure;
    * lambda prices it — the microstructure number behind execution
    * cost models and toxicity monitors. Flow sums are exact decimals,
    * the price change rounds to 6 then joins the co-moment machinery
    * of [[symbolBeta]] (products exact DECIMAL(38,12), one double
    * division at the boundary; λ is small, so it rounds at 9).
    *
    * One trades scan each for bars and flow (both on the same
    * (symbol, window) key), one equi-join, one per-symbol agg.
    */
  def kyleLambda(trades: DataFrame,
                 barWidth: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 6)
    val bars = Gold.bars(trades, barWidth)
      .select(col("symbol"), col("bar_start"),
        round(col("close") - col("open"), 6).cast(dec).as("dp"))
    def side(s: String) =
      sum(when(col("side") === s, col("size").cast(dec))
        .otherwise(lit(0).cast(dec)))
    val fl = trades
      .groupBy(col("symbol"), window(col("event_time"), barWidth).as("w"))
      .agg(side("buy").as("b"), side("sell").as("s"))
      .select(col("symbol"), col("w.start").as("bar_start"),
        (col("b") - col("s")).cast(dec).as("sv"))
    val g = bars.join(fl, Seq("symbol", "bar_start"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_bars"),
        sum(col("sv")).as("sx"), sum(col("dp")).as("sy"),
        sum((col("sv") * col("dp")).cast(DecimalType(38, 12))).as("sxy"),
        sum((col("sv") * col("sv")).cast(DecimalType(38, 12))).as("sxx"))
    val n = col("n_bars").cast("double")
    def d(c: String) = col(c).cast("double")
    val den = n * d("sxx") - d("sx") * d("sx")
    g.select(col("symbol"), col("n_bars"),
        when(den > 0,
          r9((n * d("sxy") - d("sx") * d("sy")) / den))
          .as("kyle_lambda"))
      .orderBy(col("symbol"))
  }

  /** Winsorized per-symbol price statistics: clip prices to the exact
    * [p01, p99] band before computing mean/stddev — the robust-moments
    * step an outlier-laden feed (fat-finger prints, bad ticks) needs
    * before its statistics are usable for feature scaling.
    *
    * Scale shape: the per-symbol clip bounds are a symbol-cardinality
    * aggregate — symbols are a constant-size universe (like the
    * reference's currency pairs), so the join back to the fact rows is
    * an explicit broadcast; the facts never shuffle for it. One fact
    * shuffle total (the final per-symbol aggregate).
    *
    * Determinism: bounds are rounded to 6 decimals before clipping;
    * clipped values are rounded to 6 and cast to DECIMAL(18,6), so the
    * sum and sum-of-squares accumulate EXACTLY (decimal × decimal is
    * exact; no order-dependent double partial sums). Mean/variance are
    * computed from those exact sums in one fixed-order double
    * expression at the output boundary.
    */
  def winsorizedStats(trades: DataFrame): DataFrame = {
    val bounds = trades.groupBy(col("symbol")).agg(
      round(expr("percentile(price, 0.01)"), 6).as("p01"),
      round(expr("percentile(price, 0.99)"), 6).as("p99"))
    val w = round(least(greatest(col("price"), col("p01")), col("p99")), 6)
      .cast("decimal(18,6)")
    val n = col("n").cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    trades.join(broadcast(bounds), Seq("symbol"))
      .groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n"),
        max(col("p01")).as("p01"),
        max(col("p99")).as("p99"),
        sum(w).as("s1"),
        sum(w * w).as("s2"),
        sum((col("price") < col("p01")).cast("long")).as("n_clipped_low"),
        sum((col("price") > col("p99")).cast("long")).as("n_clipped_high"))
      .select(col("symbol"), col("n"), col("p01"), col("p99"),
        r6(s1 / n).as("w_mean"),
        // n = 1 would divide by zero and emit NaN — a meaningless row
        // both engines happen to agree on; NULL is the honest value
        when(col("n") > 1,
          r6(sqrt((s2 - s1 * s1 / n) / (n - lit(1.0d)))))
          .as("w_stddev"),
        col("n_clipped_low"), col("n_clipped_high"))
      .orderBy(col("symbol"))
  }

  /** Robust outlier detection via median absolute deviation: per
    * symbol, median price and MAD (median of |price − median|), then
    * every print whose absolute deviation exceeds k·MAD — the
    * breakdown-point-0.5 alternative to z-scores (one fat-finger print
    * cannot move its own threshold, unlike mean/stddev gates). The
    * detection companion to [[winsorizedStats]]'s correction.
    *
    * Two symbol-cardinality aggregates broadcast back over the facts
    * (constant-size symbol universe); the fact table is scanned, never
    * shuffled. Deviations are rounded to 6 decimals before the MAD
    * percentile and before the final compare, so both engines branch on
    * identical operands.
    */
  def madOutliers(trades: DataFrame, k: Double = 8.0): DataFrame = {
    val med = trades.groupBy(col("symbol"))
      .agg(round(expr("percentile(price, 0.5)"), 6).as("med"))
    val mad = trades.join(broadcast(med), Seq("symbol"))
      .groupBy(col("symbol"))
      .agg(max(col("med")).as("med"),
        round(expr("percentile(round(abs(price - med), 6), 0.5)"), 6)
          .as("mad"))
    trades.join(broadcast(mad), Seq("symbol"))
      .filter(round(abs(col("price") - col("med")), 6) > lit(k) * col("mad"))
      .select(col("symbol"), col("event_id"), col("price"), col("med"),
        col("mad"))
      .orderBy(col("symbol"), col("event_id"))
  }

  /** Equi-width price histogram per symbol: `bins` buckets over the
    * symbol's [min, max] (rounded to 6 decimals), sparse output (empty
    * bins omitted) — the distribution-profiling pass behind data-quality
    * dashboards and histogram-based join/filter selectivity estimates.
    *
    * Bounds are one symbol-cardinality aggregate broadcast back; the
    * binning itself is a map-only floor-division (top bin clamps the
    * x = max edge; a zero-width symbol collapses to bin 0), and the
    * final aggregate carries only (symbol, bin) partials.
    */
  def priceHistogram(trades: DataFrame, bins: Int = 20): DataFrame = {
    val b = trades.groupBy(col("symbol")).agg(
      round(min(col("price")), 6).as("lo"),
      round(max(col("price")), 6).as("hi"))
    val width = (col("hi") - col("lo")) / lit(bins.toDouble)
    // clamp BOTH edges: round(min,6) can land just above the true min
    // (negative raw bin), and x = max divides to exactly `bins`
    val bin = when(col("hi") === col("lo"), lit(0))
      .otherwise(greatest(least(
        floor((col("price") - col("lo")) / width),
        lit((bins - 1).toDouble)), lit(0.0d)))
      .cast("int")
    trades.join(broadcast(b), Seq("symbol"))
      .select(col("symbol"), col("lo"), col("hi"), bin.as("bin"))
      .groupBy(col("symbol"), col("bin"))
      .agg(max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        count(lit(1)).as("n"))
      .select(col("symbol"), col("bin"),
        r6(col("lo") + col("bin") * (col("hi") - col("lo")) / lit(bins.toDouble)).as("bin_lo"),
        col("n"))
      .orderBy(col("symbol"), col("bin"))
  }

  /** Temporal activity profile: trade counts and volume by (event_type
    * surrogate) hour-of-day × day-of-week. Exercises the temporal
    * function family; group count is bounded (24×7) so the shuffle
    * carries only partial aggregates.
    */
  def timeProfile(trades: DataFrame): DataFrame =
    trades
      .groupBy(
        hour(col("event_time")).as("hour_of_day"),
        dayofweek(col("event_time")).as("day_of_week"))
      .agg(
        count(lit(1)).as("n_trades"),
        sum(col("size").cast(org.apache.spark.sql.types.DecimalType(20, 6)))
          .cast("double").as("volume"))
      .orderBy(col("hour_of_day"), col("day_of_week"))

  /** Driver-side row streaming for plotting/export (O4 — the reference
    * N5 `toLocalIterator` loop): rows arrive one partition at a time, so
    * driver memory stays O(partition), not O(result).
    */
  def streamToDriver(df: DataFrame): Iterator[org.apache.spark.sql.Row] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala
  }

  /** Time-weighted average price per (symbol, hour), beside the
    * volume-weighted one. Each trade's price holds from its own
    * timestamp until the next trade in the hour (or the hour end for
    * the last) — the standard piecewise-constant TWAP segmentation, so
    * thin illiquid prints don't dominate the way they can in a plain
    * mean, and bursts don't dominate the way they do in VWAP.
    *
    * Determinism: segment durations are exact µs longs; price×duration
    * products are rounded to 6 decimals and summed as DECIMAL (the
    * house vwap convention — double sums are merge-order-dependent,
    * decimal sums are associative), with doubles only at the final
    * division. Ties on event_time are ordered by event_id so `lead` is
    * total. One window pass + one hash agg, both on the (symbol, hour)
    * key — no extra shuffle beyond the grouping itself.
    */
  def twap(trades: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val hs = date_trunc("hour", col("event_time"))
    val w = Window.partitionBy(col("symbol"), col("hour_start"))
      .orderBy(col("event_time"), col("event_id"))
    trades
      .withColumn("hour_start", hs)
      .withColumn("seg_end",
        coalesce(lead(col("event_time"), 1).over(w),
          col("hour_start") + expr("INTERVAL 1 HOUR")))
      .withColumn("dt_us",
        unix_micros(col("seg_end")) - unix_micros(col("event_time")))
      .groupBy(col("symbol"), col("hour_start"))
      .agg(
        count(lit(1)).as("n_trades"),
        sum(r6(col("price") * col("dt_us").cast("double") / 1e6)
          .cast(DecimalType(28, 6))).as("pxdt"),
        sum(r6(col("dt_us").cast("double") / 1e6)
          .cast(DecimalType(18, 6))).as("dts"),
        sum(round(col("price") * col("size"), 6)
          .cast(DecimalType(28, 6))).as("pxv"),
        sum(col("size").cast(DecimalType(20, 6))).as("v"))
      .select(col("symbol"), col("hour_start"), col("n_trades"),
        r6(col("pxdt").cast("double") / col("dts").cast("double"))
          .as("twap"),
        r6(col("pxv").cast("double") / col("v").cast("double"))
          .as("vwap"))
      .orderBy(col("symbol"), col("hour_start"))
  }

  /** Return autocorrelation per symbol at lags 1..maxLag — the
    * memory-structure profile of a series (momentum at positive ACF,
    * mean-reversion at negative, microstructure noise at lag 1) that
    * the point/window monitors can't see. ACF here is the plain
    * Pearson correlation of the (rₜ, rₜ₊ₗ) pair stream, computed per
    * (symbol, lag) with the [[symbolCorrelation]] determinism recipe:
    * 6-decimal DECIMAL log returns, DECIMAL(38,12) product sums (exact,
    * associative), doubles only in the final correlation boundary.
    *
    * Scale shape: the lag explode fans each return into maxLag rows
    * and joins back on the composite (symbol, idx+lag) = (symbol, idx)
    * equi-key — shuffle is maxLag·|returns| rows, never a within-
    * symbol cross product; one hash agg per (symbol, lag) after that.
    */
  def acf(bars: DataFrame, maxLag: Int = 5): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col("symbol")).orderBy(col("bar_start"))
    val r = bars
      .select(col("symbol"), col("bar_start"), col("close"))
      .withColumn("prev", lag(col("close"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > 0 &&
        col("close") > 0)
      .select(col("symbol"),
        r6(log(col("close") / col("prev")))
          .cast(DecimalType(18, 6)).as("x"),
        row_number().over(w).as("idx"))
    val a = r.toDF("symbol", "x", "idx")
      .withColumn("l", explode(sequence(lit(1), lit(maxLag))))
      .withColumn("tidx", col("idx") + col("l")).as("a")
    val b = r.toDF("symbol", "y", "bidx").as("b")
    val pairs = a.join(b,
        col("a.symbol") === col("b.symbol") &&
          col("a.tidx") === col("b.bidx"))
      .select(col("a.symbol").as("symbol"), col("a.l").as("lag"),
        col("a.x").as("x"), col("b.y").as("y"))
    val g = pairs.groupBy(col("symbol"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum((col("x") * col("y")).cast(DecimalType(38, 12))).as("sxy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 12))).as("sxx"),
        sum((col("y") * col("y")).cast(DecimalType(38, 12))).as("syy"))
    val n = col("n_pairs").cast("double")
    def d(c: String) = col(c).cast("double")
    val denx = n * d("sxx") - d("sx") * d("sx")
    val deny = n * d("syy") - d("sy") * d("sy")
    g.select(col("symbol"), col("lag"), col("n_pairs"),
        when(denx > 0 && deny > 0,
          r6((n * d("sxy") - d("sx") * d("sy"))
            / (sqrt(denx) * sqrt(deny)))).as("acf"))
      .orderBy(col("symbol"), col("lag"))
  }

  /** Level-shift (changepoint) scan per symbol — the third monitor
    * beside distribution drift (`value_drift_psi`) and point outliers
    * (`bar_analytics` z-scores): a sliding two-window mean comparison
    * over hourly closes. At each bar, the trailing `w` bars' mean is
    * compared against the `w` bars before them; the shift statistic is
    * (mean_recent − mean_prev) / sqrt(var₂w · 2/w) — the two-sample z
    * under the pooled 2w-window variance. A genuine regime change
    * moves the recent mean for many consecutive bars (a single spike
    * cannot — it is diluted by w), which is exactly what the point
    * z-score can't see.
    *
    * Determinism: closes and their squares are 6-decimal-rounded and
    * summed as DECIMAL over ROWS frames (associative, engine-exact);
    * sqrt is IEEE-correctly-rounded, so the final round(…, 6) is
    * stable cross-engine. Only bars with both windows full emit.
    */
  def levelShift(bars: DataFrame, w: Int = 12,
      threshold: Double = 4.0): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(28, 6)
    val ts = unix_timestamp(col("bar_start"))
    def frame(lo: Int, hi: Int) = Window.partitionBy(col("symbol"))
      .orderBy(ts).rowsBetween(lo, hi)
    val recent = frame(-(w - 1), 0)
    val prev = frame(-(2 * w - 1), -w)
    val both = frame(-(2 * w - 1), 0)
    val c6 = round(col("close"), 6).cast(dec)
    val c2 = round(col("close") * col("close"), 6).cast(dec)
    bars
      .withColumn("n_r", count(lit(1)).over(recent))
      .withColumn("n_p", count(lit(1)).over(prev))
      .withColumn("s_r", sum(c6).over(recent))
      .withColumn("s_p", sum(c6).over(prev))
      .withColumn("s_all", sum(c6).over(both))
      .withColumn("s2_all", sum(c2).over(both))
      .where(col("n_r") === w && col("n_p") === w)
      .withColumn("mean_recent",
        r6(col("s_r").cast("double") / w))
      .withColumn("mean_prev",
        r6(col("s_p").cast("double") / w))
      .withColumn("var_all",
        col("s2_all").cast("double") / (2 * w) -
          (col("s_all").cast("double") / (2 * w)) *
          (col("s_all").cast("double") / (2 * w)))
      .withColumn("shift_z",
        when(col("var_all") > 0,
          r6((col("mean_recent") - col("mean_prev")) /
            sqrt(col("var_all") * (2.0 / w)))))
      .select(col("symbol"), col("bar_start"), col("mean_prev"),
        col("mean_recent"), col("shift_z"),
        (abs(coalesce(col("shift_z"), lit(0.0))) > threshold).as("shifted"))
      .orderBy(col("symbol"), col("bar_start"))
  }

  /** Per-symbol realized-volatility estimators from OHLC bars — the
    * four classical range-based estimators side by side (per-bar
    * variance terms, aggregated to a per-symbol per-bar vol):
    *
    *  - close-to-close: mean (ln C_t/C_{t-1})² — the naive baseline,
    *    needs the lag;
    *  - Parkinson (1980): mean (ln H/L)² / (4 ln 2) — range-based,
    *    ~5× more efficient than close-to-close;
    *  - Garman–Klass (1980): mean [½(ln H/L)² − (2 ln 2 − 1)(ln C/O)²];
    *  - Rogers–Satchell (1991): mean [ln(H/C)ln(H/O) + ln(L/C)ln(L/O)]
    *    — drift-free (the others assume zero drift).
    *
    * Determinism: each per-bar term is a row-local IEEE computation,
    * rounded to 6 decimals and cast to DECIMAL(18,6) BEFORE the
    * per-symbol sum (double sums are partial-order-dependent; exact
    * decimal sums are not), then one double division + sqrt at the
    * output boundary. GK and RS terms can be negative per bar; a
    * negative MEAN (possible in degenerate series) yields NULL vol
    * rather than a NaN sqrt.
    *
    * Scale shape: one window pass for the close lag (shares the
    * (symbol, bar_start) sort with every other per-symbol family),
    * then a single hash aggregation — map-linear in bars.
    */
  def volEstimators(bars: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 6)
    val w = Window.partitionBy(col("symbol")).orderBy(col("bar_start"))
    def t6(c: Column) = r6(c).cast(dec)
    val lnHL = log(col("high") / col("low"))
    val lnCO = log(col("close") / col("open"))
    val terms = bars
      .select(col("symbol"), col("bar_start"), col("open"), col("high"),
        col("low"), col("close"))
      .withColumn("prev_close", lag(col("close"), 1).over(w))
      .filter(col("open") > 0 && col("low") > 0)
      .select(col("symbol"),
        // ln·ln products, never pow(x,2): IEEE multiply is exactly
        // reproducible across engines; Math.pow need not equal x*x.
        t6(when(col("prev_close") > 0,
          log(col("close") / col("prev_close")) *
            log(col("close") / col("prev_close")))).as("cc"),
        t6(lnHL * lnHL).as("pk"),
        // 2·ln2−1 pinned as a decimal literal so the oracle SQL can
        // carry the bit-identical constant (ln(2.0) may differ by an
        // ulp between libm and Math.log).
        t6(lnHL * lnHL * 0.5 - lit(0.3862943611198906) * lnCO * lnCO)
          .as("gk"),
        t6(log(col("high") / col("close")) * log(col("high") / col("open")) +
          log(col("low") / col("close")) * log(col("low") / col("open")))
          .as("rs"))
    val g = terms.groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_bars"),
        count(col("cc")).as("n_cc"),
        sum(col("cc")).as("s_cc"), sum(col("pk")).as("s_pk"),
        sum(col("gk")).as("s_gk"), sum(col("rs")).as("s_rs"))
    def d(c: String) = col(c).cast("double")
    val n = col("n_bars").cast("double")
    def vol(mean: Column) =
      when(mean >= 0, r6(sqrt(mean)))
    g.select(col("symbol"), col("n_bars"),
        when(col("n_cc") > 0,
          r6(sqrt(d("s_cc") / col("n_cc").cast("double"))))
          .as("vol_cc"),
        vol(d("s_pk") / n / 2.772588722239781).as("vol_parkinson"),
        vol(d("s_gk") / n).as("vol_gk"),
        vol(d("s_rs") / n).as("vol_rs"))
      .orderBy(col("symbol"))
  }

  /** Volume-weighted MEDIAN price per symbol — the robust fair-price
    * beside [[twap]] and vwap: vwap moves with one whale print at a
    * bad price; the weighted median (smallest price where cumulative
    * size reaches half the total) does not. One price-ordered
    * cumulative window per symbol over EXACT decimal sizes, the
    * half-total test in decimal (2·cum ≥ total — no division), and an
    * aggregation picking the smallest qualifying price. Emits vwap
    * beside it; a wide vwap−median spread is itself a data-quality
    * signal (heavy prints far from consensus).
    *
    * Determinism: the qualifying set's minimum price is invariant to
    * intra-price row order (cumulative weight at a price's last row =
    * total weight at ≤ that price), sizes sum as DECIMAL(20,6), and
    * the vwap is the exact-decimal quotient at the boundary.
    */
  def weightedMedianPrice(trades: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(20, 6)
    val w = Window.partitionBy(col("symbol"))
      .orderBy(col("price"), col("event_time"))
    val cum = trades
      .select(col("symbol"), col("price"), col("event_time"),
        col("size").cast(dec).as("sz"))
      .withColumn("cum", sum(col("sz")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("sz")).over(
        Window.partitionBy(col("symbol"))))
      .withColumn("pv", (col("price") * col("sz"))
        .cast(DecimalType(28, 10)))
    cum.groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_trades"),
        max(col("tot")).cast("double").as("volume"),
        (sum(col("pv")).cast("double") /
          max(col("tot")).cast("double")).as("vwap"),
        min(when(col("cum") * 2 >= col("tot"), col("price")))
          .as("wmedian_price"))
      .orderBy(col("symbol"))
  }

  /** Donchian channel per symbol: rolling `w`-bar high/low extrema
    * (EXCLUDING the current bar — else a new extreme can never break
    * its own channel) and the breakout flags, completing the indicator
    * family beside Bollinger/RSI/EWMA ([[indicators]]). Extrema of
    * stored doubles are exact (no arithmetic, no rounding needed);
    * only full windows emit. Shares the one (symbol, bar_start) sort
    * every per-symbol family rides.
    */
  def donchian(bars: DataFrame, w: Int = 20): DataFrame = {
    val win = Window.partitionBy(col("symbol")).orderBy(col("bar_start"))
      .rowsBetween(-w, -1)
    bars.select(col("symbol"), col("bar_start"), col("high"), col("low"),
        col("close"))
      .withColumn("n_win", count(lit(1)).over(win))
      .withColumn("ch_high", max(col("high")).over(win))
      .withColumn("ch_low", min(col("low")).over(win))
      .where(col("n_win") === w)
      .select(col("symbol"), col("bar_start"), col("close"),
        col("ch_high"), col("ch_low"),
        (col("close") > col("ch_high")).as("breakout_up"),
        (col("close") < col("ch_low")).as("breakout_down"))
      .orderBy(col("symbol"), col("bar_start"))
  }

  /** Rolling-median despike filter per symbol: the EXACT median of the
    * trailing `w` closes (sorted small-array pick, average of the two
    * middles on even counts — deterministic double arithmetic, no
    * interpolation ambiguity) plus a flag for bars whose close strays
    * more than `threshold` from it. The median is the robust
    * counterpart of [[withRollingStats]]'s mean/σ z-scores: one bad
    * print CANNOT drag the reference level with it, which is exactly
    * what makes median filtering the standard tick-cleaning pass
    * (z-scores self-mask: the spike inflates σ).
    *
    * Scale: one window over the shared (symbol, bar_start) sort; the
    * per-row state is a `w`-element array (w is a small constant —
    * this is a FILTER kernel, not an aggregation over unbounded
    * frames), so the pass stays map-linear after the one exchange.
    */
  /** Sequential CUSUM drift monitor per symbol (Page 1954): the
    * two-sided cumulative-sum control chart over log returns — the
    * SEQUENTIAL detector beside the windowed [[levelShift]] scan:
    * CUSUM accumulates every small same-direction deviation from the
    * first post-change bar, so it catches slow drifts a two-window
    * mean comparison dilutes, and it fires as early as the evidence
    * allows instead of waiting for a window to fill.
    *
    * The textbook recursion S⁺_t = max(0, S⁺_{t-1} + r_t − k) is not a
    * window aggregate, but its closed form is: with P_t = Σ_{i≤t}
    * (r_i − k), S⁺_t = P_t − min(0, min_{j≤t} P_j) — a cumulative sum
    * and a running min, BOTH plain prefix windows over the shared
    * (symbol, bar_start) sort (the mirrored pair gives S⁻). Allowance
    * k = 0.5σ and threshold h = 4σ per symbol, σ from one exact-
    * decimal pre-pass joined back as a broadcast.
    *
    * Determinism: returns are 6-decimal decimals, so P, the prefix
    * extrema, and both CUSUM statistics are EXACT decimal arithmetic
    * end-to-end — no rounding anywhere past the returns; only the
    * h-comparison casts to double at the boundary.
    */
  def cusum(bars: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col("symbol")).orderBy(col("bar_start"))
    val r = bars
      .select(col("symbol"), col("bar_start"), col("close"))
      .withColumn("prev", lag(col("close"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > 0 &&
        col("close") > 0)
      .select(col("symbol"), col("bar_start"),
        r6(log(col("close") / col("prev")))
          .cast(DecimalType(18, 6)).as("ret"))
    val stats = r.groupBy(col("symbol"))
      .agg(count(lit(1)).as("n"), sum(col("ret")).as("s"),
        sum((col("ret") * col("ret")).cast(DecimalType(38, 12))).as("s2"))
      .select(col("symbol"),
        r6(sqrt(col("s2").cast("double") / col("n").cast("double") -
          (col("s").cast("double") / col("n").cast("double")) *
          (col("s").cast("double") / col("n").cast("double"))))
          .cast(DecimalType(18, 6)).as("sigma6"))
      // k = σ/2 as EXACT decimal×decimal (scale 7): rounding σ·0.5 to
      // 6 decimals would land exactly on the half-micro boundary
      // whenever σ's last digit is odd — the one case engine round()s
      // systematically disagree on (observed live on this query)
      .select(col("symbol"),
        (col("sigma6") * lit(BigDecimal("0.5")).cast(DecimalType(2, 1)))
          .as("k"),
        (col("sigma6") * 4).cast("double").as("h"))
    val prefix = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the j=0 empty-prefix term of the closed form, as a TYPED decimal
    // zero: an int literal would push DuckDB's least/greatest to
    // DOUBLE, and a precision-38 zero would push Spark's subtraction
    // past 38 digits, where the precision-loss rule silently trims the
    // scale to 6 (both observed live) — (20,7) keeps every op exact
    val zero = lit(0).cast(DecimalType(20, 7))
    r.join(broadcast(stats), Seq("symbol"))
      .withColumn("p_pos", sum(col("ret") - col("k")).over(prefix))
      .withColumn("p_neg", sum(col("ret") + col("k")).over(prefix))
      .withColumn("cusum_pos",
        (col("p_pos") - least(min(col("p_pos")).over(prefix), zero))
          .cast("double"))
      .withColumn("cusum_neg",
        (greatest(max(col("p_neg")).over(prefix), zero) - col("p_neg"))
          .cast("double"))
      .select(col("symbol"), col("bar_start"), col("cusum_pos"),
        col("cusum_neg"), col("h"),
        (col("cusum_pos") > col("h") || col("cusum_neg") > col("h"))
          .as("alarmed"))
      .orderBy(col("symbol"), col("bar_start"))
  }

  def medianDespike(bars: DataFrame, w: Int = 5,
                    threshold: Double = 0.05): DataFrame = {
    val win = Window.partitionBy(col("symbol")).orderBy(col("bar_start"))
      .rowsBetween(-(w - 1), 0)
    val arr = col("arr")
    val n = col("n")
    bars.select(col("symbol"), col("bar_start"), col("close"))
      .withColumn("arr", sort_array(collect_list(col("close")).over(win)))
      .withColumn("n", size(arr))
      .select(col("symbol"), col("bar_start"), col("close"),
        when(n % 2 === 1, element_at(arr, ((n + 1) / 2).cast("int")))
          .otherwise((element_at(arr, (n / 2).cast("int")) +
            element_at(arr, (n / 2).cast("int") + 1)) / lit(2.0))
          .as("median_close"),
        n.as("n_in_window"))
      // a window of nonpositive closes (a literal 0.0 print exists in
      // the corpus) must read NULL, not an Infinity/NaN comparison
      .withColumn("spiked",
        when(col("median_close") > 0,
          abs(col("close") - col("median_close")) / col("median_close")
            > threshold))
      .orderBy(col("symbol"), col("bar_start"))
  }

  /** Theil–Sen robust trend per symbol: the MEDIAN of pairwise
    * close-to-close slopes over bar pairs within `maxLagHours` — the
    * slope estimator with a 29% breakdown point, where OLS
    * ([[symbolBeta]]'s machinery) is dragged arbitrarily far by one
    * bad print. The lag band bounds pair fan-out to ≤ L per bar (the
    * dedup cap discipline applied to regression — never all-pairs),
    * and preferring nearby pairs is itself the robust choice for
    * drifting series.
    *
    * Determinism: slopes round to 12 decimals BEFORE sorting (libm
    * ulps cannot reorder the array), the median is the exact
    * sorted-array pick with the two-middle /2 average on even counts
    * ([[medianDespike]]'s proven mechanics), rounded to 6 at the
    * boundary.
    *
    * Scale shape: the band is a banded EQUI-join — each bar explodes
    * its ≤ L lag offsets and joins on (symbol, exact target µs), the
    * same decomposition as the interval join — so no symbol-wide
    * cross product ever materializes. One per-symbol agg follows; the
    * slope array is T·L-sized, bounded by the retention window (slice
    * by (symbol, period) + median-of-medians when T is unbounded).
    */
  def theilSenTrend(bars: DataFrame, maxLagHours: Int = 24): DataFrame = {
    val left = bars.select(col("symbol"),
        unix_micros(col("bar_start")).as("u1"), col("close").as("c1"))
      .withColumn("lag_h",
        explode(sequence(lit(1L), lit(maxLagHours.toLong))))
      .withColumn("u2", col("u1") + col("lag_h") * lit(3600000000L))
    val right = bars.select(col("symbol"),
      unix_micros(col("bar_start")).as("u2"), col("close").as("c2"))
    val pairs = left.join(right, Seq("symbol", "u2"))
      .select(col("symbol"),
        r12((col("c2") - col("c1")) / col("lag_h").cast("double"))
          .as("slope"))
    val arr = col("ss"); val n = col("n_pairs")
    pairs.groupBy(col("symbol"))
      .agg(sort_array(collect_list(col("slope"))).as("ss"),
        count(lit(1)).as("n_pairs"))
      .select(col("symbol"), col("n_pairs"),
        r6(when(n % 2 === 1,
            element_at(arr, ((n + 1) / 2).cast("int")))
          .otherwise((element_at(arr, (n / 2).cast("int")) +
            element_at(arr, (n / 2).cast("int") + 1)) / lit(2.0)))
          .as("ts_slope"))
      .orderBy(col("symbol"))
  }


  /** Amihud (2002) illiquidity: the mean over days of
    * |daily log return| per dollar of daily volume — the standard
    * price-impact-per-dollar proxy, the cross-sectional liquidity
    * ranking [[kyleLambda]]'s regression form estimates per trade.
    *
    * Determinism: |lr6| is the one pinned ln per (symbol, day)
    * (momentum_backtest's convention, nonpositive prints excluded);
    * dollar volume is an exact micro-unit integer sum (per-trade
    * price·size is one IEEE product pinned at round(v·1e6, 0));
    * the per-day ratio is pinned at 1e6 units from one forced IEEE
    * division chain (a 1e12 pin overflows a long on penny-volume
    * days: |lr6|/0.01·1e12 ≈ 1e20); the mean is a truncating
    * integer division emitted as a micro double — no DECIMAL
    * output columns.
    */
  def amihudIlliq(trades: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val byDay = Window.partitionBy(col("symbol"), col("event_date"))
      .orderBy(col("event_time").desc, col("event_id").desc)
    val bySym = Window.partitionBy(col("symbol")).orderBy(col("d"))
    val daily = trades.filter(col("price") > 0)
      .withColumn("rn", row_number().over(byDay))
      .groupBy(col("symbol"), col("event_date").as("d"))
      .agg(max(when(col("rn") === 1, col("price"))).as("close"),
        sum(round(col("price") * col("size") * lit(1000000.0), 0)
          .cast("long").cast(DecimalType(38, 0))).as("dv6"))
    val lr = daily
      .withColumn("prev", lag(col("close"), 1).over(bySym))
      .filter(col("prev").isNotNull && col("dv6") > 0)
      .select(col("symbol"),
        abs(round(log(col("close") / col("prev")) * lit(1e6), 0)
          .cast("long")).as("alr6"),
        col("dv6"))
      .select(col("symbol"),
        round(col("alr6").cast("double") /
          (col("dv6").cast("double") / lit(1000000.0))
          * lit(1e6), 0).cast("long").as("ratio6"))
    lr.groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_days"),
        // decimal accumulator: tiny dollar volumes push per-day
        // ratios near 1e17 — a long sum could overflow
        sum(col("ratio6").cast(DecimalType(38, 0))).as("rs"))
      .select(col("symbol"), col("n_days"),
        (expr("rs div n_days").cast("double") / lit(1000000.0))
          .as("illiq"))
      .orderBy(col("symbol"))
  }

  /** Wald–Wolfowitz runs test for trade-sign randomness per symbol:
    * too FEW runs = momentum herding (signs cluster), too MANY =
    * mean-reverting flow (signs alternate); |z| < 1.96 is consistent
    * with random order flow. R, n₊, n₋ are exact integers over the
    * (event_time, event_id) total order; E[R] and Var[R] are the
    * textbook formulas evaluated in doubles with the identical
    * expression shape both engines, and z is pinned once at
    * micro-units.
    */
  def runsTest(trades: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val bySym = Window.partitionBy(col("symbol"))
      .orderBy(col("event_time"), col("event_id"))
    val g = trades
      .select(col("symbol"),
        when(col("side") === "buy", 1).otherwise(-1).as("sgn"),
        col("event_time"), col("event_id"))
      .withColumn("chg",
        when(lag(col("sgn"), 1).over(bySym).isNull ||
          lag(col("sgn"), 1).over(bySym) =!= col("sgn"), 1L)
          .otherwise(0L))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n_buy"),
        sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n_sell"),
        sum(col("chg")).as("runs"))
    g.withColumn("z6",
        // 2·n₊·n₋ > n keeps Var[R] strictly positive (exact integers)
        when(col("n_buy") > 0 && col("n_sell") > 0 && col("n") > 1 &&
            lit(2L) * col("n_buy") * col("n_sell") > col("n"),
          round((col("runs").cast("double") -
            (lit(2.0) * col("n_buy").cast("double") *
              col("n_sell").cast("double") / col("n").cast("double")
              + lit(1.0))) /
            sqrt(lit(2.0) * col("n_buy").cast("double") *
              col("n_sell").cast("double") *
              (lit(2.0) * col("n_buy").cast("double") *
                col("n_sell").cast("double") -
                col("n").cast("double")) /
              (col("n").cast("double") * col("n").cast("double") *
                (col("n").cast("double") - lit(1.0)))) *
            lit(1e6), 0).cast("long")))
      .select(col("symbol"), col("n"), col("n_buy"), col("n_sell"),
        col("runs"),
        (col("z6").cast("double") / lit(1000000.0)).as("z"),
        (col("z6").isNotNull && abs(col("z6")) <= 1960000L)
          .as("consistent_with_random"))
      .orderBy(col("symbol"))
  }


  /** Daily market concentration: the Herfindahl–Hirschman index of
    * dollar volume across symbols, per day — the "is flow
    * concentrating into a few pairs?" regime monitor (HHI → 1 means
    * one symbol takes the tape; → 1/n means even flow).
    *
    * Shares are pinned once per (day, symbol) as ppm integers over
    * exact micro-unit integer dollar-volume sums (the amihudIlliq
    * convention: per-trade price·size is one IEEE product pinned at
    * round(v·1e6, 0) — a wide-decimal→double cast is oracle-version
    * territory); HHI and top share are then pure integer arithmetic
    * emitted as micro doubles.
    */
  def volumeHhi(trades: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val byDay = Window.partitionBy(col("d"))
    def micro(c: Column) = c.cast("double") / lit(1000000.0)
    trades.filter(col("price") > 0)
      .groupBy(col("event_date").as("d"), col("symbol"))
      .agg(sum(round(col("price") * col("size") * lit(1000000.0), 0)
        .cast("long").cast(DecimalType(38, 0))).as("dv6"))
      .withColumn("tot6", sum(col("dv6")).over(byDay))
      .select(col("d"),
        round(col("dv6").cast("double") / col("tot6").cast("double")
          * lit(1e6), 0).cast("long").as("s6"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_symbols"),
        sum(col("s6") * col("s6")).as("ss"),
        max(col("s6")).as("mx"))
      .select(col("d"), col("n_symbols"),
        micro(expr("ss div 1000000")).as("hhi"),
        micro(col("mx")).as("top_share"))
      .orderBy(col("d"))
  }
}
