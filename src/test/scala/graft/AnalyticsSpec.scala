package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions.{col, lag, log, round, stddev_samp}

import graft.Schemas.Bar
import graft.operators.Analytics

/** Window-analytics semantics (reference notebooks/analysis.ipynb N3-N5). */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def bar(sym: String, minute: Int, close: Double,
                  volume: Double = 1.0, open: Double = 0.0): Bar = {
    val start = ts(f"2024-01-01 10:$minute%02d:00")
    Bar(sym, start, new Timestamp(start.getTime + 60000),
      if (open == 0.0) close else open, close, close, close,
      volume, close, 1L, Date.valueOf("2024-01-01"))
  }

  test("prev_close/ret via lag; first bar has null ret") {
    val rows = Analytics.withReturns(Analytics.withTsSeconds(
      Seq(bar("B", 0, 100.0), bar("B", 1, 110.0)).toDS.toDF))
      .orderBy("bar_start").collect()
    assert(rows(0).getAs[Any]("prev_close") == null)
    assert(rows(0).getAs[Any]("ret") == null) // when-without-otherwise => null
    assert(rows(1).getAs[Double]("prev_close") == 100.0)
    assert(math.abs(rows(1).getAs[Double]("ret") - 0.1) < 1e-12)
  }

  test("rolling RANGE window EXCLUDES the current row") {
    // 3 bars; for the 3rd, mu over window = avg(logret_1, logret_2) must
    // not include its own logret. With closes 100,110,121 logret_2 and
    // logret_3 are both ln(1.1); if the current row leaked in, sd would
    // still be ~0 BUT mu at row 2 would change from null-skipped single
    // value. Check counts via ret_mu at bar 1: only bar 0's logret (null)
    // => ret_mu null.
    val rows = Analytics.withRollingStats(Analytics.withReturns(
      Analytics.withTsSeconds(
        Seq(bar("B", 0, 100.0), bar("B", 1, 110.0), bar("B", 2, 121.0))
          .toDS.toDF)))
      .orderBy("bar_start").collect()
    // bar 0: frame is empty => mu null
    assert(rows(0).getAs[Any]("ret_mu") == null)
    // bar 1: frame = {bar0.logret = null} => avg skips nulls => null
    assert(rows(1).getAs[Any]("ret_mu") == null)
    // bar 2: frame = {bar0: null, bar1: ln(1.1)} => mu = round(ln(1.1),6)
    assert(rows(2).getAs[Double]("ret_mu") ==
      BigDecimal(math.log(1.1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // sd over a single value (n-1 denominator) => null; z guarded => null
    assert(rows(2).getAs[Any]("ret_sd") == null)
    assert(rows(2).getAs[Any]("z_ret") == null)
  }

  test("volume anomaly is one-sided, return anomaly two-sided") {
    // construct z-scores directly through enrich on a crafted series: 40
    // gently-oscillating bars (sd must exceed the 1e-12 guard or z is
    // null) then a crash => z_ret large negative, z_vol large positive
    val flat = (0 to 39).map(i =>
      bar("B", i, if (i % 2 == 0) 100.0 else 101.0,
        volume = if (i % 2 == 0) 1.0 else 1.1))
    val crash = bar("B", 40, 50.0, volume = 100.0)
    val rows = Analytics.enrich(
      (flat :+ crash).toDS.toDF).orderBy("bar_start").collect()
    val last = rows.last
    assert(last.getAs[Double]("z_ret") < -3.0)
    assert(last.getAs[Boolean]("is_return_anom"))
    assert(last.getAs[Double]("z_vol") > 3.0)
    assert(last.getAs[Boolean]("is_volume_anom"))
    // a negative-volume-z bar can never be a volume anomaly (one-sided):
    assert(rows.forall(r => r.getAs[Any]("z_vol") == null ||
      r.getAs[Double]("z_vol") > 3.0 == r.getAs[Boolean]("is_volume_anom")))
  }

  test("enrich and enrichViaJoins agree") {
    val bars = (0 to 35).map(i => bar("B", i, 100.0 + i)) ++
      (0 to 35).map(i => bar("E", i, 50.0 + 2 * i))
    val a = Analytics.enrich(bars.toDS.toDF)
      .select("symbol", "bar_start", "ret", "logret", "z_ret", "z_vol",
        "next_open", "gap_pct", "is_return_anom", "is_volume_anom")
      .orderBy("symbol", "bar_start").collect().toSeq
    val b = Analytics.enrichViaJoins(bars.toDS.toDF)
      .select("symbol", "bar_start", "ret", "logret", "z_ret", "z_vol",
        "next_open", "gap_pct", "is_return_anom", "is_volume_anom")
      .orderBy("symbol", "bar_start").collect().toSeq
    assert(a == b)
  }

  test("winsorizedStats clips to the exact [p01,p99] band, decimal-exact mean") {
    // 1..99 plus one fat-finger print at 1e6
    val trades = ((1 to 99).map(i => ("A", i.toDouble)) :+ (("A", 1000000.0)))
      .toDF("symbol", "price")
    val r = Analytics.winsorizedStats(trades).collect().head
    assert(r.getAs[Long]("n") == 100)
    // sorted v[0..99]: p01 = 1 + 0.99·(2−1) = 1.99,
    // p99 = 99 + 0.01·(1e6−99) = 10098.01
    assert(r.getAs[Double]("p01") == 1.99)
    assert(r.getAs[Double]("p99") == 10098.01)
    assert(r.getAs[Long]("n_clipped_low") == 1)
    assert(r.getAs[Long]("n_clipped_high") == 1)
    // exact decimal sum: 1.99 + (2+…+99) + 10098.01 = 15049.0
    assert(r.getAs[Double]("w_mean") == 150.49)
    // clipping kills the outlier's variance contribution
    val rawStd = trades.agg(stddev_samp(col("price"))).collect().head.getDouble(0)
    assert(r.getAs[Double]("w_stddev") < rawStd / 50)
  }

  test("madOutliers flags only deviations beyond k·MAD") {
    // 1..101 (median 51, MAD 25) plus one print at 1000:
    // |1000−51| = 949 > 8·25 = 200 → exactly one outlier
    val trades = ((1 to 101).map(i => (i.toLong, "A", i.toDouble))
      :+ ((102L, "A", 1000.0)))
      .toDF("event_id", "symbol", "price")
    val r = Analytics.madOutliers(trades).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("event_id") == 102L)
    assert(r.head.getAs[Double]("med") == 51.5) // 102 rows: (51+52)/2
    // deviations |x−51.5|: 0.5,0.5,1.5,…,50.5,948.5 → median 25.5
    assert(r.head.getAs[Double]("mad") == 25.5)
  }

  test("priceHistogram: equi-width bins, max edge clamps into the top bin") {
    // prices 0..20, one symbol → lo=0, hi=20, width=1
    val trades = (0 to 20).map(i => ("A", i.toDouble)).toDF("symbol", "price")
    val r = Analytics.priceHistogram(trades).collect()
    assert(r.map(_.getAs[Int]("bin")).toSeq == (0 to 19))
    // bin 19 holds price 19 AND the max edge 20
    assert(r.map(_.getAs[Long]("n")).toSeq == (Seq.fill(19)(1L) :+ 2L))
    assert(r.head.getAs[Double]("bin_lo") == 0.0)
    assert(r.last.getAs[Double]("bin_lo") == 19.0)
  }

  test("symbolCorrelation: bounded, symmetric universe, agrees with Spark's corr to 1e-6") {
    val dir = "/root/testdata/sf0.01"
    val bars = graft.operators.Gold.bars(
      graft.operators.Trades.fromEvents(Tables.events(spark, dir)), "1 hour")
    val syms = (1 to 8).map(i => s"SYM_$i")
    val rows = Analytics.symbolCorrelation(bars, syms).collect()
    assert(rows.length == 28) // full 8-choose-2 matrix
    rows.filterNot(_.isNullAt(3)).foreach { r =>
      val c = r.getDouble(3)
      assert(c >= -1.0 && c <= 1.0, s"corr out of range: $r")
    }
    // spot-check the exact-decimal formula against Spark's built-in
    // merge-based corr (which is only stable to ~1e-12 across runs)
    val r0 = rows.filterNot(_.isNullAt(3)).head
    val (s1, s2) = (r0.getString(0), r0.getString(1))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("symbol")).orderBy(col("bar_start"))
    val rets = bars.filter(col("symbol").isin(s1, s2))
      .withColumn("prev", lag(col("close"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > 0)
      .select(col("symbol"), col("bar_start"),
        round(log(col("close") / col("prev")), 6).as("ret"))
    val joined = rets.filter(col("symbol") === s1).select(col("bar_start"), col("ret").as("x"))
      .join(rets.filter(col("symbol") === s2).select(col("bar_start"), col("ret").as("y")),
        Seq("bar_start"))
    val builtin = joined.stat.corr("x", "y")
    assert(math.abs(builtin - r0.getDouble(3)) < 1e-6,
      s"formula drift: builtin=$builtin exact=${r0.getDouble(3)}")
  }

  test("maxDrawdown: hand-computed peak-to-trough; monotone series has zero drawdown") {
    val up = (0 to 5).map(i => bar("UP", i, 100.0 + i))
    // DOWN: 100 → 120 (peak) → 90 (trough, -25%) → 110 (recovery)
    val dn = Seq(bar("DN", 0, 100.0), bar("DN", 1, 120.0),
      bar("DN", 2, 90.0), bar("DN", 3, 110.0))
    val rows = Analytics.maxDrawdown((up ++ dn).toDS.toDF)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows("UP") == 0.0)
    assert(rows("DN") == -0.25)
  }

  test("flowImbalance: all-buy bar is +1, balanced bar is 0") {
    import graft.Schemas.Trade
    def t(sym: String, side: String, size: Double) =
      Trade("kraken", sym, 10.0, size, side, "limit", ts("2024-01-01 10:00:01"))
    val rows = Analytics.flowImbalance(Seq(
        t("A", "buy", 2.0), t("A", "buy", 1.0),
        t("B", "buy", 3.0), t("B", "sell", 3.0)).toDS.toDF)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows("A") == ((3.0, 0.0, 1.0)))
    assert(rows("B") == ((3.0, 3.0, 0.0)))
  }

  test("lastK returns the most recent K in ascending order") {
    val bars = (0 to 30).map(i => bar("B", i, 100.0 + i))
    val rows = Analytics.lastK(bars.toDS.toDF, 5).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Timestamp]("bar_start").getTime).toSeq ==
      rows.map(_.getAs[Timestamp]("bar_start").getTime).toSeq.sorted)
    assert(rows.last.getAs[Timestamp]("bar_start") == ts("2024-01-01 10:30:00"))
  }

  test("acf: alternating returns give -1/+1 at lags 1/2; zero-variance guard nulls") {
    // closes 100,110,100,110,... -> log returns alternate +/-ln(1.1):
    // perfectly anti-correlated at lag 1, perfectly correlated at lag 2
    val alt = (0 until 12).map(i => bar("A", i, if (i % 2 == 0) 100.0 else 110.0))
    // constant-growth closes -> constant return -> zero variance -> null
    val trend = (0 until 12).map(i => bar("T", i, 100.0 * math.pow(1.01, i)))
    val rows = Analytics.acf((alt ++ trend).toDS.toDF, maxLag = 3).collect()
    val m = rows.map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    assert(m(("A", 1)).getDouble(3) == -1.0)
    assert(m(("A", 2)).getDouble(3) == 1.0)
    assert(m(("A", 3)).getDouble(3) == -1.0)
    // 12 bars -> 11 returns -> 11 - lag pairs
    assert(m(("A", 1)).getLong(2) == 10L && m(("A", 3)).getLong(2) == 8L)
    (1 to 3).foreach(l => assert(m(("T", l)).isNullAt(3)))
  }

  test("levelShift: sustained step trips, lone spike is diluted, flat var is null z") {
    def series(sym: String, cs: Seq[Double]) =
      cs.zipWithIndex.map { case (c, i) => bar(sym, i, c) }
    val step = series("S",
      Seq(100.0, 101.0, 100.0, 101.0, 100.0, 101.0, 200.0, 201.0, 200.0, 201.0))
    val spike = series("P",
      Seq(100.0, 100.0, 100.0, 100.0, 100.0, 200.0, 100.0, 100.0, 100.0, 100.0))
    val flat = series("F", Seq.fill(8)(50.0))
    val rows = Analytics.levelShift((step ++ spike ++ flat).toDS.toDF,
      w = 3, threshold = 2.0).collect()
    val bySym = rows.groupBy(_.getString(0))
    // rows emit only once BOTH w-windows are full: 10 bars -> 5, 8 -> 3
    assert(bySym("S").length == 5 && bySym("P").length == 5 &&
      bySym("F").length == 3)
    // a pure step's max z is sqrt(2w) ~ 2.449 (the pooled variance
    // contains the step itself) -- exactly one bar has recent fully on
    // the new level AND prev fully on the old, and only it trips 2.0
    val tripped = bySym("S").filter(_.getBoolean(5))
    assert(tripped.length == 1 && tripped.head.getDouble(4) > 2.0)
    // a lone spike never fills a window: max |z| ~ 1.1 -> never shifted
    assert(bySym("P").forall(!_.getBoolean(5)))
    // flat closes: pooled variance 0 -> guarded null z, not shifted
    assert(bySym("F").forall(r => r.isNullAt(4) && !r.getBoolean(5)))
  }

  test("volEstimators: hand-computed Parkinson/GK/RS/cc terms; " +
      "negative-mean guard nulls instead of NaN") {
    def ohlc(sym: String, minute: Int, o: Double, h: Double, l: Double,
             c: Double): Bar = {
      val start = ts(f"2024-01-01 10:$minute%02d:00")
      Bar(sym, start, new Timestamp(start.getTime + 60000),
        o, h, l, c, 1.0, c, 1L, Date.valueOf("2024-01-01"))
    }
    def r6(x: Double) = math.rint(x * 1e6) / 1e6 // HALF_EVEN ~ test vals safe
    val bars = Seq(
      ohlc("V", 0, 100.0, 110.0, 90.0, 105.0),
      ohlc("V", 1, 105.0, 120.0, 100.0, 110.0),
      // H=L collapses the range terms; C!=O makes the GK mean negative
      ohlc("G", 0, 100.0, 110.0, 110.0, 110.0)).toDS.toDF
    val out = Analytics.volEstimators(bars).collect()
      .map(r => r.getString(0) -> r).toMap
    val v = out("V")
    assert(v.getAs[Long]("n_bars") == 2L)
    // close-to-close: only bar 1 has a prev -> n_cc = 1
    val cc = { val x = math.log(110.0 / 105.0); r6(x * x) }
    assert(math.abs(v.getAs[Double]("vol_cc") -
      math.rint(math.sqrt(cc) * 1e6) / 1e6) < 1e-9)
    val pks = Seq((110.0, 90.0), (120.0, 100.0)).map { case (h, l) =>
      val x = math.log(h / l); r6(x * x) }
    val expPk = math.sqrt(pks.sum / 2 / 2.772588722239781)
    assert(math.abs(v.getAs[Double]("vol_parkinson") - expPk) < 1e-6)
    val rss = Seq((100.0, 110.0, 90.0, 105.0), (105.0, 120.0, 100.0, 110.0))
      .map { case (o, h, l, c) =>
        r6(math.log(h / c) * math.log(h / o) +
          math.log(l / c) * math.log(l / o)) }
    assert(math.abs(v.getAs[Double]("vol_rs") -
      math.sqrt(rss.sum / 2)) < 1e-6)
    assert(v.getAs[Double]("vol_gk") > 0)
    val g = out("G")
    // zero range, positive ln(C/O): GK mean < 0 -> guarded null
    assert(g.isNullAt(g.fieldIndex("vol_gk")))
    assert(g.getAs[Double]("vol_parkinson") == 0.0)
    // single bar, no prev close -> vol_cc null
    assert(g.isNullAt(g.fieldIndex("vol_cc")))
  }

  test("weightedMedianPrice: whale print moves vwap but not the " +
      "weighted median; half-total boundary picks the lower price") {
    import graft.Schemas.Trade
    def tr(p: Double, sz: Double, sec: Int) =
      Trade("x", "W", p, sz, "buy", "market",
        new Timestamp(ts("2024-01-01 10:00:00").getTime + sec * 1000L))
    // sizes 1@100, 1@101, 1@102 -> median 101; add a whale 0.5@1000:
    // total 3.5, half 1.75; cum at 100=1, at 101=2 >= 1.75 -> median
    // stays 101 while vwap jumps toward 1000
    val trades = Seq(tr(100.0, 1.0, 0), tr(101.0, 1.0, 1),
      tr(102.0, 1.0, 2), tr(1000.0, 0.5, 3)).toDS.toDF
    val r = Analytics.weightedMedianPrice(trades).collect().head
    assert(r.getAs[Double]("wmedian_price") == 101.0)
    assert(r.getAs[Double]("vwap") > 180.0) // dragged by the whale
    assert(r.getAs[Double]("volume") == 3.5)
    // exact half boundary: weights 1@10, 1@20 -> cum(10)*2 == tot ->
    // the LOWER price qualifies
    val even = Seq(tr(10.0, 1.0, 0), tr(20.0, 1.0, 1)).toDS.toDF
    assert(Analytics.weightedMedianPrice(even).collect().head
      .getAs[Double]("wmedian_price") == 10.0)
  }

  test("volSignature: a pure bid-ask bounce inflates fine-scale RV " +
      "and vanishes entirely at the scale that straddles it") {
    import graft.Schemas.Trade
    // one trade per minute, price bouncing 100/101 with period 2:
    // 1-minute RV is all bounce; 2-minute closes are constant 101
    val trades = (0 until 60).map { m =>
      Trade("x", "V", 100.0 + (m % 2), 1.0, "buy", "market",
        new java.sql.Timestamp(
          ts("2024-01-01 10:00:00").getTime + m * 60000L))
    }.toDS.toDF
    val r = Analytics.volSignature(trades, scales = Seq(1, 2)).collect()
    val byScale = r.map(x => x.getAs[Int]("scale_minutes") -> x).toMap
    assert(byScale(1).getAs[Double]("rv") > 0)
    assert(byScale(2).getAs[Double]("rv") == 0.0)
    // base scale (max = 2) has zero RV -> ratio guarded to NULL
    assert(r.forall(_.isNullAt(r.head.fieldIndex("noise_ratio"))))
    assert(byScale(1).getAs[Long]("n_rets") == 59L)
    assert(byScale(2).getAs[Long]("n_rets") == 29L)
  }

  test("saxMotifs: a repeated ramp's words are exactly the cyclic " +
      "pattern's windows; a 3-bar symbol emits nothing") {
    // closes 1..8 repeated 4x: rank quartiles map {1,2}->1, {3,4}->2,
    // {5,6}->3, {7,8}->4 -> letters cycle "11223344"
    val bars = (0 until 32).map { i =>
      ("ramp", new java.sql.Timestamp(
        ts("2024-01-01 00:00:00").getTime + i * 3600000L),
        (i % 8 + 1).toDouble)
    } ++ (0 until 3).map { i =>
      ("tiny", new java.sql.Timestamp(
        ts("2024-01-01 00:00:00").getTime + i * 3600000L), 1.0 + i)
    }
    val df = bars.toDF("symbol", "bar_start", "close")
    val r = Analytics.saxMotifs(df).collect()
    assert(r.forall(_.getAs[String]("symbol") == "ramp"))
    // 29 sliding words over the period-8 cycle: 8 distinct windows
    assert(r.map(_.getAs[Long]("cnt")).sum == 29L)
    val cyc = "1122334411223344"
    val windows = (0 until 8).map(i => cyc.substring(i, i + 4)).toSet
    assert(r.map(_.getAs[String]("word")).toSet.subsetOf(windows))
    // 29 = 3*8 + 5: the first five cyclic windows appear 4 times
    val top = r.filter(_.getAs[Long]("cnt") == 4L)
    assert(top.length == 5)
    assert(r.head.getAs[Int]("rank") == 1)
    assert(r.head.getAs[Long]("support_bp") == 4L * 10000 / 29)
  }

  test("hurstExponent: a perfectly anti-persistent alternating series " +
      "has R/S = 1 at every size, so H is exactly 0; a constant " +
      "series has zero variance and drops out") {
    val base = ts("2024-01-01 00:00:00").getTime
    def bar(sym: String, h: Int, close: Double) =
      (sym, new java.sql.Timestamp(base + h * 3600000L), close)
    // closes 100,101,100,101,... -> returns alternate +-ln(1.01)
    val alt = (0 to 128).map(h => bar("ALT", h, if (h % 2 == 0) 100.0 else 101.0))
    // constant closes -> all returns 0 -> variance 0 everywhere
    val flat = (0 to 128).map(h => bar("FLAT", h, 100.0))
    val r = Analytics.hurstExponent((alt ++ flat)
      .toDF("symbol", "bar_start", "close")).collect()
    assert(r.length == 1 && r.head.getString(0) == "ALT")
    assert(r.head.getAs[Long]("n_sizes") == 4L)
    assert(r.head.getAs[Double]("hurst") == 0.0)
  }

  test("kyleLambda: perfectly collinear impact recovers the exact " +
      "price-per-unit-flow slope") {
    import graft.Schemas.Trade
    def tr(h: Int, m: Int, side: String, sz: Double, p: Double) =
      Trade("x", "K", p, sz, side, "market",
        ts(f"2024-01-01 $h%02d:$m%02d:00"))
    // dp = 0.001 * signed_flow in every bar
    val trades = Seq(
      tr(0, 0, "buy", 5.0, 100.00), tr(0, 30, "buy", 5.0, 100.01),
      tr(1, 0, "sell", 10.0, 100.00), tr(1, 30, "sell", 10.0, 99.98),
      tr(2, 0, "buy", 2.5, 100.00), tr(2, 30, "buy", 2.5, 100.005)
    ).toDS.toDF
    val r = Analytics.kyleLambda(trades).collect().head
    assert(r.getAs[Long]("n_bars") == 3L)
    assert(r.getAs[Double]("kyle_lambda") == 0.001)
  }

  test("symbolLeadLag: a single symbol IS the market, so lag 0 " +
      "correlates exactly 1 and wins the best flag") {
    val bars = Seq(10.0, 11.0, 10.5, 11.5, 10.8, 12.0).zipWithIndex.map {
      case (c, h) => ("X", ts(f"2024-01-01 $h%02d:00:00"), c)
    }.toDF("symbol", "bar_start", "close")
    val r = Analytics.symbolLeadLag(bars).collect()
    val byLag = r.map(x => x.getAs[Int]("lag_hours") -> x).toMap
    assert(byLag(0).getAs[Double]("xcorr") == 1.0)
    assert(byLag(0).getAs[Boolean]("is_best"))
    assert(byLag(0).getAs[Long]("n_obs") == 5L)
    assert(byLag(1).getAs[Long]("n_obs") == 4L) // boundary shrinks
    assert(r.count(_.getAs[Boolean]("is_best")) == 1)
  }

  test("interpolateGaps: missing minutes take the time-weighted blend " +
      "of their brackets; forward fill stays stale for comparison") {
    val bars = Seq(
      ("X", ts("2024-01-01 10:00:00"), 10.0),
      ("X", ts("2024-01-01 10:03:00"), 16.0))
      .toDF("symbol", "bar_start", "close")
    val r = Analytics.interpolateGaps(bars)
      .orderBy("bar_start").collect()
    assert(r.length == 4)
    assert(r.map(_.getAs[Boolean]("is_real")).toSeq ==
      Seq(true, false, false, true))
    assert(r.map(_.getAs[Double]("close_li")).toSeq ==
      Seq(10.0, 12.0, 14.0, 16.0)) // linear ramp
    assert(r.map(_.getAs[Double]("close_ff")).toSeq ==
      Seq(10.0, 10.0, 10.0, 16.0)) // the stale step
  }

  test("theilSenTrend: linear series recovers the exact slope; one " +
      "outlier bar cannot move the median where OLS would be dragged") {
    def bars(closes: Seq[Double]) = closes.zipWithIndex.map {
      case (c, h) => ("X", ts(f"2024-01-01 $h%02d:00:00"), c)
    }.toDF("symbol", "bar_start", "close")
    // closes 10 + 2h: every pairwise slope is exactly 2
    val lin = Analytics.theilSenTrend(bars(Seq(10, 12, 14, 16, 18)))
      .collect().head
    assert(lin.getAs[Long]("n_pairs") == 10L) // C(5,2), all within 24 h
    assert(lin.getAs[Double]("ts_slope") == 2.0)
    // last bar spikes to 1000: the 4 spike pairs land in the upper
    // tail, the 6 clean pairs still surround the median
    val rob = Analytics.theilSenTrend(bars(Seq(10, 12, 14, 16, 1000)))
      .collect().head
    assert(rob.getAs[Long]("n_pairs") == 10L)
    assert(rob.getAs[Double]("ts_slope") == 2.0)
    // lag band: with maxLagHours=1 only the 4 adjacent pairs remain
    val band = Analytics.theilSenTrend(bars(Seq(10, 12, 14, 16, 18)),
      maxLagHours = 1).collect().head
    assert(band.getAs[Long]("n_pairs") == 4L)
    assert(band.getAs[Double]("ts_slope") == 2.0)
  }

  test("donchian: trailing extrema exclude the current bar so a new " +
      "extreme can break out; warm-up rows dropped") {
    def ohlc(minute: Int, h: Double, l: Double, c: Double): Bar = {
      val start = ts(f"2024-01-01 10:$minute%02d:00")
      Bar("D", start, new Timestamp(start.getTime + 60000),
        c, h, l, c, 1.0, c, 1L, Date.valueOf("2024-01-01"))
    }
    // 5-bar channel: 5 warm-ups at high=110/low=90, then a close above
    // the prior channel high
    val bars = ((0 until 5).map(i => ohlc(i, 110.0, 90.0, 100.0)) :+
      ohlc(5, 120.0, 100.0, 115.0)).toDS.toDF
    val r = Analytics.donchian(bars, w = 5).collect()
    assert(r.length == 1) // only the 6th bar has a full 5-bar window
    val b = r.head
    assert(b.getAs[Double]("ch_high") == 110.0 &&
      b.getAs[Double]("ch_low") == 90.0)
    // its own 120 high is NOT in the channel -> 115 close breaks out
    assert(b.getAs[Boolean]("breakout_up") &&
      !b.getAs[Boolean]("breakout_down"))
  }

  test("cusum: prefix-extrema closed form equals the Page recursion; " +
      "sustained shift alarms, stationary series does not") {
    // two symbols: S drifts up after bar 30; Q stays i.i.d.-ish flat
    val bars = ((0 until 60).map { i =>
      val c = if (i < 30) 100.0 * (1 + 0.001 * (i % 2)) // alternating
              else 100.0 * math.pow(1.004, i - 29)      // sustained drift
      bar("S", i, c)
    } ++ (0 until 60).map { i =>
      bar("Q", i, 100.0 * (1 + 0.001 * (i % 2)))
    }).toDS.toDF
    val out = Analytics.cusum(bars).collect()
    val bySym = out.groupBy(_.getString(0))
    // closed form vs the textbook recursion, replayed in exact decimals
    // from the emitted statistics: S+ must be >= 0, = 0 at start, and
    // alarm exactly when it crosses h
    for (r <- out) {
      assert(r.getAs[Double]("cusum_pos") >= 0.0)
      assert(r.getAs[Double]("cusum_neg") >= 0.0)
      val alarmed = r.getAs[Boolean]("alarmed")
      val h = r.getAs[Double]("h")
      assert(alarmed == (r.getAs[Double]("cusum_pos") > h ||
        r.getAs[Double]("cusum_neg") > h))
    }
    // the drifting symbol alarms eventually; the stationary one never
    assert(bySym("S").exists(_.getAs[Boolean]("alarmed")))
    assert(!bySym("Q").exists(_.getAs[Boolean]("alarmed")))
    // recursion replay for S: S+_t = max(0, S+_{t-1} + (r_t - k))
    // using the same 6-decimal returns; spot-check a prefix
    val s = bySym("S").sortBy(_.getTimestamp(1).getTime)
    val closes = (0 until 60).map { i =>
      if (i < 30) 100.0 * (1 + 0.001 * (i % 2))
      else 100.0 * math.pow(1.004, i - 29) }
    val rets = closes.sliding(2).map { case Seq(a, b) =>
      BigDecimal(math.rint(math.log(b / a) * 1e6) / 1e6) }.toSeq
    val n = rets.length
    val mean = rets.sum / n
    val varr = rets.map(r => r * r).sum / n - mean * mean
    val sigma6 = BigDecimal(math.rint(math.sqrt(varr.toDouble) * 1e6) / 1e6)
    val k = sigma6 / 2
    var sPlus = BigDecimal(0)
    for ((r, i) <- rets.zipWithIndex) {
      sPlus = (sPlus + (r - k)).max(0)
      assert(math.abs(s(i).getAs[Double]("cusum_pos") - sPlus.toDouble)
        < 1e-9, s"row $i")
    }
  }

  test("medianDespike: exact window medians (odd pick, even two-middle " +
      "average), spike flagged without dragging the reference level") {
    val closes = Seq(100.0, 101.0, 150.0, 102.0, 103.0, 101.0)
    val bars = closes.zipWithIndex.map { case (c, i) => bar("M", i, c) }
      .toDS.toDF
    val r = Analytics.medianDespike(bars, w = 5, threshold = 0.05)
      .collect()
    // row 0: window {100} -> median 100; row 1: {100,101} -> 100.5
    assert(r(0).getAs[Double]("median_close") == 100.0)
    assert(r(1).getAs[Double]("median_close") == 100.5)
    assert(r(1).getAs[Int]("n_in_window") == 2)
    // row 2 (the 150 spike): window {100,101,150} -> median 101, and
    // the spike is > 5% away from it -> flagged
    assert(r(2).getAs[Double]("median_close") == 101.0)
    assert(r(2).getAs[Boolean]("spiked"))
    // row 4: {100,101,150,102,103} -> median 102; the spike sits in
    // the window but CANNOT drag the median -> neighbors stay clean
    assert(r(4).getAs[Double]("median_close") == 102.0)
    assert(!r(4).getAs[Boolean]("spiked"))
    assert(r.count(_.getAs[Boolean]("spiked")) == 1)
  }

  test("streamToDriver (O4): partition-at-a-time iteration preserves " +
      "lastK's ascending order and full contents") {
    // the reference N5 plotting loop: lastK (top-k desc, re-sorted
    // asc) pulled to the driver via toLocalIterator — the iterator
    // must yield the SAME rows in the SAME ascending order as a
    // collect, across multiple output partitions
    val bars = (0 until 97).map(i => bar("S", i % 60, 100.0 + i))
      .zipWithIndex.map { case (b, i) =>
        b.copy(bar_start = new Timestamp(b.bar_start.getTime + i * 60000L))
      }.toDS.toDF
    val viaIterator = Analytics.streamToDriver(
      Analytics.lastK(bars, k = 25)).toSeq
    val viaCollect = Analytics.lastK(bars, k = 25).collect().toSeq
    assert(viaIterator == viaCollect)
    assert(viaIterator.size == 25)
    val starts = viaIterator.map(_.getAs[Timestamp]("bar_start").getTime)
    assert(starts == starts.sorted, "ascending bar_start contract broken")
    // and the streamed rows are exactly the k most recent
    assert(starts.head > bars.orderBy(col("bar_start"))
      .limit(1).collect().head.getAs[Timestamp]("bar_start").getTime)
  }
}
