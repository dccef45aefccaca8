package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.Schemas.Trade
import graft.operators.Sessions

/** Gap-based sessionization: batch window shape vs streaming
  * flatMapGroupsWithState state machine.
  */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def trade(sym: String, t: String, size: Double = 1.0) =
    Trade("kraken", sym, 100.0, size, "buy", "market", ts(t))

  private val trades = Seq(
    trade("A", "2024-01-01 10:00:00", 1.0),
    trade("A", "2024-01-01 10:10:00", 2.0),  // same session (gap 10m)
    trade("A", "2024-01-01 11:00:00", 3.0),  // new session (gap 50m > 30m)
    trade("B", "2024-01-01 10:05:00", 4.0))

  test("batch: gap > 30min starts a new session; aggregates exact") {
    val s = Sessions.stats(trades.toDS.toDF)
      .orderBy("symbol", "session_id").collect()
    assert(s.length == 3)
    assert(s(0).getAs[Long]("session_id") == 0L)
    assert(s(0).getAs[Long]("n_trades") == 2L)
    assert(s(0).getAs[Double]("volume") == 3.0)
    assert(s(1).getAs[Long]("session_id") == 1L)
    assert(s(1).getAs[Long]("n_trades") == 1L)
    assert(s(2).getAs[String]("symbol") == "B")
  }

  test("native session_window variant is row-identical to the window shape") {
    // synthetic boundary cases: exactly-30min gap (same session under the
    // floor-second > rule), 30min+1s gap (new session), sub-second jitter
    val edge = trades ++ Seq(
      trade("C", "2024-01-01 10:00:00", 1.0),
      trade("C", "2024-01-01 10:30:00", 1.0),  // gap exactly 1800s: merges
      trade("C", "2024-01-01 11:00:01", 1.0),  // gap 1801s: splits
      trade("D", "2024-01-01 10:00:00", 1.0))
    val cols = Seq("symbol", "session_id", "session_start", "session_end",
      "n_trades", "volume")
    val a = Sessions.stats(edge.toDS.toDF)
      .select(cols.map(col): _*).orderBy("symbol", "session_id")
      .collect().toSeq
    val b = Sessions.statsNative(edge.toDS.toDF)
      .select(cols.map(col): _*).orderBy("symbol", "session_id")
      .collect().toSeq
    assert(a == b)
    // and on the real data (µs timestamps, all symbols)
    val real = operators.Trades.fromEvents(
      Tables.events(spark, "/root/testdata/sf0.001"))
    val ra = Sessions.stats(real).select(cols.map(col): _*)
      .orderBy("symbol", "session_id").collect().toSeq
    val rb = Sessions.statsNative(real).select(cols.map(col): _*)
      .orderBy("symbol", "session_id").collect().toSeq
    assert(ra.nonEmpty && ra == rb)
  }

  test("streaming native session_window emits the batch sessions") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Trade]
    val q = graft.streaming.Streams.sessionWindowStream(in.toDF)
      .writeStream.format("memory").queryName("sessions_native_stream")
      .outputMode("append").start()
    try {
      in.addData(trades: _*)
      // sentinel far in the future drags the watermark past every session
      in.addData(trade("ZZ", "2024-01-02 10:00:00", 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions_native_stream")
        .filter(col("symbol") =!= "ZZ")
        .select("symbol", "session_start", "session_end", "n_trades", "volume")
        .orderBy("symbol", "session_start").collect().toSeq
      val want = operators.Sessions.stats(trades.toDS.toDF)
        .select(col("symbol"), col("session_start"), col("session_end"),
          col("n_trades"), col("volume"))
        .orderBy("symbol", "session_start").collect().toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("streaming: sessions emit on gap closure with identical aggregates") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Trade]
    val q = Sessions.streamingStats(spark, in.toDF)
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    try {
      in.addData(trades.take(2): _*)
      q.processAllAvailable()
      // session still open
      assert(spark.table("sessions_stream").count() == 0)
      in.addData(trades(2)) // 50-minute gap closes session 0
      q.processAllAvailable()
      val closed = spark.table("sessions_stream").collect()
      assert(closed.length == 1)
      assert(closed.head.getAs[Long]("n_trades") == 2L)
      assert(closed.head.getAs[Double]("volume") == 3.0)
      assert(closed.head.getAs[java.sql.Timestamp]("session_end") ==
        ts("2024-01-01 10:10:00"))
    } finally q.stop()
  }

  test("transformWithState sessionization emits the same sessions") {
    implicit val ctx = spark.sqlContext
    // transformWithState needs a multi-column-family store => RocksDB
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Trade]
    val q = Sessions.streamingStatsTws(spark, in.toDF)
      .writeStream.format("memory").queryName("sessions_tws")
      .outputMode("append").start()
    try {
      in.addData(trades: _*)
      // far-future sentinel advances the watermark past every timer
      in.addData(trade("ZZ", "2024-01-02 10:00:00", 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions_tws")
        .filter(col("symbol") =!= "ZZ")
        .select("symbol", "session_start", "session_end", "n_trades", "volume")
        .orderBy("symbol", "session_start").collect().toSeq
      val want = Sessions.stats(trades.toDS.toDF)
        .select(col("symbol"), col("session_start"), col("session_end"),
          col("n_trades"), col("volume"))
        .orderBy("symbol", "session_start").collect().toSeq
      assert(got == want)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("eventFunnel: strict event order, median stage latencies") {
    // user 1 converts in order; user 2's purchase comes BEFORE its
    // signup (must not count); user 3 only views
    val events = Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:10"),
      (1L, "signup", "2024-01-01 10:00:30"),
      (1L, "purchase", "2024-01-01 10:01:00"),
      (2L, "view", "2024-01-01 09:00:00"),
      (2L, "purchase", "2024-01-01 09:00:05"), // before its signup
      (2L, "click", "2024-01-01 09:00:10"),
      (2L, "signup", "2024-01-01 09:00:20"),
      (3L, "view", "2024-01-01 08:00:00"))
      .map { case (u, t, s) => (u, t, ts(s)) }
      .toDF("user_id", "event_type", "ts")
    val r = Sessions.eventFunnel(events).collect()
    assert(r.map(x => (x.getString(0), x.getAs[Long]("n_users"))).toSeq ==
      Seq(("1_view", 3L), ("2_click", 2L), ("3_signup", 2L),
        ("4_purchase", 1L)))
    assert(r.head.isNullAt(r.head.fieldIndex("median_secs_from_prev")))
    val med = r.tail.map(x =>
      x.getString(0) -> x.getAs[Double]("median_secs_from_prev")).toMap
    // click deltas {10,10} → 10; signup {20,10} → 15; purchase {30} → 30
    assert(med == Map("2_click" -> 10.0, "3_signup" -> 15.0,
      "4_purchase" -> 30.0))
  }

  test("lastTouchAttribution: latest touch wins, lookback expires, no touch = direct") {
    val events = Seq(
      // u1: click then purchase 1h later -> click credited, 60 mins
      (1L, 1L, "click", "2024-01-01 10:00:00"),
      (2L, 1L, "purchase", "2024-01-01 11:00:00"),
      // u2: view then click then purchase -> LATEST touch (click) wins
      (3L, 2L, "view", "2024-01-01 10:00:00"),
      (4L, 2L, "click", "2024-01-01 10:10:00"),
      (5L, 2L, "purchase", "2024-01-01 10:30:00"),
      // u3: click 100h before purchase -> beyond 72h lookback -> direct
      (6L, 3L, "click", "2024-01-01 00:00:00"),
      (7L, 3L, "purchase", "2024-01-05 04:00:00"),
      // u4: purchase with no preceding touch at all -> direct
      (8L, 4L, "purchase", "2024-01-01 12:00:00"),
      // u5: view 10m before purchase -> view credited
      (9L, 5L, "view", "2024-01-01 09:50:00"),
      (10L, 5L, "purchase", "2024-01-01 10:00:00"))
      .map { case (id, u, t, s) => (id, u, t, ts(s)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Sessions.lastTouchAttribution(events).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("click", "view", "direct"))
    assert(r("click").getAs[Long]("n_conversions") == 2L)
    assert(r("direct").getAs[Long]("n_conversions") == 2L)
    assert(r("view").getAs[Long]("n_conversions") == 1L)
    assert(r("click").getAs[Double]("share") == 0.4)
    // click latencies {60, 20} -> mean 40; view {10}; direct has none
    assert(r("click").getAs[Double]("avg_mins") == 40.0)
    assert(r("view").getAs[Double]("avg_mins") == 10.0)
    assert(r("direct").isNullAt(r("direct").fieldIndex("avg_mins")))
  }

  test("sessionPaths: windows never cross the session gap; " +
      "counts and distinct sessions roll up") {
    val events = Seq(
      // u1 session 1: view>click>purchase (one trigram)
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "click", "2024-01-01 10:05:00"),
      (3L, 1L, "purchase", "2024-01-01 10:10:00"),
      // u1 session 2 (gap > 30m): view>click>purchase again
      (4L, 1L, "view", "2024-01-01 12:00:00"),
      (5L, 1L, "click", "2024-01-01 12:05:00"),
      (6L, 1L, "purchase", "2024-01-01 12:10:00"),
      // u2: view>click then a 40m gap, then purchase — the trigram
      // spanning the gap MUST NOT appear
      (7L, 2L, "view", "2024-01-01 10:00:00"),
      (8L, 2L, "click", "2024-01-01 10:05:00"),
      (9L, 2L, "purchase", "2024-01-01 10:50:00"))
      .map { case (id, u, t, s) => (id, u, t, ts(s)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Sessions.sessionPaths(events).collect()
    assert(r.length == 1)
    assert(r.head.getString(0) == "view>click>purchase")
    assert(r.head.getAs[Long]("n") == 2L)
    assert(r.head.getAs[Long]("n_sessions") == 2L)
  }

  test("attributionMarkov: removal effect counts carried paths, not " +
      "just closes — the closer gets 1.0, the opener half") {
    // 10 users: click -> purchase; 10: view -> click -> purchase;
    // 10: view only. Chain: P(conv)=2/3; removing click kills all
    // conversion (effect 1); removing view leaves the direct click
    // path (effect 1/2). Last-touch would credit click 100%.
    var eid = 0L
    def ev(u: Long, t: String, minute: Int) = {
      eid += 1
      (eid, u, t, ts(f"2024-01-01 10:$minute%02d:00"))
    }
    val events = (
      (1L to 10L).flatMap(u => Seq(ev(u, "click", 0), ev(u, "purchase", 1))) ++
      (11L to 20L).flatMap(u =>
        Seq(ev(u, "view", 0), ev(u, "click", 1), ev(u, "purchase", 2))) ++
      (21L to 30L).map(u => ev(u, "view", 0)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Sessions.attributionMarkov(events).collect()
    val m = r.map(x => x.getString(0) -> x).toMap
    assert(m.keySet == Set("click", "view"))
    assert(m("click").getAs[Double]("removal_effect") == 1.0)
    assert(m("view").getAs[Double]("removal_effect") == 0.5)
    assert(m("click").getAs[Double]("p_conv_base") == 0.666667)
    assert(m("click").getAs[Double]("p_conv_removed") == 0.0)
    assert(m("view").getAs[Double]("p_conv_removed") == 0.333333)
    assert(m("click").getAs[Double]("share") == 0.666667)
    assert(m("view").getAs[Double]("share") == 0.333333)
  }

  test("burstiness: pacemaker-regular arrivals score B = -1 with " +
      "CV 0; a heavy-tailed gap mix scores B > regular") {
    val events = (
      // type "reg": every 60 s exactly -> sigma 0
      (0 until 5).map(i => (100L + i, 1L, "reg",
        ts("2024-01-01 10:00:00").getTime + i * 60000L)) ++
      // type "burst": nine 1 s gaps then a 40000 s silence — the
      // single-spike limit has B -> (sqrt(n)-1)/(sqrt(n)+1), here ~0.52
      ((0L to 9L) :+ 40009L).zipWithIndex.map { case (s, i) =>
        (200L + i, 1L, "burst",
          ts("2024-01-01 10:00:00").getTime + s * 1000L) })
      .map { case (id, u, t, ms) =>
        (id, u, t, new java.sql.Timestamp(ms)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val m = Sessions.burstiness(events).collect()
      .map(r => r.getString(0) -> r).toMap
    val reg = m("reg")
    assert(reg.getAs[Long]("n_gaps") == 4L)
    assert(reg.getAs[Double]("mean_gap_us") == 6.0e7)
    assert(reg.getAs[Double]("sigma_gap_us") == 0.0)
    assert(reg.getAs[Double]("cv") == 0.0)
    assert(reg.getAs[Double]("burstiness") == -1.0)
    val b = m("burst")
    assert(b.getAs[Long]("n_gaps") == 10L)
    assert(b.getAs[Double]("burstiness") >
      reg.getAs[Double]("burstiness"))
    assert(b.getAs[Double]("burstiness") > 0.4) // strongly bursty
  }

  test("cohortLtv: cumulative revenue per signup-week cohort with the " +
      "full cohort in the denominator") {
    def e(id: Long, u: Long, day: String, v: Double) =
      (id, u, "purchase", v, ts(s"$day 12:00:00"))
    val events = Seq(
      e(1, 1, "2024-01-01", 10.0), // u1+u2 -> cohort Mon 2024-01-01
      e(2, 2, "2024-01-03", 20.0),
      e(3, 1, "2024-01-09", 5.0),  // u1 active in week offset 1
      e(4, 3, "2024-01-10", 7.0))  // u3 -> cohort Mon 2024-01-08
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val r = Sessions.cohortLtv(events).collect()
    assert(r.length == 3)
    val k = r.map(x => (x.getAs[java.sql.Date]("cohort_week").toString,
      x.getAs[Long]("week_offset")) -> x).toMap
    val a0 = k(("2024-01-01", 0L))
    assert(a0.getAs[Long]("n_active") == 2L)
    assert(a0.getAs[Long]("cohort_size") == 2L)
    assert(a0.getAs[Double]("cum_revenue") == 30.0)
    assert(a0.getAs[Double]("ltv_per_user") == 15.0)
    val a1 = k(("2024-01-01", 1L))
    assert(a1.getAs[Long]("n_active") == 1L)
    // inactive u2 stays in the denominator: 35 / 2, not 5 / 1
    assert(a1.getAs[Double]("cum_revenue") == 35.0)
    assert(a1.getAs[Double]("ltv_per_user") == 17.5)
    val b0 = k(("2024-01-08", 0L))
    assert(b0.getAs[Long]("cohort_size") == 1L)
    assert(b0.getAs[Double]("ltv_per_user") == 7.0)
  }

  test("hillTailIndex: a geometric value ladder recovers its exact " +
      "tail slope; types without k+1 positives drop out") {
    // values exp(0.01*i), i=1..150: top-100 log-ratios vs x_(101) are
    // 0.01..1.00 -> hill_sum = 50.5, alpha = 100/50.5 = 1.980198...
    val events = (1 to 150).map(i => (i.toLong, 1L, "geo",
        math.exp(0.01 * i),
        new java.sql.Timestamp(ts("2024-01-01 10:00:00").getTime + i))) ++
      // 50 positives only -> no 101st order statistic -> no row
      (1 to 50).map(i => (1000L + i, 1L, "thin", 1.0 + i,
        new java.sql.Timestamp(ts("2024-01-01 10:00:00").getTime + i))) ++
      // zero/negative values never enter the ladder
      Seq((2000L, 1L, "geo", 0.0,
        new java.sql.Timestamp(ts("2024-01-01 10:00:00").getTime)),
        (2001L, 1L, "geo", -5.0,
          new java.sql.Timestamp(ts("2024-01-01 10:00:00").getTime)))
    val df = events.toDF("event_id", "user_id", "event_type", "value", "ts")
    val r = Sessions.hillTailIndex(df).collect()
    assert(r.length == 1 && r.head.getAs[String]("event_type") == "geo")
    assert(r.head.getAs[Long]("n_pos") == 150L)
    assert(math.abs(r.head.getAs[Double]("x_k") - math.exp(0.5)) < 1e-12)
    val alpha = r.head.getAs[Double]("tail_alpha")
    assert(math.abs(alpha - 100.0 / 50.5) < 1e-4, s"alpha $alpha")
  }

  test("conversionSurvival: converters enter at their hour, censoring " +
      "shrinks the risk set, hazards are exact micro-units") {
    // corpus end = user 3's last event (2024-01-20 00:00). user 1
    // converts at t=2h; user 4 converts instantly (t=0); user 2
    // converts at 400h > window 336 -> censored at 336; user 3 never
    // converts, joins 100h before corpus end -> censored at 100.
    val events = Seq(
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "purchase", "2024-01-01 02:30:00"),
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "purchase", "2024-01-17 16:00:00"), // +400 h
      (3L, "view", "2024-01-15 20:00:00"),     // 100 h before end
      (3L, "click", "2024-01-20 00:00:00"),    // defines corpus end
      (4L, "purchase", "2024-01-02 00:00:00"))
      .map { case (u, t, s) => (u, t, ts(s)) }
      .toDF("user_id", "event_type", "ts")
    val r = Sessions.conversionSurvival(events).collect()
    assert(r.map(_.getAs[Long]("t_hours")).toSeq == Seq(0L, 2L))
    val at0 = r(0); val at2 = r(1)
    assert(at0.getAs[Long]("n_risk") == 4L)   // everyone at risk
    assert(at0.getAs[Long]("d_conv") == 1L)
    assert(at0.getAs[Long]("hazard_micro") == 250000000000L) // 1/4
    assert(at2.getAs[Long]("n_risk") == 3L)   // user 4 converted at 0
    assert(at2.getAs[Long]("hazard_micro") == 333333333333L) // 1/3 floor
    assert(at2.getAs[Long]("cum_hazard_micro") == 583333333333L)
    assert(r.map(_.getAs[Long]("c_censored")).sum == 0L) // censored
    // rows (t=100, t=336) have d_conv=0 and are not emitted
  }


  test("userEntropy: a one-type user reads exactly 0 nats; four " +
      "equally-used types read exactly the pinned ln 4") {
    import graft.operators.Sessions
    var eid = 0L
    def ev(u: Long, t: String) = {
      eid += 1
      (eid, u, t,
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0, "{}")
    }
    val events = ((1 to 12).map(_ => ev(1L, "click")) ++
      Seq("a", "b", "c", "d").flatMap(t => (1 to 3).map(_ => ev(2L, t))))
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
    val r = Sessions.userEntropy(events).collect()
    val b0 = r.filter(_.getLong(0) == 0L).head
    assert(b0.getAs[Long]("n_users") == 1L)
    assert(b0.getAs[Double]("mean_entropy") == 0.0)
    // H = -(4 * 3 * round(ln(1/4)*1e6)) / 12 = 1386294 micro-nats
    val b5 = r.filter(_.getLong(0) == 5L).head
    // mean_entropy is a micro-double (n/1e6): recover integer units
    assert(math.round(b5.getAs[Double]("mean_entropy") * 1e6)
      == 1386294L)
    assert(Sessions.userEntropy(events).collect().toSeq == r.toSeq)
  }
}
