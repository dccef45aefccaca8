package graft

/** Deterministic momentum backtest semantics. */
class BacktestSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Backtest, Trades}

  // price paths: WIN doubles every day, LOSE1/LOSE2 halve — WIN has
  // the strictly largest trailing momentum from the first eligible day
  private def events(days: Int) = {
    var eid = 0L
    (1 to days).flatMap { d =>
      Seq(("WIN", math.pow(2.0, d)), ("LOSE1", math.pow(0.5, d)),
        ("LOSE2", 100.0 * math.pow(0.9, d))).zipWithIndex.map {
        case ((sym, px), i) =>
          eid += 1
          // user_id encodes the symbol (Trades maps user_id -> symbol)
          (eid, sym.hashCode.toLong.abs % 1000 + i, sym, px, d)
      }
    }.map { case (eid, _, sym, px, d) =>
      (eid, symId(sym), "trade",
        java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), px, "{}")
    }.toDF("event_id", "user_id", "event_type", "ts", "value", "props")
  }
  private def symId(s: String): Long =
    Map("WIN" -> 1L, "LOSE1" -> 2L, "LOSE2" -> 3L)(s)

  test("momentum: the persistent winner is held from the first " +
      "eligible day; the ledger is an exact running sum") {
    val r = Backtest.momentum(Trades.fromEvents(events(12)), topK = 1)
      .collect()
    // lr needs day 2, momentum needs 5 complete -> first day is day 7
    assert(r.head.getAs[java.sql.Date]("d").toString == "2024-01-07")
    assert(r.length == 6) // days 7..12
    val ln2micro = math.round(math.log(2.0) * 1e6)
    var cum = BigInt(0)
    r.foreach { row =>
      assert(row.getAs[Long]("n_candidates") == 3L)
      assert(row.getAs[Long]("n_held") == 1L)
      // topK=1 holds WIN, whose daily log return is exactly ln 2;
      // outputs are micro-doubles (n/1e6), so ×1e6+round recovers
      // the underlying integer units exactly
      val p = math.round(row.getAs[Double]("port_logret") * 1e6)
      assert(p == ln2micro)
      cum += p
      val c = math.round(row.getAs[Double]("cum_logret") * 1e6)
      assert(BigInt(c) == cum)
      // the benchmark (equal-weight all three) is strictly worse
      assert(row.getAs[Double]("bench_logret") <
        row.getAs[Double]("port_logret"))
    }
    assert(Backtest.momentum(Trades.fromEvents(events(12)), topK = 1)
      .collect().toSeq == r.toSeq)
  }

  test("momentum: selection uses strictly prior returns (a day-t " +
      "crash cannot affect day-t holdings)") {
    // WIN doubles through day 11 then crashes 99% on day 12; with
    // topK=1 it is still held on day 12 (selection saw only <= day 11)
    var eid = 0L
    val ev = (1 to 12).flatMap { d =>
      val winPx = if (d == 12) math.pow(2.0, 11) * 0.01 else math.pow(2.0, d)
      Seq((1L, winPx), (2L, math.pow(0.5, d)), (3L, 100.0 * math.pow(0.9, d)))
        .map { case (u, px) =>
          eid += 1
          (eid, u, "trade",
            java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), px, "{}")
        }
    }.toDF("event_id", "user_id", "event_type", "ts", "value", "props")
    val r = Backtest.momentum(Trades.fromEvents(ev), topK = 1).collect()
    val last = r.last
    assert(last.getAs[java.sql.Date]("d").toString == "2024-01-12")
    // the crash day's portfolio return is the crash itself: the
    // selection could not see it coming
    assert(last.getAs[Double]("port_logret") < -4.0)
  }


  test("runsTest: alternating order flow reads maximal runs and a " +
      "large positive z; one-sided flow has no defined z") {
    import graft.operators.Analytics
    var eid = 0L
    // symbol 1: strictly alternating buy/sell (even/odd event ids);
    // symbol 2: buys only (even ids)
    val ev = ((1 to 40).map { i =>
      eid = i.toLong // parity alternates -> side alternates
      (eid, 1L, "t",
        java.sql.Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"),
        10.0, "{}")
    } ++ (1 to 20).map { i =>
      (1000L + 2 * i, 2L, "t",
        java.sql.Timestamp.valueOf(f"2024-01-02 00:${i % 60}%02d:00"),
        10.0, "{}")
    }).toDF("event_id", "user_id", "event_type", "ts", "value", "props")
    val r = Analytics.runsTest(Trades.fromEvents(ev)).collect()
    val s1 = r.filter(_.getString(0) == "SYM_1").head
    assert(s1.getAs[Long]("runs") == 40L) // every step is a new run
    assert(s1.getAs[Double]("z") > 1.96)
    assert(!s1.getAs[Boolean]("consistent_with_random"))
    val s2 = r.filter(_.getString(0) == "SYM_2").head
    assert(s2.getAs[Long]("n_sell") == 0L)
    assert(s2.isNullAt(s2.fieldIndex("z")))
  }

  test("amihudIlliq: equal price moves on 10x the dollar volume read " +
      "~10x lower illiquidity") {
    import graft.operators.Analytics
    var eid = 0L
    // both symbols double daily; THIN trades once/day, THICK has 10
    // identical trades/day (10x dollar volume) — sizes are equal
    // because Trades derives size from event_id: use matching ids
    def ev(u: Long, d: Int, k: Int, px: Double) = {
      eid += 1
      (u * 100000L + d * 100L + k, u, "t",
        java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:$k%02d:00"),
        px, "{}")
    }
    val rows = (1 to 8).flatMap { d =>
      ev(1L, d, 0, math.pow(2.0, d)) ::
        (0 until 10).map(k => ev(2L, d, k, math.pow(2.0, d))).toList
    }
    val df = rows.toDF("event_id", "user_id", "event_type", "ts",
      "value", "props")
    val r = Analytics.amihudIlliq(Trades.fromEvents(df)).collect()
      .map(x => x.getString(0) -> x.getAs[Double]("illiq")).toMap
    assert(r("SYM_1") > 0 && r("SYM_2") > 0)
    val ratio = r("SYM_1") / r("SYM_2")
    assert(ratio > 8.0 && ratio < 12.0) // sizes differ slightly by id
  }


  test("pairsTrading: a log-price relation lnPa = 2 lnPb +/- w " +
      "recovers beta ~ 2 and an alternating ~unit z-score") {
    import graft.operators.Backtest
    var eid = 0L
    val ev = (1 to 12).flatMap { d =>
      val pb = 1.0 + d * 0.3                       // drifting leg B
      val w = if (d % 2 == 0) 0.01 else -0.01      // spread wobble
      val pa = math.exp(2.0 * math.log(pb) + w)
      Seq((1L, pa), (2L, pb)).map { case (u, px) =>
        eid += 1
        (eid, u, "t",
          java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"),
          px, "{}")
      }
    }.toDF("event_id", "user_id", "event_type", "ts", "value", "props")
    val r = Backtest.pairsTrading(Trades.fromEvents(ev)).collect()
    assert(r.length == 12)
    val beta = r.head.getAs[Double]("beta")
    assert(beta > 1.9 && beta < 2.1)
    assert(r.head.getAs[Long]("n_days") == 12L)
    // the wobble is the whole spread: z alternates sign ~unit size
    val zs = r.map(_.getAs[Double]("z"))
    assert(zs.forall(z => math.abs(math.abs(z) - 1.0) < 0.35))
    assert(zs.sliding(2).forall { case Array(x, y) => x * y < 0 })
    assert(Backtest.pairsTrading(Trades.fromEvents(ev)).collect()
      .toSeq == r.toSeq)
  }
}
