package graft

import graft.operators.AsOf

/** As-of join semantics: latest right row with ts <= left ts per key. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def l(sym: String, t: String, price: Double) = (sym, ts(t), price)
  private def r(sym: String, t: String, close: Double) = (sym, ts(t), close)

  test("picks the latest preceding right row per key; equal ts visible; no match => null") {
    val trades = Seq(
      l("A", "2024-01-01 10:00:30", 1.0),  // before any bar => null
      l("A", "2024-01-01 10:01:00", 2.0),  // exactly at bar_end 10:01 => that bar
      l("A", "2024-01-01 10:03:30", 3.0),  // after both bars => latest (10:02)
      l("B", "2024-01-01 10:05:00", 4.0))  // other key => B's bar only
      .toDF("symbol", "event_time", "price")
    val bars = Seq(
      r("A", "2024-01-01 10:01:00", 10.0),
      r("A", "2024-01-01 10:02:00", 20.0),
      r("B", "2024-01-01 10:01:00", 30.0))
      .toDF("symbol", "bar_end", "close")

    val out = AsOf.join(trades, bars, "symbol", "event_time", "bar_end",
      Seq("close")).orderBy("symbol", "event_time").collect()

    assert(out.map(_.getAs[Any]("asof_close")).toSeq ==
      Seq(null, 10.0, 20.0, 30.0))
    // left columns all survive
    assert(out.map(_.getAs[Double]("price")).toSeq == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("strict mode hides the equal-timestamp right row (the leakage guard)") {
    val trades = Seq(
      l("A", "2024-01-01 10:01:00", 1.0),  // == bar ts: <= sees it, < does not
      l("A", "2024-01-01 10:02:30", 2.0))  // strictly after: both see 10:02
      .toDF("symbol", "event_time", "price")
    val bars = Seq(
      r("A", "2024-01-01 10:01:00", 10.0),
      r("A", "2024-01-01 10:02:00", 20.0))
      .toDF("symbol", "bar_end", "close")

    val lax = AsOf.join(trades, bars, "symbol", "event_time", "bar_end",
      Seq("close")).orderBy("event_time").collect()
    val strict = AsOf.join(trades, bars, "symbol", "event_time", "bar_end",
      Seq("close"), strict = true).orderBy("event_time").collect()

    assert(lax.map(_.getAs[Any]("asof_close")).toSeq == Seq(10.0, 20.0))
    assert(strict.map(_.getAs[Any]("asof_close")).toSeq == Seq(null, 20.0))
  }

  test("strict as-of onto an identical timestamp set reduces to lag(1)") {
    val rows = (1 to 20).map(i =>
      ("A", ts(f"2024-01-01 10:${i % 60}%02d:00"), i.toDouble))
    val left = rows.toDF("symbol", "t", "v")
    val out = AsOf.join(left, left.toDF("symbol", "t", "v"),
        "symbol", "t", "t", Seq("v"), strict = true)
      .orderBy("t").collect()
    val sorted = rows.sortBy(_._2.getTime).map(_._3)
    assert(out.map(_.getAs[Any]("asof_v")).toSeq ==
      (null +: sorted.init.map(x => x: Any)))
  }
}
