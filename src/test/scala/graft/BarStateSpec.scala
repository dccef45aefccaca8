package graft

import graft.Schemas.Trade
import graft.operators.Gold
import org.apache.spark.sql.DataFrame

/** Mergeable bar state (Gold.barState / mergeBarStates / restateBars):
  * the merge must commute with recomputation — finalize(merge(state(A),
  * state(B))) == bars(A ∪ B) bit-for-bit, including the struct-min/max
  * tie-break and the exact-decimal volume/vwap.
  */
class BarStateSpec extends SparkSpec {
  import spark.implicits._

  private def trade(sym: String, t: String, price: Double, size: Double) =
    Trade("kraken", sym, price, size, "buy", "market", ts(t))

  private def rows(df: DataFrame): Seq[String] =
    df.orderBy("symbol", "bar_start").collect().toSeq.map(_.toString)

  private def assertBarsEqual(got: DataFrame, want: DataFrame): Unit = {
    val g = rows(got.select(want.columns.map(org.apache.spark.sql.functions.col): _*))
    val w = rows(want)
    assert(g == w)
  }

  test("two-way merge parity: finalize(merge(state(A), state(B))) == bars(A++B)") {
    val a = Seq(
      trade("BTC", "2024-01-01 10:00:05", 10.0, 1.0),
      trade("BTC", "2024-01-01 10:00:55", 20.0, 1.5),
      trade("ETH", "2024-01-01 10:00:30", 5.0, 2.0))
    val b = Seq(
      trade("BTC", "2024-01-01 10:00:20", 30.0, 2.0),
      trade("BTC", "2024-01-01 10:01:10", 25.0, 1.0), // new bar, delta only
      trade("ETH", "2024-01-01 10:00:01", 6.0, 1.0))
    val merged = Gold.finalizeBars(Gold.mergeBarStates(
      Gold.barState(a.toDS.toDF), Gold.barState(b.toDS.toDF)))
    assertBarsEqual(merged, Gold.bars((a ++ b).toDS.toDF))
  }

  test("tie-break across the split: equal min/max ts in both halves picks lower open / higher close") {
    val t = "2024-01-01 10:00:10"
    val a = Seq(trade("BTC", t, 15.0, 1.0))
    val b = Seq(trade("BTC", t, 12.0, 1.0))
    val m = Gold.finalizeBars(Gold.mergeBarStates(
      Gold.barState(a.toDS.toDF), Gold.barState(b.toDS.toDF))).collect().head
    assert(m.getAs[Double]("open") == 12.0)
    assert(m.getAs[Double]("close") == 15.0)
    assertBarsEqual(
      Gold.finalizeBars(Gold.mergeBarStates(
        Gold.barState(a.toDS.toDF), Gold.barState(b.toDS.toDF))),
      Gold.bars((a ++ b).toDS.toDF))
  }

  test("property: random trades, random 3-way split — merge and restate both equal full recompute") {
    val rnd = new scala.util.Random(4207)
    for (round <- 1 to 5) {
      val syms = Seq("BTC", "ETH", "SOL")
      val all = (1 to 120).map { i =>
        val sec = rnd.nextInt(300)                  // 5 minutes of bars
        trade(syms(rnd.nextInt(syms.size)),
          f"2024-01-01 10:${sec / 60}%02d:${sec % 60}%02d.${rnd.nextInt(1000)}%03d",
          10.0 + rnd.nextInt(500) / 10.0, 1.0 + rnd.nextInt(100) / 100.0)
      }
      val tag = all.map(t => (t, rnd.nextInt(3)))
      val parts = (0 to 2).map(k => tag.filter(_._2 == k).map(_._1))
      val full = Gold.bars(all.toDS.toDF)
      // associative merge: ((s0 + s1) + s2)
      val merged = Gold.finalizeBars(Gold.mergeBarStates(
        Gold.mergeBarStates(Gold.barState(parts(0).toDS.toDF),
          Gold.barState(parts(1).toDS.toDF)),
        Gold.barState(parts(2).toDS.toDF)))
      assertBarsEqual(merged, full)
      // restate: parts 0+1 are history, part 2 is the late delta
      val restated = Gold.restateBars(
        Gold.barState((parts(0) ++ parts(1)).toDS.toDF), parts(2).toDS.toDF)
      assertBarsEqual(restated, full)
    }
  }

  test("restate with empty delta is the identity on finalized history") {
    val hist = Seq(
      trade("BTC", "2024-01-01 10:00:05", 10.0, 1.0),
      trade("ETH", "2024-01-01 10:02:30", 5.0, 2.0))
    val empty = spark.emptyDataset[Trade].toDF
    assertBarsEqual(
      Gold.restateBars(Gold.barState(hist.toDS.toDF), empty),
      Gold.bars(hist.toDS.toDF))
  }

  test("restate touches only delta keys: untouched bars survive via the anti join") {
    val hist = Seq(
      trade("BTC", "2024-01-01 10:00:05", 10.0, 1.0),
      trade("BTC", "2024-01-01 10:01:05", 11.0, 1.0),
      trade("ETH", "2024-01-01 10:00:30", 5.0, 2.0))
    val late = Seq(trade("BTC", "2024-01-01 10:00:59", 12.0, 3.0))
    val restated = Gold.restateBars(Gold.barState(hist.toDS.toDF),
      late.toDS.toDF)
    assertBarsEqual(restated, Gold.bars((hist ++ late).toDS.toDF))
    val touched = restated.filter("symbol = 'BTC' and minute(bar_start) = 0")
      .collect().head
    assert(touched.getAs[Double]("close") == 12.0)
    assert(touched.getAs[Long]("trades") == 2L)
  }
}
