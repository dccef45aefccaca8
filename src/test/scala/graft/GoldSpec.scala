package graft

import graft.Schemas.Trade
import graft.operators.Gold

/** OHLCV bar semantics (reference silver_to_gold_bars.py:34-66). */
class GoldSpec extends SparkSpec {
  import spark.implicits._

  private def trade(sym: String, t: String, price: Double, size: Double) =
    Trade("kraken", sym, price, size, "buy", "market", ts(t))

  test("single-trade bar: open=high=low=close, vwap=price, volume=size") {
    val bars = Gold.bars(Seq(
      trade("BTC", "2024-01-01 10:00:30.123", 100.5, 2.0)).toDS.toDF).collect()
    assert(bars.length == 1)
    val b = bars.head
    assert(b.getAs[Double]("open") == 100.5)
    assert(b.getAs[Double]("high") == 100.5)
    assert(b.getAs[Double]("low") == 100.5)
    assert(b.getAs[Double]("close") == 100.5)
    assert(b.getAs[Double]("vwap") == 100.5)
    assert(b.getAs[Double]("volume") == 2.0)
    assert(b.getAs[Long]("trades") == 1L)
    assert(b.getAs[java.sql.Timestamp]("bar_start") == ts("2024-01-01 10:00:00"))
    assert(b.getAs[java.sql.Timestamp]("bar_end") == ts("2024-01-01 10:01:00"))
  }

  test("open/close pick first/last trade by event_time; high/low/vwap exact") {
    val bars = Gold.bars(Seq(
      trade("BTC", "2024-01-01 10:00:05", 10.0, 1.0),
      trade("BTC", "2024-01-01 10:00:20", 30.0, 2.0),
      trade("BTC", "2024-01-01 10:00:55", 20.0, 1.0)).toDS.toDF).collect()
    val b = bars.head
    assert(b.getAs[Double]("open") == 10.0)
    assert(b.getAs[Double]("close") == 20.0)
    assert(b.getAs[Double]("high") == 30.0)
    assert(b.getAs[Double]("low") == 10.0)
    assert(b.getAs[Double]("volume") == 4.0)
    // vwap = (10*1 + 30*2 + 20*1) / 4 = 90/4 = 22.5, exact decimals
    assert(b.getAs[Double]("vwap") == 22.5)
  }

  test("struct-min tie-break: equal event_time picks LOWER price for open, HIGHER for close") {
    val t = "2024-01-01 10:00:10"
    val bars = Gold.bars(Seq(
      trade("BTC", t, 15.0, 1.0), trade("BTC", t, 12.0, 1.0)).toDS.toDF).collect()
    val b = bars.head
    assert(b.getAs[Double]("open") == 12.0)  // min(struct(ts, price))
    assert(b.getAs[Double]("close") == 15.0) // max(struct(ts, price))
  }

  test("trades in different minutes and symbols land in separate bars") {
    val bars = Gold.bars(Seq(
      trade("BTC", "2024-01-01 10:00:59.999", 1.0, 1.0),
      trade("BTC", "2024-01-01 10:01:00.000", 2.0, 1.0),
      trade("ETH", "2024-01-01 10:00:30", 3.0, 1.0)).toDS.toDF).collect()
    assert(bars.length == 3)
  }

  test("typed Aggregator bars are row-identical to the untyped Gold.bars plan") {
    import graft.operators.{Trades, TypedBars}
    val trades = Trades.fromEvents(
      Tables.events(spark, "/root/testdata/sf0.001"))
    val cols = Seq("symbol", "bar_start", "open", "high", "low", "close",
      "volume", "vwap", "trades")
    val typed = TypedBars.minuteBarsDF(spark,
        trades.select(org.apache.spark.sql.functions.col("symbol"),
          org.apache.spark.sql.functions.col("event_time"),
          org.apache.spark.sql.functions.col("price"),
          org.apache.spark.sql.functions.col("size"))
          .as[TypedBars.TradeRow](
            org.apache.spark.sql.Encoders.product[TypedBars.TradeRow]))
      .select(cols.map(org.apache.spark.sql.functions.col): _*)
      .orderBy("symbol", "bar_start").collect().toSeq
    val untyped = graft.operators.Gold.bars(trades)
      .select(cols.map(org.apache.spark.sql.functions.col): _*)
      .orderBy("symbol", "bar_start").collect().toSeq
    assert(typed.nonEmpty && typed == untyped)
  }

  test("bar width is parameterizable (5 minutes)") {
    val bars = Gold.bars(Seq(
      trade("BTC", "2024-01-01 10:01:00", 1.0, 1.0),
      trade("BTC", "2024-01-01 10:04:59", 2.0, 1.0)).toDS.toDF, "5 minutes")
      .collect()
    assert(bars.length == 1)
    assert(bars.head.getAs[java.sql.Timestamp]("bar_start") == ts("2024-01-01 10:00:00"))
  }
}
