package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.Schemas.Trade
import graft.operators.{Analytics, Gold, Trades}

/** Multi-timeframe resampling and gap filling semantics. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def trade(sym: String, t: String, price: Double, size: Double = 1.0) =
    Trade("kraken", sym, price, size, "buy", "market", ts(t))

  test("1h resample composes 1m bars: open/close by time, high/low/volume exact") {
    val bars = Gold.bars(Seq(
      trade("BTC", "2024-01-01 10:05:00", 10.0, 1.0),
      trade("BTC", "2024-01-01 10:30:00", 50.0, 2.0),
      trade("BTC", "2024-01-01 10:59:00", 20.0, 1.0),
      trade("BTC", "2024-01-01 11:10:00", 30.0, 1.0)).toDS.toDF)
    val hourly = Gold.resample(bars).orderBy("bar_start").collect()
    assert(hourly.length == 2)
    val h10 = hourly.head
    assert(h10.getAs[Double]("open") == 10.0)   // first minute's open
    assert(h10.getAs[Double]("close") == 20.0)  // last minute's close
    assert(h10.getAs[Double]("high") == 50.0)
    assert(h10.getAs[Double]("low") == 10.0)
    assert(h10.getAs[Double]("volume") == 4.0)
    assert(h10.getAs[Long]("trades") == 3L)
    // vwap = (10*1 + 50*2 + 20*1) / 4 = 32.5 (single-trade bars: vwap=price)
    assert(h10.getAs[Double]("vwap") == 32.5)
  }

  test("gap filling: dense grid, forward-filled close, zeroed volume") {
    val bars = Gold.bars(Seq(
      trade("BTC", "2024-01-01 10:00:10", 10.0),
      trade("BTC", "2024-01-01 10:03:20", 40.0)).toDS.toDF)
    val filled = Analytics.fillGaps(bars).orderBy("bar_start").collect()
    assert(filled.length == 4) // 10:00 .. 10:03
    assert(filled.map(_.getAs[Boolean]("is_real")).toSeq ==
      Seq(true, false, false, true))
    assert(filled.map(_.getAs[Double]("close_ff")).toSeq ==
      Seq(10.0, 10.0, 10.0, 40.0))
    assert(filled.map(_.getAs[Double]("volume")).toSeq ==
      Seq(1.0, 0.0, 0.0, 1.0))
    assert(filled.map(_.getAs[Long]("trades")).toSeq == Seq(1L, 0L, 0L, 1L))
  }

  test("resampling the harness data conserves volume and trade counts") {
    val bars = Gold.bars(Trades.fromEvents(
      Tables.events(spark, "/root/testdata/sf0.001")))
    val hourly = Gold.resample(bars)
    val a = bars.agg(sum("trades"), round(sum("volume"), 6)).collect().head
    val b = hourly.agg(sum("trades"), round(sum("volume"), 6)).collect().head
    assert(a == b)
  }
}
