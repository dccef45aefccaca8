package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col

/** Typed Dataset aggregation path (SURVEY §7.5): the same OHLCV bar
  * semantics as Gold.bars expressed through the `Aggregator[IN, BUF,
  * OUT]` API over `Dataset[TradeRow]` — the type-safe alternative for
  * users who want compile-time row types instead of Columns. Proven
  * row-identical to the untyped plan in GoldSpec.
  *
  * Exactness rules mirror the untyped path bit-for-bit:
  *  - volume/notional accumulate in exact scaled BigDecimals (HALF_UP to
  *    scale 6/10, matching Spark's double→decimal cast), summed in any
  *    order (decimal addition is associative), doubled only at finish;
  *  - open/close use the struct-min/max tie-break on (event-time µs,
  *    price) exactly like ArgExtremum.
  *
  * Scale: Aggregator compiles to a regular partial+final aggregation —
  * same shuffle as the untyped plan; the buffer is a flat product
  * encoder. (The untyped ArgExtremum path stays the default: typed
  * aggregation pays serialization in/out of the object row format.)
  */
object TypedBars {

  case class TradeRow(symbol: String, event_time: Timestamp, price: Double,
                      size: Double)

  case class BarKey(symbol: String, bar_start: Timestamp)

  case class BarBuf(oTs: Long, oPx: Double, cTs: Long, cPx: Double,
                    high: Double, low: Double,
                    vol: java.math.BigDecimal, notional: java.math.BigDecimal,
                    n: Long)

  case class BarOut(open: Double, high: Double, low: Double, close: Double,
                    volume: Double, vwap: Double, trades: Long)

  private def micros(ts: Timestamp): Long =
    (ts.getTime / 1000) * 1000000L + ts.getNanos / 1000

  private def dec(x: Double, scale: Int): java.math.BigDecimal =
    new java.math.BigDecimal(x).setScale(scale, java.math.RoundingMode.HALF_UP)

  val bars: Aggregator[TradeRow, BarBuf, BarOut] =
    new Aggregator[TradeRow, BarBuf, BarOut] {
      override def zero: BarBuf = BarBuf(Long.MaxValue, Double.MaxValue,
        Long.MinValue, Double.MinValue, Double.MinValue, Double.MaxValue,
        java.math.BigDecimal.ZERO, java.math.BigDecimal.ZERO, 0L)

      override def reduce(b: BarBuf, t: TradeRow): BarBuf = {
        val ts = micros(t.event_time)
        val openWins = ts < b.oTs || (ts == b.oTs && t.price < b.oPx)
        val closeWins = ts > b.cTs || (ts == b.cTs && t.price > b.cPx)
        BarBuf(
          if (openWins) ts else b.oTs, if (openWins) t.price else b.oPx,
          if (closeWins) ts else b.cTs, if (closeWins) t.price else b.cPx,
          math.max(b.high, t.price), math.min(b.low, t.price),
          b.vol.add(dec(t.size, 6)),
          b.notional.add(dec(t.price * t.size, 10)),
          b.n + 1)
      }

      override def merge(a: BarBuf, b: BarBuf): BarBuf = {
        val openWins = b.oTs < a.oTs || (b.oTs == a.oTs && b.oPx < a.oPx)
        val closeWins = b.cTs > a.cTs || (b.cTs == a.cTs && b.cPx > a.cPx)
        BarBuf(
          if (openWins) b.oTs else a.oTs, if (openWins) b.oPx else a.oPx,
          if (closeWins) b.cTs else a.cTs, if (closeWins) b.cPx else a.cPx,
          math.max(a.high, b.high), math.min(a.low, b.low),
          a.vol.add(b.vol), a.notional.add(b.notional), a.n + b.n)
      }

      override def finish(b: BarBuf): BarOut = {
        val vol = b.vol.doubleValue
        BarOut(b.oPx, b.high, b.low, b.cPx, vol,
          b.notional.doubleValue / vol, b.n)
      }

      override def bufferEncoder: Encoder[BarBuf] = Encoders.product[BarBuf]
      override def outputEncoder: Encoder[BarOut] = Encoders.product[BarOut]
    }

  /** Typed end-to-end: Dataset[TradeRow] → one bar row per
    * (symbol, minute), flattened to the Gold.bars column names.
    */
  def minuteBars(spark: SparkSession,
                 trades: Dataset[TradeRow]): Dataset[(BarKey, BarOut)] = {
    import spark.implicits._
    trades
      .groupByKey(t => BarKey(t.symbol,
        new Timestamp(t.event_time.getTime - t.event_time.getTime % 60000)))
      .agg(bars.toColumn)
  }

  /** Flat DataFrame view matching Gold.bars columns (for comparisons). */
  def minuteBarsDF(spark: SparkSession, trades: Dataset[TradeRow]) =
    minuteBars(spark, trades).toDF("key", "bar")
      .select(col("key.symbol").as("symbol"),
        col("key.bar_start").as("bar_start"),
        col("bar.open").as("open"), col("bar.high").as("high"),
        col("bar.low").as("low"), col("bar.close").as("close"),
        col("bar.volume").as("volume"), col("bar.vwap").as("vwap"),
        col("bar.trades").as("trades"))
}
