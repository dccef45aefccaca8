package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.types._

/** Declared StructTypes + case classes for the three lakehouse tiers
  * (reference bronze_to_silver_trades.py:30-50, silver_to_gold_bars.py:52-66).
  *
  * File-stream sources require explicit schemas (SURVEY §1.3); these are
  * the single source of truth. Every field nullable, matching the
  * reference's all-nullable declarations.
  */
object Schemas {

  /** The 7 standard Kafka source columns — what a real
    * `spark.readStream.format("kafka")` emits, and the schema of the
    * synthesized wire landing (streaming.Pipeline / TradeSource).
    */
  val kafka: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    StructField("key", BinaryType),
    StructField("value", BinaryType)))

  /** Kafka-frame metadata + raw value (bronze_schema, :30-38). */
  val bronze: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("ts_kafka", TimestampType),
    StructField("ts_type", IntegerType),
    StructField("key", StringType),
    StructField("value_raw", StringType)))

  /** Bronze passthrough + parsed payload + event time (:52-69). */
  val silver: StructType = StructType(
    bronze.fields.filterNot(_.name == "ts_type") ++ Seq(
      StructField("exchange", StringType),
      StructField("symbol", StringType),
      StructField("side", StringType),
      StructField("order_type", StringType),
      StructField("price", DoubleType),
      StructField("size", DoubleType),
      StructField("event_time", TimestampType),
      StructField("ingest_time", TimestampType),
      StructField("event_date", DateType)))

  /** OHLCV+VWAP bars (silver_to_gold_bars.py:52-66). */
  val goldBars: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("bar_start", TimestampType),
    StructField("bar_end", TimestampType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", DoubleType),
    StructField("vwap", DoubleType),
    StructField("trades", LongType),
    StructField("bar_date", DateType)))

  /** Typed trade row (wire payload shape + event time), for
    * Dataset[Trade] streaming tests and MemoryStream sources.
    */
  case class Trade(
      exchange: String,
      symbol: String,
      price: Double,
      size: Double,
      side: String,
      order_type: String,
      event_time: Timestamp)

  case class Bar(
      symbol: String,
      bar_start: Timestamp,
      bar_end: Timestamp,
      open: Double,
      high: Double,
      low: Double,
      close: Double,
      volume: Double,
      vwap: Double,
      trades: Long,
      bar_date: Date)
}
