package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Silver

/** Source abstraction for the ingestion edge (SURVEY §7.4: "Kafka without
  * Kafka").
  *
  * The reference ingests from a Kafka topic (kafka_to_bronze_trades.py:
  * 46-56); this offline environment ships no kafka-sql connector jar, so
  * sources produce the same KAFKA-SHAPED frame (topic, partition, offset,
  * timestamp, timestampType, key, value) and Bronze.fromKafkaLike consumes
  * it unchanged. A real Kafka source is a drop-in:
  *
  * {{{
  * spark.readStream.format("kafka")
  *   .option("kafka.bootstrap.servers", brokers)
  *   .option("subscribe", "crypto.trades")
  *   .option("startingOffsets", "latest")      // or earliest for backfill
  *   .option("failOnDataLoss", "false")
  *   .option("maxOffsetsPerTrigger", n)        // backpressure (T6)
  *   .load()
  * }}}
  */
trait TradeSource {
  /** Streaming Kafka-shaped frame. */
  def stream(spark: SparkSession): DataFrame
  /** Batch Kafka-shaped frame (backfill / tests). */
  def batch(spark: SparkSession): DataFrame
}

/** JSON-lines directory of wire payloads (the exact producer output,
  * ingestion/kraken_trades_ws.py:96-106), one JSON object per line.
  * Kafka metadata is synthesized: offset = ingest-time ms (monotonic
  * surrogate that is also streaming-legal, unlike
  * monotonically_increasing_id), timestamp = ingest time, key = symbol.
  */
final class FileTradeSource(dir: String) extends TradeSource {

  private def kafkaShape(payload: DataFrame): DataFrame = payload.select(
    lit("crypto.trades").as("topic"),
    lit(0).as("partition"),
    col("ts_ingest").as("offset"),
    timestamp_millis(col("ts_ingest")).as("timestamp"),
    lit(0).as("timestampType"),
    col("symbol").cast("binary").as("key"),
    to_json(struct(col("exchange"), col("symbol"), col("price"),
      col("size"), col("side"), col("order_type"), col("ts_event"),
      col("ts_ingest"))).cast("binary").as("value"))

  override def stream(spark: SparkSession): DataFrame =
    kafkaShape(spark.readStream.schema(Silver.payloadSchema).json(dir))

  override def batch(spark: SparkSession): DataFrame =
    kafkaShape(spark.read.schema(Silver.payloadSchema).json(dir))
}
