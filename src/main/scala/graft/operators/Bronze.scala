package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bronze tier: raw Kafka-frame audit projection (reference
  * spark/jobs/kafka_to_bronze_trades.py:59-69).
  *
  * Semantics: keep Kafka metadata + the raw value bytes VERBATIM — no
  * parsing at this tier (reference README.md:121 "raw audit"). The only
  * transforms are renames (`timestamp→ts_kafka`, `timestampType→ts_type`)
  * and binary→utf8 casts for key/value.
  *
  * The offline harness has no Kafka connector jar, so sources synthesize a
  * Kafka-shaped frame (SURVEY §7.4): [[kafkaShapedFromEvents]] builds one
  * deterministically from the harness `events` table (offset = event_id,
  * ts_kafka = event ts, value_raw = the row's raw JSON `props` payload).
  * A real `spark.readStream.format("kafka")` source drops in unchanged —
  * [[fromKafkaLike]] only assumes the 7 standard Kafka columns.
  *
  * Scale: stateless narrow projection; fuses into the scan under
  * whole-stage codegen. At 100 TB this tier is write-bound, not
  * compute-bound — partition the sink by ingest date and size files via
  * `maxRecordsPerFile` so downstream listing stays O(days touched).
  */
object Bronze {

  /** Kafka frame → bronze rows (projection + casts only). */
  def fromKafkaLike(kafka: DataFrame): DataFrame = kafka.select(
    col("topic"),
    col("partition"),
    col("offset"),
    col("timestamp").as("ts_kafka"),
    col("timestampType").as("ts_type"),
    col("key").cast("string").as("key"),
    col("value").cast("string").as("value_raw"))

  /** Deterministic Kafka-shaped frame from the harness events table:
    * what the producer (reference ingestion/kraken_trades_ws.py:107-110 —
    * key = symbol, value = payload JSON) would have landed on the topic.
    * `value` carries the row's raw `props` payload verbatim — the audit
    * path never interprets it (reference README.md:121).
    */
  def kafkaShapedFromEvents(events: DataFrame): DataFrame = events.select(
    lit("crypto.trades").as("topic"),
    (col("user_id") % 4).cast("int").as("partition"),
    col("event_id").as("offset"),
    col("ts").as("timestamp"),
    lit(0).as("timestampType"),
    concat(lit("SYM_"), col("user_id").cast("string")).cast("binary").as("key"),
    col("props").cast("binary").as("value"))

  /** Kafka frame whose `value` is the reference's wire JSON
    * (ingestion/kraken_trades_ws.py:96-106: {exchange, symbol, price, size,
    * side, order_type, ts_event(ms), ts_ingest(ms)}), built deterministically
    * from the events→trades mapping. Feeds the Silver parse path end-to-end:
    * to_json here, from_json in Silver — double fields round-trip exactly
    * (shortest-repr printing on write, exact parse on read).
    */
  def kafkaWireFromEvents(events: DataFrame): DataFrame = {
    val t = Trades.fromEvents(events)
    val tsEvent = unix_millis(col("event_time"))
    t.select(
      lit("crypto.trades").as("topic"),
      (col("event_id") % 4).cast("int").as("partition"),
      col("event_id").as("offset"),
      col("event_time").as("timestamp"),
      lit(0).as("timestampType"),
      col("symbol").cast("binary").as("key"),
      to_json(struct(
        col("exchange"), col("symbol"), col("price"), col("size"),
        col("side"), col("order_type"),
        tsEvent.as("ts_event"),
        (tsEvent + col("event_id") % 500).as("ts_ingest"))).cast("binary").as("value"))
  }
}
