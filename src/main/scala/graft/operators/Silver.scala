package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Silver tier: parse, type, event-time, dedup (reference
  * spark/jobs/bronze_to_silver_trades.py).
  *
  * - [[payloadSchema]] mirrors the declared wire schema (:41-50); every
  *   field nullable, and `from_json` stays PERMISSIVE so malformed Bronze
  *   rows become null-columned Silver rows, not errors (SURVEY §1.3).
  * - [[projectToSilver]] is the pure `DataFrame => DataFrame` used by both
  *   the batch backfill and the streaming hop, exactly like the
  *   reference's `project_to_silver` (:52 used at :82 and :100).
  * - ms-epoch → timestamp: the reference's double-division shape
  *   (`to_timestamp((ts/1000).cast("double"))`, :65-66) loses an ulp for
  *   some ms values (double can't represent ms/1000 exactly; Spark's
  *   double→timestamp cast truncates). We use `timestamp_millis` — the
  *   exact integer path — which implements the reference's OBSERVABLE
  *   semantic (ms precision preserved) without the drift, and is
  *   bit-reproducible against any oracle engine.
  * - [[dedup]] / streaming variant in graft.streaming: exact dedup on
  *   (symbol, event_time, price, size, side) (:82-84, README.md:122).
  *
  * Scale: the parse is a map-only stage. Dedup is the first shuffle of the
  * pipeline — it hash-partitions on the dedup keys; at 100 TB restrict the
  * batch variant per event_date partition (dedup keys include event_time,
  * so duplicates can only collide within a date) to keep shuffle width
  * bounded; the streaming variant bounds state by watermark instead.
  */
object Silver {

  val payloadSchema: StructType = StructType(Seq(
    StructField("exchange", StringType),
    StructField("symbol", StringType),
    StructField("price", DoubleType),
    StructField("size", DoubleType),
    StructField("side", StringType),
    StructField("order_type", StringType),
    StructField("ts_event", LongType),
    StructField("ts_ingest", LongType)))

  val dedupKeys: Seq[String] = Seq("symbol", "event_time", "price", "size", "side")

  /** bronze rows → silver rows: passthrough + parsed payload + event time.
    * (reference bronze_to_silver_trades.py:52-69)
    */
  def projectToSilver(bronze: DataFrame): DataFrame = {
    val p = from_json(col("value_raw"), payloadSchema)
    bronze.select(
      col("topic"), col("partition"), col("offset"), col("ts_kafka"),
      col("key"), col("value_raw"),
      p.getField("exchange").as("exchange"),
      p.getField("symbol").as("symbol"),
      p.getField("side").as("side"),
      p.getField("order_type").as("order_type"),
      p.getField("price").as("price"),
      p.getField("size").as("size"),
      timestamp_millis(p.getField("ts_event")).as("event_time"),
      timestamp_millis(p.getField("ts_ingest")).as("ingest_time"))
      .withColumn("event_date", to_date(col("event_time")))
  }

  /** Exact batch dedup keeping one arbitrary row per key
    * (reference bronze_to_silver_trades.py:82-84).
    */
  def dedup(silver: DataFrame): DataFrame = silver.dropDuplicates(dedupKeys)
}
