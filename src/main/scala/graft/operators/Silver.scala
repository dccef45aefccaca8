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

  /** Reject-channel audit: classify every bronze row by the FIRST parse
    * defect (or 'ok') — the dead-letter gate a lakehouse runs beside
    * the silver hop so malformed wire data is counted and quarantined,
    * never silently dropped. Malformed JSON is detected via a
    * corrupt-record column (see inline note); absent/mistyped keys
    * surface as NULL fields; the classification cascades in severity
    * order so each row lands in exactly one bucket. Map-only over the
    * scan; the aggregate carries one row per reason.
    */
  val RejectReasons: Seq[String] =
    Seq("malformed_json", "missing_symbol", "missing_event_time",
      "bad_price", "bad_size", "ok")
  def rejectAudit(bronze: DataFrame): DataFrame = {
    // PERMISSIVE from_json yields a struct of NULL fields for broken
    // JSON (not a null struct), so malformed rows are detected the
    // idiomatic way: a corrupt-record column in the parse schema, which
    // Spark populates with the raw text exactly when parsing failed.
    val auditSchema = payloadSchema.add(StructField("_corrupt", StringType))
    val p = from_json(col("value_raw"), auditSchema,
      Map("columnNameOfCorruptRecord" -> "_corrupt"))
    val reason =
      when(p.getField("_corrupt").isNotNull, "malformed_json")
        .when(p.getField("symbol").isNull, "missing_symbol")
        .when(p.getField("ts_event").isNull, "missing_event_time")
        .when(p.getField("price").isNull || p.getField("price") <= 0,
          "bad_price")
        .when(p.getField("size").isNull || p.getField("size") <= 0,
          "bad_size")
        .otherwise("ok")
    // left-join a literal reason table so every bucket reports (zero
    // counts included) — the audit schema is stable run to run
    val counts = bronze.select(reason.as("reason"))
      .groupBy(col("reason")).agg(count(lit(1)).as("n"))
    import org.apache.spark.sql.SparkSession
    val spark = SparkSession.active
    import spark.implicits._
    RejectReasons.zipWithIndex.map { case (r, i) => (r, i) }
      .toDF("reason", "severity")
      .join(counts, Seq("reason"), "left")
      .select(col("severity"), col("reason"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("severity"))
  }
}
