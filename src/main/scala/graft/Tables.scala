package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * Paths are the catalog, exactly like the reference lakehouse
  * (reference README.md:82-85 — env-var paths, no metastore). At 100 TB
  * these would be partitioned directory trees; here each table is a single
  * parquet file per scale factor. All reads go through `spark.read.parquet`
  * so Catalyst gets column pruning + predicate pushdown for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped as three different physical types across
    * harness generations, so the loader normalizes by INSPECTING the
    * footer schema instead of assuming one:
    *   - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it;
    *     read as a raw ns-epoch long (`legacy.parquet.nanosAsLong`,
    *     runtime-settable) and floor-divide to µs — the same truncation
    *     DuckDB applies narrowing ns→µs on read. Integer `div`, not `/`:
    *     ns epochs (~1.7e18) exceed double's 2^53 exact-integer range.
    *   - TIMESTAMP_NTZ (µs, no zone — pandas/pyarrow default): reinterpret
    *     the wall-clock as UTC. All sessions here pin
    *     `spark.sql.session.timeZone=UTC`, so the NTZ→TZ cast is the
    *     identity on the µs value, matching DuckDB's zone-less TIMESTAMP.
    *   - TIMESTAMP: already the canonical type; pass through.
    * Every downstream consumer (and the DuckDB oracles, via
    * `CAST(ts AS TIMESTAMP)`) sees identical µs UTC instants regardless
    * of which generation is on disk.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    val ts = raw.schema("ts").dataType match {
      case LongType         => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts").cast("timestamp")
      case _                => col("ts")
    }
    raw.withColumn("ts", ts)
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
