package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic events→trades mapping (SURVEY §7.2 `Gen`).
  *
  * The reference ingests live Kraken trades (reference
  * ingestion/kraken_trades_ws.py:96-106 — wire JSON {exchange, symbol,
  * price, size, side, order_type, ts_event, ts_ingest}). The harness has no
  * live feed, so every trade-shaped query derives its input from the
  * driver-generated `events` table through this single, purely-columnar
  * mapping (FIXTURES.md §A): ts→event_time, user_id→symbol surrogate,
  * value→price, plus deterministic size/side/order_type from event_id.
  *
  * Every expression here is IEEE-deterministic and reproducible in ANSI SQL
  * (see SparkEntry.tradesCte) so DuckDB-oracle comparisons are exact:
  * no aggregation, no floating-point whose result could depend on row order.
  *
  * Scale note: narrow projection over the scan — no shuffle, no UDF, fully
  * whole-stage-codegen'd; at 100 TB this is a map-only stage that fuses into
  * whatever consumes it.
  */
object Trades {

  /** events(event_id, ts, user_id, event_type, value, props) → trade rows.
    * Keeps `event_id` (unique, monotone) as a deterministic tie-break /
    * sort key for oracle comparisons.
    */
  def fromEvents(events: DataFrame): DataFrame = events.select(
    col("event_id"),
    lit("kraken").as("exchange"),
    concat(lit("SYM_"), col("user_id").cast("string")).as("symbol"),
    col("ts").as("event_time"),
    col("value").as("price"),
    // 1.00 .. 1.99, exact two-decimal doubles; x/100.0 is a single IEEE op
    (lit(1.0) + (col("event_id") % 100).cast("double") / lit(100.0)).as("size"),
    when(col("event_id") % 2 === 0, "buy").otherwise("sell").as("side"),
    when(col("event_id") % 3 === 0, "market").otherwise("limit").as("order_type"),
    to_date(col("ts")).as("event_date")
  )

  /** The same mapping as ANSI SQL (DuckDB oracle), as a CTE body over the
    * harness `events` table. Literals are cast to DOUBLE explicitly because
    * DuckDB parses bare decimals as DECIMAL, not DOUBLE.
    */
  val sqlCte: String =
    """SELECT event_id,
      |  'kraken' AS exchange,
      |  'SYM_' || CAST(user_id AS VARCHAR) AS symbol,
      |  CAST(ts AS TIMESTAMP) AS event_time,
      |  value AS price,
      |  CAST(1 AS DOUBLE) + CAST(event_id % 100 AS DOUBLE) / CAST(100 AS DOUBLE) AS size,
      |  CASE WHEN event_id % 2 = 0 THEN 'buy' ELSE 'sell' END AS side,
      |  CASE WHEN event_id % 3 = 0 THEN 'market' ELSE 'limit' END AS order_type,
      |  CAST(ts AS DATE) AS event_date
      |FROM events""".stripMargin
}
