package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Symbols
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query here is a pure function (SparkSession, sfDir) => DataFrame
  * over the harness tables, paired (where ANSI-SQL-expressible) with a
  * DuckDB oracle in [[oracleSql]]. Column names and row order match the
  * oracle exactly; every query ends in a deterministic ORDER BY on a key
  * that is unique within the result.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    goldBars(spark, "/root/testdata/sf0.001")

  private def goldBars(s: SparkSession, dir: String): DataFrame =
    Gold.bars(Trades.fromEvents(Tables.events(s, dir)))
      .orderBy(col("symbol"), col("bar_start"))

  /** Six exchange-style pair symbols derived deterministically from
    * user_id — exercises every branch of Symbols (slash, dash, suffix,
    * alias). Shared by the query and (as a CASE chain) the oracle.
    */
  private val testSymbols =
    Seq("XBT/USDT", "ETH-USD", "SOLUSDT", "XDGEUR", "ADA/BTC", "BTCUSDC")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gold_bars_1m" -> ((s, dir) => goldBars(s, dir)),
    "q1_pricing_summary" -> ((s, dir) =>
      Relational.pricingSummary(Tables.lineitem(s, dir))),
    "q3_revenue_topk" -> ((s, dir) =>
      Relational.revenueTopK(Tables.customer(s, dir), Tables.orders(s, dir),
        Tables.lineitem(s, dir))),
    "region_revenue" -> ((s, dir) =>
      Relational.regionRevenue(Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.nation(s, dir), Tables.region(s, dir))),

    // Bronze audit projection (P1/P2): Kafka-shaped frame → raw audit rows.
    "bronze_audit" -> ((s, dir) =>
      Bronze.fromKafkaLike(Bronze.kafkaShapedFromEvents(Tables.events(s, dir)))
        .orderBy(col("offset"))),

    // Silver parse (P3/P4/P5): wire JSON → from_json → typed columns.
    "silver_parse" -> ((s, dir) =>
      Silver.projectToSilver(
        Bronze.fromKafkaLike(Bronze.kafkaWireFromEvents(Tables.events(s, dir))))
        .select("offset", "exchange", "symbol", "side", "order_type",
          "price", "size", "event_time", "ingest_time", "event_date")
        .orderBy(col("offset"))),

    // Exact dedup (A7) + union: duplicate every trade, dedup back down.
    "silver_dedup" -> ((s, dir) => {
      val t = Trades.fromEvents(Tables.events(s, dir))
        .select("symbol", "event_time", "price", "size", "side")
      Silver.dedup(t.union(t))
        .orderBy(col("symbol"), col("event_time"), col("price"),
          col("size"), col("side"))
    }),

    // Symbol normalization (P16): every splitting style + alias mapping.
    "symbol_normalize" -> ((s, dir) => {
      val pick = element_at(
        array(testSymbols.map(lit): _*), (col("user_id") % 6).cast("int") + 1)
      Tables.events(s, dir)
        .select(pick.as("symbol")).distinct()
        .select(col("symbol"),
          Symbols.baseCol(col("symbol")).as("base"),
          Symbols.quoteCol(col("symbol")).as("quote"),
          Symbols.normalizeCol(col("symbol")).as("normalized"))
        .orderBy(col("symbol"))
    }),

    // Full analytics frame (W1-W7, P7-P15): returns, rolling z, gaps,
    // anomalies in one window pass.
    "bar_analytics" -> ((s, dir) =>
      Analytics.enrich(Gold.bars(Trades.fromEvents(Tables.events(s, dir))))
        .orderBy(col("symbol"), col("bar_start"))),

    // Join-stitch variant (J1): same analytics via 3 chained left joins.
    "bar_analytics_joined" -> ((s, dir) =>
      Analytics.enrichViaJoins(Gold.bars(Trades.fromEvents(Tables.events(s, dir))))
        .select("symbol", "bar_start", "prev_close", "ret", "logret",
          "ret_mu", "ret_sd", "z_ret", "vol_mu", "vol_sd", "z_vol",
          "next_open", "gap_pct", "is_return_anom", "is_volume_anom")
        .orderBy(col("symbol"), col("bar_start"))),

    // Top-K then re-sort (O1/O2): last 180 bars of one symbol, time order.
    "bars_last_k" -> ((s, dir) =>
      Analytics.lastK(
        Gold.bars(Trades.fromEvents(Tables.events(s, dir)))
          .filter(col("symbol") === "SYM_7"), 180)),
  )

  /** Shared oracle CTE: the deterministic events→trades mapping. */
  private val tradesCte = s"WITH trades AS (\n${Trades.sqlCte}\n)"

  /** Shared oracle CTE chain: trades → 1-minute OHLCV bars (mirrors
    * Gold.bars; struct-min/max argmin via row_number over (ts, price)).
    */
  private val barsCte =
    s"""$tradesCte,
       |t2 AS (
       |  SELECT *, time_bucket(INTERVAL 1 MINUTE, event_time) AS bs,
       |    row_number() OVER (PARTITION BY symbol, time_bucket(INTERVAL 1 MINUTE, event_time)
       |                       ORDER BY event_time, price) AS rn_a,
       |    row_number() OVER (PARTITION BY symbol, time_bucket(INTERVAL 1 MINUTE, event_time)
       |                       ORDER BY event_time DESC, price DESC) AS rn_d
       |  FROM trades),
       |bars AS (
       |  SELECT symbol, bs AS bar_start, bs + INTERVAL 1 MINUTE AS bar_end,
       |    max(CASE WHEN rn_a = 1 THEN price END) AS open,
       |    max(price) AS high, min(price) AS low,
       |    max(CASE WHEN rn_d = 1 THEN price END) AS close,
       |    CAST(SUM(CAST(size AS DECIMAL(20,6))) AS DOUBLE) AS volume,
       |    CAST(SUM(CAST(price * size AS DECIMAL(28,10))) AS DOUBLE)
       |      / CAST(SUM(CAST(size AS DECIMAL(20,6))) AS DOUBLE) AS vwap,
       |    count(*) AS trades,
       |    CAST(bs AS DATE) AS bar_date
       |  FROM t2 GROUP BY symbol, bs)""".stripMargin

  /** Shared oracle CTE chain: bars → full analytics frame (mirrors
    * Analytics.enrich — lag/lead, trailing-30-min RANGE stats excluding the
    * current row, guarded z-scores, anomaly flags; every window aggregate
    * rounded to 6 decimals exactly as the engine does).
    */
  private val analyticsCte =
    s"""$barsCte,
       |b2 AS (SELECT *, CAST(floor(epoch(bar_start)) AS BIGINT) AS ts_s FROM bars),
       |b3 AS (SELECT *,
       |  lag(close, 1) OVER (PARTITION BY symbol ORDER BY ts_s) AS prev_close,
       |  lead(open, 1) OVER (PARTITION BY symbol ORDER BY ts_s) AS next_open
       |  FROM b2),
       |b4 AS (SELECT *,
       |  CASE WHEN prev_close IS NOT NULL AND prev_close <> 0 THEN close / prev_close - 1 END AS ret,
       |  CASE WHEN prev_close IS NOT NULL AND prev_close > 0 THEN round(ln(close / prev_close), 6) END AS logret
       |  FROM b3),
       |b5 AS (SELECT *,
       |  round(avg(logret) OVER wr, 6) AS ret_mu,
       |  round(stddev_samp(logret) OVER wr, 6) AS ret_sd,
       |  round(avg(volume) OVER wr, 6) AS vol_mu,
       |  round(stddev_samp(volume) OVER wr, 6) AS vol_sd
       |  FROM b4
       |  WINDOW wr AS (PARTITION BY symbol ORDER BY ts_s RANGE BETWEEN 1800 PRECEDING AND 1 PRECEDING)),
       |b6 AS (SELECT *,
       |  CASE WHEN ret_sd IS NOT NULL AND ret_sd > 1e-12 THEN round((logret - ret_mu) / ret_sd, 6) END AS z_ret,
       |  CASE WHEN vol_sd IS NOT NULL AND vol_sd > 1e-12 THEN round((volume - vol_mu) / vol_sd, 6) END AS z_vol,
       |  CASE WHEN next_open IS NOT NULL AND close <> 0 THEN (next_open - close) / close END AS gap_pct
       |  FROM b5),
       |anom AS (SELECT *,
       |  (z_ret IS NOT NULL AND abs(z_ret) > 3.0) AS is_return_anom,
       |  (z_vol IS NOT NULL AND z_vol > 3.0) AS is_volume_anom
       |  FROM b6)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "gold_bars_1m" ->
      s"""$barsCte
         |SELECT * FROM bars ORDER BY symbol, bar_start""".stripMargin,

    "bronze_audit" ->
      """SELECT 'crypto.trades' AS topic,
        |  CAST(user_id % 4 AS INT) AS "partition",
        |  event_id AS "offset",
        |  CAST(ts AS TIMESTAMP) AS ts_kafka,
        |  0 AS ts_type,
        |  'SYM_' || CAST(user_id AS VARCHAR) AS key,
        |  props AS value_raw
        |FROM events ORDER BY "offset"""".stripMargin,

    "silver_parse" ->
      """WITH e AS (SELECT *, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events)
        |SELECT event_id AS "offset", 'kraken' AS exchange,
        |  'SYM_' || CAST(user_id AS VARCHAR) AS symbol,
        |  CASE WHEN event_id % 2 = 0 THEN 'buy' ELSE 'sell' END AS side,
        |  CASE WHEN event_id % 3 = 0 THEN 'market' ELSE 'limit' END AS order_type,
        |  value AS price,
        |  CAST(1 AS DOUBLE) + CAST(event_id % 100 AS DOUBLE) / CAST(100 AS DOUBLE) AS size,
        |  make_timestamp(ms * 1000) AS event_time,
        |  make_timestamp((ms + event_id % 500) * 1000) AS ingest_time,
        |  CAST(make_timestamp(ms * 1000) AS DATE) AS event_date
        |FROM e ORDER BY "offset"""".stripMargin,

    "silver_dedup" ->
      s"""$tradesCte
         |SELECT DISTINCT symbol, event_time, price, size, side
         |FROM trades
         |ORDER BY symbol, event_time, price, size, side""".stripMargin,

    "symbol_normalize" ->
      """WITH s AS (SELECT DISTINCT CASE CAST(user_id % 6 AS INT)
        |    WHEN 0 THEN 'XBT/USDT' WHEN 1 THEN 'ETH-USD' WHEN 2 THEN 'SOLUSDT'
        |    WHEN 3 THEN 'XDGEUR' WHEN 4 THEN 'ADA/BTC' ELSE 'BTCUSDC' END AS symbol
        |  FROM events)
        |SELECT symbol,
        |  CASE symbol WHEN 'XBT/USDT' THEN 'XBT' WHEN 'ETH-USD' THEN 'ETH'
        |    WHEN 'SOLUSDT' THEN 'SOL' WHEN 'XDGEUR' THEN 'XDG'
        |    WHEN 'ADA/BTC' THEN 'ADA' ELSE 'BTC' END AS base,
        |  CASE symbol WHEN 'XBT/USDT' THEN 'USDT' WHEN 'ETH-USD' THEN 'USD'
        |    WHEN 'SOLUSDT' THEN 'USDT' WHEN 'XDGEUR' THEN 'EUR'
        |    WHEN 'ADA/BTC' THEN 'BTC' ELSE 'USDC' END AS quote,
        |  CASE symbol WHEN 'XBT/USDT' THEN 'BTC_USDT' WHEN 'ETH-USD' THEN 'ETH_USD'
        |    WHEN 'SOLUSDT' THEN 'SOL_USDT' WHEN 'XDGEUR' THEN 'DOGE_EUR'
        |    WHEN 'ADA/BTC' THEN 'ADA_BTC' ELSE 'BTC_USDC' END AS normalized
        |FROM s ORDER BY symbol""".stripMargin,

    "bar_analytics" ->
      s"""$analyticsCte
         |SELECT * FROM anom ORDER BY symbol, bar_start""".stripMargin,

    "bar_analytics_joined" ->
      s"""$analyticsCte
         |SELECT symbol, bar_start, prev_close, ret, logret, ret_mu, ret_sd,
         |  z_ret, vol_mu, vol_sd, z_vol, next_open, gap_pct,
         |  is_return_anom, is_volume_anom
         |FROM anom ORDER BY symbol, bar_start""".stripMargin,

    "bars_last_k" ->
      s"""$barsCte,
         |r AS (SELECT * FROM bars WHERE symbol = 'SYM_7'
         |      ORDER BY bar_start DESC LIMIT 180)
         |SELECT * FROM r ORDER BY bar_start""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  count(*) AS count_order,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_revenue_topk" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "region_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS total_revenue,
        |  count(*) AS order_count
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
  )
}
