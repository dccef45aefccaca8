package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  )

  /** Shared oracle CTE: the deterministic events→trades mapping. */
  private val tradesCte = s"WITH trades AS (\n${Trades.sqlCte}\n)"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "gold_bars_1m" ->
      s"""$tradesCte,
         |t2 AS (
         |  SELECT *, time_bucket(INTERVAL 1 MINUTE, event_time) AS bs,
         |    row_number() OVER (PARTITION BY symbol, time_bucket(INTERVAL 1 MINUTE, event_time)
         |                       ORDER BY event_time, price) AS rn_a,
         |    row_number() OVER (PARTITION BY symbol, time_bucket(INTERVAL 1 MINUTE, event_time)
         |                       ORDER BY event_time DESC, price DESC) AS rn_d
         |  FROM trades)
         |SELECT symbol, bs AS bar_start, bs + INTERVAL 1 MINUTE AS bar_end,
         |  max(CASE WHEN rn_a = 1 THEN price END) AS open,
         |  max(price) AS high, min(price) AS low,
         |  max(CASE WHEN rn_d = 1 THEN price END) AS close,
         |  CAST(SUM(CAST(size AS DECIMAL(20,6))) AS DOUBLE) AS volume,
         |  CAST(SUM(CAST(price * size AS DECIMAL(28,10))) AS DOUBLE)
         |    / CAST(SUM(CAST(size AS DECIMAL(20,6))) AS DOUBLE) AS vwap,
         |  count(*) AS trades,
         |  CAST(bs AS DATE) AS bar_date
         |FROM t2 GROUP BY symbol, bs
         |ORDER BY symbol, bar_start""".stripMargin,

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
