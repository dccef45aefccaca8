package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** General relational query shapes over the TPC-H-ish harness tables —
  * the batch-analytics capability surface the reference exercises in its
  * notebooks (scans, filters, multi-way joins, grouped aggregation, top-K;
  * reference notebooks/analysis.ipynb, notebooks/read_data.ipynb).
  *
  * Determinism: all double sums go through exact Decimal accumulation
  * (associative ⇒ shuffle-order independent) and are cast back to double at
  * the output boundary; averages are double divisions of those exact sums.
  *
  * Scale notes per query are on each method.
  */
object Relational {

  // Exact-decimal money arithmetic: prices/discounts/taxes are 2-decimal
  // quantities, so casting each INPUT to decimal (not the double product —
  // Spark's double→decimal cast goes through the shortest string repr and
  // drifts an ulp from DuckDB's) makes every product/sum exact rational
  // arithmetic: identical on any engine at any parallelism.
  /** sum(extendedprice × (1 − discount)) — the standard revenue measure,
    * exact decimal accumulation cast to double at the boundary (shared
    * with the salted-join parity query in SparkEntry).
    */
  def revenueAgg: org.apache.spark.sql.Column =
    sum(extD * oneMinusDisc).cast("double")

  private def extD  = col("l_extendedprice").cast(DecimalType(12, 2))
  private def oneMinusDisc = lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(4, 2))
  private def onePlusTax   = lit(1).cast(DecimalType(3, 2)) + col("l_tax").cast(DecimalType(4, 2))

  /** Pricing summary (TPC-H Q1 shape): scan-heavy single aggregation.
    * Scale: predicate + column pruning push to parquet; partial aggregation
    * means the shuffle carries only |returnflag×linestatus| ≈ 6 groups per
    * map task. The canonical "is the scan path fast" benchmark.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(20, 6))).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(24, 6))).cast("double").as("sum_base_price"),
        sum(extD * oneMinusDisc).cast("double").as("sum_disc_price"),
        sum(extD * oneMinusDisc * onePlusTax).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order").cast("double"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order").cast("double"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Revenue top-K (TPC-H Q3 shape): selective dim filter → 3-way join →
    * agg → top-K. Scale: customer filter prunes early; orders⋈lineitem is
    * the big shuffle join on l_orderkey (co-partitioned by key at scale via
    * bucketing); the filtered customer side is broadcast — no shuffle of
    * the fact table for it. Top-K plans as TakeOrderedAndProject (no global
    * sort).
    */
  def revenueTopK(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                  segment: String = "BUILDING", k: Int = 20): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === segment)
      .select("c_custkey")
    val ord = orders.filter(col("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    ord
      // customer is SF-proportional — no forced broadcast; AQE
      // broadcasts the segment-filtered single-column projection while
      // it fits and degrades to a shuffle join when it doesn't
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(extD * oneMinusDisc).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(k)
  }

  /** Star-join rollup: fact ⋈ 3 broadcast dims, grouped two ways.
    * Scale: every dim is broadcast (nation/region/customer are tiny
    * relative to orders at any SF) so the fact table never shuffles for the
    * joins — only the final group-by shuffles, carrying pre-aggregated
    * partial rows.
    */
  def regionRevenue(orders: DataFrame, customer: DataFrame,
                    nation: DataFrame, region: DataFrame): DataFrame =
    orders
      // nation/region are constant-size (hinted); customer grows with
      // SF, so its broadcast is AQE's call, not a hint
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(col("o_totalprice").cast(DecimalType(24, 6))).cast("double").as("total_revenue"),
        count(lit(1)).as("order_count"))
      .orderBy(col("r_name"), col("n_name"))

  /** Hierarchical rollup (region → nation → grand total): multi-level
    * aggregates in ONE pass — Catalyst expands the grouping sets and
    * still plans a single partial+final hash aggregation, versus three
    * separate scans.
    */
  def regionRevenueRollup(orders: DataFrame, customer: DataFrame,
                          nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        sum(col("o_totalprice").cast(DecimalType(24, 6))).cast("double").as("total_revenue"),
        count(lit(1)).as("order_count"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  /** Pivot (orderstatus × orderpriority counts): fixed pivot values so
    * the plan needs no extra distinct-values job; a single aggregation.
    */
  def orderStatusPivot(orders: DataFrame): DataFrame = {
    val statuses = Seq("F", "O", "P")
    orders
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", statuses)
      .agg(count(lit(1)))
      .na.fill(0L, statuses)
      .withColumnsRenamed(statuses.map(s => s -> s"n_$s").toMap)
      .orderBy(col("o_orderpriority"))
  }

  /** Small-quantity revenue (TPC-H Q17 shape): lineitems whose quantity
    * is below 20% of their part's average quantity, revenue grouped by
    * brand — the correlated-aggregate pattern (per-key average joined
    * back to the fact table). Scale: the per-part average is ONE
    * aggregation shuffle on l_partkey and the join back is on the same
    * key, so Exchange reuse co-partitions them (no second fact shuffle);
    * the part dimension is broadcast. Determinism: the average is an
    * exact decimal sum divided by a count — identical operands in any
    * engine at any parallelism — and the 0.2× threshold compare happens
    * on those bit-identical doubles.
    */
  def smallQtyRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val avgQty = lineitem.groupBy(col("l_partkey")).agg(
      (sum(col("l_quantity").cast(DecimalType(20, 6))).cast("double")
        / count(lit(1)).cast("double")).as("avg_qty"))
    lineitem
      .join(avgQty, Seq("l_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      // no forced broadcast: part is a data-scale table (SF-proportional),
      // so the hint would overflow the broadcast limit on a real corpus —
      // AQE broadcasts the 2-column projection when it actually fits
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(24, 6))).cast("double")
          .as("small_qty_revenue"),
        count(lit(1)).as("n_small"))
      .orderBy(col("p_brand"))
  }

  /** Local-supplier volume (TPC-H Q5 shape): the 6-way join — fact
    * (lineitem) ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region, with
    * the correlation predicate c_nationkey = s_nationkey (both ends of
    * the trade in the same nation). Scale: region/nation broadcast;
    * customer and supplier broadcast after the region filter prunes
    * them; the only big shuffles are orders⋈lineitem on orderkey. The
    * nationkey equality is a residual on the supplier broadcast join,
    * not an extra shuffle.
    */
  def localSupplierVolume(lineitem: DataFrame, orders: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          nation: DataFrame, region: DataFrame,
                          regionName: String = "ASIA"): DataFrame = {
    // nation⋈region is genuinely constant-size (≤25 rows) — broadcast
    // hint is safe at any SF. customer/supplier are data-scale tables:
    // no forced broadcast (the region filter keeps ~1/5 of them, which
    // still grows with SF); AQE broadcasts the pruned projections when
    // they actually fit, and falls back to shuffle joins when not.
    val nr = nation.join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = customer.join(broadcast(nr),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = supplier.join(broadcast(nr),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    lineitem
      .join(orders.filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(revenueAgg.as("revenue"), count(lit(1)).as("n_lineitems"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Disjunctive-predicate revenue (TPC-H Q19 shape): an OR of three
    * (brand × size-range × quantity-band) conjunctions across the
    * lineitem⋈part join. Scale: the common subexpressions push to the
    * scans — part prunes on the brand IN list, lineitem on the overall
    * quantity envelope — and the disjunction evaluates as a residual on
    * the broadcast join, not three separate scans unioned.
    */
  def disjunctiveRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val j = lineitem.join(broadcast(
        part.select(col("p_partkey"), col("p_brand"), col("p_size"))),
      col("l_partkey") === col("p_partkey"))
    val pred =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 40)) ||
      (col("p_brand") === "Brand#5" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20, 60))
    j.filter(pred)
      .agg(revenueAgg.as("revenue"), count(lit(1)).as("n_lineitems"))
  }

  /** EXISTS-style semi join (TPC-H Q4 shape): orders with ≥1 returned
    * lineitem, counted by priority. LEFT SEMI keeps the orders side
    * unduplicated without a distinct — the probe side is reduced to its
    * join key before the join, so the shuffle carries one column.
    */
  def returnedOrdersByPriority(orders: DataFrame,
                               lineitem: DataFrame): DataFrame =
    orders.join(
        lineitem.filter(col("l_returnflag") === "R").select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
}
