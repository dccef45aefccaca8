package graft

/** Plan-shape assertions: the scale claims in SCALING.md, locked in as
  * tests so regressions surface as failures, not slow clusters.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q1: filter pushed to parquet, columns pruned, hash-aggregated") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("ReadSchema") && !p.contains("l_orderkey")) // pruned
    assert(p.contains("HashAggregate") && !p.contains("SortAggregate"))
  }

  test("gold bars: HashAggregate (ArgExtremum), pruned scan, no sort-agg") {
    val p = plan("gold_bars_1m")
    assert(p.contains("HashAggregate"))
    assert(!p.contains("SortAggregate"))
    // props (the widest events column) must not be read
    assert(!p.contains("props"))
  }

  test("star joins broadcast every dimension (fact never shuffles for joins)") {
    val p = plan("region_revenue")
    assert(p.split("\\(\\d+\\) BroadcastHashJoin").length - 1 == 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("top-K plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q3_revenue_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("bar analytics: all window families share ONE partition exchange") {
    val p = plan("bar_analytics")
    // exchanges: gold agg shuffle + one window shuffle + final orderBy
    val exchanges = p.split("\\(\\d+\\) Exchange").length - 1
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges:\n$p")
    assert(p.split("\\(\\d+\\) Window").length - 1 >= 4) // 4 window ops over 1 sort
  }

  test("ANN top-k: per-partition rank limit before the shuffle") {
    val p = plan("ann_topk")
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("BroadcastNestedLoopJoin")) // broadcast query side
  }
}
