package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Semantics of the relational suite's derived inputs and exactness
  * preconditions (the TPC-H shapes themselves are oracle-verified
  * query-by-query; these pin the assumptions the oracles rely on).
  */
class RelationalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("derivedPartSupp: unique composite key, in-range suppliers, deterministic") {
    val part = Tables.part(spark, dir)
    val supplier = Tables.supplier(spark, dir)
    val ps = Relational.derivedPartSupp(part, supplier)
    val n = ps.count()
    assert(n == part.count() * 4)
    assert(ps.select("ps_partkey", "ps_suppkey").distinct().count() == n)
    val nSupp = supplier.count()
    val bad = ps.filter(col("ps_suppkey") < 0 ||
      col("ps_suppkey") >= nSupp ||
      col("ps_availqty") < 1 || col("ps_availqty") > 9999 ||
      col("ps_supplycost_cents") < 1000 ||
      col("ps_supplycost_cents") > 9999).count()
    assert(bad == 0)
    // content-deterministic: two independent builds are identical
    val again = Relational.derivedPartSupp(part, supplier)
    assert(ps.exceptAll(again).isEmpty && again.exceptAll(ps).isEmpty)
  }

  test("l_quantity is integral — the precondition for exact cents x qty profit (Q9)") {
    val li = Tables.lineitem(spark, dir)
    assert(li.filter(col("l_quantity") =!= floor(col("l_quantity")))
      .count() == 0)
  }

  test("q15 returns the maximum-revenue supplier(s), never empty") {
    val r = Relational.topSupplier(Tables.supplier(spark, dir),
      Tables.lineitem(spark, dir)).collect()
    assert(r.nonEmpty)
    assert(r.map(_.getAs[Double]("total_revenue")).distinct.length == 1)
  }
}
