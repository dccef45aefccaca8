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


  test("partSimilarity: perfectly co-purchased parts read cosine 1 " +
      "at rank 1; counts and rank order are exact") {
    import graft.operators.Relational
    import spark.implicits._
    // parts 1 and 2 appear together in all 4 orders; part 3 joins
    // order 1 only -> cos(1,2) = 1.0, cos(1,3) = 1/sqrt(4*1) = 0.5
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L),
      (13L, 1L), (13L, 2L)
    ).toDF("l_orderkey", "l_partkey")
    val r = Relational.partSimilarity(li).collect()
    val p1 = r.filter(_.getLong(0) == 1L)
    assert(p1.map(x => (x.getAs[Int]("rank"),
      x.getAs[Long]("other_part"),
      x.getAs[Double]("cosine"),
      x.getAs[Long]("n_co"))).toSeq ==
      Seq((1, 2L, 1.0, 4L), (2, 3L, 0.5, 1L)))
    assert(Relational.partSimilarity(li).collect().toSeq == r.toSeq)
  }
}
