package graft

import org.apache.spark.sql.functions._

import graft.operators.Privacy

/** k-anonymity audit and the seeded-Laplace DP release mechanism. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("k-anonymity: crafted group sizes land in the right buckets") {
    // groups: a->1 row, b->2 rows, c->5 rows, d->12 rows
    val rows = Seq.fill(1)("a") ++ Seq.fill(2)("b") ++
      Seq.fill(5)("c") ++ Seq.fill(12)("d")
    val rep = Privacy.kAnonymityAudit(rows.toDF("q"), Seq(col("q")))
      .collect().map(r => r.getAs[Int]("k_threshold") ->
        ((r.getAs[Long]("n_groups_below"), r.getAs[Long]("n_rows_below")))).toMap
    assert(rep(2) == ((1L, 1L)))   // only the singleton
    assert(rep(5) == ((2L, 3L)))   // sizes 1 and 2
    assert(rep(10) == ((3L, 8L)))  // sizes 1, 2, 5
  }

  test("audit totals are threshold-independent") {
    val rows = (1 to 100).map(i => s"g${i % 7}")
    val rep = Privacy.kAnonymityAudit(rows.toDF("q"), Seq(col("q"))).collect()
    assert(rep.map(_.getAs[Long]("n_rows")).distinct.toSeq == Seq(100L))
    assert(rep.map(_.getAs[Long]("n_groups")).distinct.toSeq == Seq(7L))
  }

  test("seeded laplace noise: zero-mean-ish, scale ~1/eps, deterministic") {
    val df = (1 to 2000).map(i => s"k$i").toDF("g")
    val noised = df.select(
      Privacy.laplaceNoise(col("g"), eps = 1.0).as("n1"),
      Privacy.laplaceNoise(col("g"), eps = 2.0).as("n2"))
    val r = noised.agg(
      avg(col("n1")).as("m1"), avg(abs(col("n1"))).as("a1"),
      avg(abs(col("n2"))).as("a2")).collect().head
    // Laplace(1/eps): E|X| = 1/eps
    assert(math.abs(r.getAs[Double]("m1")) < 0.15, s"mean ${r.get(0)}")
    assert(math.abs(r.getAs[Double]("a1") - 1.0) < 0.15, s"E|X| ${r.get(1)}")
    assert(math.abs(r.getAs[Double]("a2") - 0.5) < 0.1, s"E|X| ${r.get(2)}")
  }

  test("dp release is replayable, non-negative, and count-preserving in expectation") {
    val ev = (1 to 500).map(i => (s"t${i % 5}", s"d${i % 3}")).toDF("t", "d")
    val rel1 = Privacy.dpCountRelease(ev, Seq("t", "d"), 1.0, "s_").collect()
    val rel2 = Privacy.dpCountRelease(ev, Seq("t", "d"), 1.0, "s_").collect()
    assert(rel1.map(_.toString).toSeq == rel2.map(_.toString).toSeq)
    assert(rel1.forall(_.getAs[Double]("n_released") >= 0.0))
    // a different salt is a different release
    val rel3 = Privacy.dpCountRelease(ev, Seq("t", "d"), 1.0, "z_").collect()
    assert(rel1.map(_.getAs[Double]("n_released")).toSeq !=
      rel3.map(_.getAs[Double]("n_released")).toSeq)
  }
}
