package graft

import org.apache.spark.sql.functions._

import graft.operators.Coreset

/** k-center greedy coreset: the engine must reproduce the greedy
  * farthest-point recursion computed directly (same pinned integer
  * distances, same tie-breaks), the radius sequence must be
  * non-increasing (the coverage guarantee), the assignment must
  * partition the corpus, and the phased extend must keep the history
  * phase bit-identical to a history-only selection.
  */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  // 25 vectors in 3 angular clusters plus 2 outliers — enough
  // structure that the greedy's picks are non-trivial (outliers go
  // early) and ties are exercised (two exactly-duplicated vectors).
  private val vecs: Seq[(Long, Array[Float])] = {
    val ring = (0 until 21).map { i =>
      val ang = 2.0 * math.Pi * (i % 3) / 3.0 + 0.02 * (i / 3)
      (i.toLong, Array(math.cos(ang).toFloat, math.sin(ang).toFloat, 0.3f))
    }
    val outliers = Seq(
      (21L, Array(-0.1f, -0.1f, 5.0f)), (22L, Array(0.1f, -5.0f, 0.1f)))
    val dups = Seq( // exact duplicates of vec 0: dmin6 = 0 forever
      (23L, ring.head._2.clone()), (24L, ring.head._2.clone()))
    ring ++ outliers ++ dups
  }
  private val embeddings =
    vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")

  /** Direct greedy over driver-side doubles with the engine's exact
    * pinning (BigDecimal HALF_UP, the Spark `round` semantics) and
    * tie-breaks (max dmin6, then smaller id).
    */
  private def brute(ids: Seq[Long], k: Int): Seq[(Long, Option[Long])] = {
    val m = vecs.toMap.view.mapValues(_.map(_.toDouble)).toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val nrm = ids.map(i => i -> math.sqrt(dot(m(i), m(i)))).toMap
    def d6(a: Long, b: Long): Long =
      1000000L - BigDecimal(dot(m(a), m(b)) / (nrm(a) * nrm(b)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val seed = ids.min
    var dmin = ids.filter(_ != seed).map(i => i -> d6(i, seed)).toMap
    var out = Seq((seed, Option.empty[Long]))
    for (_ <- 2 to k) {
      val (pick, dm) = dmin.toSeq.maxBy { case (i, d) => (d, -i) }
      out :+= (pick, Some(dm))
      dmin = (dmin - pick).map { case (i, d) => i -> math.min(d, d6(i, pick)) }
    }
    out
  }

  test("kcenter equals the direct greedy recursion (ids, radii, order)") {
    val got = Coreset.kcenter(embeddings, k = 6).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    val want = brute(vecs.map(_._1), 6).zipWithIndex.map { case ((id, d), j) =>
      (j + 1, id, d.map(_.toDouble / 1e6))
    }
    assert(got.toSeq == want, s"\ngot:  ${got.toSeq}\nwant: $want")
  }

  test("radius sequence is non-increasing; picks are distinct and " +
      "duplicates are never selected") {
    val rows = Coreset.kcenter(embeddings, k = 6).collect()
    val radii = rows.drop(1).map(_.getDouble(2))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"radii not non-increasing: ${radii.toSeq}")
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length == ids.length)
    // 23/24 duplicate vec 0 exactly (dmin6 = 0 from the seed onward):
    // a zero-distance point can never win the farthest-point argmax
    assert(!ids.exists(Set(23L, 24L)), s"duplicate vector selected: " +
      ids.toSeq.toString)
  }

  test("assign partitions the corpus; every center covers itself") {
    val a = Coreset.assign(embeddings, k = 6).collect()
    assert(a.map(_.getLong(1)).sum == vecs.size.toLong)
    val centerIds = Coreset.kcenter(embeddings, k = 6).collect()
      .map(_.getLong(1)).toSet
    assert(a.map(_.getLong(0)).toSet == centerIds)
    // duplicate vectors (23, 24) sit at distance 0 from center 0's
    // cluster: their assigned center's max_radius is still >= 0 and
    // every mean_radius <= max_radius
    assert(a.forall(r => r.getDouble(3) <= r.getDouble(2) + 1e-12))
  }

  test("requesting more centers than points fails diagnosably") {
    val tiny = vecs.take(3).map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      Coreset.kcenter(tiny, k = 10).collect()
    }
    assert(e.getMessage.contains("exhausted the corpus"))
  }

  test("extend: history phase bit-identical to a history-only run; " +
      "extend radii non-increasing") {
    val isHist = col("vec_id") < 15
    val ext = Coreset.extend(embeddings, isHist, k = 4, kMore = 3)
      .collect()
    assert(ext.length == 7)
    assert(ext.map(_.getString(3)).toSeq ==
      Seq.fill(4)("base") ++ Seq.fill(3)("extend"))
    val histOnly = Coreset.kcenter(embeddings.filter(isHist), k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    val basePhase = ext.take(4).map(r => (r.getInt(0), r.getLong(1),
      Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(basePhase.toSeq == histOnly.toSeq)
    val extRadii = ext.drop(4).map(_.getDouble(2))
    assert(extRadii.zip(extRadii.tail).forall { case (x, y) => x >= y })
  }
}
