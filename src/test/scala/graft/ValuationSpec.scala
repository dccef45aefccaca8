package graft

import org.apache.spark.sql.functions._

import graft.operators.Valuation

/** KNN-Shapley: the engine must reproduce the closed-form recursion
  * computed directly, the values must sum to the KNN utility, the
  * truncated twin must equal the exact form when R ≥ N, and a
  * mislabeled nearest neighbor must value negative.
  */
class ValuationSpec extends SparkSpec {
  import spark.implicits._

  // 21 vectors on a 3-dim simplex-ish layout; vec 7 is the test point
  // (7 ≡ TestRes mod TestMod with MaxPanel ample). Labels cluster by
  // direction so KNN is meaningful; vec 13 is a MISLABELED point very
  // close to the test point.
  private val vecs = (0 until 21).map { i =>
    val ang = 2.0 * math.Pi * i / 21.0
    val base = Array(math.cos(ang).toFloat, math.sin(ang).toFloat, 0.5f)
    val label = if (i == 13) 9 else i % 3
    (i.toLong, base, label)
  }
  private val embeddings = {
    // move 13 right next to 7 in angle so it ranks top-1 for the test
    val adjusted = vecs.map { case (id, v, l) =>
      if (id == 13L) {
        val ang = 2.0 * math.Pi * 7 / 21.0 + 0.01
        (id, Array(math.cos(ang).toFloat, math.sin(ang).toFloat, 0.5f), l)
      } else (id, v, l)
    }
    adjusted.toDF("vec_id", "embedding", "label")
  }

  /** Direct recursion over the engine's own pinned ranking. */
  private def brute(): Map[Long, Double] = {
    val rows = embeddings.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2))
    }
    val (testId, tv, tl) = rows.find(_._1 == 7L).map(t => (t._1, t._2, t._3)).get
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    def nrm(x: Array[Double]) = math.sqrt(dot(x, x))
    val train = rows.filter(_._1 != testId)
    val ranked = train.map { case (id, v, l) =>
      val c6 = math.round(dot(tv, v) / (nrm(tv) * nrm(v)) * 1e6)
      (id, l, c6)
    }.sortBy { case (id, _, c6) => (-c6, id) }
    val n = ranked.length
    val k = Valuation.K
    val a = ranked.map { case (_, l, _) => if (l == tl) 1.0 else 0.0 }
    val s = new Array[Double](n)
    s(n - 1) = a(n - 1) / n
    for (i <- n - 2 to 0 by -1)
      s(i) = s(i + 1) + (a(i) - a(i + 1)) / k * math.min(k, i + 1) / (i + 1)
    ranked.map(_._1).zip(s).toMap
  }

  test("exact values reproduce the closed-form recursion") {
    val got = Valuation.shapleyKnn(embeddings)
      .select(col("train_id"), col("shapley")).as[(Long, Double)]
      .collect().toMap
    val want = brute()
    assert(got.keySet == want.keySet)
    // per-term 1e-12 pinning and final 1e-6 pinning bound the error
    got.foreach { case (id, v) =>
      assert(math.abs(v - want(id)) < 2e-6, s"vec $id: $v vs ${want(id)}")
    }
  }

  test("values sum to the KNN utility of the full training set") {
    val total = Valuation.shapleyKnn(embeddings)
      .agg(sum(col("shapley"))).as[Double].head()
    val want = brute().values.sum // = fraction of top-K sharing the label
    assert(math.abs(total - want) < 1e-4, s"$total vs $want")
    assert(total >= 0.0 && total <= 1.0)
  }

  test("truncated twin equals the exact form when R >= N (N >= K)") {
    val exact = Valuation.shapleyKnn(embeddings).collect().map(_.toSeq)
    val trunc = Valuation.shapleyKnnTruncated(embeddings)
      .collect().map(_.toSeq)
    assert(exact.toSeq == trunc.toSeq)
  }

  test("truncation fidelity reads zero error when R >= N") {
    val fid = Valuation.shapleyTruncFidelity(embeddings).collect()
    assert(fid.nonEmpty)
    fid.foreach { r =>
      assert(r.getLong(3) == 0L, s"max_delta6 nonzero: $r")
      assert(r.getDouble(4) == 0.0, s"mean_abs_delta nonzero: $r")
    }
  }

  // 140 vectors spread over a circle: tests are ids ≡ 7 (mod 50) →
  // {7, 57, 107} (panel of 3), 137 train points >> TruncR = 64 — the
  // regime where a train point survives SOME tests' top-R but not
  // others', so the panel divisor and the appearance-count divisor
  // genuinely differ.
  private val bigEmbeddings = (0 until 140).map { i =>
    val ang = 2.0 * math.Pi * i / 140.0
    (i.toLong, Array(math.cos(ang).toFloat, math.sin(ang).toFloat, 0.5f),
      i % 3)
  }.toDF("vec_id", "embedding", "label")

  /** Brute TKNN over the WHOLE panel: per test, rank all train by the
    * pinned cosine, truncate at R (s_(R+1) := 0), recurse, then
    * average each point's per-test values — implicit 0 for tests
    * whose top-R it misses — over the PANEL size.
    */
  private def bruteTrunc(): Map[Long, Double] = {
    val rows = bigEmbeddings.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2))
    }
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    def nrm(x: Array[Double]) = math.sqrt(dot(x, x))
    val tests = rows.filter(t => t._1 % 50 == 7)
    val train = rows.filter(t => t._1 % 50 != 7)
    val k = Valuation.K
    val r = Valuation.TruncR
    val acc = scala.collection.mutable.Map.empty[Long, Double]
      .withDefaultValue(0.0)
    tests.foreach { case (_, tv, tl) =>
      val ranked = train.map { case (id, v, l) =>
        (id, l, math.round(dot(tv, v) / (nrm(tv) * nrm(v)) * 1e6))
      }.sortBy { case (id, _, c6) => (-c6, id) }.take(r)
      val a = ranked.map { case (_, l, _) => if (l == tl) 1.0 else 0.0 }
      val s = new Array[Double](r)
      var suffix = 0.0 // s_(R+1) := 0
      for (i <- r - 1 to 0 by -1) {
        val aNx = if (i == r - 1) 0.0 else a(i + 1)
        suffix += (a(i) - aNx) / k * math.min(k, i + 1) / (i + 1)
        s(i) = suffix
      }
      ranked.map(_._1).zip(s).foreach { case (id, v) => acc(id) += v }
    }
    acc.map { case (id, v) => id -> v / tests.length }.toMap
  }

  test("truncated values with R < N and a multi-test panel match the " +
      "whole-panel brute force (panel divisor, not appearance count)") {
    val got = Valuation.shapleyKnnTruncated(bigEmbeddings)
      .select(col("train_id"), col("n_tests"), col("shapley"))
      .as[(Long, Long, Double)].collect()
    val want = bruteTrunc()
    assert(got.map(_._1).toSet == want.keySet)
    // the scenario must actually exercise the divergence: at least one
    // surviving point misses at least one test's top-R
    assert(got.exists(_._2 < 3),
      "every point appeared in every test's top-R — R < N not exercised")
    got.foreach { case (id, _, v) =>
      assert(math.abs(v - want(id)) < 2e-6, s"vec $id: $v vs ${want(id)}")
    }
  }

  test("incremental merge of (top-R index + delta) equals the full " +
      "truncated rebuild") {
    val isPanel = col("vec_id") === 7L
    val isHist = col("vec_id") % 3 =!= 0 // arbitrary deterministic split
    val inc = Valuation.shapleyIncremental(
        Valuation.topRIndex(embeddings.filter(isPanel || isHist)),
        embeddings.filter(isPanel || !isHist))
      .collect().map(_.toSeq)
    val full = Valuation.shapleyKnnTruncated(embeddings)
      .collect().map(_.toSeq)
    assert(inc.toSeq == full.toSeq)
  }

  test("a mislabeled nearest neighbor values negative; label audit flags it") {
    val got = Valuation.shapleyKnn(embeddings)
      .select(col("train_id"), col("shapley")).as[(Long, Double)]
      .collect().toMap
    assert(got(13L) < 0, s"mislabeled top-1 neighbor valued ${got(13L)}")
    val audit = Valuation.shapleyLabelAudit(embeddings).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (n9, neg9) = audit(9)
    assert(n9 == 1 && neg9 == 1, s"label-9 slice: $n9 points, $neg9 negative")
  }
}
