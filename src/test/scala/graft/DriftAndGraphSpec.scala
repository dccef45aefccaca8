package graft

import org.apache.spark.sql.functions._

import graft.operators.{DataQuality, Sessions, Similarity, Sketches}

/** PSI drift, transition matrix, triangle stats, and histogram
  * quantiles on crafted fixtures.
  */
class DriftAndGraphSpec extends SparkSpec {
  import spark.implicits._

  test("psi is ~0 for identical halves and large for a shifted one") {
    // every day carries the identical value distribution -> psi ~ 0
    val same = (for (day <- 1 to 30; v <- 0 until 100)
      yield (ts(f"2024-01-$day%02d 10:00:00"), "t", v.toDouble))
      .toDF("ts", "event_type", "value")
    val psiSame = DataQuality.psiDrift(same).collect().head.getAs[Double]("psi")
    assert(math.abs(psiSame) < 0.05, s"psi $psiSame")
    // second half shifted into the top bins -> large psi
    val shifted = (1 to 400).map { i =>
      val day = i % 30 + 1
      val v = if (day <= 15) (i % 50).toDouble else 50.0 + (i % 50)
      (ts(f"2024-01-$day%02d 10:00:00"), "t", v)
    }.toDF("ts", "event_type", "value")
    val psiShift = DataQuality.psiDrift(shifted).collect().head.getAs[Double]("psi")
    assert(psiShift > 0.25, s"psi $psiShift")
  }

  test("psi baseline survives the parquet round trip and freezes its bounds") {
    val ref = (for (d <- 1 to 15; v <- 0 until 100)
      yield (ts(f"2024-01-$d%02d 10:00:00"), "t", v.toDouble))
      .toDF("ts", "event_type", "value")
    val idx = java.nio.file.Files.createTempDirectory("graft_psiidx_").toString
    DataQuality.referenceHistogram(ref).write.mode("overwrite").parquet(idx)
    val baseline = spark.read.parquet(idx)
    // identical current distribution -> psi ~ 0 (smoothing only)
    val curSame = (for (d <- 16 to 30; v <- 0 until 100)
      yield (ts(f"2024-01-$d%02d 10:00:00"), "t", v.toDouble))
      .toDF("ts", "event_type", "value")
    val psiSame = DataQuality.psiVsBaseline(baseline, curSame)
      .collect().head.getAs[Double]("psi")
    assert(math.abs(psiSame) < 0.05, s"psi $psiSame")
    // out-of-bounds values clamp into the top bin -> large finite psi
    val curOob = (for (d <- 16 to 30; v <- 0 until 100)
      yield (ts(f"2024-01-$d%02d 10:00:00"), "t", 1000.0 + v))
      .toDF("ts", "event_type", "value")
    val psiOob = DataQuality.psiVsBaseline(baseline, curOob)
      .collect().head.getAs[Double]("psi")
    assert(psiOob > 1.0 && !psiOob.isInfinite, s"psi $psiOob")
  }

  test("transition shares sum to 1 per from-type and counts are exact") {
    // user 1: a->b->a  user 2: a->b
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "a"),
      (2L, 4L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 5L, ts("2024-01-01 10:01:00"), "b")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val rep = Sessions.eventTransitions(ev).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("p")))).toMap
    assert(rep(("a", "b")) == ((2L, 1.0)))
    assert(rep(("b", "a")) == ((1L, 1.0)))
    assert(rep.size == 2)
  }

  test("triangle stats: a triangle plus a pendant edge") {
    // 1-2-3 triangle, 3-4 pendant
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("id1", "id2")
    val m = Similarity.triangleStats(e).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("n_triangles"),
          r.getAs[Double]("clustering")))).toMap
    assert(m(1L) == ((2L, 1L, 1.0)))
    assert(m(2L) == ((2L, 1L, 1.0)))
    assert(m(3L) == ((3L, 1L, round3(1.0 / 3))))
    assert(m(4L) == ((1L, 0L, 0.0)))
  }

  private def round3(d: Double) =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("a k4 clique has 4 triangles, one per omitted vertex") {
    val e = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toDF("id1", "id2")
    val rep = Similarity.triangleStats(e).collect()
    assert(rep.forall(_.getAs[Long]("n_triangles") == 3L)) // each vertex in 3
    assert(rep.forall(_.getAs[Double]("clustering") == 1.0))
  }

  test("weighted sampling: selection tracks the ES inclusion probability") {
    import graft.operators.TextAnalysis
    // two docs; w = ln(1+n_chars): 2980 vs 1 chars -> w1 ≈ 8.0, w2 ≈ 0.69,
    // so P(doc1 wins a 1-of-2 draw) = w1/(w1+w2) ≈ 0.92. One query runs
    // 500 independent salted races (same key formula as weightedSample).
    val docs = Seq((1L, 2980L), (2L, 1L)).toDF("doc_id", "n_chars")
    val races = spark.range(500).select(concat(lit("t"), col("id"), lit("_"))
      .as("salt")).crossJoin(docs)
    val u = (graft.functions.TextFunctions.hash60(
      concat(col("salt"), col("doc_id"))).cast("double") + 0.5) /
      graft.operators.Sketches.HashRange
    val keyed = races.withColumn("k",
      log(u) / log(lit(1.0) + col("n_chars").cast("double")))
    val wins = keyed.groupBy(col("salt"))
      .agg(expr("max_by(doc_id, k)").as("winner"))
      .where(col("winner") === 1L).count()
    val p = wins / 500.0
    assert(p > 0.84 && p < 0.98, s"doc1 win rate $p")
    // and k >= n keeps everything
    val all = TextAnalysis.weightedSample(
      Seq((1L, "s", 2980L), (2L, "s", 1L)).toDF("doc_id", "source", "n_chars"),
      perSource = 5)
    assert(all.count() == 2)
  }

  test("histogram quantile estimate is within one bin width of exact") {
    val df = (1 to 5000).map(i => ("g", i.toDouble)).toDF("symbol", "price")
    val r = Sketches.quantileHistogram(df, "symbol", col("price")).collect().head
    val binWidth = (5000.0 - 1.0) / 256
    Seq("p50", "p90", "p99").foreach { p =>
      assert(r.getAs[Double](s"${p}_abs_err") <= binWidth + 1e-9,
        s"$p err ${r.getAs[Double](s"${p}_abs_err")} > $binWidth")
    }
  }

  test("histogram quantiles are exact for a single-valued group") {
    val df = (1 to 100).map(_ => ("g", 42.0)).toDF("symbol", "price")
    val r = Sketches.quantileHistogram(df, "symbol", col("price")).collect().head
    assert(r.getAs[Double]("p50_exact") == 42.0)
    // degenerate span: all mass lands in bin 0, estimate = vmin = 42
    assert(r.getAs[Double]("p50_est") == 42.0)
    assert(r.getAs[Double]("p99_abs_err") == 0.0)
  }

  test("embedPcaPower: planted dominant direction recovered, loadings " +
      "unit-norm, share reflects concentration, partitioning-stable") {
    // 40 vectors in 8 dims: big variance along dim 3 (index 2),
    // small noise on dim 6 (index 5)
    val vecs = (0 until 40).map { i =>
      val a = Array.fill(8)(0.0f)
      a(2) = (if (i % 2 == 0) 1.0f else -1.0f) * (1.0f + (i % 5))
      a(5) = (if (i % 3 == 0) 0.1f else -0.1f)
      (i.toLong, a)
    }.toDF("vec_id", "embedding")
    val r = Similarity.embedPcaPower(vecs).collect()
    val byDim = r.map(x => x.getInt(0) -> x.getAs[Double]("loading")).toMap
    // dominant loading on dim 3 (1-based), near +-1
    assert(math.abs(byDim(3)) > 0.99)
    assert(byDim.filterNot(_._1 == 3).values.forall(v => math.abs(v) < 0.1))
    // unit norm (up to per-component 6-decimal rounding)
    val norm = math.sqrt(byDim.values.map(v => v * v).sum)
    assert(math.abs(norm - 1.0) < 1e-4)
    // nearly all variance is the planted direction
    assert(r.head.getAs[Double]("explained_share") > 0.95)
    // fixed-K recurrence is a pure function of the data
    val re = Similarity.embedPcaPower(vecs.repartition(7)).collect()
    assert(re.map(_.toSeq).toSeq == r.map(_.toSeq).toSeq)
  }

  test("embedDimStats: collapsed dims flagged, zero shares counted, " +
      "healthy dims pass") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.5f, 0.0f)),
      (2L, Array(-1.0f, 0.5f, 0.0f)),
      (3L, Array(1.0f, 0.5f, 2.0f)),
      (4L, Array(-1.0f, 0.5f, 0.0f))).toDF("vec_id", "embedding")
    val r = Similarity.embedDimStats(vecs).collect()
      .map(x => x.getInt(0) -> x).toMap
    // dim 1: mean 0, var 1, no zeros, healthy
    assert(r(1).getAs[Double]("mean") == 0.0)
    assert(r(1).getAs[Double]("variance") == 1.0)
    assert(!r(1).getAs[Boolean]("collapsed"))
    // dim 2: constant 0.5 -> variance 0 -> collapsed, zero_share 0
    assert(r(2).getAs[Double]("variance") == 0.0)
    assert(r(2).getAs[Boolean]("collapsed"))
    assert(r(2).getAs[Double]("zero_share") == 0.0)
    // dim 3: 3 of 4 exactly zero
    assert(r(3).getAs[Double]("zero_share") == 0.75)
    assert(!r(3).getAs[Boolean]("collapsed")) // var = 0.75 > eps
  }

  test("bfsLevels: hop levels are minimal, the wave stops at the " +
      "iteration budget, disconnected components stay unreached") {
    // path 1-2-3-4-5-6-7, shortcut 1-4, island 100-101; seed = {1}
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (1L, 4L), (100L, 101L)).toDF("id1", "id2")
    val m = Similarity.bfsLevels(e, iterations = 3, nSeeds = 1)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("level"), r.getAs[Long]("deg")))).toMap
    assert(m(1L)._1 == 0)
    assert(m(2L)._1 == 1)
    assert(m(4L)._1 == 1)          // shortcut beats the 3-hop path
    assert(m(3L)._1 == 2)          // via 2 or 4, still 2
    assert(m(5L)._1 == 2)          // via the shortcut
    assert(m(6L)._1 == 3)
    assert(!m.contains(7L))        // beyond the 3-hop budget
    assert(!m.contains(100L) && !m.contains(101L)) // island
    assert(m(4L)._2 == 3L)         // degree rides along (3,5,1)
    // two seeds: 1 and 2 both level 0
    val m2 = Similarity.bfsLevels(e, iterations = 1, nSeeds = 2)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Int]("level")).toMap
    assert(m2(1L) == 0 && m2(2L) == 0 && m2(3L) == 1 && m2(4L) == 1)
  }
}
