package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, Trades}

/** Scale-guard semantics: stop-shingle/bucket caps (active on synthetic
  * hot-key corpora, inactive on the harness data), hyperplane-LSH
  * agreement with the exact near-dup baseline, blocked all-pairs
  * correctness, pointer-jumping connected components, and sketch
  * error-bound checks for the approx profile.
  */
class CapsAndLshSpec extends SparkSpec {
  import spark.implicits._

  private def hotShingleCorpus = (0 until 10)
    .map(i => (i.toLong, s"a b c x$i y$i"))
    .toDF("doc_id", "text")

  test("ngramJaccardPairs drops stop shingles over the df cap") {
    // every doc pair shares exactly one shingle ("a b c", df = 10);
    // jaccard = 1/5 = 0.2 per pair without the cap
    val uncapped = Dedup.ngramJaccardPairs(hotShingleCorpus, 0.1, maxDf = 1000)
    assert(uncapped.count() == 45) // C(10,2), all via the hot shingle
    val capped = Dedup.ngramJaccardPairs(hotShingleCorpus, 0.1, maxDf = 4)
    assert(capped.count() == 0) // hot shingle dropped; nothing else shared
  }

  test("capStats counts hot shingles and dropped postings") {
    val row = Dedup.capStats(hotShingleCorpus, maxDf = 4, maxBucket = 1000)
      .collect().head
    assert(row.getAs[Long]("n_hot_shingles") == 1L)
    assert(row.getAs[Long]("n_postings_dropped") == 10L)
    assert(row.getAs[Long]("n_hot_buckets") == 0L)
    // harness data: caps must be inactive (results unchanged by design)
    val real = Dedup.capStats(Tables.documents(spark, "/root/testdata/sf0.01"))
      .collect().head
    assert(real.getAs[Long]("n_hot_shingles") == 0L)
    assert(real.getAs[Long]("n_hot_buckets") == 0L)
  }

  test("lshCandidates star-caps oversized band buckets") {
    // identical docs -> identical signatures -> one bucket per band; a
    // bucket over the cap degrades to member↔min star pairs instead of
    // disappearing (identical docs have NO other selective band, so a
    // drop would disconnect exactly the flood that needs dedup)
    val dups = (0 until 6).map(i => (i.toLong, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(dups)
    val star = Dedup.lshCandidates(sigs, maxBucket = 4)
      .orderBy("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(star.toSeq == (1 to 5).map(j => (0L, j.toLong)))
    assert(Dedup.lshCandidates(sigs, maxBucket = 10).count() == 15) // C(6,2)
  }

  test("a 100-identical-doc flood stays one cluster through the star cap") {
    val flood = (0 until 100).map(i => (i.toLong, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(flood, threshold = 0.5)
    // star cap (bucket of 100 > 64): 99 pairs, all through doc 0, every
    // one passing exact-Jaccard verification at similarity 1.0
    assert(pairs.count() == 99)
    val reps = Dedup.clusters(pairs).select("cluster_rep")
      .distinct().collect().map(_.getLong(0))
    assert(reps.toSeq == Seq(0L)) // single connected component
  }

  test("embedding LSH agrees with the exact near-dup pairs at sf0.01") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val exact = Similarity.cosineNearDupPairs(emb).collect().toSeq
    val lsh = Similarity.cosineNearDupLsh(emb).collect().toSeq
    assert(exact.size == 14) // known ground truth at sf0.01
    assert(lsh == exact) // full recall at this SF; precision exact by design
  }

  test("blocked all-pairs produces each pair exactly once, values exact") {
    val emb = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 31 + j + 1).toFloat),
        i % 3)
    }.toDF("vec_id", "embedding", "label")
    val blocked = Similarity.allPairsCosine(emb, numBlocks = 4)
      .orderBy("id1", "id2").collect().toSeq
    assert(blocked.size == 435) // C(30,2) — no dup, no loss
    // naive reference: plain theta-join
    val n = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val naive = n.select(col("vec_id").as("id1"), col("v").as("a"))
      .join(n.select(col("vec_id").as("id2"), col("v").as("b")),
        col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
          / (sqrt(expr("aggregate(a, 0D, (acc, x) -> acc + x * x)"))
            * sqrt(expr("aggregate(b, 0D, (acc, x) -> acc + x * x)"))), 6)
          .as("cosine"))
      .orderBy("id1", "id2").collect().toSeq
    assert(blocked == naive)
  }

  test("clusters: pointer jumping converges to per-component min labels") {
    // a 10-node chain (worst case for plain propagation) + a triangle
    val chain = (1L until 10L).map(i => (i, i + 1))
    val tri = Seq((20L, 21L), (21L, 22L), (20L, 22L))
    val pairs = (chain ++ tri).toDF("d1", "d2")
    val got = Dedup.clusters(pairs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (1L to 10L).map(i => (i, 1L)) ++ (20L to 22L).map(i => (i, 20L))
    assert(got == want)
  }

  test("int8 quantization: reconstruction error bounded by scale/2, codes in range") {
    val q = Similarity.quantizeInt8(
      Tables.embeddings(spark, "/root/testdata/sf0.01")).collect()
    assert(q.length == 500)
    q.foreach { r =>
      val (scale, err) = (r.getAs[Double]("scale"), r.getAs[Double]("max_err"))
      // round-to-nearest guarantees |x - q*scale| <= scale/2 per element
      assert(err <= scale / 2 + 1e-6,
        s"vec ${r.getLong(0)}: max_err $err > scale/2 ${scale / 2}")
      // codes are int8-range by construction: |x| <= max|v| => |q| <= 127,
      // so the L1 norm of 64 codes is bounded by 64*127
      assert(r.getAs[Long]("q_l1") <= 64L * 127L)
    }
  }

  test("approx_profile sketches land within their error bounds") {
    val t = Trades.fromEvents(Tables.events(spark, "/root/testdata/sf0.01"))
    val joined = t.groupBy(col("symbol"))
      .agg(
        approx_count_distinct(col("price"), 0.01).as("approx_nd"),
        count_distinct(col("price")).as("exact_nd"),
        percentile_approx(col("price"), lit(0.5), lit(10000)).as("p50_approx"),
        expr("percentile(price, 0.45)").as("p45_exact"),
        expr("percentile(price, 0.55)").as("p55_exact"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (a, e) = (r.getAs[Long]("approx_nd").toDouble,
        r.getAs[Long]("exact_nd").toDouble)
      // HLL++ with rsd 0.01: allow 5 sigma
      assert(math.abs(a - e) / e <= 0.05,
        s"${r.getString(0)}: HLL $a vs exact $e")
      // percentile_approx returns a REAL element (rank-based, no
      // interpolation); the honest bound is a rank bound: the returned
      // value must sit within the exact 45th..55th percentile band
      // (guaranteed rank error is 1/accuracy ≪ 5%)
      val pa = r.getAs[Double]("p50_approx")
      val (lo, hi) = (r.getAs[Double]("p45_exact"), r.getAs[Double]("p55_exact"))
      assert(pa >= lo && pa <= hi,
        s"${r.getString(0)}: approx p50 $pa outside exact rank band [$lo, $hi]")
    }
  }

  test("sourceOverlap counts rare shared shingles per pair, drops hot ones") {
    val corpus = Seq(
      (0L, "p q r unique0", "A"), // shares shingle "p q r" with doc 2
      (1L, "x y z unique1", "A"),
      (2L, "p q r unique2", "B"),
      (3L, "no overlap here at all", "C"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.sourceOverlap(corpus).collect()
    assert(r.length == 1)
    assert((r.head.getString(0), r.head.getString(1), r.head.getLong(2)) ==
      (("A", "B", 1L)))
    // df cap: at maxDf=1 the shared shingle counts as boilerplate
    assert(Dedup.sourceOverlap(corpus, maxDf = 1).count() == 0)
  }

  test("semanticDedup drops the higher id of a planted duplicate pair") {
    // vec 15 is vec 10 verbatim; everything else is sin-noise, far from
    // cosine 1. threshold=1.0 (rounded) isolates the planted pair.
    val emb = (0 until 20).map { i =>
      val src = if (i == 15) 10 else i
      (i.toLong, Array.tabulate(8)(j => math.sin(src * 31 + j + 1).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val r = Similarity.semanticDedup(emb, threshold = 1.0).collect()
    assert(r.length == 20) // full per-vector audit
    assert(r.filterNot(_.getAs[Boolean]("kept")).map(_.getLong(0)).toSet ==
      Set(15L))
    // identical vectors must share a k-means cell (same distances, same
    // tie-break) — the within-cell restriction cannot split them
    val cellOf = r.map(x => x.getLong(0) -> x.getAs[Int]("cell")).toMap
    assert(cellOf(10L) == cellOf(15L))
  }

  test("clusterProfile: planted clusters profile as perfectly compact") {
    val e1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    // init centroids = vec 0 (e1) and vec 1 (e2); members split 3/3
    val emb = Seq((0L, e1, 0), (1L, e2, 0), (2L, e1, 0), (3L, e1, 0),
      (4L, e2, 0), (5L, e2, 0)).toDF("vec_id", "embedding", "label")
    val r = Similarity.clusterProfile(emb, kCells = 2, iters = 1).collect()
    assert(r.map(_.getAs[Int]("cell")).toSeq == Seq(0, 1))
    assert(r.map(_.getAs[Long]("n_vectors")).toSeq == Seq(3L, 3L))
    // identical members ⇒ centroid = the member vector, cosine exactly 1
    assert(r.forall(_.getAs[Double]("avg_centroid_cos") == 1.0))
    assert(r.forall(_.getAs[Double]("min_centroid_cos") == 1.0))
  }

  test("diversitySample keeps perCell prototypes per cell, min-id ties") {
    val e1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val emb = Seq((0L, e1, 0), (1L, e2, 0), (2L, e1, 0), (3L, e1, 0),
      (4L, e2, 0), (5L, e2, 0)).toDF("vec_id", "embedding", "label")
    val r = Similarity
      .diversitySample(emb, perCell = 2, kCells = 2, iters = 1).collect()
    // all members sit ON their centroid (cos 1.0) → ties break by id
    assert(r.map(x => (x.getAs[Int]("cell"), x.getAs[Int]("rk"),
      x.getAs[Long]("vec_id"))).toSeq ==
      Seq((0, 1, 0L), (0, 2, 2L), (1, 1, 1L), (1, 2, 4L)))
    assert(r.forall(_.getAs[Double]("centroid_cos") == 1.0))
  }

  test("embedOutliers: the planted impostor is its label's worst " +
      "vector and the in-class members outrank it") {
    val e1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    // label 0 = three e1's plus one mislabeled e2 (the impostor);
    // centroid points (3e6, 1e6, 0, 0)-ish -> impostor cos lowest
    val emb = Seq((0L, e1, 0), (1L, e1, 0), (2L, e1, 0), (3L, e2, 0),
      (10L, e2, 1), (11L, e2, 1)).toDF("vec_id", "embedding", "label")
    val r = Similarity.embedOutliers(emb, topK = 10).collect()
    val l0 = r.filter(_.getAs[Int]("label") == 0)
    assert(l0.head.getAs[Long]("vec_id") == 3L) // rank 1 = farthest
    assert(l0.head.getAs[Int]("rank") == 1)
    assert(l0.forall(_.getAs[Long]("n_label") == 4L))
    assert(l0.head.getAs[Double]("centroid_cos") <
      l0.last.getAs[Double]("centroid_cos"))
    // label 1 is pure: every member sits on the centroid direction
    val l1 = r.filter(_.getAs[Int]("label") == 1)
    assert(l1.forall(_.getAs[Double]("centroid_cos") == 1.0))
  }

  test("semanticDedup: identical flood degrades to star pairs, keeps one rep") {
    // 12 identical vectors collapse to one cell of size 12 > maxCell=4:
    // pair generation degrades to stars around the cell min, which still
    // marks every non-rep a duplicate — the flood cannot OOM a task.
    val emb = (0 until 12)
      .map(i => (i.toLong, Array.tabulate(8)(j => (j + 1).toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity
      .semanticDedup(emb, threshold = 1.0, kCells = 2, iters = 1, maxCell = 4)
      .collect()
    assert(r.length == 12)
    assert(r.filter(_.getAs[Boolean]("kept")).map(_.getLong(0)).toSeq ==
      Seq(0L))
  }

  test("knnPagerank: ranks positive, total mass ~1, two-node graph splits evenly") {
    val real = Similarity.knnPagerank(Tables.embeddings(spark, "/root/testdata/sf0.01"))
      .collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getDouble(1) > 0))
    val mass = real.map(_.getDouble(1)).sum
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass drifted: $mass")
    // a graph of exactly one near-dup pair: both endpoints get 0.5 at
    // every iteration (teleport/2 + d*0.5 = 0.5)
    import spark.implicits._
    val pair = Seq(
      (0L, Array.fill(64)(1.0f), 0),
      (1L, Array.fill(64)(1.0f), 0)).toDF("vec_id", "embedding", "label")
    val two = Similarity.knnPagerank(pair).collect()
    assert(two.length == 2)
    two.foreach(r => assert(r.getDouble(1) == 0.5 && r.getLong(2) == 1L))
  }


  test("matryoshkaEval: when all information lives in the first 4 " +
      "dims, every truncation level has perfect recall") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(11)
    // 40 vectors: dims 1-4 carry the direction, dims 5-16 are zero,
    // so truncated cosines equal full cosines at every d >= 4
    val embs = (0L until 40L).map { i =>
      val head = Array.fill(4)(rnd.nextFloat() * 2f - 1f)
      (i, head ++ Array.fill(12)(0f), (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val r = Similarity.matryoshkaEval(embs).collect()
    assert(r.map(_.getAs[Int]("dim")).toSeq == Seq(4, 8, 16))
    r.foreach { row =>
      assert(row.getAs[Long]("n_queries") == 10L)
      assert(row.getAs[Double]("mean_recall") == 1.0)
      assert(row.getAs[Double]("min_recall") == 1.0)
    }
    assert(Similarity.matryoshkaEval(embs).collect().toSeq == r.toSeq)
  }
}
