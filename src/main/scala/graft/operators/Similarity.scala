package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors.{vecDot, vecNorm}

/** Similarity search over the `embeddings` table (vec_id, embedding
  * list<float>[64], label).
  *
  * - [[annBruteForce]]: exact cosine top-k for a query set — broadcast the
  *   (small) query side, single scan of the corpus, per-query top-k. The
  *   correctness baseline every ANN variant is judged against.
  * - [[topPairs]]: global most-similar pairs, O(n²) self-join — exact;
  *   at 100 TB use [[Dedup.minhashLshPairs]]-style bucketing or IVF.
  * - [[annIvf]]: inverted-file ANN — partition the corpus into coarse
  *   cells (label = cluster id here; k-means at scale), score queries
  *   against cell centroids, probe only the closest `nProbe` cells. Scans
  *   nProbe/cells of the corpus instead of all of it — the scale path.
  *
  * Numerics: floats are widened to double BEFORE any arithmetic (exact),
  * dot/norm folds are sequential left-folds (bit-identical across
  * engines), every emitted score is rounded to 6 decimals and ordering
  * ties broken by id so results are total-order deterministic.
  */
object Similarity {

  /** (vec_id, v: array<double>, nrm: double) — widened + norms. */
  def normed(embeddings: DataFrame): DataFrame = embeddings
    .select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    .withColumn("nrm", vecNorm(col("v")))

  /** Version-safe 6-decimal pin: round(e·1e6, 0)/1e6 — the engine and
    * the DuckDB oracle then round the SAME IEEE double to an integer
    * (identical for every input), where round(e, 6) lets BigDecimal
    * HALF_UP and a multiply-based round disagree near any half-micro
    * boundary (SCALING.md trap #10). Oracle twins use
    * SparkEntry.safe6 with the same association order. */
  private def r6(c: Column): Column = round(c * lit(1.0e6), 0) / lit(1.0e6)
  private def r12(c: Column): Column =
    round(c * lit(1.0e12), 0) / lit(1.0e12)

  private def cosine = r6(
    vecDot(col("qv"), col("v")) / (col("qn") * col("nrm")))

  /** Exact cosine top-k per query vector (query set = vec_id < nQueries).
    * Broadcast the queries; the corpus is scanned once, scored rows
    * shuffle only for the per-query top-k window.
    */
  def annBruteForce(embeddings: DataFrame, nQueries: Int = 10,
                    k: Int = 10): DataFrame = {
    val n = normed(embeddings)
    val q = n.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val scored = n.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine.as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exact all-pairs cosine via 2-D block decomposition (the
    * "1-bucket-theta" join): every vector is assigned a block
    * `vec_id mod B`; each unordered block pair (p ≤ q) becomes ONE
    * equi-join key, rows replicate to the keys they participate in
    * (row-role to (blk..B-1), column-role to (0..blk)), and the join is
    * a plain shuffled equi-join with `(n/B)²` work per key. Exact O(n²)
    * compute — unavoidable for an exact answer — but NO
    * BroadcastNestedLoopJoin: nothing broadcasts a whole table, no
    * single task holds the cross product, and B scales with cluster
    * parallelism (√tasks). Each pair is produced exactly once: a pair in
    * blocks (p,q), p≠q, meets only at key (min,max) with one role
    * assignment; a same-block pair meets at (b,b) in both role orders
    * and the `id_r < id_c` residual keeps one.
    */
  def allPairsCosine(embeddings: DataFrame, numBlocks: Int = 8): DataFrame = {
    val n = normed(embeddings)
    val withBlk = n.withColumn("blk", pmod(col("vec_id"), lit(numBlocks)).cast("int"))
    val rows = withBlk
      .withColumn("cb", explode(sequence(col("blk"), lit(numBlocks - 1))))
      .select(col("vec_id").as("id_r"), col("v").as("qv"),
        col("nrm").as("qn"), col("blk").as("rb"), col("cb"))
    val cols = withBlk
      .withColumn("rb", explode(sequence(lit(0), col("blk"))))
      .select(col("vec_id").as("id_c"), col("v"), col("nrm"),
        col("rb"), col("blk").as("cb"))
    rows.join(cols, Seq("rb", "cb"))
      .filter(col("rb") < col("cb") ||
        (col("rb") === col("cb") && col("id_r") < col("id_c")))
      .select(least(col("id_r"), col("id_c")).as("id1"),
        greatest(col("id_r"), col("id_c")).as("id2"), cosine.as("cosine"))
  }

  /** Global top-k most-similar pairs by cosine — exact, blocked
    * ([[allPairsCosine]]); plans as TakeOrderedAndProject on top (no
    * global sort materialized).
    */
  def topPairs(embeddings: DataFrame, k: Int = 20): DataFrame =
    allPairsCosine(embeddings)
      .orderBy(col("cosine").desc, col("id1"), col("id2"))
      .limit(k)

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine ≥
    * threshold (the last member of the dedup suite — near-dup by
    * embedding rather than text). Exact via [[allPairsCosine]]; the
    * sub-quadratic scale path is [[cosineNearDupLsh]], judged against
    * this as ground truth.
    */
  def cosineNearDupPairs(embeddings: DataFrame,
                         threshold: Double = 0.45): DataFrame =
    allPairsCosine(embeddings)
      .filter(col("cosine") >= threshold)
      .orderBy(col("id1"), col("id2"))

  /** Cross-modal dedup consistency: every TEXT near-dup pair
    * ([[Dedup.ngramJaccardPairs]]) annotated with its EMBEDDING cosine —
    * the audit that text-level and vector-level dedup agree (pairs with
    * high jaccard but low cosine flag embedding-pipeline drift, and vice
    * versa). Pair set is the capped jaccard output, so this is two
    * 1-row-per-doc joins on top of the text pipeline.
    */
  def crossModalPairs(docs: DataFrame, embeddings: DataFrame,
                      threshold: Double = 0.5): DataFrame = {
    val n = normed(embeddings)
    Dedup.ngramJaccardPairs(docs, threshold)
      .join(n.select(col("vec_id").as("d1"), col("v").as("qv"),
        col("nrm").as("qn")), Seq("d1"))
      .join(n.select(col("vec_id").as("d2"), col("v"), col("nrm")), Seq("d2"))
      .select(col("d1"), col("d2"), col("jaccard"), cosine.as("cosine"))
      .orderBy(col("d1"), col("d2"))
  }

  /** Int8 scalar quantization per vector (the standard embedding
    * compression for ANN serving: 4× smaller than float32, 8× smaller
    * than the widened doubles): per-vector scale = max|v|/127,
    * q_i = round(v_i/scale). Emits the scale, the L1 norm of the
    * quantized codes (a content checksum), and the max reconstruction
    * error — all map-only higher-order folds, no shuffle, and every
    * step (division, half-away-from-zero round, max) bit-reproducible
    * across engines.
    */
  def quantizeInt8(embeddings: DataFrame): DataFrame = embeddings
    .select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    .withColumn("mx", expr(
      "greatest(aggregate(v, 0D, (a, x) -> greatest(a, abs(x))), 1e-12d)"))
    .withColumn("scale", col("mx") / lit(127.0))
    .withColumn("qv", expr(
      "transform(v, x -> cast(round(x / scale, 0) as int))"))
    .select(
      col("vec_id"),
      r6(col("scale")).as("scale"),
      expr("aggregate(qv, 0L, (a, q) -> a + abs(q))").as("q_l1"),
      r6(expr(
        """aggregate(zip_with(v, qv, (x, q) -> abs(x - q * scale)),
          |0D, (a, e) -> greatest(a, e))""".stripMargin)).as("max_err"))
    .orderBy(col("vec_id"))

  /** Deterministic ±1 hyperplane components: parity of the md5-derived
    * 60-bit hash of "hp<bit>_<dim>" — reproducible in ANY engine with
    * md5 (the DuckDB oracle re-derives the identical matrix in SQL).
    */
  def hyperplane(bit: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"hp${bit}_$dim".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1.0
    else -1.0
  }

  /** Sign-of-random-hyperplane LSH near-dup: project every vector onto
    * `nBands × bitsPerBand` fixed ±1 hyperplanes, bucket by the sign
    * pattern of each band, generate candidate pairs per bucket
    * (posting-list expansion, one shuffle — same shape as
    * [[Dedup.lshCandidates]]), then verify candidates with the exact
    * cosine. Precision is exact (every emitted pair passes the real
    * threshold); recall is 1-(1-pᵇ)ᵏ with p = 1-θ/π per bit.
    *
    * Parameter note (measured on the harness data): at this corpus's
    * weak threshold (0.45 ≈ 63°, p ≈ 0.65) 16×4 bands give full recall
    * at sf0.01 and ~94% at sf0.1, but candidate selectivity is
    * necessarily poor — the threshold sits close to the background
    * similarity, which no LSH family can separate cheaply. At a real
    * dedup threshold (0.85+, p ≥ 0.9) the same 16×4 structure keeps
    * recall ≥ 1-10⁻⁴ while bucketing prunes almost everything: THAT is
    * the 100 TB regime this operator exists for. `maxBucket` star-caps
    * degenerate buckets like [[Dedup.MaxBucketSize]] — and unlike the
    * text LSH (whose 60-bit band keys spread non-dups into effectively
    * unique buckets), the 4-bit hyperplane bands have only 2⁴ buckets
    * per band, so bucket occupancy grows LINEARLY with the corpus and
    * uncapped pair generation grows quadratically: measured on the 10×
    * replica corpus, uncapped shuffle went 9.8 → 694 MB (70×, 34 GB
    * spill) while the capped run stays linear (SCALING.md round 8).
    * The cap is therefore the DEFAULT; pass `Int.MaxValue` only for
    * small-corpus exhaustive sweeps where the lost flood-recall
    * matters more than the quadratic (the star keeps each flooded
    * bucket one connected component either way, which is what the
    * downstream clustering needs).
    */
  def cosineNearDupLsh(embeddings: DataFrame, threshold: Double = 0.45,
                       nBands: Int = 16, bitsPerBand: Int = 4,
                       dims: Int = 64,
                       maxBucket: Int = Dedup.MaxBucketSize): DataFrame = {
    val n = normed(embeddings)
    val bitCols = (0 until nBands * bitsPerBand).map { b =>
      val hp = typedLit((0 until dims).map(j => hyperplane(b, j)))
      when(vecDot(col("v"), hp) >= 0, "1").otherwise("0")
    }
    val bandKeyCols = (0 until nBands).map { band =>
      concat((0 until bitsPerBand).map(i => bitCols(band * bitsPerBand + i)): _*)
    }
    val bands = n.select(col("vec_id"),
      posexplode(array(bandKeyCols: _*)).as(Seq("band", "bkey")))
    val cand = bands
      .groupBy(col("band"), col("bkey"))
      .agg(sort_array(collect_list(col("vec_id"))).as("ds"))
      .select(org.apache.spark.sql.graft.SortedPairs
        .column(col("ds"), if (maxBucket == Int.MaxValue) 0 else maxBucket)
        .as(Seq("id1", "id2")))
      .distinct()
    cand
      .join(n.select(col("vec_id").as("id1"), col("v").as("qv"),
        col("nrm").as("qn")), Seq("id1"))
      .join(n.select(col("vec_id").as("id2"), col("v"), col("nrm")),
        Seq("id2"))
      .select(col("id1"), col("id2"), cosine.as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, the
    * LASER/CCMatrix parallel-corpus recipe): candidate translation
    * pairs between two LANGUAGE slices of the corpus, scored by the
    * RATIO margin — cos(x,y) normalized by the mean of each side's
    * k-NN cosines — instead of raw cosine, which the paper shows is
    * what kills hub targets (a vector globally similar to everything
    * scores high cosine against every source but low margin against
    * all of them). A pair is mined when the target is the source's
    * rank-1 margin match AND the margin clears `marginThreshold`
    * (margin > 1 ⇔ the pair is closer than its neighborhoods).
    *
    * Scale shape: candidates come from the SAME hyperplane-LSH banding
    * as [[cosineNearDupLsh]] restricted to the bipartite (src, tgt)
    * cross — per-side hot-bucket rank caps keep bucket joins linear;
    * the k-NN means are computed over the retrieved candidate set (the
    * standard implementation — FAISS-retrieved neighborhoods, never
    * all pairs); two key-partitioned rank windows + two group-sized
    * aggs. Determinism: cosines pinned ONCE at 1e-6 integer units
    * (negative-cosine candidates dropped — the margin denominator must
    * be positive), the margin is one double ratio of exact integers
    * pinned at 1e-6, ties break on doc id.
    */
  /** The persisted banded-vector index rows behind [[bitextMine]] —
    * one (vec_id, lang, band, bkey) row per band per vector, per-doc
    * provenance like every other index family: takedown = one anti
    * join ([[Dedup.retireRows]]), refresh = an idempotent per-doc
    * append, and the miner serves off whatever index it is given.
    */
  def bitextBands(docs: DataFrame, embeddings: DataFrame,
                  nBands: Int = 16, bitsPerBand: Int = 4,
                  dims: Int = 64): DataFrame =
    bitextBandKeys(normed(embeddings)
        .join(docs.select(col("doc_id").as("vec_id"), col("lang")),
          Seq("vec_id")),
      nBands, bitsPerBand, dims)

  /** [[bitextBands]] for a self-contained (vec_id, lang, embedding)
    * frame — the STREAMING delta shape, where lang rides the row so
    * the band hashing is stateless per-row map work (the
    * minhashSignaturesRowwise analogue for this family).
    */
  def bitextBandsRowwise(vecs: DataFrame, nBands: Int = 16,
                         bitsPerBand: Int = 4, dims: Int = 64): DataFrame =
    bitextBandKeys(vecs.select(col("vec_id"), col("lang"),
        expr("transform(embedding, x -> cast(x as double))").as("v")),
      nBands, bitsPerBand, dims)

  /** Per-row hyperplane band keys over a frame carrying (vec_id, lang,
    * v) — all map-only expressions, shared by the batch index build
    * and the streaming rowwise variant.
    */
  private def bitextBandKeys(n: DataFrame, nBands: Int, bitsPerBand: Int,
                             dims: Int): DataFrame = {
    val bitCols = (0 until nBands * bitsPerBand).map { b =>
      val hp = typedLit((0 until dims).map(j => hyperplane(b, j)))
      when(vecDot(col("v"), hp) >= 0, "1").otherwise("0")
    }
    val bandKeyCols = (0 until nBands).map { band =>
      concat((0 until bitsPerBand).map(i => bitCols(band * bitsPerBand + i)): _*)
    }
    n.select(col("vec_id"), col("lang"),
      posexplode(array(bandKeyCols: _*)).as(Seq("band", "bkey")))
  }

  /** Per-side capped bucket membership of a banded index — the
    * bipartite analogue of SortedPairs' hot-bucket cap: rank by vec_id
    * within (band, bkey), keep `maxBucket` per side, bounding each
    * bucket's pair fan-out at maxBucket² and keeping candidate
    * generation linear in the corpus. Shared by the batch miner, the
    * recall audit, and the streaming candidate twin (where it caps the
    * STATIC history side, planned per micro-batch).
    */
  def bitextCappedSide(bands: DataFrame, lang: String, asName: String,
                       maxBucket: Int = Dedup.MaxBucketSize): DataFrame =
    bands.filter(col("lang") === lang)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("band"), col("bkey"))
          .orderBy(col("vec_id"))))
      .filter(col("rk") <= maxBucket)
      .select(col("band"), col("bkey"), col("vec_id").as(asName))

  /** Distinct LSH bipartite (src_id, tgt_id) candidates off a banded
    * index — the retrieval half of [[bitextMine]], factored so the
    * recall audit and the streaming twin share it.
    */
  def bitextCandidates(bands: DataFrame, srcLang: String, tgtLang: String,
                       maxBucket: Int = Dedup.MaxBucketSize): DataFrame =
    bitextCappedSide(bands, srcLang, "src_id", maxBucket)
      .join(bitextCappedSide(bands, tgtLang, "tgt_id", maxBucket),
        Seq("band", "bkey"))
      .select(col("src_id"), col("tgt_id")).distinct()

  def bitextMine(docs: DataFrame, embeddings: DataFrame,
                 srcLang: String = "en", tgtLang: String = "es",
                 k: Int = 4, nBands: Int = 16, bitsPerBand: Int = 4,
                 dims: Int = 64, maxBucket: Int = Dedup.MaxBucketSize,
                 marginThreshold: Double = 1.0,
                 bandIndex: Option[DataFrame] = None): DataFrame = {
    val n = normed(embeddings)
      .join(docs.select(col("doc_id").as("vec_id"), col("lang")),
        Seq("vec_id"))
    // the band index feeds BOTH capped sides of the candidate join,
    // whose per-side lang filters push below the exchange and defeat
    // reuse — without the pin the 16-hyperplane band build runs once
    // per side (and the incremental wiring's history/delta union twice
    // more). It IS the persisted index a deployment serves from.
    val bands = bandIndex.getOrElse(
        bitextBands(docs, embeddings, nBands, bitsPerBand, dims))
      .localCheckpoint(false)
    bitextMarginScore(n,
      bitextCandidates(bands, srcLang, tgtLang, maxBucket),
      k, marginThreshold)
  }

  /** The scoring half of [[bitextMine]]: ratio-margin over whatever
    * candidate set it is given (LSH-retrieved for the miner,
    * exhaustive bipartite for the recall audit's truth) — k-NN means
    * computed over that same candidate set, the standard
    * retrieved-neighborhood implementation.
    */
  private def bitextMarginScore(n: DataFrame, cand: DataFrame, k: Int,
                                marginThreshold: Double): DataFrame =
    bitextMarginFromCos6(cand
      .join(n.select(col("vec_id").as("src_id"), col("v").as("qv"),
        col("nrm").as("qn")), Seq("src_id"))
      .join(n.select(col("vec_id").as("tgt_id"), col("v"), col("nrm")),
        Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"),
        round(vecDot(col("qv"), col("v")) / (col("qn") * col("nrm"))
          * lit(1.0e6), 0).cast("long").as("c6"))
      .filter(col("c6") > 0), k, marginThreshold)

  /** The CSLS ratio-margin ranking over an already-scored (src_id,
    * tgt_id, c6) cosine frame — factored from [[bitextMarginScore]] so
    * the brute truth can score AT the cross join (vectors never enter a
    * shuffle; only 3-long rows reach the kNN windows) while the LSH
    * miner keeps the candidate→vector-join form.
    */
  private def bitextMarginFromCos6(cos6: DataFrame, k: Int,
                                   marginThreshold: Double): DataFrame = {
    val knn = cos6
      .withColumn("rs", row_number().over(Window.partitionBy(col("src_id"))
        .orderBy(col("c6").desc, col("tgt_id"))))
      .withColumn("rt", row_number().over(Window.partitionBy(col("tgt_id"))
        .orderBy(col("c6").desc, col("src_id"))))
    val sAvg = knn.filter(col("rs") <= k).groupBy(col("src_id"))
      .agg(sum(col("c6")).as("s_sum6"), count(lit(1)).as("s_cnt"))
    val tAvg = knn.filter(col("rt") <= k).groupBy(col("tgt_id"))
      .agg(sum(col("c6")).as("t_sum6"), count(lit(1)).as("t_cnt"))
    cos6.join(sAvg, Seq("src_id")).join(tAvg, Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"), col("c6"),
        round(lit(2.0) * col("c6") * col("s_cnt") * col("t_cnt")
          / (col("s_sum6") * col("t_cnt") + col("t_sum6") * col("s_cnt"))
          * lit(1.0e6), 0).cast("long").as("m6"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("src_id"))
          .orderBy(col("m6").desc, col("tgt_id"))))
      .filter(col("rank") === 1 &&
        col("m6") > lit((marginThreshold * 1e6).toLong))
      .select(col("src_id").as("src_doc"), col("tgt_id").as("tgt_doc"),
        (col("c6").cast("double") / lit(1.0e6)).as("cosine"),
        (col("m6").cast("double") / lit(1.0e6)).as("margin"))
      .orderBy(col("src_doc"))
  }

  /** Brute-force bitext truth: the full bipartite src×tgt candidate
    * set fed to the SAME margin scorer — no banding, no caps, so its
    * mined pairs are the exact rank-1 margin ranking the LSH miner
    * approximates. Quadratic in the language-slice sizes BY DEFINITION
    * (it is the audit's ground truth, the `lsh_recall_audit` role for
    * this family); a 100 TB deployment runs it on a deterministic
    * hash sample of SOURCES, never the full corpus — `srcSamplePct`
    * is that contract (the embed_pca_power discipline: the salted
    * sample is oracle-pinned data, not an approximation knob), making
    * the truth leg \|src\|·pct/100 × \|tgt\| instead of unboundedly
    * quadratic. NOTE the margin scores are CSLS-normalized by kNN
    * means over the candidate set, so the sampled result is the exact
    * truth OF THE SAMPLED SUB-CORPUS (sampled sources × all targets)
    * — not a row-filter of the full-corpus truth; an audit comparing
    * against it must mine the SAME sub-corpus
    * ([[bitextRecallAudit]] does). The production path is
    * [[bitextMine]], which is what this exists to measure.
    */
  def bitextBrute(docs: DataFrame, embeddings: DataFrame,
                  srcLang: String = "en", tgtLang: String = "es",
                  k: Int = 4, marginThreshold: Double = 1.0,
                  srcSamplePct: Int = 100): DataFrame = {
    val n = normed(embeddings)
      .join(docs.select(col("doc_id").as("vec_id"), col("lang")),
        Seq("vec_id"))
    // vectors ride the cross join itself and the cosine is computed IN
    // the cartesian stage, so the quadratic candidate set reaches the
    // downstream kNN shuffles as (src_id, tgt_id, c6) long triples —
    // never as vector-carrying rows (the 10× 4.2 GB sort-spill shape:
    // cand ⋈ vectors ⋈ vectors materialized the full bipartite set
    // through two SortMergeJoins with 64-float payloads)
    val src = n.filter(col("lang") === srcLang)
      .filter(srcSample(srcSamplePct, col("vec_id")))
      .select(col("vec_id").as("src_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val cos6 = src.crossJoin(n.filter(col("lang") === tgtLang)
        .select(col("vec_id").as("tgt_id"), col("v"), col("nrm")))
      .select(col("src_id"), col("tgt_id"),
        round(vecDot(col("qv"), col("v")) / (col("qn") * col("nrm"))
          * lit(1.0e6), 0).cast("long").as("c6"))
      .filter(col("c6") > 0)
    bitextMarginFromCos6(cos6, k, marginThreshold)
  }

  /** The deterministic source-sample predicate shared by the brute
    * truth and the audit's LSH-side restriction. */
  private def srcSample(pct: Int, id: Column): Column =
    if (pct >= 100) lit(true)
    else pmod(graft.functions.TextFunctions.hash60(
      concat(lit("btxsmp_"), id)), lit(100)) < pct

  /** Recall audit for the bitext miner — the knob audit SCALING.md's
    * prose promised made into data: LSH-mined pairs vs the brute-force
    * bipartite margin ranking, as one row of counts plus recall@1
    * (fraction of true rank-1 pairs the miner found) and the mined-pair
    * Jaccard. This is what decides when the corpus has outgrown the
    * band geometry: as buckets saturate into the per-side cap regime,
    * recall drops here first — the remedy is raising `bitsPerBand`
    * (measured at 10× in SCALING.md), not raising the cap.
    *
    * Both legs run on the SAME sampled sub-corpus (the `srcSamplePct`
    * deterministic source sample, default 25% — the embed_pca_power
    * contract — × all targets): the LSH leg MINES the sampled docs
    * (banding, caps and CSLS margin normalization all see the same
    * universe as the brute leg — a post-hoc filter of full-corpus
    * mined pairs would compare margins normalized over different kNN
    * means and bias recall), so every count is like-for-like and the
    * audit stays runnable at any corpus size (the truth cross is
    * \|src\|/4 × \|tgt\|; a deployment dials pct down as the corpus
    * grows).
    */
  def bitextRecallAudit(docs: DataFrame, embeddings: DataFrame,
                        srcLang: String = "en", tgtLang: String = "es",
                        k: Int = 4, nBands: Int = 16, bitsPerBand: Int = 4,
                        dims: Int = 64,
                        maxBucket: Int = Dedup.MaxBucketSize,
                        marginThreshold: Double = 1.0,
                        srcSamplePct: Int = 25): DataFrame = {
    val sampledDocs = docs.filter(col("lang") =!= srcLang ||
      srcSample(srcSamplePct, col("doc_id")))
    val lsh = bitextMine(sampledDocs, embeddings, srcLang, tgtLang, k,
        nBands, bitsPerBand, dims, maxBucket, marginThreshold)
      .select(col("src_doc"), col("tgt_doc"))
    val truth = bitextBrute(docs, embeddings, srcLang, tgtLang, k,
        marginThreshold, srcSamplePct)
      .select(col("src_doc"), col("tgt_doc"))
    val nt = truth.agg(count(lit(1)).as("n_truth"))
    val nl = lsh.agg(count(lit(1)).as("n_lsh"))
    val nh = truth.join(lsh, Seq("src_doc", "tgt_doc"))
      .agg(count(lit(1)).as("n_hit"))
    nt.crossJoin(nl).crossJoin(nh)
      .select(col("n_truth"), col("n_lsh"), col("n_hit"),
        (round(col("n_hit").cast("double")
          / col("n_truth").cast("double") * lit(1.0e6), 0)
          / lit(1.0e6)).as("recall_at1"),
        (round(col("n_hit").cast("double")
          / (col("n_truth") + col("n_lsh") - col("n_hit")).cast("double")
          * lit(1.0e6), 0) / lit(1.0e6)).as("pair_jaccard"))
  }

  /** Near-dup graph threshold sweep: edge/node/degree counts of the
    * LSH near-neighbor graph at each candidate cosine threshold — the
    * KNOB audit for the whole graph family ([[knnPagerank]],
    * [[knnCommunities]], [[knnBfs]], dedup clustering all inherit this
    * one parameter): a threshold where the edge count cliffs is a
    * phase boundary (slightly lower floods components together,
    * slightly higher shatters them), and you want to SEE that curve
    * before trusting any downstream clustering. One candidate-pair
    * table (built at the LOOSEST threshold — the knob is a pure
    * post-filter over verified cosines), each pair exploded to the
    * thresholds it clears, then two vocabulary-sized aggregations;
    * mean degree = 2E/N rounds once at the boundary.
    */
  def lshThresholdSweep(embeddings: DataFrame,
                        thresholds: Seq[Double] =
                          Seq(0.35, 0.45, 0.55, 0.65, 0.75)): DataFrame = {
    val pairs = cosineNearDupLsh(embeddings, threshold = thresholds.min)
    val e = pairs.select(col("id1"), col("id2"), col("cosine"))
      .withColumn("threshold",
        explode(array(thresholds.map(lit): _*)))
      .filter(col("cosine") >= col("threshold"))
    val edges = e.groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_edges"))
    val nodes = e
      .select(col("threshold"),
        explode(array(col("id1"), col("id2"))).as("id"))
      .distinct()
      .groupBy(col("threshold")).agg(count(lit(1)).as("n_nodes"))
    edges.join(nodes, Seq("threshold"))
      .select(col("threshold"), col("n_edges"), col("n_nodes"),
        r6(lit(2.0) * col("n_edges") / col("n_nodes"))
          .as("mean_degree"))
      .orderBy(col("threshold"))
  }

  /** Rounded squared L2 distance between two equal-length double arrays
    * — one sequential zip-fold (bit-identical to DuckDB's
    * list_sum∘list_transform∘list_zip), rounded to 6 decimals at the
    * boundary so assignment/ranking ties are cross-engine identical.
    * Backed by the codegen'd [[org.apache.spark.sql.graft.VecL2Sq]]
    * (the HOF reference form survives as [[l2sqHof]] and is asserted
    * equal in TextDedupSpec).
    */
  private def l2sq(a: org.apache.spark.sql.Column,
                   b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    r6(org.apache.spark.sql.graft.VecL2Sq.column(a, b))

  /** The composable higher-order-function reference form of [[l2sq]]. */
  private[graft] def l2sqHof(a: org.apache.spark.sql.Column,
                             b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    r6(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, e) => acc + e))

  /** Product-quantization ANN with asymmetric distance (ADC) — the
    * billion-vector memory-scale path (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): split each vector into
    * `numSub` subspaces, learn a small per-subspace codebook (Lloyd,
    * fixed iterations, deterministic init = sub-vectors of the first
    * `codebookK` vec_ids), encode the corpus as `numSub` byte-sized
    * codes (here 64 doubles → 4 codes: 128× smaller), and score a query
    * against a corpus vector as the SUM of per-subspace distances from
    * a precomputed (query × subspace × code) lookup table — the corpus
    * scan never touches raw vectors.
    *
    * Scale shape: the codebook is numSub×codebookK rows (broadcast);
    * training is fixed map-only scans + tiny aggregations; encoding is
    * map-only after the broadcast; the ADC lookup table is
    * queries×numSub×codebookK rows (broadcast); scoring shuffles
    * (query, neighbor, partial-distance) rows only for the final sum +
    * top-k. Exact-rerank of the PQ top-k against raw vectors is
    * [[annBruteForce]] restricted to the candidates (standard two-stage
    * serving).
    *
    * Determinism: per-subspace distances are rounded to 6 decimals, the
    * cross-vector sum accumulates those exact values as DECIMAL(18,6)
    * (associative — shuffle-order independent), and every ranking tie
    * breaks by id.
    */
  def annPqAdc(embeddings: DataFrame, nQueries: Int = 10, k: Int = 10,
               numSub: Int = 4, codebookK: Int = 16, dims: Int = 64,
               iters: Int = 1): DataFrame = {
    val dsub = dims / numSub
    val n = normed(embeddings)
    // (vec_id, m, sv): the corpus split into per-subspace sub-vectors
    val subs = n.select(col("vec_id"),
      posexplode(array((0 until numSub).map(m =>
        slice(col("v"), m * dsub + 1, dsub)): _*)).as(Seq("m", "sv")))
    // Nearest codebook cell per sub-vector, fully MAP-SIDE: the K cells
    // of each subspace are packed into one array row (numSub rows
    // total, broadcast), and the argmin is an in-row array_min over
    // struct(d2, cell) — lexicographic struct ordering gives exactly
    // the (d2 ASC, cell ASC) total order a row_number window would,
    // with zero shuffle and no K× replication of sub-vector arrays
    // through an exchange. At 10⁹ vectors assignment cost is one corpus
    // scan, full stop.
    def assign(cb: DataFrame): DataFrame = {
      val packed = cb.groupBy(col("m"))
        .agg(collect_list(struct(col("cell"), col("cv"))).as("cbs"))
      subs.join(broadcast(packed), Seq("m"))
        .withColumn("best", array_min(transform(col("cbs"), c =>
          struct(l2sq(col("sv"), c.getField("cv")).as("d2"),
            c.getField("cell").as("cell")))))
        .select(col("vec_id"), col("m"), col("sv"),
          col("best").getField("cell").as("cell"))
    }
    // deterministic init: sub-vectors of vec_id 0..K-1, then Lloyd means
    var cb = subs.filter(col("vec_id") < codebookK)
      .select(col("m"), col("vec_id").cast("int").as("cell"),
        col("sv").as("cv"))
    (1 to iters).foreach { _ =>
      cb = assign(cb)
        .select(col("m"), col("cell"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("m"), col("cell"), col("pos")).agg(avg(col("x")).as("cx"))
        .groupBy(col("m"), col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pcs"))
        .select(col("m"), col("cell"),
          expr("transform(pcs, p -> round(p.cx * 1.0e6, 0) / 1.0e6)").as("cv"))
    }
    // Pin the trained codebook (numSub×K tiny rows): corpus encoding and
    // the ADC table both consume it, and without the checkpoint each
    // broadcast would re-run the whole training chain (its lineage holds
    // `iters`+1 corpus scans). Train once, persist the codebook — the
    // same thing a production PQ build does.
    cb = cb.localCheckpoint(true)
    val codes = assign(cb)
      .select(col("vec_id"), col("m"), col("cell").as("code"))
    // ADC lookup table: query × subspace × code → rounded partial d²
    val dtab = subs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("m"), col("sv").as("qsv"))
      .join(broadcast(cb), Seq("m"))
      .select(col("query_id"), col("m"), col("cell"),
        l2sq(col("qsv"), col("cv")).as("d2"))
    codes
      .join(broadcast(dtab),
        codes("m") === dtab("m") && col("code") === dtab("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("d2").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .cast("double").as("approx_dist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("approx_dist"), col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("approx_dist"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Two-stage ANN serving: PQ-ADC shortlist → EXACT cosine rerank of
    * the `nCandidates` shortlist → top-k. The standard production
    * pattern (the PQ scan touches only codes; raw vectors are fetched
    * for ~3k/k candidates per query), giving near-exact quality at
    * PQ-scan cost. The shortlist join is broadcast (nQueries ×
    * nCandidates rows); the corpus is touched once for the fetch.
    */
  def annPqRerank(embeddings: DataFrame, nQueries: Int = 10, k: Int = 10,
                  nCandidates: Int = 30): DataFrame = {
    val n = normed(embeddings)
    val cand = annPqAdc(embeddings, nQueries, nCandidates)
      .select(col("query_id"), col("neighbor_id"))
    val q = n.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    broadcast(cand)
      .join(n.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm")),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine.as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** One Lloyd assignment step: nearest centroid per vector by rounded
    * cosine, ties to the smallest cell id (cross-engine deterministic),
    * fully MAP-SIDE: the k centroids collapse to ONE array row that
    * broadcasts, and each vector picks its cell with an in-row
    * array_min over struct(-cs, cell) — lexicographic struct ordering
    * reproduces ORDER BY cs DESC, cell ASC exactly. Zero shuffle: no k×
    * replication of vector arrays through a window sort, no join-back
    * to re-attach vectors. Assignment at 10⁹ vectors is one corpus
    * scan.
    */
  def assignCells(n: DataFrame, cents: DataFrame): DataFrame = {
    val packed = cents
      .agg(collect_list(struct(col("cell"), col("cv"), col("c_nrm")))
        .as("cents"))
    n.crossJoin(broadcast(packed))
      .withColumn("best", array_min(transform(col("cents"), c =>
        struct(
          (-r6(vecDot(col("v"), c.getField("cv")) /
            (col("nrm") * c.getField("c_nrm")))).as("ncs"),
          c.getField("cell").as("cell")))))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("best").getField("cell").as("cell"))
  }

  /** Distributed k-means (Lloyd, a FIXED number of iterations so the
    * DuckDB oracle can unroll the same steps): deterministic init
    * (centroid c = the vector with vec_id c), assignment by rounded
    * cosine, new centroid = element-wise mean rounded to 6 decimals.
    * Everything stays in-plan — centroids are k-row aggregates that
    * broadcast; no driver-side collect loop (MLlib collects centroids
    * per iteration; this shape keeps the lineage declarative instead).
    * Corpus cost: iters+1 map-only scans, no corpus shuffle.
    */
  def kmeansCentroids(n: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    var cents = n.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cell"), col("v").as("cv"),
        col("nrm").as("c_nrm"))
    (1 to iters).foreach { _ =>
      cents = assignCells(n, cents)
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("cx"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pcs"))
        .select(col("cell"),
          expr("transform(pcs, p -> round(p.cx * 1.0e6, 0) / 1.0e6)").as("cv"))
        .withColumn("c_nrm", vecNorm(col("cv")))
        // Pin each iteration's k tiny centroid rows: the next assignment
        // broadcasts them, and without the checkpoint that broadcast
        // re-runs every previous iteration's corpus scan (lineage depth
        // grows linearly with iters). Train once per step, like any
        // production coarse-quantizer build.
        .localCheckpoint(true)
    }
    cents
  }

  /** IVF ANN over LEARNED cells: k-means centroids instead of the label
    * shortcut in [[annIvf]] — the production IVF build path (train
    * coarse quantizer, assign corpus once, probe nProbe cells per
    * query). Same probing/scoring shape as [[annIvf]].
    */
  def annIvfKmeans(embeddings: DataFrame, nQueries: Int = 10, k: Int = 10,
                   nProbe: Int = 2, kCells: Int = 8,
                   iters: Int = 2): DataFrame = {
    val n = normed(embeddings)
    val cents = kmeansCentroids(n, kCells, iters)
    annQueryIvf(cents, assignCells(n, cents), nQueries, k, nProbe)
  }

  /** IVF serving straight off a persisted index: `cents` is the k-row
    * frozen coarse quantizer, `cells` the per-vector assignment table
    * ([[assignCells]] or [[refreshIvfAssignments]]). Queries (vec_id <
    * nQueries) probe the nProbe closest centroids (broadcast, k rows)
    * and search exactly within probed cells only. This is the
    * [[annIvfKmeans]] tail exposed on its own so an incrementally
    * refreshed index serves results without re-clustering anything —
    * index-then-query equals cluster-then-query bitwise (asserted in
    * SimilaritySpec).
    */
  def annQueryIvf(cents: DataFrame, cells: DataFrame, nQueries: Int = 10,
                  k: Int = 10, nProbe: Int = 2): DataFrame = {
    val q = cells.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val probed = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("qn"), col("cell"),
        r6(vecDot(col("qv"), col("cv")) / (col("qn") * col("c_nrm")))
          .as("c_cos"))
      .withColumn("c_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("c_cos").desc, col("cell"))))
      .filter(col("c_rank") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell").as("p_cell"))
    val scored = broadcast(probed)
      .join(cells, col("cell") === col("p_cell") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine.as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Daily refresh of the IVF assignment table — the ANN analogue of
    * [[graft.operators.TextAnalysis.refreshBm25Index]]: history
    * assignments are never re-clustered or re-scored; batch vectors not
    * already indexed are assigned to the FROZEN quantizer (one map-side
    * scan over the delta, [[assignCells]]) and appended. The anti join
    * ships bare vec_ids only, so re-appending the same batch is a no-op
    * (idempotent reruns, spec-asserted). This is production IVF posture:
    * the coarse quantizer retrains rarely; the inverted lists grow with
    * every batch. At 100 TB the refresh cost is one scan of the delta
    * plus one id-projected scan of the index — history vectors are never
    * touched.
    */
  def refreshIvfAssignments(cents: DataFrame, histAssign: DataFrame,
                            batch: DataFrame): DataFrame = {
    val delta = normed(batch).join(
      histAssign.select(col("vec_id")), Seq("vec_id"), "left_anti")
    histAssign.select(col("vec_id"), col("v"), col("nrm"), col("cell"))
      .unionByName(assignCells(delta, cents))
  }

  /** The retrain trigger for a frozen IVF quantizer: per cell, how much
    * the incrementally appended members ([[refreshIvfAssignments]]) have
    * grown the inverted list and how much WORSE they fit the frozen
    * centroid than the members it was trained on. `growth_ratio` high →
    * the list is unbalancing (probe cost skews); `cos_drift` positive →
    * the data distribution moved and new vectors land far from every
    * trained centroid. Either crossing a threshold is the signal to
    * retrain the quantizer — the audit production ANN serving runs
    * before trusting a stale index, as a query.
    *
    * Scale shape: one id-projected left-anti-style membership join
    * (bare vec_ids), the k-row centroid broadcast, and a k-row
    * aggregate. Per-vector cosines scale to exact longs pre-sum
    * (order-independent, the [[clusterProfile]] convention); the means
    * and ratios are exact-integer quotients.
    */
  def ivfDriftAudit(cents: DataFrame, histAssign: DataFrame,
                    refreshed: DataFrame): DataFrame = {
    val histIds = histAssign.select(col("vec_id"))
      .withColumn("is_hist", lit(true))
    refreshed.join(broadcast(cents), Seq("cell"))
      .join(histIds, Seq("vec_id"), "left_outer")
      .select(col("cell"),
        coalesce(col("is_hist"), lit(false)).as("is_hist"),
        round(vecDot(col("v"), col("cv")) / (col("nrm") * col("c_nrm"))
          * lit(1e6), 0).cast("long").as("c6"))
      .groupBy(col("cell"))
      .agg(
        sum(when(col("is_hist"), 1L).otherwise(0L)).as("n_hist"),
        sum(when(col("is_hist"), 0L).otherwise(1L)).as("n_new"),
        sum(when(col("is_hist"), col("c6")).otherwise(0L)).as("s6_hist"),
        sum(when(col("is_hist"), 0L).otherwise(col("c6"))).as("s6_new"))
      .select(col("cell"), col("n_hist"), col("n_new"),
        when(col("n_hist") > 0, col("n_new").cast("double") /
          col("n_hist").cast("double")).as("growth_ratio"),
        when(col("n_hist") > 0, col("s6_hist").cast("double") / lit(1e6) /
          col("n_hist").cast("double")).as("mean_cos_hist"),
        when(col("n_new") > 0, col("s6_new").cast("double") / lit(1e6) /
          col("n_new").cast("double")).as("mean_cos_new"),
        when(col("n_hist") > 0 && col("n_new") > 0,
          (col("s6_hist").cast("double") / lit(1e6) /
            col("n_hist").cast("double")) -
          (col("s6_new").cast("double") / lit(1e6) /
            col("n_new").cast("double"))).as("cos_drift"))
      .orderBy(col("cell"))
  }

  /** IVF ANN: centroid per label cell (element-wise mean, rounded to 6
    * decimals so cell assignment is cross-engine deterministic), probe the
    * nProbe closest cells per query, exact top-k within probed cells.
    */
  def annIvf(embeddings: DataFrame, nQueries: Int = 10, k: Int = 10,
             nProbe: Int = 2): DataFrame = {
    val n = normed(embeddings)
    // element-wise mean per cell: explode positions once, re-assemble
    val centroids = n
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos")).agg(avg(col("x")).as("cx"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pcs"))
      .select(col("label").as("c_label"),
        expr("transform(pcs, p -> round(p.cx * 1.0e6, 0) / 1.0e6)").as("cv"))
      .withColumn("c_nrm", vecNorm(col("cv")))
    val q = n.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    // rank cells per query, keep nProbe closest
    val probed = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("qn"), col("c_label"),
        r6(vecDot(col("qv"), col("cv")) / (col("qn") * col("c_nrm")))
          .as("c_cos"))
      .withColumn("c_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("c_cos").desc, col("c_label"))))
      .filter(col("c_rank") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("c_label"))
    // exact search within probed cells only
    val scored = broadcast(probed)
      .join(n, col("label") === col("c_label") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine.as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** 12-decimal DCG rank discounts 1/log₂(r+1), r = 1..k — computed
    * ONCE here and embedded as identical literals in both the Spark
    * plan and the DuckDB oracle (SparkEntry builds the oracle's VALUES
    * table from this same sequence), so no libm log2 ulp can split the
    * engines. */
  def dcgDiscounts(k: Int): Seq[java.math.BigDecimal] =
    (1 to k).map { r =>
      java.math.BigDecimal
        .valueOf(1.0 / (math.log(r + 1.0) / math.log(2.0)))
        .setScale(12, java.math.RoundingMode.HALF_UP)
    }

  /** 12-decimal reciprocal ranks 1/r for MRR — the same shared-literal
    * discipline as [[dcgDiscounts]]. */
  def recipRanks(k: Int): Seq[java.math.BigDecimal] =
    (1 to k).map { r =>
      java.math.BigDecimal.valueOf(1.0 / r)
        .setScale(12, java.math.RoundingMode.HALF_UP)
    }

  /** Graded retrieval evaluation of the IVF ANN ranking against the
    * exact brute-force ranking — the RANK-quality companion of the
    * set-recall audits (`lsh_recall_audit` answers "how much of the
    * truth did we find"; this answers "did we put what we found in the
    * right ORDER"): per query, nDCG@k with graded relevance
    * rel = k+1 − exact_rank, the first-hit rank, and the reciprocal
    * rank (the MRR contribution). An approximate index can hold 90%
    * recall while inverting the head of the ranking — exactly what
    * nDCG catches and recall cannot.
    *
    * Determinism: the only irrational constants (1/log₂(r+1), 1/r) are
    * k pinned 12-decimal literals shared verbatim with the oracle;
    * rel × discount products and their per-query sums are exact
    * decimals; the one double division (DCG/IDCG) happens at the
    * output boundary, rounded to 6.
    *
    * Scale shape: inherits the two rankings' pinned plans (broadcast
    * query sets, per-query top-k windows), then everything is
    * (nQueries × k)-sized: a hits equi-join and two tiny aggregations.
    */
  def retrievalEval(embeddings: DataFrame, nQueries: Int = 10,
                    k: Int = 10, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d1412 = DecimalType(14, 12)
    val discArr = array(dcgDiscounts(k).map(d => lit(d).cast(d1412)): _*)
    val recipArr = array(recipRanks(k).map(d => lit(d).cast(d1412)): _*)
    val truth = annBruteForce(embeddings, nQueries, k)
      .select(col("query_id"), col("neighbor_id"),
        (lit(k + 1) - col("rank")).cast(DecimalType(4, 0)).as("rel"),
        col("rank"))
    val idcg = truth
      .select(col("query_id"),
        (col("rel") * element_at(discArr, col("rank"))).as("t"))
      .groupBy(col("query_id"))
      .agg(sum(col("t")).as("idcg"), count(lit(1)).as("n_truth"))
    val sys = annIvf(embeddings, nQueries, k, nProbe)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").as("sys_rank"))
    val hits = sys.join(
      truth.select(col("query_id"), col("neighbor_id"), col("rel")),
      Seq("query_id", "neighbor_id"))
    val dcg = hits
      .select(col("query_id"), col("sys_rank"),
        (col("rel") * element_at(discArr, col("sys_rank"))).as("t"))
      .groupBy(col("query_id"))
      .agg(sum(col("t")).as("dcg"), count(lit(1)).as("n_hits"),
        min(col("sys_rank")).as("first_hit_rank"))
    idcg.join(dcg, Seq("query_id"), "left")
      .select(col("query_id"), col("n_truth"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("first_hit_rank"),
        r6(coalesce(col("dcg"), lit(0)).cast("double") /
          col("idcg").cast("double")).as("ndcg"),
        coalesce(element_at(recipArr, col("first_hit_rank"))
          .cast("double"), lit(0.0)).as("rr"))
      .orderBy(col("query_id"))
  }

  /** Clustering-quality audit for the k-means coarse quantizer: per
    * cell, the member count and the mean/worst cosine to the cell
    * centroid — the compactness profile that decides whether kCells is
    * right before trusting [[semanticDedup]] or IVF probing with it
    * (sparse cells → over-clustered; low min cosine → under-clustered).
    *
    * One assignment scan + a broadcast join back to the k centroids +
    * one k-row aggregate. Per-vector cosines are rounded to 6 decimals
    * and scaled to exact longs BEFORE summing, so the mean is
    * order-independent at any parallelism.
    */
  def clusterProfile(embeddings: DataFrame, kCells: Int = 8,
                     iters: Int = 2): DataFrame = {
    val n = normed(embeddings)
    val cents = kmeansCentroids(n, kCells, iters)
    val cells = assignCells(n, cents)
    cells.join(broadcast(cents), Seq("cell"))
      .select(col("cell"),
        round(vecDot(col("v"), col("cv")) / (col("nrm") * col("c_nrm"))
          * lit(1e6), 0).cast("long").as("c6"))
      .groupBy(col("cell"))
      .agg(
        count(lit(1)).as("n_vectors"),
        // raw exact-integer quotients, NOT re-rounded (half-micro
        // boundary — see TextAnalysis.lmScore)
        (sum(col("c6")).cast("double") / lit(1e6) /
          count(lit(1)).cast("double")).as("avg_centroid_cos"),
        (min(col("c6")).cast("double") / lit(1e6)).as("min_centroid_cos"))
      .orderBy(col("cell"))
  }

  /** Prototype (diversity-aware) subsampling: keep the `perCell`
    * vectors CLOSEST to each k-means centroid — one prototype set per
    * semantic region, so the sample spans the embedding space instead
    * of oversampling its dense core (the SSL-prototypes/D4 family of
    * curation steps; ordering by cosine ASC instead gives the
    * hard-example variant). One assignment scan + a per-cell top-k that
    * plans as WindowGroupLimit — rank cut before any full-cell sort
    * materializes.
    */
  def diversitySample(embeddings: DataFrame, perCell: Int = 4,
                      kCells: Int = 8, iters: Int = 2): DataFrame = {
    val n = normed(embeddings)
    val cents = kmeansCentroids(n, kCells, iters)
    val cells = assignCells(n, cents)
    cells.join(broadcast(cents), Seq("cell"))
      .select(col("cell"), col("vec_id"),
        round(vecDot(col("v"), col("cv")) / (col("nrm") * col("c_nrm"))
          * lit(1e6), 0).cast("long").as("c6"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("cell"))
          .orderBy(col("c6").desc, col("vec_id"))))
      .filter(col("rk") <= perCell)
      .select(col("cell"), col("rk"), col("vec_id"),
        (col("c6").cast("double") / lit(1e6)).as("centroid_cos"))
      .orderBy(col("cell"), col("rk"))
  }

  /** Hard-negative mining for contrastive embedding training: for each
    * query vector, the top-k most similar SAME-label vectors (positives)
    * and the top-k most similar DIFFERENT-label vectors (hard negatives
    * — high-cosine impostors, the pairs that actually move a contrastive
    * loss). One corpus scan against the broadcast query set, one
    * per-(query, role) top-k window — the [[annBruteForce]] scale shape
    * with a role split; at full-corpus mining the query side becomes the
    * IVF/PQ candidate chain instead of a broadcast.
    */
  def hardNegatives(embeddings: DataFrame, nQueries: Int = 10,
                    k: Int = 3): DataFrame = {
    val n = normed(embeddings)
    val q = n.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("v").as("qv"), col("nrm").as("qn"))
    val scored = n.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        when(col("label") === col("q_label"), "pos").otherwise("neg")
          .as("role"),
        cosine.as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"), col("role"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("role"), col("rank"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with the k-means coarse
    * quantizer, compare embeddings only WITHIN a cell, and drop every
    * vector whose cosine to a lower-id cell-mate reaches the threshold
    * (each semantic neighborhood keeps its lowest id). Returns the full
    * per-vector audit (vec_id, cell, kept) a curation pipeline logs.
    *
    * Scale shape: candidate pairs come from an EQUI-join on cell — the
    * quadratic blowup is bounded by cell size, and kCells grows with the
    * corpus (SemDeDup uses ~100k clusters at web scale) so cells stay
    * O(n/kCells). No collect_list of a cell is ever materialized (cells
    * are far larger than LSH buckets — a posting-list shape would hold a
    * whole cell in one aggregation buffer); the join streams pairs
    * instead. Cells that still exceed `maxCell` degrade to star pairs
    * against the cell's min id — same hot-bucket discipline as
    * [[Dedup.lshCandidates]], mirrored exactly in the oracle.
    */
  def semanticDedup(embeddings: DataFrame, threshold: Double = 0.45,
                    kCells: Int = 8, iters: Int = 2,
                    maxCell: Int = 256): DataFrame = {
    val n = normed(embeddings)
    val cents = kmeansCentroids(n, kCells, iters)
    // assignment is referenced 4× below (both pair sides, star reps, the
    // final audit join); materialize it once — Catalyst re-executes a
    // subplan per reference, and this one holds a corpus scan + the
    // cell window. At scale this is the persisted cell-assignment table
    // every SemDeDup build writes between stages.
    val cells = assignCells(n, cents)
      .withColumn("cn", count(lit(1)).over(Window.partitionBy(col("cell"))))
      .withColumn("cmin", min(col("vec_id")).over(Window.partitionBy(col("cell"))))
      .localCheckpoint(false)
    val small = cells.filter(col("cn") <= maxCell)
    val withinPairs = small.as("a").join(small.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        r6(vecDot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
          .as("cosine"))
    // over-cap cells: every member is compared to the cell's min id only
    // (star pairs) — candidate count degrades from O(cn²) to O(cn)
    val reps = cells.filter(col("vec_id") === col("cmin") && col("cn") > maxCell)
      .select(col("cell").as("r_cell"), col("vec_id").as("id1"),
        col("v").as("rv"), col("nrm").as("rn"))
    val starPairs = cells.filter(col("cn") > maxCell && col("vec_id") > col("cmin"))
      .join(reps, col("cell") === col("r_cell"))
      .select(col("id1"), col("vec_id").as("id2"),
        r6(vecDot(col("rv"), col("v")) / (col("rn") * col("nrm")))
          .as("cosine"))
    val dropped = withinPairs.unionByName(starPairs)
      .filter(col("cosine") >= threshold)
      .select(col("id2").as("vec_id")).distinct()
      .withColumn("is_dup", lit(true))
    cells
      .join(dropped, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"),
        (!coalesce(col("is_dup"), lit(false))).as("kept"))
      .orderBy(col("vec_id"))
  }

  /** PageRank over the embedding near-neighbor graph — graph centrality
    * as a data-selection signal (high-rank vectors sit in dense
    * semantic neighborhoods; low-rank ones are fringe). Edges are the
    * LSH near-dup pairs ([[cosineNearDupLsh]] — banded, capped, never
    * all-pairs), symmetrized.
    *
    * Determinism: double summation is order-dependent, so each
    * iteration's contributions (rank/degree) are rounded to 12 decimals
    * and summed as EXACT decimals; only the per-node teleport+damp
    * update runs in doubles, with the identical expression shape in the
    * oracle — the unrolled-iteration SQL matches bit for bit. The
    * damping/teleport pair is passed as two literals (not 1−d: IEEE
    * 1.0−0.85 ≠ the 0.15 literal by one ulp).
    *
    * Scale shape: the edge list is materialized once and reused across
    * iterations; each iteration is one equi join (edges ⋈ ranks, both
    * partitioned by src) + one hash agg on dst. Iterations are a fixed
    * small constant — the classic bulk-synchronous PageRank schedule.
    */
  def knnPagerank(embeddings: DataFrame, iterations: Int = 5,
                  damping: Double = 0.85, teleport: Double = 0.15)
      : DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(28, 12)
    val pairs = cosineNearDupLsh(embeddings).select(col("id1"), col("id2"))
    val edges = pairs
      .unionByName(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      .toDF("src", "dst")
      .localCheckpoint(false)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("src").as("id")).distinct()
    val nRow = nodes.agg(count(lit(1)).as("n"))
    var r = nodes.crossJoin(broadcast(nRow))
      .select(col("id"),
        r12(lit(1.0) / col("n").cast("double")).cast(dec).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(r.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"),
          r12(col("r").cast("double") / col("deg").cast("double"))
            .cast(dec).as("c"))
      r = contrib.groupBy(col("id")).agg(sum(col("c")).as("sc"))
        .crossJoin(broadcast(nRow))
        .select(col("id"),
          r12(lit(teleport) / col("n").cast("double")
            + lit(damping) * col("sc").cast("double")).cast(dec).as("r"))
    }
    r.join(deg.withColumnRenamed("src", "id"), Seq("id"))
      .select(col("id").as("vec_id"), col("r").cast("double").as("rank"),
        col("deg"))
      .orderBy(col("vec_id"))
  }

  /** Community detection over the same LSH near-neighbor graph:
    * synchronous label propagation [Raghavan et al. 2007], made fully
    * deterministic — every node adopts its neighbors' MODE label each
    * round, ties broken by smallest label, all nodes updating from the
    * previous round's labels simultaneously. Unlike the min-label rule
    * (which converges to connected components — `dedup_clusters`'
    * territory), the mode rule finds DENSE regions: a bridge edge
    * between two tight groups cannot outvote either group's internal
    * majority, so the groups keep distinct labels. Each node's own
    * label joins the vote (a self-loop per node) — without it,
    * synchronous LPA oscillates on bipartite-ish structures (a 2-node
    * component swaps labels every round and lands back on itself after
    * any even count). A fixed iteration count keeps the result
    * engine-independent, letting the DuckDB oracle unroll the same k
    * stages.
    *
    * Scale shape: identical to [[knnPagerank]] — the edge list
    * materializes once and is reused; each round is one edges ⋈ labels
    * equi-join, one (dst, label) count agg, and one per-dst top-1
    * window that Spark executes as WindowGroupLimit (partial top-1
    * before the shuffle).
    */
  def knnCommunities(embeddings: DataFrame, iterations: Int = 4): DataFrame =
    labelPropagation(
      cosineNearDupLsh(embeddings).select(col("id1"), col("id2")),
      iterations)
      .select(col("id").as("vec_id"), col("label").as("community"),
        col("community_size"))
      .orderBy(col("vec_id"))

  /** The LPA core over an undirected (id1, id2) pair list — see
    * [[knnCommunities]] for semantics. Returns (id, label,
    * community_size), unsorted.
    */
  def labelPropagation(pairs: DataFrame, iterations: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = pairs
      .unionByName(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      .toDF("src", "dst")
    val nodes = sym.select(col("src").as("id")).distinct()
    val edges = sym
      .unionByName(nodes.select(col("id").as("src"), col("id").as("dst")))
      .localCheckpoint(false)
    var labels = nodes.select(col("id"), col("id").as("label"))
    for (_ <- 1 to iterations) {
      // mode-with-min-tiebreak as a struct-max argmax: max(n, −label)
      // picks the highest count, ties the smallest label. Two hash
      // aggs with map-side partials instead of a sort + row_number
      // window — one fewer sort per round, same semantics (the oracle
      // keeps the row_number formulation; they must agree).
      labels = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("dst"))
        .agg(max(struct(col("n"), (-col("label")).as("neg"))).as("m"))
        .select(col("dst").as("id"), (-col("m.neg")).as("label"))
    }
    labels.withColumn("community_size",
      count(lit(1)).over(Window.partitionBy(col("label"))))
  }

  /** Triangle counting + local clustering coefficient over the LSH
    * near-neighbor graph — the third graph lens beside [[knnPagerank]]
    * (centrality) and [[knnCommunities]] (partition): how CLIQUISH is
    * each vector's neighborhood. Classic ordered edge-iterator
    * enumeration: with every edge stored (a < b), a wedge a–b–c with
    * a < b < c closes iff (a, c) is an edge — each triangle is counted
    * exactly once, no direction bookkeeping. coefficient =
    * 2·T_v / (deg_v·(deg_v−1)), 0 below degree 2.
    *
    * Scale shape: two equi-joins on the ordered edge list (the wedge
    * build shuffles on the middle vertex, the close on the (a, c)
    * pair); at 100 TB the standard refinement is degree-ordering (store
    * edges low-degree → high-degree so wedge counts are bounded by
    * arboricity) — noted here, unnecessary at LSH-graph densities where
    * the bucket cap already bounds per-node degree.
    */
  def knnTriangles(embeddings: DataFrame): DataFrame =
    triangleStats(cosineNearDupLsh(embeddings).select(col("id1"), col("id2")))

  /** k-core membership over the LSH near-neighbor graph — the fourth
    * graph lens beside centrality ([[knnPagerank]]), partition
    * ([[knnCommunities]]) and cliquishness ([[knnTriangles]]): the
    * k-core is the maximal subgraph where every node keeps ≥ k
    * neighbors, the standard "dense redundant region" cut a curation
    * pipeline uses to find over-represented content (a near-dup CLUSTER
    * has high pairwise degree; a merely-popular node does not).
    * Computed by synchronous peeling: each round drops nodes whose
    * degree among survivors is < k; the k-core is the fixed point.
    *
    * `rounds` bounds the peel depth (peeling a fixed point is a no-op,
    * so extra rounds are idempotent — the fixture and the sf0.001
    * fixpoint spec assert convergence well inside the default). Each
    * round is two semi-joins + one count per surviving node,
    * checkpointed like the CC loop so the plan stays round-sized
    * (the surviving set is referenced twice per round; without the
    * lineage cut the logical plan doubles every round).
    */
  def kCore(pairs: DataFrame, k: Int = 3, rounds: Int = 4): DataFrame = {
    val sym = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .localCheckpoint(false)
    val nodes = sym.select(col("src").as("id")).distinct()
    var surv = nodes
    for (_ <- 1 to rounds) {
      surv = sym
        .join(surv.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(surv.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("id"))
        .localCheckpoint(false)
    }
    val coreDeg = sym
      .join(surv.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(surv.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
      .select(col("src").as("id"), col("core_deg"))
    nodes.join(coreDeg, Seq("id"), "left")
      .select(col("id").as("vec_id"),
        coalesce(col("core_deg"), lit(0L)).as("core_deg"),
        col("core_deg").isNotNull.as("in_kcore"))
      .orderBy(col("vec_id"))
  }

  /** [[kCore]] over the same LSH edge list as the other knn_* lenses. */
  def knnKcore(embeddings: DataFrame, k: Int = 3): DataFrame =
    kCore(cosineNearDupLsh(embeddings).select(col("id1"), col("id2")), k)

  /** Multi-source BFS hop levels over the LSH near-neighbor graph —
    * the TRAVERSAL lens beside centrality ([[knnPagerank]]), density
    * ([[knnCommunities]]), cohesion ([[knnTriangles]]) and resilience
    * ([[knnKcore]]): how far does relatedness propagate from a seed
    * set, with hop distance as the semantic radius (level 1 = direct
    * near-neighbors of a seed, level 2 = neighbors-of-neighbors, …;
    * nodes the wave never reaches are disconnected from the seeds'
    * region). Seeds are the `nSeeds` smallest node ids — a
    * deterministic stand-in for "the flagged documents" in the real
    * use (contamination blast-radius: start from known-bad items, BFS
    * gives everything within k degrees of association).
    *
    * A FIXED `iterations` round count keeps the result a pure data
    * function (the unrolled-CTE oracle convention — no convergence
    * test), and levels are minimal by construction: a node joins the
    * frontier the first round it is seen and is anti-joined away from
    * all later rounds.
    *
    * Scale shape: the edge list materializes once and is reused; each
    * round is one edges ⋈ FRONTIER equi-join (frontier only — not the
    * visited set, so per-round cost is frontier-degree-bounded) + one
    * distinct + one anti join against visited. The classic
    * bulk-synchronous BFS schedule, the same loop discipline as the
    * CC/PageRank families.
    */
  def knnBfs(embeddings: DataFrame, iterations: Int = 4,
             nSeeds: Int = 5): DataFrame =
    bfsLevels(cosineNearDupLsh(embeddings).select(col("id1"), col("id2")),
      iterations, nSeeds)

  /** The BFS core over an (id1, id2) unique pair list — see
    * [[knnBfs]]. Returns (vec_id, level, deg) for every node reached
    * within `iterations` hops of the seed set.
    */
  def bfsLevels(pairs: DataFrame, iterations: Int,
                nSeeds: Int): DataFrame = {
    val edges = pairs
      .unionByName(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      .toDF("src", "dst")
      .localCheckpoint(false)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val seeds = edges.select(col("src").as("id")).distinct()
      .orderBy(col("id")).limit(nSeeds)
    var levels = seeds.select(col("id"), lit(0).as("level"))
      .localCheckpoint(false)
    for (k <- 1 to iterations) {
      val frontier = levels.filter(col("level") === lit(k - 1))
        .select(col("id").as("src"))
      val next = edges.join(frontier, Seq("src"))
        .select(col("dst").as("id")).distinct()
        .join(levels.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), lit(k).as("level"))
      levels = levels.unionByName(next).localCheckpoint(false)
    }
    levels.join(deg.withColumnRenamed("src", "id"), Seq("id"))
      .select(col("id").as("vec_id"), col("level"), col("deg"))
      .orderBy(col("vec_id"))
  }

  /** The triangle/clustering core over an ordered (id1 < id2) unique
    * edge list — see [[knnTriangles]]. Returns (vec_id, deg,
    * n_triangles, clustering) sorted by vec_id.
    */
  def triangleStats(pairs: DataFrame): DataFrame = {
    val e = pairs.select(col("id1"), col("id2")).localCheckpoint(false)
    val deg = e.select(col("id1").as("id"))
      .unionByName(e.select(col("id2").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val wedges = e.select(col("id1").as("a"), col("id2").as("b"))
      .join(e.select(col("id1").as("b"), col("id2").as("c")), Seq("b"))
    val tris = wedges
      .join(e.select(col("id1").as("a"), col("id2").as("c")), Seq("a", "c"))
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id").as("vec_id"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2,
          r6(lit(2.0) * coalesce(col("n_triangles"), lit(0L)).cast("double")
            / (col("deg") * (col("deg") - 1)).cast("double")))
          .otherwise(lit(0.0)).as("clustering"))
      .orderBy(col("vec_id"))
  }

  /** Per-DIMENSION embedding health audit: mean, variance, and the
    * zero-value share of every coordinate, plus a `collapsed` flag for
    * dimensions whose variance has degenerated below `varEps`. This is
    * the table an ANN/semantic-dedup operator reads when recall sags:
    * collapsed dimensions mean the encoder (or a bad cast upstream)
    * stopped using part of the space — cosine contrasts shrink and
    * every LSH/IVF family built on these vectors quietly loses
    * resolution, which no query-level metric localizes to a coordinate.
    *
    * Determinism: each float is widened to double (exact) and rounded
    * to 6 decimals into DECIMAL before the sums; mean/variance divide
    * the exact sums at the boundary in a pinned association order and
    * are re-rounded, so the `collapsed` comparison sees bit-identical
    * operands cross-engine. Scale: posexplode is a flat dims× fan-out
    * fused into the scan; ONE hash agg keyed by dimension (dims-sized
    * result — trivially small).
    */
  /** Dominant principal component of the embedding cloud by FIXED-K
    * power iteration, entirely in-plan — the anisotropy probe beside
    * [[embedDimStats]]: sentence-embedding spaces are notoriously
    * dominated by one direction (Mu & Viswanath 2018, "All-but-the-
    * Top"), and a rising `explained_share` is the drift signal that
    * cosine contrasts are collapsing into it. Emits the 64 loadings
    * plus the eigenvalue and its share of total variance.
    *
    * The iteration count is a FIXED constant, not a convergence test:
    * after exactly K steps the result is a well-defined function of
    * the data, so the DuckDB oracle mirrors it as K unrolled CTE
    * stages and hash-matches — determinism without requiring
    * convergence (loadings after K steps ARE the contract; K=6 is
    * plenty at 64 dims for the drift use).
    *
    * Numerics: every accumulation is an exact DECIMAL sum re-rounded
    * to 6 decimals (doubles summed per group would be partial-order-
    * dependent); the norm's Σw² stays decimal (scale 12) until one
    * sqrt at the boundary. v₀ = 1/8 exactly (a unit vector at 64 dims
    * with an exact binary representation).
    *
    * Scale shape — the corpus is read ONCE: a single pass builds the
    * dims×dims Gram matrix C = Σ x·xᵀ (map-side partial aggregation
    * collapses the per-vector fan-out to the 4096 (i,j) cells before
    * the shuffle), and the K-step recurrence v ← C·v runs entirely on
    * that checkpointed dims²-sized table — per step one 4096-row join
    * + one 64-row agg, independent of corpus size. Eigenvalue = vᵀCv/n
    * and total variance = trace(C)/n also read only the Gram table.
    */
  def embedPcaPower(embeddings: DataFrame, iters: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d6 = DecimalType(18, 6)
    val x = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("vec_id"), col("pos"),
        r6(col("xf").cast("double")).cast(d6).as("xr"))
    val mu = x.groupBy(col("pos"))
      .agg(r6(sum(col("xr")).cast("double") /
        count(lit(1)).cast("double")).cast(d6).as("mur"))
    // the mean vector as ONE array row (dims-sized), broadcast into
    // the centering pass
    val muv = mu.agg(expr(
      "transform(array_sort(collect_list(struct(pos, mur))), s -> s.mur)")
      .as("muv"))
    // ONE corpus pass builds the dims x dims Gram matrix. The pair
    // fan-out happens IN-TASK as a higher-order transform over the
    // centered MICRO-UNIT LONG array (exact: scale-6 decimals times
    // 1e6 are integers; long products are codegen-fast where the
    // equivalent 84M-row decimal self-join measured 73 s at 10x), and
    // map-side partial aggregation collapses it to the 4096 (i, j)
    // cells before the shuffle. Integer sums are accumulation-shape
    // independent, so the oracle mirrors this with a readable
    // self-join over the same units and hash-matches. localCheckpoint
    // pins the tiny result so the K-step recurrence replans only
    // dims^2-sized joins.
    val xcu = embeddings.crossJoin(broadcast(muv))
      .select(col("vec_id"), expr(
        """zip_with(embedding, muv, (x, m) ->
          |  cast((cast(round(cast(x as double) * 1.0e6, 0) / 1.0e6
          |          as decimal(18,6)) - m)
          |       * 1000000 as bigint))""".stripMargin).as("u"))
    // symmetry: emit only the upper triangle (j >= i) per vector —
    // 2080 products instead of 4096 — and mirror the off-diagonal
    // cells AFTER the aggregation (dims²-sized). c_ij = c_ji exactly
    // (identical integer products, identical sums), so the mirrored
    // matrix is bit-equal to the full-fanout build; the corpus-scale
    // explode+agg stage does half the work.
    val gramUpper = xcu.select(explode(expr(
        """flatten(transform(u, (xi, i) ->
          |  transform(slice(u, i + 1, size(u) - i), (xj, j) ->
          |    named_struct('i', i, 'j', i + j, 'p', xi * xj))))"""
          .stripMargin))
        .as("e"))
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      // scale synthesis stays in DECIMAL end to end: unit-sum x 1e-12
      // as exact decimal multiply, then a decimal-space round — a
      // double division before round() lands on the half-micro
      // boundary whenever the unit sum ends in 500000 (observed live
      // on the 25% sample)
      .agg(round(sum(col("e.p").cast(DecimalType(38, 0)))
          .cast(DecimalType(20, 0)) *
          lit(BigDecimal("0.000000000001")).cast(DecimalType(13, 12)), 6)
        .cast(d6).as("c"))
      // pin the triangle BEFORE the mirror union references it twice
      // (both branches would otherwise re-run the corpus pass)
      .localCheckpoint(true)
    val gram = gramUpper.unionByName(gramUpper.filter(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("c")))
    val v0 = mu.select(col("pos"), lit(BigDecimal("0.125")).cast(d6).as("v"))
    val vK = (1 to iters).foldLeft(v0) { (vPrev, _) =>
      val v = vPrev.localCheckpoint(true)
      val w = gram.join(broadcast(
          v.select(col("pos").as("i"), col("v").as("vi"))), Seq("i"))
        .groupBy(col("j"))
        // decimal-space round, same rationale as the Gram cells
        .agg(round(sum((col("c") * col("vi")).cast(DecimalType(38, 12))), 6)
          .cast(d6).as("w6"))
      val nrm = w.agg(
        sqrt(sum((col("w6") * col("w6")).cast(DecimalType(38, 12)))
          .cast("double")).as("nrm"))
      w.crossJoin(broadcast(nrm))
        .select(col("j").as("pos"),
          when(col("nrm") > 0,
            r6(col("w6").cast("double") / col("nrm")))
            .otherwise(0.0).cast(d6).as("v"))
    }
    val n1 = embeddings.agg(count(lit(1)).as("nv"))
    // eigenvalue = v'Cv / n; total variance = trace(C) / n — both read
    // the 4096-row Gram table, never the corpus again. The unit-range
    // loadings narrow to (8,6) so the triple product stays exact.
    val lam = gram
      .join(broadcast(vK.select(col("pos").as("i"),
        col("v").cast(DecimalType(8, 6)).as("vi"))), Seq("i"))
      .join(broadcast(vK.select(col("pos").as("j"),
        col("v").cast(DecimalType(8, 6)).as("vj"))), Seq("j"))
      .crossJoin(broadcast(n1))
      .agg((sum((col("vi") * col("c") * col("vj"))
        .cast(DecimalType(38, 18))).cast("double") /
        max(col("nv")).cast("double")).as("eigenvalue"))
    val tot = gram.filter(col("i") === col("j"))
      .crossJoin(broadcast(n1))
      .agg((sum(col("c")).cast("double") /
        max(col("nv")).cast("double")).as("total_var"))
    vK.crossJoin(broadcast(lam)).crossJoin(broadcast(tot))
      .select((col("pos") + 1).as("dim"),
        col("v").cast("double").as("loading"),
        col("eigenvalue"),
        (col("eigenvalue") / col("total_var")).as("explained_share"))
      .orderBy(col("dim"))
  }

  def embedDimStats(embeddings: DataFrame,
                    varEps: Double = 1e-4): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(28, 6)
    val g = embeddings
      .select(posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select((col("pos") + 1).as("dim"),
        r6(col("xf").cast("double")).cast(dec).as("x"),
        (col("xf") === 0.0f).cast("long").as("z"))
      .withColumn("x2", (col("x") * col("x")).cast(DecimalType(38, 12)))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x2")).as("sxx"), sum(col("z")).as("n_zero"))
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val mean = r6(d("sx") / n)
    val variance =
      r6(d("sxx") / n - (d("sx") / n) * (d("sx") / n))
    g.select(col("dim"), col("n"), mean.as("mean"),
        variance.as("variance"),
        (col("n_zero").cast("double") / n).as("zero_share"),
        (variance < varEps).as("collapsed"))
      .orderBy(col("dim"))
  }

  /** Embedding outlier audit: per label, the `topK` vectors FARTHEST
    * (lowest cosine) from their label's centroid — mislabeled items,
    * encoder failures, or genuine edge cases; the per-class sibling of
    * [[clusterProfile]]'s per-cell compactness view and the screening
    * step before [[hardNegatives]] mines "impostors" that are really
    * labeling noise.
    *
    * The centroid is the per-dim SUM of 1e-6-scaled exact longs —
    * cosine is scale-invariant, so the unnormalized sum vector IS the
    * centroid direction with no order-dependent mean division
    * anywhere; entries stay < 2^53 so the doubles handed to the dot
    * product are exact integers in both engines.
    *
    * Scale shape: one posexplode agg (map-side combinable) to |labels|
    * centroid rows, broadcast back, one scoring scan, WindowGroupLimit
    * bottom-k per label.
    */
  def embedOutliers(embeddings: DataFrame, topK: Int = 20): DataFrame = {
    val n = normed(embeddings)
    val cents = n
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(round(col("x") * 1e6, 0).cast("long")).as("sx"),
        count(lit(1)).as("cn"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("sx")))).as("pcs"),
        max(col("cn")).as("n_label"))
      .select(col("label"), col("n_label"),
        expr("transform(pcs, p -> cast(p.sx as double))").as("cv"))
      .withColumn("c_nrm", vecNorm(col("cv")))
    n.join(broadcast(cents), Seq("label"))
      .select(col("label"), col("n_label"), col("vec_id"),
        r6(vecDot(col("v"), col("cv")) / (col("nrm") * col("c_nrm")))
          .as("centroid_cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("centroid_cos"), col("vec_id"))))
      .filter(col("rank") <= topK)
      .select(col("label"), col("rank"), col("vec_id"),
        col("centroid_cos"), col("n_label"))
      .orderBy(col("label"), col("rank"))
  }

  /** Link prediction over the LSH near-neighbor graph — the MISSING-
    * edge lens beside the five existing knn_* views: which non-
    * adjacent pairs have the strongest mutual neighborhood and are
    * therefore the near-dup edges the banded LSH pass most likely
    * MISSED (or the next semantic merges a curator would review).
    * Scores are the two classics: common-neighbor count and
    * Adamic–Adar Σ 1/ln(deg(w)) over shared neighbors w [Adamic &
    * Adar 2003] — rare shared neighbors count more than hubs.
    *
    * Determinism: 1/ln(deg) is pinned per NODE at the 9-grid and the
    * per-pair score is an exact decimal sum (the λ-grid recipe);
    * ranking orders by the exact decimal, then ids.
    *
    * Scale shape: wedges come from one self-join of the symmetric
    * edge list on the middle vertex — bounded by the LSH bucket caps
    * exactly like [[triangleStats]] — then one (u,v) hash agg, one
    * anti join against existing edges, TakeOrderedAndProject top-k.
    */
  def knnLinkPredict(embeddings: DataFrame, threshold: Double = 0.35,
                     topK: Int = 50): DataFrame =
    // the LOOSE graph (the sweep's lowest knob): the 0.45 near-dup
    // graph is a union of isolated cliques by construction, so open
    // wedges — the whole candidate set — only exist below it
    linkPredict(
      cosineNearDupLsh(embeddings, threshold).select(col("id1"), col("id2")),
      topK)

  /** The link-prediction core over an ordered (id1 < id2) unique pair
    * list — see [[knnLinkPredict]]. Returns the top-k strongest
    * non-edges by (aa_score, ids).
    */
  def linkPredict(pairList: DataFrame, topK: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val pairs = pairList.select(col("id1"), col("id2"))
      .localCheckpoint(false)
    val edges = pairs
      .unionByName(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      .toDF("src", "dst")
    val wgt = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2) // a deg-1 node centers no wedge
      .select(col("src").as("w"),
        // 1/ln(deg) pinned at 1e-9 units (round(v*1e9, 0) - the
        // lm_score form, never round(v, 9) + decimal cast)
        round(lit(1.0) / log(col("deg").cast("double")) *
          lit(1000000000.0), 0).cast("long").as("aa9"))
    val wedges = edges.select(col("src").as("w"), col("dst").as("u"))
      .join(edges.select(col("src").as("w"), col("dst").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
    wedges.join(wgt, Seq("w"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"),
        sum(col("aa9")).cast(DecimalType(38, 0)).as("s9"))
      .join(pairs.select(col("id1").as("u"), col("id2").as("v")),
        Seq("u", "v"), "left_anti")
      .orderBy(col("s9").desc, col("u"), col("v"))
      .limit(topK)
      .select(col("u").as("id1"), col("v").as("id2"), col("cn"),
        (col("s9").cast("double") / lit(1000000000.0)).as("aa_score"))
  }


  /** Matryoshka-style dimension-truncation retrieval audit: how much
    * of full-dimension brute-force top-k recall survives when queries
    * and corpus are truncated to the first d dimensions (d ∈ 4/8/16)?
    * The capacity-planning table for storing short embedding prefixes
    * (MRL; Kusupati et al. 2022) — if recall@10 at d=16 is already
    * ~1, the ANN tier can index a quarter of the bytes.
    *
    * Per dim: the same broadcast-query brute-force scan as
    * [[annBruteForce]] on sliced vectors, hits counted against the
    * full-dim truth set, and exact integer recall (truncating
    * micro-division over queries × k). Shares the ann family's
    * query-bounded broadcast shape.
    */
  def matryoshkaEval(embeddings: DataFrame, nQueries: Int = 10,
                     k: Int = 10,
                     dims: Seq[Int] = Seq(4, 8, 16)): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val truth = annBruteForce(embeddings, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(false)
    val qids = truth.select(col("query_id")).distinct()
    val n = normed(embeddings)
    def micro(c: Column) = c.cast("double") / lit(1000000.0)
    val perDim = dims.map { d =>
      val nd = n.select(col("vec_id"), expr(s"slice(v, 1, $d)").as("v"))
        .withColumn("nrm", vecNorm(col("v")))
      val q = nd.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val sys = nd.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosine.as("cosine"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cosine").desc, col("neighbor_id"))))
        .filter(col("rank") <= k)
      qids
        .join(sys.join(truth, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as("hits")),
          Seq("query_id"), "left_outer")
        .select(coalesce(col("hits"), lit(0L)).as("hits"))
        .agg(count(lit(1)).as("nq"), sum(col("hits")).as("th"),
          min(col("hits")).as("mh"))
        .select(lit(d).as("dim"), col("nq").as("n_queries"),
          micro(expr(s"(th * 1000000) div (nq * $k)")).as("mean_recall"),
          micro(expr(s"(mh * 1000000) div $k")).as("min_recall"))
    }
    perDim.reduce(_ unionByName _).orderBy(col("dim"))
  }


  /** Degree assortativity of the kNN near-dup graph — the
    * degree-mixing capstone of the graph family (pagerank/kcore/
    * triangles/communities/bfs/link-predict all read LOCAL structure;
    * assortativity is the one-number GLOBAL mixing pattern: r > 0 =
    * hubs link to hubs (a dense duplicated core), r < 0 = hubs link
    * to leaves (star-shaped near-dup clusters — the common shape when
    * one canonical doc spawns many variants)).
    *
    * r is the Pearson correlation of (deg(src), deg(dst)) over the
    * symmetrized edge list: degrees are exact integers, all five
    * moment sums are exact (driver-held BigInt, far inside 2^53 under
    * the LSH bucket caps), the two sqrts are IEEE exactly-rounded,
    * and the one division is pinned at micro-units.
    */
  def knnAssortativity(embeddings: DataFrame): DataFrame =
    assortativityOf(
      cosineNearDupLsh(embeddings).select(col("id1"), col("id2")))

  /** The moment computation over an undirected (id1, id2) pair list —
    * public so callers (and specs) can drive any edge list (a star is exactly
    * −1) without steering LSH.
    */
  def assortativityOf(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val edges = pairs
      .unionByName(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      .toDF("src", "dst")
      .localCheckpoint(false)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val m = edges
      .join(deg.toDF("src", "dx"), Seq("src"))
      .join(deg.toDF("dst", "dy"), Seq("dst"))
      .agg(count(lit(1)).as("m"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
      .collect().head
    def b(c: String) = BigInt(m.getAs[Long](c))
    val (mm, sx, sy) = (b("m"), b("sx"), b("sy"))
    val (vx, vy) = (mm * b("sxx") - sx * sx, mm * b("syy") - sy * sy)
    val nNodes = deg.count()
    // micro-unit integers emitted as DOUBLE (u/1e6) - the
    // no-DECIMAL-outputs envelope
    def microLit(units: BigInt) =
      lit(units.toLong.toDouble / 1.0e6)
    val rCol =
      if (vx > 0 && vy > 0)
        microLit(BigInt(math.round((mm * b("sxy") - sx * sy).toDouble /
          (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)) * 1e6)))
      else lit(null).cast("double")
    pairs.sparkSession.range(1).select(
      lit(nNodes).as("n_nodes"),
      lit((mm / 2).toLong).as("n_edges"),
      microLit(sx * 1000000 / mm).as("mean_edge_degree"),
      rCol.as("assortativity"))
  }
}
