package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication suite for training-data pipelines over `documents`:
  * exact (hash-groupBy), MinHash+LSH (shingle→minhash→band→bucket-join),
  * SimHash, and n-gram Jaccard.
  *
  * Scale design (the point of each variant):
  *  - exact: one shuffle keyed by content hash — the 100 TB baseline.
  *  - MinHash+LSH: O(n) signature pass + band-bucket join, so candidate
  *    generation never goes O(n²); only band-colliding pairs are verified
  *    with an exact Jaccard. This is the standard web-scale near-dup
  *    pipeline (shingle → minhash → LSH band → verify).
  *  - SimHash: one 60-bit signature per doc, O(n) map-only; near-dup =
  *    small Hamming distance, bucketable by signature prefix at scale.
  *  - n-gram Jaccard: inverted-index join (pairs must share ≥1 shingle) —
  *    exact but quadratic in the worst case; the LSH path is the scale
  *    version of the same semantic.
  *
  * Hashes are md5-derived (cross-engine exact, see TextFunctions.hash60);
  * no UDFs anywhere — shingling and signatures are higher-order array
  * expressions, the rest is joins + aggregations Catalyst can plan freely.
  */
object Dedup {

  val NumHashes = 16
  val NumBands = 4 // 4 rows per band

  /** Exact dedup: group by content hash, keep the smallest doc_id as the
    * canonical representative.
    */
  def exact(docs: DataFrame): DataFrame = docs
    .groupBy(md5(col("text")).as("fp"))
    .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_docs"))
    .orderBy(col("fp"))

  /** (doc_id, shingle-hash) pairs — the exploded distinct-3-gram
    * inverted index shared by MinHash and Jaccard. Shingles are carried
    * as their 60-bit hashes, never as strings: one md5 per shingle, and
    * every downstream join/dedup shuffles 8-byte longs instead of
    * ~20-byte strings (cross-engine exact — the oracle computes the
    * same hash; a 60-bit collision merging two shingles has probability
    * ~|shingles|²/2⁶¹ and would affect both engines identically).
    */
  def shingled(docs: DataFrame): DataFrame = docs.select(
    col("doc_id"),
    explode(array_distinct(
      transform(shinglesCol(tokensCol(col("text"))), s => hash60(s))))
      .as("shingle"))

  /** MinHash signatures: one row per doc, h0..h15 = min over shingles of
    * 16 seeded hashes. Single groupBy — the 16 mins ride one shuffle.
    */
  def minhashSignatures(docs: DataFrame): DataFrame =
    minhashSignaturesFrom(shingled(docs))

  private def minhashSignaturesFrom(sh: DataFrame): DataFrame = {
    // shingle column already carries the base hash60 (see shingled)
    val aggs = (0 until NumHashes).map(i =>
      min(seededFromHash(i, col("shingle"))).as(s"h$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: docs whose signatures collide in ≥1 band of 4
    * consecutive minhash rows. Returns (d1, d2) with d1 < d2, distinct.
    */
  def lshCandidates(sigs: DataFrame): DataFrame = {
    val rowsPerBand = NumHashes / NumBands
    val bandKeys = (0 until NumBands).map { b =>
      md5(concat_ws(",",
        (0 until rowsPerBand).map(r => col(s"h${rowsPerBand * b + r}")): _*))
    }
    val bands = sigs.select(col("doc_id"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
    // same one-shuffle posting-list shape as ngramJaccardPairs: group by
    // bucket, emit each bucket's ordered pairs map-side, distinct
    bands
      .groupBy(col("band"), col("bkey"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .select(explode(expr(
        """flatten(transform(ds,
          |  (x, i) -> transform(slice(ds, i + 2, size(ds)),
          |            y -> struct(x AS d1, y AS d2))))""".stripMargin))
        .as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
  }

  /** Exact Jaccard verification of candidate pairs against the shingle
    * index; keeps pairs with similarity ≥ threshold.
    */
  def verifyJaccard(cand: DataFrame, sh: DataFrame,
                    threshold: Double): DataFrame = {
    // NOTE: `cand` must appear exactly ONCE in this plan — expressing a
    // "restrict sh to candidate docs first" semi-join would reference
    // cand twice and Catalyst re-executes the whole candidate subplan
    // per reference (no automatic subplan caching): measured 3× slower.
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sh.as("s2"),
        col("d2") === col("s2.doc_id") && col("s1.shingle") === col("s2.shingle"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.as("c1"), col("d1") === col("c1.doc_id"))
      .join(cnt.as("c2"), col("d2") === col("c2.doc_id"))
      .select(col("d1"), col("d2"),
        round(col("inter").cast("double")
          / (col("c1.n") + col("c2.n") - col("inter")).cast("double"), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Full MinHash+LSH near-dup pipeline: signatures → band collisions →
    * exact-Jaccard verify ≥ threshold.
    *
    * The shingle index is referenced three times (signatures, both sides
    * of the verify join); `localCheckpoint` materializes it once instead
    * of re-exploding the corpus per reference — at scale you'd persist
    * the index as a table between pipeline stages, this is the
    * single-query equivalent.
    */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = shingled(docs).localCheckpoint(false)
    verifyJaccard(lshCandidates(minhashSignaturesFrom(sh)), sh, threshold)
      .orderBy(col("d1"), col("d2"))
  }

  /** Exact n-gram Jaccard near-dup via the inverted index (no LSH):
    * every pair sharing ≥1 shingle is scored. The exact-but-quadratic
    * twin of [[minhashLshPairs]].
    *
    * One pass: the shingle self-join streams straight into a pair-count
    * aggregation — |A∩B| per pair with NO materialized candidate set, no
    * distinct, no re-join of the shingle index (3 shuffles fewer than the
    * naive candidates→verify shape; ~4× faster at sf0.1).
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = shingled(docs)
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // co-shingled pairs WITHOUT a self-join: group the inverted index by
    // shingle once (one shuffle of the index instead of two), generate
    // each posting list's ordered pairs map-side, count per pair
    val inter = sh
      .groupBy(col("shingle"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .select(explode(expr(
        """flatten(transform(ds,
          |  (x, i) -> transform(slice(ds, i + 2, size(ds)),
          |            y -> struct(x AS d1, y AS d2))))""".stripMargin))
        .as("p"))
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.as("c1"), col("d1") === col("c1.doc_id"))
      .join(cnt.as("c2"), col("d2") === col("c2.doc_id"))
      .select(col("d1"), col("d2"),
        round(col("inter").cast("double")
          / (col("c1.n") + col("c2.n") - col("inter")).cast("double"), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("d1"), col("d2"))
  }

  /** Connected components over near-dup pairs → cluster representative
    * per document (the step that turns pairwise near-dup detection into
    * actual dedup groups). Iterative min-label propagation: each round
    * every node adopts the smallest label among itself and its
    * neighbors; converges in O(component diameter) rounds. Each round is
    * one join + one aggregation — the standard large-graph CC shape
    * (no driver-side graph). Lineage is truncated per round
    * (localCheckpoint) so plans stay O(1) deep.
    */
  def clusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val p = pairs.select(col("d1"), col("d2")).localCheckpoint(true)
    val edges = p.select(col("d1").as("a"), col("d2").as("b"))
      .union(p.select(col("d2").as("a"), col("d1").as("b")))
      .localCheckpoint(true)
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("rep", col("id")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val nbrMin = edges.join(labels, col("b") === col("id"))
        .groupBy(col("a")).agg(min(col("rep")).as("nbr"))
      val updated = labels.join(nbrMin, col("id") === col("a"), "left")
        .select(col("id"), col("rep"),
          least(col("rep"), coalesce(col("nbr"), col("rep"))).as("rep2"))
        .localCheckpoint(true)
      changed = updated.filter(col("rep2") < col("rep")).count()
      labels = updated.select(col("id"), col("rep2").as("rep"))
      iter += 1
    }
    labels.select(col("id").as("doc_id"), col("rep").as("cluster_rep"))
  }

  /** 60-bit SimHash per document: sign-aggregated bit votes of every
    * token hash (term frequency preserved — duplicate tokens vote twice).
    * Pure higher-order expressions: no explosion, no shuffle, one pass.
    * (Bit j of token hash extracted via `div pow(2,j)` — exact for j<60
    * since pow(2,j) is exactly representable — because the shift builtins
    * take only literal shift amounts.)
    */
  def simhash(docs: DataFrame): DataFrame = docs.select(
    col("doc_id"),
    expr(
      """aggregate(
        |  zip_with(
        |    aggregate(
        |      transform(split(text, ' '),
        |        t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)),
        |      array_repeat(0L, 60),
        |      (acc, h) -> zip_with(acc,
        |        transform(sequence(0, 59),
        |          j -> if(((h div cast(pow(2, j) as bigint)) % 2) = 1, 1L, -1L)),
        |        (a, b) -> a + b)),
        |    sequence(0, 59),
        |    (c, j) -> if(c > 0, cast(pow(2, j) as bigint), 0L)),
        |  0L, (acc, x) -> acc + x)""".stripMargin).as("simhash"))
}
