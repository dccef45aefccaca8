package graft.operators

import org.apache.spark.sql.DataFrame
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

  private def cosine = round(
    vecDot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)

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

  /** Global top-k most-similar pairs by cosine (exact, O(n²) self-join;
    * plans as TakeOrderedAndProject — no global sort materialized).
    */
  def topPairs(embeddings: DataFrame, k: Int = 20): DataFrame = {
    val n = normed(embeddings)
    val a = n.select(col("vec_id").as("id1"), col("v").as("qv"),
      col("nrm").as("qn"))
    val b = n.select(col("vec_id").as("id2"), col("v"), col("nrm"))
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosine.as("cosine"))
      .orderBy(col("cosine").desc, col("id1"), col("id2"))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine ≥
    * threshold (the last member of the dedup suite — near-dup by
    * embedding rather than text). Exact O(n²) here; at 100 TB bucket by
    * coarse quantization (IVF cells / LSH hyperplane signs) first and
    * compare within buckets only, like [[Dedup.minhashLshPairs]].
    */
  def cosineNearDupPairs(embeddings: DataFrame,
                         threshold: Double = 0.45): DataFrame = {
    val n = normed(embeddings)
    val a = n.select(col("vec_id").as("id1"), col("v").as("qv"),
      col("nrm").as("qn"))
    val b = n.select(col("vec_id").as("id2"), col("v"), col("nrm"))
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosine.as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("id1"), col("id2"))
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
        expr("transform(pcs, p -> round(p.cx, 6))").as("cv"))
      .withColumn("c_nrm", vecNorm(col("cv")))
    val q = n.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    // rank cells per query, keep nProbe closest
    val probed = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("qn"), col("c_label"),
        round(vecDot(col("qv"), col("cv")) / (col("qn") * col("c_nrm")), 6)
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
}
