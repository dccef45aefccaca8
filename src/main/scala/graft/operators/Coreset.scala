package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.Vectors.vecDot

/** Coreset selection over the embedding corpus — k-center greedy
  * (farthest-point traversal; Gonzalez 1985's 2-approximation to the
  * k-center objective, the construction Sener & Savarese 2018 use for
  * core-set active learning and dataset-distillation pipelines use to
  * pick a small representative training subset): start from a seed,
  * repeatedly select the point FARTHEST from the selected set, and
  * maintain every point's distance-to-nearest-center as running state.
  *
  * Spark shape (the BPE/k-means discipline): the corpus-scale state is
  * ONE frame (vec_id, v, nrm, dmin6) refreshed by a map-only `least`
  * fold per round; each round's selection is a 1-row max(struct)
  * argmax fold pulled to the driver (K is parameter-bounded, like the
  * BPE merge ledger), and the picked vector re-enters the plan as a
  * broadcast literal — no corpus-scale window, no crossJoin, no
  * driver-side corpus pull, ever. Each round eagerly localCheckpoints
  * the state so round r scans the CHECKPOINTED state once instead of
  * re-deriving r chained map stages (the mmFit lineage discipline);
  * K rounds = K corpus scans, the textbook cost of the construction.
  *
  * Determinism (the ann/bitext discipline): distances live on a 1e-6
  * integer grid — d6 = 1e6 − round(cos·1e6) — every `least` fold and
  * every argmax compares exact integers, ties break to the smaller
  * vec_id, and the DuckDB oracle unrolls the same K stages over the
  * same pinned integers (MATERIALIZED per stage, the BT lesson).
  */
object Coreset {

  /** Default number of selected centers (picks including the seed). */
  val K = 8

  /** Extension picks for the phased lifecycle twin. */
  val KExtend = 4

  /** One selected center: rank (1-based selection order), id, the
    * k-center radius when it was picked (max distance-to-selected over
    * the remaining corpus; null for the seed), and its vector/norm so
    * downstream stages never rescan the corpus for center payloads.
    */
  private[graft] case class Pick(rank: Int, vecId: Long,
                                 radius6: Option[Long],
                                 v: Seq[Double], nrm: Double)

  private def d6(v: Column, litV: Column, nrm: Column,
                 litNrm: Double): Column =
    lit(1000000L) -
      round(vecDot(v, litV) / (nrm * lit(litNrm)) * lit(1.0e6), 0)
        .cast("long")

  /** (vec_id, v, nrm) of one id — a 1-row lookup fold. */
  private def rowOf(n: DataFrame, id: Long): (Seq[Double], Double) = {
    val r = n.filter(col("vec_id") === id)
      .select(col("v"), col("nrm")).head()
    (r.getSeq[Double](0), r.getDouble(1))
  }

  /** Greedy loop: run `picks` selection rounds over `state`
    * (vec_id, v, nrm, dmin6), returning the picks (rank-stamped from
    * `rank0`) and the post-update state (every remaining point's dmin6
    * reflects ALL picked centers — the persisted nightly state the
    * phased twin folds a delta into).
    */
  private def greedy(state0: DataFrame, picks: Int, rank0: Int)
      : (Seq[Pick], DataFrame) = {
    var state = state0
    val sel = Seq.newBuilder[Pick]
    for (r <- 0 until picks) {
      // 1-row argmax: (dmin6, -vec_id) is unique, so the struct
      // ordering never reaches the payload fields. A corpus smaller
      // than the requested k fails diagnosably (max over an empty
      // state is a NULL struct), never with a bare NPE.
      val m = state.agg(max(struct(col("dmin6"),
          (-col("vec_id")).as("nid"), col("v"), col("nrm"))).as("m"))
        .select(col("m.dmin6"), col("m.nid"), col("m.v"), col("m.nrm"))
        .head()
      require(!m.isNullAt(0),
        s"kcenter greedy exhausted the corpus after $r of $picks picks" +
          " — requested more centers than remaining points")
      val (dm, id) = (m.getLong(0), -m.getLong(1))
      val (pv, pn) = (m.getSeq[Double](2), m.getDouble(3))
      sel += Pick(rank0 + r, id, Some(dm), pv, pn)
      state = state.filter(col("vec_id") =!= id)
        .withColumn("dmin6",
          least(col("dmin6"), d6(col("v"), typedLit(pv), col("nrm"), pn)))
        .localCheckpoint(true)
    }
    (sel.result(), state)
  }

  /** Seed (min vec_id) + initial distance state over `n` =
    * Similarity.normed output restricted to (vec_id, v, nrm).
    */
  private def seeded(n: DataFrame): (Pick, DataFrame) = {
    val seedId = n.agg(min(col("vec_id"))).head().getLong(0)
    val (sv, sn) = rowOf(n, seedId)
    val state = n.filter(col("vec_id") =!= seedId)
      .withColumn("dmin6", d6(col("v"), typedLit(sv), col("nrm"), sn))
      .localCheckpoint(true)
    (Pick(1, seedId, None, sv, sn), state)
  }

  private def normedState(embeddings: DataFrame): DataFrame =
    Similarity.normed(embeddings).select(col("vec_id"), col("v"),
      col("nrm"))

  /** Internal: full selection = seed + (k−1) greedy picks, plus the
    * final state (used by the phased twin).
    */
  private def select(embeddings: DataFrame, k: Int)
      : (Seq[Pick], DataFrame) = {
    val (seed, state0) = seeded(normedState(embeddings))
    val (picks, state) = greedy(state0, k - 1, 2)
    (seed +: picks, state)
  }

  private def picksToDf(spark: org.apache.spark.sql.SparkSession,
                        picks: Seq[Pick]): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("radius",
        org.apache.spark.sql.types.DoubleType)))
    val rows = picks.map(p => Row(p.rank, p.vecId,
      p.radius6.map(_.toDouble / 1e6).map(Double.box).orNull))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy(col("rank"))
  }

  /** The k-center greedy coreset: K selected centers with the k-center
    * radius at each pick (a non-increasing sequence — the coverage
    * guarantee the selection buys, spec-asserted).
    */
  def kcenter(embeddings: DataFrame, k: Int = K): DataFrame = {
    val (picks, _) = select(embeddings, k)
    picksToDf(embeddings.sparkSession, picks)
  }

  /** Coverage audit: every corpus point assigned to its NEAREST
    * selected center (integer distance, ties to the smaller center
    * id), per-center membership count + max/mean radius. The scan is
    * one broadcast-K fan-out over the corpus — the selection's quality
    * as data, the lsh_recall_audit discipline.
    */
  def assign(embeddings: DataFrame, k: Int = K): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (picks, _) = select(embeddings, k)
    val n = normedState(embeddings)
    // centers as a K-row broadcast frame (vectors from the driver-held
    // picks — no corpus rescan for center payloads); the crossJoin is
    // the intentional K-per-row fan-out, K parameter-bounded
    val centers = picks.map(p =>
        (p.vecId, p.v, p.nrm)).toDF("cid", "cv", "cn")
    val withD = n.crossJoin(broadcast(centers))
      .select(col("vec_id"), col("cid"),
        (lit(1000000L) - round(vecDot(col("v"), col("cv"))
          / (col("nrm") * col("cn")) * lit(1.0e6), 0).cast("long"))
          .as("d6"))
    val nearest = withD.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id")).orderBy(col("d6"), col("cid"))))
      .filter(col("rn") === 1)
    nearest.groupBy(col("cid").as("center_id"))
      .agg(count(lit(1)).as("n_points"),
        (max(col("d6")).cast("double") / lit(1.0e6)).as("max_radius"),
        (round(sum(col("d6")).cast("double") / count(lit(1)), 0)
          / lit(1.0e6)).as("mean_radius"))
      .orderBy(col("center_id"))
  }

  /** Phased lifecycle twin — selection is APPEND-ONLY in production (a
    * distilled subset already shipped to training is never re-drawn
    * nightly): the persisted state is the selected centers plus every
    * remaining point's dmin6; a DELTA folds in by scoring its points
    * against the K existing centers (one broadcast-K map pass — the
    * history state is NEVER rescanned against new centers it already
    * reflects) and the greedy continues for `kMore` picks over the
    * union. Output = all K + kMore picks with their phase. The oracle
    * unrolls the same phased chain, so "extend ≡ re-run" is pinned
    * exactly — for the PHASED semantics, which differ from a fresh
    * (K + kMore)-center selection over the union by construction
    * (the greedy is order-dependent; that asymmetry is the documented
    * production contract, not drift).
    */
  def extend(embeddings: DataFrame, isHist: Column, k: Int = K,
             kMore: Int = KExtend): DataFrame = {
    val spark = embeddings.sparkSession
    val n = normedState(embeddings)
    val (basePicks, histState) = {
      val (seed, state0) = seeded(n.filter(isHist))
      val (picks, st) = greedy(state0, k - 1, 2)
      (seed +: picks, st)
    }
    // delta entry: dmin6 = min distance over ALL existing centers —
    // a least-fold over K driver-held literals, one map pass
    val deltaState = n.filter(!isHist)
      .withColumn("dmin6",
        basePicks.map(p =>
            d6(col("v"), typedLit(p.v), col("nrm"), p.nrm))
          .reduce(least(_, _)))
      .localCheckpoint(true)
    val (morePicks, _) =
      greedy(histState.unionByName(deltaState), kMore, k + 1)
    picksToDf(spark, basePicks ++ morePicks)
      .withColumn("phase",
        when(col("rank") <= k, lit("base")).otherwise(lit("extend")))
      .orderBy(col("rank"))
  }
}
