package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash60

/** Entity resolution (record linkage) — the structured-data sibling of
  * the near-dup text family. A 100 TB training corpus carries entity
  * tables (users, merchants, instruments, publishers) ingested from
  * multiple feeds with typos, formatting drift, and partial overlap;
  * before those tables can key anything they must be resolved: block
  * candidate pairs cheaply, score each pair with the Fellegi–Sunter
  * log-likelihood model, classify, and transitively close the matches
  * into entities with one survivor record each.
  *
  * Harness ground truth: source A is `customer` verbatim; source B is
  * a deterministically corrupted re-observation of ~90% of it (typo'd
  * names, perturbed balances, occasionally re-labelled segments and
  * nations) built from the same portable md5-based hash family the
  * dedup corpora use, so every query is DuckDB-oracle exact AND true
  * links are known (b_id − [[BIdOffset]] = a_id), which turns
  * blocking recall / match precision into measured columns instead of
  * prose.
  *
  * Scale shape (the 100 TB design):
  *  - Blocking is two UNIONed equi-join passes on composite keys
  *    ((nation, segment) and (nation, $500 balance band)) — never a
  *    cross join; per-(key, side) membership is capped at
  *    [[MaxBlockSize]] by a deterministic hash rank (the
  *    MaxBucketSize discipline from the LSH family), so one hot key
  *    bounds fan-out instead of exploding the shuffle. Lost recall
  *    from the cap is MEASURED by [[erEval]]'s blocking_recall, the
  *    remedy is finer composite keys (more passes), not a bigger cap.
  *  - u-probabilities (chance agreement among non-matches) come from
  *    data, not priors: segment u by the exact value-frequency
  *    identity Σ_v pA(v)·pB(v) (two group-bys), fuzzy-field u from a
  *    hash-bucket pseudo-random pairing whose bucket count scales
  *    with |B| (≈[[UPairsPerA]] sampled partners per A record — the
  *    sample stays LINEAR in the data, never quadratic).
  *  - m-probabilities are fixed documented priors (the unsupervised
  *    Fellegi–Sunter practice); the eval query measures the resulting
  *    operating point so threshold tuning is evidence-driven.
  *  - Transitive closure reuses [[Dedup.clusters]]' pointer-jumping
  *    CC (O(log diameter) rounds, no driver barrier per round).
  *
  * Reference scope: the reference has no record-linkage surface
  * (nearest is the silver dedup, bronze_to_silver_trades.py:74);
  * this family is part of the training-data-pipeline extension.
  */
object EntityResolution {

  /** B-side record ids live at A-id + this offset (id spaces disjoint,
    * A ids always smaller → cluster reps prefer the clean source). */
  val BIdOffset = 10000000L

  /** Per-(blocking key, side) membership cap — hash-ranked, so the
    * kept subset is deterministic and unbiased. */
  val MaxBlockSize = 256

  /** The PRODUCTION key-set cap: the persisted master index, the
    * incremental path and the streaming hop all block with the finer
    * 3-pass keys at this cap — measured dominant over 2-pass at
    * [[MaxBlockSize]] (SCALING.md round-14 table: blocking recall
    * 0.964 vs 0.833 at 10×, wall 21.9 vs 54.6 s). The 2-pass/256 form
    * stays as `er_match`/`er_candidates`' self-contained cross-check.
    */
  val MasterCap = 128

  /** Target sampled non-match partners per A record for fuzzy-field
    * u estimation (bucket count = max(1, |B| / this)). */
  val UPairsPerA = 20

  /** Fellegi–Sunter m-priors: P(field agreement | records co-refer).
    * Fixed documented constants (classic unsupervised FS practice —
    * u comes from data, m from priors or EM; one set of priors serves
    * every scale because m is a property of the corruption process,
    * not of corpus size). */
  val MNameExact = 0.80
  val MNameClose = 0.15
  val MSeg = 0.90
  val MAb = 0.85

  /** Match / possible-match score thresholds (log2-likelihood units). */
  val ThMatch = 6.0
  val ThPossible = 0.0

  private val Segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  private def r6(c: Column): Column = round(c * lit(1.0e6), 0) / lit(1.0e6)

  private def h(tag: String, k: Column): Column =
    hash60(concat(lit(tag), k.cast("string")))

  /** Source A: `customer` verbatim, balance in exact integer cents
    * (every downstream comparison stays in integer arithmetic). */
  def sourceA(customer: DataFrame): DataFrame = customer.select(
    col("c_custkey").cast("long").as("rec_id"),
    col("c_name").as("name"),
    col("c_nationkey").cast("long").as("nat"),
    col("c_mktsegment").as("seg"),
    round(col("c_acctbal") * lit(100.0), 0).cast("long").as("ab_c"))

  /** Source B: deterministic corrupted re-observation of ~90% of A.
    * Name: 20% one dropped char, 10% upper-cased, 10% trailing space;
    * balance: 25% ±99¢; segment: 5% re-labelled; nation: 2% off-by-one
    * (those lose BOTH blocking passes — the measured blocking-recall
    * floor). All draws from the portable seeded-hash family.
    */
  def sourceB(customer: DataFrame): DataFrame = {
    val a = sourceA(customer)
    val keep = a.filter(h("er_drop_", col("rec_id")) % 10 =!= 0)
    val hNm = h("er_nm_", col("rec_id")) % 10
    val p = (h("er_pos_", col("rec_id")) % length(col("name"))) + 1
    val dropped = concat(
      col("name").substr(lit(1), p - 1),
      col("name").substr(p + 1, lit(200)))
    val segIdx = (h("er_seg2_", col("rec_id")) % 5).cast("int") + 1
    keep.select(
      (col("rec_id") + lit(BIdOffset)).as("rec_id"),
      when(hNm.isin(0, 1), dropped)
        .when(hNm === 2, upper(col("name")))
        .when(hNm === 3, concat(col("name"), lit(" ")))
        .otherwise(col("name")).as("name"),
      when(h("er_nat_", col("rec_id")) % 50 === 0, (col("nat") + 1) % 25)
        .otherwise(col("nat")).as("nat"),
      when(h("er_seg_", col("rec_id")) % 20 === 0,
        element_at(
          array(Segments.map(lit): _*), segIdx))
        .otherwise(col("seg")).as("seg"),
      when(h("er_ab_", col("rec_id")) % 4 === 0,
        col("ab_c") + (h("er_ab2_", col("rec_id")) % 199) - 99)
        .otherwise(col("ab_c")).as("ab_c"))
  }

  /** Blocking keys for one side: two rows per record (pass p1 =
    * (nation, segment), pass p2 = (nation, $500 balance band)),
    * hash-rank capped at [[MaxBlockSize]] per (key, side). The +$1000
    * shift keeps the band dividend non-negative (floor ≡ truncate in
    * every engine only above zero).
    */
  private def blocked(recs: DataFrame, side: String,
                      cap: Int = MaxBlockSize,
                      finerKeys: Boolean = false): DataFrame = {
    val band = floor((col("ab_c") + lit(100000L)) / lit(50000.0)).cast("long")
    val twoPass = recs
      .select(col("rec_id"),
        concat(lit("s|"), col("nat"), lit("|"), col("seg")).as("bkey"))
      .union(recs.select(col("rec_id"),
        concat(lit("b|"), col("nat"), lit("|"), band).as("bkey")))
    val keyed =
      if (!finerKeys) twoPass
      else twoPass.union(recs.select(col("rec_id"),
        concat(lit("n|"), col("nat"), lit("|"), nameBucket).as("bkey")))
    keyed.withColumn("brk", row_number().over(
        Window.partitionBy(col("bkey"))
          .orderBy(h(s"er_cap${side}_", col("rec_id")), col("rec_id"))))
      .filter(col("brk") <= cap)
      .select(col("rec_id"), col("bkey"))
  }

  /** The FINER third-pass key: (nation, last-2 digits of the name's
    * first digit run) — SCALING.md's documented remedy for
    * fixed-cardinality blocking, as a key instead of prose. ~100
    * buckets per nation (vs 5 segments / ~20 bands), and
    * corruption-robust where it counts: upper-casing, trailing
    * spaces, and balance perturbation don't touch digits at all; a
    * dropped character hits the last-2 digit window rarely (~2/len of
    * the 20% channel), and those residual losses are what the OTHER
    * two passes still catch. Per-block membership under this key
    * grows ~1/100th as fast as the (nation, segment) blocks, so the
    * cap stops binding at much larger corpora — measured in
    * SCALING.md's round-14 table.
    */
  private def nameBucket: Column =
    substring(regexp_extract(col("name"), "[0-9]+", 0), -2, 2)

  /** Row-wise blocking keys — the STREAMING-safe variant of [[blocked]]
    * (one map-only explode per record, no window, no cap: a streaming
    * delta is batch-bounded by construction; the cap lives on the
    * persisted master side). Same (rec_id, bkey) multiset as
    * [[blocked]]'s FINER 3-pass key-union (the production key set —
    * must stay in lockstep with [[masterIndex]], or the streamed
    * candidates silently diverge from the batch incremental's), minus
    * the rank cut.
    */
  def blockKeysRowwise(recs: DataFrame): DataFrame = {
    val band = floor((col("ab_c") + lit(100000L)) / lit(50000.0)).cast("long")
    recs.select(col("rec_id"), explode(array(
      concat(lit("s|"), col("nat"), lit("|"), col("seg")),
      concat(lit("b|"), col("nat"), lit("|"), band),
      concat(lit("n|"), col("nat"), lit("|"), nameBucket))).as("bkey"))
  }

  /** The persisted master-side blocking index a production deployment
    * keeps on disk: the capped (bkey, a_id) postings of source A —
    * what the incremental and streaming twins join deltas against.
    * Carries the finer 3-pass key set at [[MasterCap]] (round-14's
    * measured remedy, wired into the path that persists).
    */
  def masterIndex(a: DataFrame, cap: Int = MasterCap): DataFrame =
    blocked(a, "A", cap, finerKeys = true)
      .select(col("bkey"), col("rec_id").as("a_id"))

  /** Candidate pairs: bipartite equi-join of the two capped key sets,
    * one row per (a, b) with which pass(es) produced it. Output:
    * (a_id, b_id, via_attr, via_band).
    */
  def candidates(a: DataFrame, b: DataFrame,
                 cap: Int = MaxBlockSize,
                 finerKeys: Boolean = false): DataFrame =
    blocked(a, "A", cap, finerKeys)
      .select(col("rec_id").as("a_id"), col("bkey"))
      .join(
        blocked(b, "B", cap, finerKeys)
          .select(col("rec_id").as("b_id"), col("bkey")),
        "bkey")
      .groupBy(col("a_id"), col("b_id"))
      .agg(
        max(when(col("bkey").startsWith("s|"), 1L).otherwise(0L))
          .cast("boolean").as("via_attr"),
        max(when(col("bkey").startsWith("b|"), 1L).otherwise(0L))
          .cast("boolean").as("via_band"))

  /** Chance-agreement (u) probabilities, all from data:
    * (u_name_exact, u_name_close, u_seg, u_ab) as one 1-row frame.
    * Exact-match u via the value-frequency identity over normalized
    * names and segments; fuzzy u (close-name, balance-within-$1) over
    * a hash-bucket pairing with |B|/[[UPairsPerA]] buckets.
    */
  def uProbabilities(a: DataFrame, b: DataFrame): DataFrame = {
    val an = a.select(col("rec_id").as("a_id"),
      lower(trim(col("name"))).as("nm_a"), col("seg").as("seg_a"),
      col("ab_c").as("ab_a"))
    val bn = b.select(col("rec_id").as("b_id"),
      lower(trim(col("name"))).as("nm_b"), col("seg").as("seg_b"),
      col("ab_c").as("ab_b"))
    val nA = an.agg(count(lit(1)).as("n_a"))
    val nB = bn.agg(count(lit(1)).as("n_b"))
    // Σ_v nA(v)·nB(v) joins are value-keyed — tiny for seg, name-sized
    // for names, never quadratic.
    val segU = an.groupBy(col("seg_a").as("v")).agg(count(lit(1)).as("ca"))
      .join(bn.groupBy(col("seg_b").as("v")).agg(count(lit(1)).as("cb")), "v")
      .agg(sum(col("ca") * col("cb")).as("seg_hits"))
    val nameU = an.groupBy(col("nm_a").as("v")).agg(count(lit(1)).as("ca"))
      .join(bn.groupBy(col("nm_b").as("v")).agg(count(lit(1)).as("cb")), "v")
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("name_hits"))
    // linear pseudo-random pairing: bucket count scales with |B|
    val sv = nB.select(greatest(lit(1L),
      floor(col("n_b") / UPairsPerA).cast("long")).as("sv"))
    val pa = an.crossJoin(broadcast(sv))
      .withColumn("uk", h("er_u_", col("a_id")) % col("sv"))
      .select(col("uk"), col("nm_a"), col("ab_a"))
    val pb = bn.crossJoin(broadcast(sv))
      .withColumn("uk", h("er_u2_", col("b_id")) % col("sv"))
      .select(col("uk"), col("nm_b"), col("ab_b"))
    val sampled = pa.join(pb, "uk")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("nm_a") === col("nm_b"), 1L).otherwise(0L))
          .as("n_exact"),
        sum(when(col("nm_a") =!= col("nm_b") &&
            levenshtein(col("nm_a"), col("nm_b")) <= 2, 1L).otherwise(0L))
          .as("n_close"),
        sum(when(abs(col("ab_a") - col("ab_b")) <= 100, 1L).otherwise(0L))
          .as("n_ab"))
    sampled.crossJoin(broadcast(nA)).crossJoin(broadcast(nB))
      .crossJoin(broadcast(segU)).crossJoin(broadcast(nameU))
      .select(
        greatest(col("name_hits") / (col("n_a") * col("n_b")
          ).cast("double"), lit(1.0e-9)).as("u_name_exact"),
        greatest(col("n_close") / col("n_pairs").cast("double"),
          lit(1.0e-9)).as("u_name_close"),
        greatest(col("seg_hits") / (col("n_a") * col("n_b")
          ).cast("double"), lit(1.0e-9)).as("u_seg"),
        greatest(col("n_ab") / col("n_pairs").cast("double"),
          lit(1.0e-9)).as("u_ab"),
        col("n_a"), col("n_b"), col("n_pairs"))
  }

  /** The model's data-derived parameters as a 1-row audit: the four
    * chance-agreement probabilities (1e-9-pinned for the report — the
    * scoring path consumes them unpinned) beside the populations and
    * the non-match sample size that estimated the fuzzy ones. The
    * first thing to read when the match curve moves between runs: did
    * the DATA's chance-agreement structure change, or the code?
    */
  def uAudit(a: DataFrame, b: DataFrame): DataFrame = {
    def r9(c: Column): Column = round(c * lit(1.0e9), 0) / lit(1.0e9)
    uProbabilities(a, b).select(
      col("n_a"), col("n_b"), col("n_pairs"),
      r9(col("u_name_exact")).as("u_name_exact"),
      r9(col("u_name_close")).as("u_name_close"),
      r9(col("u_seg")).as("u_seg"),
      r9(col("u_ab")).as("u_ab"))
  }

  private def log2(c: Column): Column = log(c) / log(lit(2.0))

  /** Fellegi–Sunter scoring of the blocked candidates: per-field
    * agreement levels (name 3-level: exact / levenshtein≤2 / differ,
    * segment exact, balance within $1), log2(m/u) agreement weights and
    * log2((1−m)/(1−u)) disagreement weights, summed and 1e-6-pinned.
    * Output: (a_id, b_id, gamma_name, seg_agree, ab_agree, score,
    * verdict).
    */
  def matchScores(a: DataFrame, b: DataFrame,
                  cap: Int = MaxBlockSize,
                  finerKeys: Boolean = false): DataFrame =
    scoreCandidates(candidates(a, b, cap, finerKeys), a, b,
      uProbabilities(a, b))

  /** Incremental ER — the nightly-delta twin (the lifecycle discipline
    * every index family carries): the master A's blocking index is
    * what production persists (re-derived here from the same rows),
    * the u probabilities are FROZEN on the already-resolved history
    * batch (chance agreement is a corpus property — re-estimating it
    * per delta would make yesterday's verdicts irreproducible), and
    * only the DELTA is keyed, capped (delta-local B-side caps: the
    * batch is what the job sees), joined, and scored — under the
    * production 3-pass key set at [[MasterCap]], matching the
    * persisted [[masterIndex]]. Work scales with the delta, never the
    * history.
    */
  def incrementalMatches(a: DataFrame, bHist: DataFrame,
                         bDelta: DataFrame): DataFrame =
    scoreCandidates(candidates(a, bDelta, MasterCap, finerKeys = true),
      a, bDelta, uProbabilities(a, bHist))

  /** Sink-side scoring of a LANDED candidate-pair table (a_id, b_id)
    * — the batch compaction that closes the streaming hop
    * ([[graft.streaming.Streams.erCandidateStream]] emits
    * retrieval-only pairs; Fellegi–Sunter needs both records' fields
    * plus the frozen u, so scoring happens over the landed sink):
    * exactly [[incrementalMatches]]' scoring half, u frozen on the
    * resolved history.
    */
  def scoreDeltaCandidates(cand: DataFrame, a: DataFrame,
                           bDelta: DataFrame,
                           bHist: DataFrame): DataFrame =
    scoreCandidates(cand, a, bDelta, uProbabilities(a, bHist))

  private def scoreCandidates(cand: DataFrame, a: DataFrame,
                              b: DataFrame, u: DataFrame): DataFrame = {
    val an = a.select(col("rec_id").as("a_id"),
      lower(trim(col("name"))).as("nm_a"), col("seg").as("seg_a"),
      col("ab_c").as("ab_a"))
    val bn = b.select(col("rec_id").as("b_id"),
      lower(trim(col("name"))).as("nm_b"), col("seg").as("seg_b"),
      col("ab_c").as("ab_b"))
    val g = cand.join(an, "a_id").join(bn, "b_id")
      .withColumn("gamma_name",
        when(col("nm_a") === col("nm_b"), 2)
          .when(levenshtein(col("nm_a"), col("nm_b")) <= 2, 1)
          .otherwise(0))
      .withColumn("seg_agree", col("seg_a") === col("seg_b"))
      .withColumn("ab_agree", abs(col("ab_a") - col("ab_b")) <= 100)
    val uNClose = greatest(col("u_name_close"), lit(1.0e-9))
    val uNDiff = greatest(
      lit(1.0) - col("u_name_exact") - col("u_name_close"), lit(1.0e-9))
    val wName =
      when(col("gamma_name") === 2, log2(lit(MNameExact) / col("u_name_exact")))
        .when(col("gamma_name") === 1, log2(lit(MNameClose) / uNClose))
        .otherwise(log2(lit(1.0 - MNameExact - MNameClose) / uNDiff))
    val wSeg = when(col("seg_agree"), log2(lit(MSeg) / col("u_seg")))
      .otherwise(log2(lit(1.0 - MSeg) / (lit(1.0) - col("u_seg"))))
    val wAb = when(col("ab_agree"), log2(lit(MAb) / col("u_ab")))
      .otherwise(log2(lit(1.0 - MAb) / (lit(1.0) - col("u_ab"))))
    g.crossJoin(broadcast(u))
      .withColumn("score", r6(wName + wSeg + wAb))
      .select(col("a_id"), col("b_id"), col("gamma_name"),
        col("seg_agree"), col("ab_agree"), col("score"),
        when(col("score") >= ThMatch, "match")
          .when(col("score") >= ThPossible, "possible")
          .otherwise("nonmatch").as("verdict"))
  }

  /** Operating-point evaluation against the harness ground truth
    * (b_id − [[BIdOffset]] = a_id): per score threshold, predicted
    * pairs / true positives / precision / recall / F1, plus the
    * threshold-independent blocking recall (true links surviving
    * blocking ÷ all true links). Linear aggregations only — the pair
    * table is scanned once per output row set, not per threshold.
    */
  def erEval(a: DataFrame, b: DataFrame,
             thresholds: Seq[Double] = Seq(0, 2, 4, 6, 8, 10, 12),
             cap: Int = MaxBlockSize,
             finerKeys: Boolean = false): DataFrame =
    erEvalFromIndex(matchScores(a, b, cap, finerKeys), b, thresholds)

  /** [[erEval]] served off the PERSISTED match index (the production
    * deployment keeps the scored-pair table on disk — evaluation must
    * not re-pay blocking + u-estimation + scoring; the
    * bm25_incremental discipline). Every requested threshold emits a
    * row even when no pair reaches it (n_pred = 0, prec NULL) — an
    * inner theta-join would silently thin the operating curve and
    * starve a regression gate reading a fixed threshold row.
    */
  def erEvalFromIndex(idx: DataFrame, b: DataFrame,
                      thresholds: Seq[Double] = Seq(0, 2, 4, 6, 8, 10, 12)
                     ): DataFrame = {
    val scores = idx
      .withColumn("is_true", col("b_id") - lit(BIdOffset) === col("a_id"))
    val spark = idx.sparkSession
    import spark.implicits._
    val th = thresholds.toDF("threshold")
    val nTrue = b.agg(count(lit(1)).as("n_true_links"))
    val base = scores.agg(
      sum(when(col("is_true"), 1L).otherwise(0L)).as("n_true_blocked"))
    val perTh0 = scores.join(broadcast(th),
        col("score") >= col("threshold"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_pred"),
        sum(when(col("is_true"), 1L).otherwise(0L)).as("n_tp"))
    val perTh = th.join(perTh0, Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_tp"), lit(0L)).as("n_tp"))
    perTh.crossJoin(broadcast(nTrue)).crossJoin(broadcast(base))
      .select(col("threshold"), col("n_pred"), col("n_tp"),
        col("n_true_links"),
        when(col("n_pred") > 0,
          r6(col("n_tp") / col("n_pred").cast("double"))).as("prec"),
        r6(col("n_tp") / col("n_true_links").cast("double")).as("rec"),
        r6(lit(2.0) * col("n_tp") /
          (col("n_pred") + col("n_true_links")).cast("double")).as("f1"),
        r6(col("n_true_blocked") / col("n_true_links").cast("double"))
          .as("blocking_recall"))
      .orderBy(col("threshold"))
  }

  /** Transitive closure of the `match`-verdict pairs into entities
    * (pointer-jumping CC, [[Dedup.clusters]]) + survivorship: one row
    * per entity with the canonical record (lowest rec_id — the clean
    * source wins by id construction), member count, source mix, and
    * the balance spread left unresolved inside the entity. Singleton
    * records (no match) stay out, as in the dedup cluster family.
    */
  def entities(a: DataFrame, b: DataFrame): DataFrame =
    entitiesFromIndex(matchScores(a, b), a, b)

  /** [[entities]] served off the persisted match index — the CC and
    * survivorship rollup never re-pay the scored-pair build. */
  def entitiesFromIndex(idx: DataFrame, a: DataFrame,
                        b: DataFrame): DataFrame = {
    val matched = idx.filter(col("verdict") === "match")
      .select(col("a_id").as("d1"), col("b_id").as("d2"))
    entityRollup(matched,
      a.withColumn("src", lit("A")).unionByName(b.withColumn("src", lit("B"))))
  }

  /** Takedown (right-to-be-forgotten) twin: retired master records are
    * ANTI-JOINED out of the persisted match-pair index and the entity
    * graph is re-closed over the survivors — match SCORES are served
    * frozen (the bitext_retire discipline: takedown must not force a
    * re-estimation pass over 100 TB). B observations whose A twin
    * retired keep any OTHER surviving matches or silently drop out of
    * the entity table.
    */
  def entitiesAfterRetire(a: DataFrame, b: DataFrame,
                          retired: DataFrame): DataFrame =
    entitiesAfterRetireFromIndex(matchScores(a, b), a, b, retired)

  /** [[entitiesAfterRetire]] served off the persisted match index —
    * takedown anti-joins the FROZEN scored pairs, never re-scores. */
  def entitiesAfterRetireFromIndex(idx: DataFrame, a: DataFrame,
                                   b: DataFrame,
                                   retired: DataFrame): DataFrame = {
    val surviving = idx.filter(col("verdict") === "match")
      .join(broadcast(retired), col("a_id") === retired("rec_id"),
        "left_anti")
      .select(col("a_id").as("d1"), col("b_id").as("d2"))
    val recs = a.join(broadcast(retired), Seq("rec_id"), "left_anti")
      .withColumn("src", lit("A"))
      .unionByName(b.withColumn("src", lit("B")))
    entityRollup(surviving, recs)
  }

  private def entityRollup(pairs: DataFrame, recs: DataFrame): DataFrame = {
    val assign = Dedup.clusters(pairs)
      .select(col("doc_id").as("rec_id"), col("cluster_rep").as("entity_id"))
    assign.join(recs, "rec_id")
      .groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_records"),
        countDistinct(col("src")).as("n_sources"),
        min_by(col("name"), col("rec_id")).as("canonical_name"),
        (max(col("ab_c")) - min(col("ab_c"))).as("ab_spread_c"))
      .orderBy(col("entity_id"))
  }
}
