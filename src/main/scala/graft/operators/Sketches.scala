package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic mergeable sketches — the map-side path for cardinality
  * at 100 TB, built so the oracle can verify them EXACTLY.
  *
  * Spark's own sketches (HLL++ `approx_count_distinct`, t-digest
  * `percentile_approx`) are engine-specific: no external oracle can
  * reproduce their estimates bit-for-bit, so they are bound-checked in
  * CapsAndLshSpec rather than oracle-gated (see `approx_profile`'s
  * note). The KMV (k-minimum-values) sketch closes that gap: its state
  * is the k smallest values of a uniform hash — pure order statistics,
  * reproducible in ANSI SQL — and its estimator (k−1)·H/h_k [Bar-Yossef
  * et al. 2002; Beyer et al. SIGMOD'07 "distinct-value synopses"] is a
  * single arithmetic expression. So the ESTIMATE itself hash-matches
  * the DuckDB oracle while keeping the properties that matter at scale:
  *   - bounded state: k longs per group, whatever the cardinality;
  *   - mergeable: union the k-min sets, re-take the k smallest —
  *     KMV(A ∪ B) = kmin_k(KMV(A) ∪ KMV(B)), exactly (the property
  *     `kmvMergeDaily` asserts row-by-row against the direct sketch);
  *   - exact below k: with fewer than k distinct hashes the sketch IS
  *     the distinct set, so small groups report exact counts.
  *
  * Plan shape: one (group, hash)-distinct two-stage agg, then a
  * row_number window that Spark 3.5+ rewrites to WindowGroupLimit —
  * each map task keeps only its local k smallest before the shuffle,
  * so the shuffle carries O(groups · k) rows, not O(distinct values).
  */
object Sketches {
  /** Version-safe k-decimal pin (SCALING.md trap #10): both engines
    * round the SAME IEEE double at scale 0. Oracle twins mirror the
    * ·10^k association. */
  private def r4(c: Column): Column = round(c * lit(1.0e4), 0) / lit(1.0e4)
  private def r6s(c: Column): Column = round(c * lit(1.0e6), 0) / lit(1.0e6)


  /** 2^60 — the exclusive upper bound of [[TextFunctions.hash60]]. */
  val HashRange: Double = 1152921504606846976.0

  private def kminRanked(hashes: DataFrame, groupCols: Seq[String], k: Int) = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    hashes.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** KMV estimate columns over a ranked k-min set: m = retained hashes,
    * h_k = the largest. Estimate is exact (= m) while m < k.
    */
  private def estimate(k: Int): Column = {
    val m = count(lit(1))
    val hk = max(col("h"))
    when(m < k, m.cast("double"))
      .otherwise(r4(lit((k - 1).toDouble) * lit(HashRange) / hk.cast("double")))
  }

  /** k-min STATE fold — the mergeable-state half of KMV for streaming
    * hops: the k smallest distinct hashes per group of (previous state
    * ∪ delta hashes). KMV(A ∪ B) = kmin_k(KMV(A) ∪ KMV(B)), so folding
    * per micro-batch is exact, idempotent (re-folding the same hashes
    * is a no-op), and keeps ≤ k rows per group of state.
    */
  def kmvStateFold(hashes: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame =
    kminRanked(hashes.distinct(), groupCols, k)
      .select(groupCols.map(col) :+ col("h"): _*)

  /** The KMV estimate read off a persisted k-min state table. */
  def kmvEstimateFromState(state: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame =
    state.groupBy(groupCols.map(col): _*)
      .agg(estimate(k).as("kmv_est"))

  /** Distinct-cardinality sketch report per group:
    * (group..., n_exact, kmv_est, rel_err). `value` is hashed with a
    * salted hash60 so the sketch is reproducible anywhere md5 exists.
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
      k: Int, salt: String): DataFrame = {
    val hashes = df
      .select(groupCols.map(col) :+
        TextFunctions.hash60(concat(lit(salt), value)).as("h"): _*)
      .distinct()
    val est = kminRanked(hashes, groupCols, k)
      .groupBy(groupCols.map(col): _*)
      .agg(estimate(k).as("kmv_est"))
    val exact = hashes.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_exact"))
    exact.join(est, groupCols)
      .select(groupCols.map(col) ++ Seq(col("n_exact"), col("kmv_est"),
        r4(abs(col("kmv_est") - col("n_exact").cast("double")) /
          col("n_exact").cast("double")).as("rel_err")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** The merge path: per-(group, day) partial sketches (the shape a
    * daily job persists) are unioned per group and re-capped to the k
    * smallest; the merged estimate is compared against the direct
    * whole-history sketch. `merge_consistent` must be uniformly true —
    * that equality is the algebraic property that lets 365 daily
    * sketch tables answer a yearly cardinality without re-reading the
    * year (KMV(A ∪ B) = kmin_k(KMV(A) ∪ KMV(B))).
    */
  def kmvMergeDaily(df: DataFrame, groupCols: Seq[String], dayCol: Column,
      value: Column, k: Int, salt: String): DataFrame = {
    val hashes = df
      .select(groupCols.map(col) ++ Seq(dayCol.as("day"),
        TextFunctions.hash60(concat(lit(salt), value)).as("h")): _*)
      .distinct() // distinct within (group, day): the daily sketch input
    // daily partial sketches: k-min per (group, day)
    val partials = kminRanked(hashes, groupCols :+ "day", k)
      .select(groupCols.map(col) :+ col("h"): _*)
    // merge = union of partials, re-ranked; duplicates across days
    // collapse first (a value seen on many days is one distinct)
    val merged = kminRanked(partials.distinct(), groupCols, k)
      .groupBy(groupCols.map(col): _*)
      .agg(estimate(k).as("merged_est"))
    // direct sketch over the whole history (day-agnostic)
    val direct = kminRanked(
        hashes.select(groupCols.map(col) :+ col("h"): _*).distinct(),
        groupCols, k)
      .groupBy(groupCols.map(col): _*)
      .agg(estimate(k).as("direct_est"))
    merged.join(direct, groupCols)
      .select(groupCols.map(col) ++ Seq(col("merged_est"), col("direct_est"),
        (col("merged_est") === col("direct_est")).as("merge_consistent")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Mergeable histogram quantiles — the oracle-able stand-in for
    * t-digest (whose sketch bytes no external oracle can reproduce,
    * see `approx_profile`): a fixed equi-width histogram over the
    * global value bounds, per-group cumulative counts, and the
    * quantile estimate read off as the left edge of the first bin
    * whose cumulative count reaches ⌈q·n⌉. Bin counts are plain sums —
    * trivially mergeable across partitions, days, or shards (the
    * property percentile_disc lacks: exact quantiles need a global
    * sort or full value multiset at query time; histogram state is
    * nBins longs per group forever). The exact discrete percentile
    * rides along for the error columns; the estimate's error bound is
    * one bin width by construction.
    *
    * Scale shape: one bounds agg (1-row broadcast), one (group, bin)
    * count — map-side combinable — then grid-sized arithmetic. The
    * exact column is the one non-mergeable cost and exists only to
    * grade the estimate.
    */
  def quantileHistogram(df: DataFrame, groupCol: String, value: Column,
      nBins: Int = 256, qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val base = df.select(col(groupCol).as("g"), value.as("v"))
    val bounds = base.agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    val binned = base.crossJoin(broadcast(bounds))
      .withColumn("bin", when(col("vmax") === col("vmin"), lit(0L))
        .otherwise(least(lit(nBins - 1),
          floor((col("v") - col("vmin")) * nBins / (col("vmax") - col("vmin"))))))
    val counts = binned.groupBy(col("g"), col("bin"))
      .agg(count(lit(1)).as("cnt"),
        max(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
    // left bin edge in value units
    val edge = col("vmin") +
      col("bin").cast("double") * (col("vmax") - col("vmin")) / nBins
    val ests = qs.map { q =>
      min(when(col("cum") >= ceil(col("n") * q), r6s(edge))).as(estName(q))
    }
    val exacts = qs.map { q =>
      expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY v)").as(exactName(q))
    }
    val est = cum.groupBy(col("g")).agg(ests.head, ests.tail: _*)
    val exact = base.groupBy(col("g")).agg(exacts.head, exacts.tail: _*)
    val errs = qs.map { q =>
      r6s(abs(col(estName(q)) - col(exactName(q)))).as(errName(q))
    }
    exact.join(est, Seq("g"))
      .select(col("g").as(groupCol) +:
        qs.flatMap(q => Seq(col(exactName(q)), col(estName(q)))) ++: errs: _*)
      .orderBy(col(groupCol))
  }

  /** k salted bit positions per fingerprint row (`h` column) →
    * (word, mask) with 63 usable bits per word.
    */
  def bloomPositions(df: DataFrame, mBits: Int, k: Int): DataFrame = df
    .withColumn("j", explode(array((0 until k).map(lit): _*)))
    .withColumn("pos", TextFunctions.seededFromHashCol(col("j"), col("h")) % mBits)
    .withColumn("word", floor(col("pos") / 63).cast("long"))
    .withColumn("mask", expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))"))

  /** The filter itself: (word, bits) rows. Filters over shards/days
    * merge by `bit_or` per word — union the word tables and re-group
    * (the algebra BloomSpec asserts: build(A ∪ B) == merge(build(A),
    * build(B))).
    */
  def bloomWords(keys: DataFrame, mBits: Int, k: Int): DataFrame =
    bloomPositions(keys, mBits, k)
      .groupBy(col("word")).agg(bit_or(col("mask")).as("bits"))

  /** Bloom-filter membership audit — the third sketch beside KMV
    * (cardinality) and the histogram (quantiles): a bit array built
    * from the HISTORY's content fingerprints, probed by the delta, with
    * the measured false-positive rate reported against the theoretical
    * (1 − e^(−kn/m))^k. The filter is stored as (word, bits) rows —
    * 63 usable bits per BIGINT word (the sign bit stays clear so shift
    * arithmetic is portable; DuckDB checks 1<<63 as overflow) — and
    * merges across shards/days by plain `bit_or` per word: the property
    * that makes it the 100 TB pre-join membership gate (probe the
    * filter BEFORE shuffling a delta against a petabyte index; only
    * bloom-positive rows pay the join). No false negatives by
    * construction — spec-asserted, and the audit counts prove it in
    * every run: every true member must hit.
    *
    * Returns one row: (n_probes, n_true_members, n_bloom_hits,
    * n_false_pos, bits_set, fp_rate, fp_theoretical).
    */
  def bloomAudit(hist: DataFrame, delta: DataFrame,
      mBits: Int = 16384, k: Int = 7): DataFrame = {
    def fp(df: DataFrame) = df.select(col("doc_id"),
      md5(col("text")).as("key"),
      TextFunctions.hash60(concat(lit("bf_"), md5(col("text")))).as("h"))
    val histKeys = fp(hist).select(col("key"), col("h")).distinct()
    val words = bloomWords(histKeys, mBits, k)
    // probe: a delta doc is bloom-positive iff ALL k bits are set
    val probes = bloomPositions(fp(delta), mBits, k)
      .join(words, Seq("word"), "left")
      .withColumn("hit",
        (coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) === col("mask")))
      .groupBy(col("doc_id"), col("key"))
      .agg(min(col("hit")).as("bloom_hit"))
    val withTruth = probes.join(
      histKeys.select(col("key"), lit(true).as("is_member")), Seq("key"), "left")
      .select(col("bloom_hit"), coalesce(col("is_member"), lit(false)).as("member"))
    val nHist = histKeys.agg(count(lit(1)).as("n_hist"))
    val bitsSet = words.agg(sum(bit_count(col("bits"))).as("bits_set"))
    withTruth.agg(
        count(lit(1)).as("n_probes"),
        sum(when(col("member"), 1L).otherwise(0L)).as("n_true_members"),
        sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_bloom_hits"),
        sum(when(col("bloom_hit") && !col("member"), 1L).otherwise(0L))
          .as("n_false_pos"))
      .crossJoin(broadcast(bitsSet))
      .crossJoin(broadcast(nHist))
      .select(col("n_probes"), col("n_true_members"), col("n_bloom_hits"),
        col("n_false_pos"), col("bits_set").cast("long").as("bits_set"),
        when(col("n_probes") > col("n_true_members"),
          r6s(col("n_false_pos").cast("double") /
            (col("n_probes") - col("n_true_members")).cast("double")))
          .otherwise(lit(0.0)).as("fp_rate"),
        r6s(pow(lit(1.0) - exp(lit(-1.0 * k) * col("n_hist").cast("double") / mBits),
          k)).as("fp_theoretical"))
  }

  /** Count-Min counter table (Cormode & Muthukrishnan 2005) — the
    * frequency sketch beside KMV (cardinality), the histogram
    * (quantiles) and Bloom (membership): d seeded hash rows × w
    * counters, each occurrence incrementing one counter per row.
    * State is d·w longs whatever the key cardinality, and the build is
    * one map-side-combinable count per (row, col) — at 100 TB every
    * task reduces its partition to ≤ d·w cells before the shuffle.
    * Counters are plain sums, so sketches over shards/days merge by
    * cell-wise addition ([[cmsMergeDaily]] asserts it).
    */
  def cmsCounters(df: DataFrame, key: Column, d: Int, w: Int,
      salt: String): DataFrame =
    df.select(TextFunctions.hash60(concat(lit(salt), key)).as("h"))
      .withColumn("r", explode(array((0 until d).map(lit): _*)))
      .select(col("r"),
        (TextFunctions.seededFromHashCol(col("r"), col("h")) % w).as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))

  /** Point-query audit over the Count-Min sketch: every distinct key's
    * estimate (min over the d rows of its counter) against its exact
    * count. CMS never underestimates — `overestimate` is ≥ 0 by
    * construction (spec-asserted) and its magnitude is the collision
    * noise the ε = e/w bound governs; `is_heavy` applies the classic
    * heavy-hitter cut est ≥ ⌈φ·N⌉ FROM THE SKETCH, the decision a real
    * pipeline makes when the exact table is too big to keep.
    *
    * Scale shape: the sketch is d·w cells — broadcast to the keys' side
    * of the probe join; the exact counts exist only to grade the
    * estimate (the one non-mergeable cost, same posture as
    * [[quantileHistogram]]).
    */
  def cmsTopK(df: DataFrame, key: Column, d: Int = 4, w: Int = 64,
      salt: String = "cms_", heavyFrac: Double = 0.01): DataFrame = {
    val occ = df.select(key.as("k"))
    val counters = cmsCounters(occ, col("k"), d, w, salt)
    val exact = occ.groupBy(col("k")).agg(count(lit(1)).as("n_exact"))
    val pos = exact
      .withColumn("h", TextFunctions.hash60(concat(lit(salt), col("k"))))
      .withColumn("r", explode(array((0 until d).map(lit): _*)))
      .select(col("k"), col("n_exact"), col("r"),
        (TextFunctions.seededFromHashCol(col("r"), col("h")) % w).as("c"))
    val total = occ.agg(count(lit(1)).as("n_total"))
    pos.join(broadcast(counters), Seq("r", "c"))
      .groupBy(col("k"), col("n_exact"))
      .agg(min(col("cnt")).as("cms_est"))
      .crossJoin(broadcast(total))
      .select(col("k").as("key"), col("n_exact"), col("cms_est"),
        (col("cms_est") - col("n_exact")).as("overestimate"),
        (col("cms_est") >= ceil(col("n_total") * lit(heavyFrac)))
          .as("is_heavy"))
      .orderBy(col("cms_est").desc, col("key"))
  }

  /** The CMS merge algebra: per-day partial sketches summed cell-wise
    * must equal the whole-history sketch (counters are linear), and
    * each row's L1 mass must equal the total occurrence count — the two
    * invariants that let 365 daily d·w-cell tables answer any
    * frequency question without re-reading the year. Emits one audit
    * row per sketch row: (row, n_cells, l1, l1_ok, merge_consistent).
    */
  def cmsMergeDaily(df: DataFrame, dayCol: Column, key: Column,
      d: Int = 4, w: Int = 64, salt: String = "cms_"): DataFrame = {
    val occ = df.select(dayCol.as("day"), key.as("k"))
    val daily = occ
      .select(col("day"),
        TextFunctions.hash60(concat(lit(salt), col("k"))).as("h"))
      .withColumn("r", explode(array((0 until d).map(lit): _*)))
      .select(col("day"), col("r"),
        (TextFunctions.seededFromHashCol(col("r"), col("h")) % w).as("c"))
      .groupBy(col("day"), col("r"), col("c")).agg(count(lit(1)).as("cnt"))
    val merged = daily.groupBy(col("r"), col("c"))
      .agg(sum(col("cnt")).as("cnt_merged"))
    val full = cmsCounters(occ.select(col("k")), col("k"), d, w, salt)
    val total = occ.agg(count(lit(1)).as("n_total"))
    full.join(merged, Seq("r", "c"), "full_outer")
      .groupBy(col("r"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("cnt")).as("l1"),
        min(coalesce(col("cnt"), lit(0L)) ===
          coalesce(col("cnt_merged"), lit(0L))).as("merge_consistent"))
      .crossJoin(broadcast(total))
      .select(col("r").as("row"), col("n_cells"), col("l1"),
        (col("l1") === col("n_total")).as("l1_ok"),
        col("merge_consistent"))
      .orderBy(col("row"))
  }

  private def qTag(q: Double) = (q * 100).round.toString
  private def estName(q: Double) = s"p${qTag(q)}_est"
  private def exactName(q: Double) = s"p${qTag(q)}_exact"
  private def errName(q: Double) = s"p${qTag(q)}_abs_err"

  /** Rolling-window cardinality from the per-day sketch table — the
    * sketch twin of `Sessions.rollingActiveUsers`: each day's k-min
    * partial expands onto the `windowDays` target days it contributes
    * to, the union per target is re-capped to k, and the estimator
    * reads off trailing-window distinct users. The raw data is touched
    * once (to build the daily partials); every window after that is
    * O(windowDays · k) sketch rows — at 100 TB this is how a 7/28/90-
    * day active-user board is served without re-scanning history, and
    * the window width can change at QUERY time. The exact count rides
    * along for the error column (collision-free at 60 hash bits for any
    * plausible population).
    *
    * Returns (day, wau_exact, wau_est, rel_err) for days present in
    * the data.
    */
  def kmvRolling(df: DataFrame, dayCol: Column, value: Column,
      k: Int, salt: String, windowDays: Int = 7): DataFrame = {
    val hashes = df
      .select(dayCol.as("d"),
        TextFunctions.hash60(concat(lit(salt), value)).as("h"))
      .distinct()
    val days = hashes.select(col("d").as("day")).distinct()
    val partials = kminRanked(hashes, Seq("d"), k)
      .select(col("d"), col("h"))
    def expand(src: DataFrame) = src
      .withColumn("k", explode(sequence(lit(0), lit(windowDays - 1))))
      .select(date_add(col("d"), col("k")).as("day"), col("h"))
      .join(days, Seq("day"), "left_semi")
      .distinct()
    val est = kminRanked(expand(partials), Seq("day"), k)
      .groupBy(col("day")).agg(estimate(k).as("wau_est"))
    val exact = expand(hashes)
      .groupBy(col("day")).agg(count(lit(1)).as("wau_exact"))
    exact.join(est, Seq("day"))
      .select(col("day"), col("wau_exact"), col("wau_est"),
        r4(abs(col("wau_est") - col("wau_exact").cast("double")) /
          col("wau_exact").cast("double")).as("rel_err"))
      .orderBy(col("day"))
  }

  /** Set-operation estimates between every pair of groups, from the
    * partial sketches alone — union by merging k-min sets, intersection
    * via the k-min coincidence estimator, Jaccard as their ratio. The
    * membership flags are computed against the PARTIAL sketches only:
    * if x ∈ kmin_k(A ∪ B) and x ∈ A, then fewer than k elements of
    * A ∪ B ⊇ A are below x, so x ∈ kmin_k(A) — union-k-min membership
    * in A is decidable from A's sketch [Beyer et al. SIGMOD'07]. That is
    * the 100 TB property: pairwise overlap of any two of 365 daily /
    * per-source sketch tables without touching raw data. Below k the
    * union sketch IS the union set, so intersection is exact there.
    *
    * Returns (type_a, type_b, est_a, est_b, est_union,
    * est_intersection, est_jaccard) for every unordered pair.
    */
  def kmvOverlap(df: DataFrame, typeCol: String, value: Column,
      k: Int, salt: String): DataFrame = {
    val hashes = df
      .select(col(typeCol).as("t"),
        TextFunctions.hash60(concat(lit(salt), value)).as("h"))
      .distinct()
    val sk = kminRanked(hashes, Seq("t"), k).select(col("t"), col("h"))
    val est = sk.groupBy(col("t")).agg(estimate(k).as("est"))
    val pairs = est.select(col("t").as("type_a"), col("est").as("est_a"))
      .join(est.select(col("t").as("type_b"), col("est").as("est_b")),
        col("type_a") < col("type_b"))
    // explode each pair into its two legs -> plain equi-join on t
    val legs = pairs.select(col("type_a"), col("type_b"),
      explode(array(col("type_a"), col("type_b"))).as("t"))
    val merged = broadcast(legs).join(sk, "t")
      .groupBy(col("type_a"), col("type_b"), col("h"))
      .agg(max(when(col("t") === col("type_a"), 1).otherwise(0)).as("in_a"),
        max(when(col("t") === col("type_b"), 1).otherwise(0)).as("in_b"))
    val w = Window.partitionBy(col("type_a"), col("type_b")).orderBy(col("h"))
    val unionK = merged.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
    val agg = unionK.groupBy(col("type_a"), col("type_b")).agg(
      count(lit(1)).as("m"), max(col("h")).as("hk"),
      sum(col("in_a") * col("in_b")).as("n_both"))
    val estUnion = when(col("m") < k, col("m").cast("double"))
      .otherwise(r4(lit((k - 1).toDouble) * lit(HashRange) / col("hk").cast("double")))
    agg
      .withColumn("est_union", estUnion)
      .withColumn("est_intersection",
        when(col("m") < k, col("n_both").cast("double"))
          .otherwise(r4(col("n_both").cast("double") / k * col("est_union"))))
      .withColumn("est_jaccard",
        r6s(col("est_intersection") / col("est_union")))
      .join(pairs, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), col("est_a"), col("est_b"),
        col("est_union"), col("est_intersection"), col("est_jaccard"))
      .orderBy(col("type_a"), col("type_b"))
  }

  // --------------------------------------------------------------------
  // HyperLogLog — the industry-standard bounded-state cardinality sketch
  // [Flajolet et al. 2007], built oracle-exact like KMV above: registers
  // are pure integer/string arithmetic over the portable hash60, and the
  // estimator keeps the harmonic-mean sum EXACT by scaling each 2^{-reg}
  // term to the integer 2^{(wBits+1)-reg} (sum ≤ m·2^{wBits+1} < 2^62,
  // fits a long — no order-dependent double accumulation anywhere).
  // State is m=2^p small ints per group FOREVER (vs KMV's k longs), and
  // the merge is register-wise max — idempotent, commutative,
  // associative — so daily shards union with a trivial re-max.
  // --------------------------------------------------------------------

  /** Bucket-bits convention over hash60's 60-bit range: top p bits pick
    * the register, the remaining wBits form the rank pattern. Rank =
    * leading zeros of the wBits-wide suffix + 1 ∈ [1, wBits+1], computed
    * as `wBits + 1 − bitlen(w)`: Spark's `bin` already strips leading
    * zeros so bitlen = length(bin(w)) with w = 0 (bin '0') special-cased
    * to the saturated rank; the oracle mirrors it as
    * `length(ltrim(bin(w),'0'))`, identical on DuckDB's zero-stripped
    * bin where w = 0 trims to ''.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], value: Column,
      p: Int, salt: String): DataFrame = {
    val wBits = 60 - p
    val wMod = 1L << wBits
    df.select(groupCols.map(col) :+
        TextFunctions.hash60(concat(lit(salt), value)).as("h"): _*)
      .select(groupCols.map(col) ++ Seq(
        shiftright(col("h"), wBits).as("idx"),
        (col("h") % wMod).as("w")): _*)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max(when(col("w") === 0, lit(wBits + 1))
        .otherwise(lit(wBits + 1) - length(bin(col("w"))))).as("reg"))
  }

  /** α_m·m²·2^{wBits+1} for p=8 (m=256, wBits=52) — the whole estimator
    * numerator as ONE pinned double literal (mirrored verbatim in the
    * oracle SQL) so the only float op is a single division by the exact
    * integer register sum.
    */
  val HllC256: Double = 4.2399330249068963e20

  /** (group..., hll_est, v_zero, s_scaled) from a register table.
    * s_scaled = Σ 2^{(wBits+1)−reg} over all m registers (absent rows =
    * empty registers contributing 2^{wBits+1} each) — exact in a long.
    * Linear counting below the standard 2.5·m threshold when any
    * register is empty, raw harmonic estimate otherwise; both rounded
    * at the 4-decimal boundary like the KMV estimate.
    */
  def hllReport(regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    require(p == 8, "HllC256 is pinned for p=8; add a constant to widen")
    val m = 1 << p
    val wBits = 60 - p
    val agg = regs.groupBy(groupCols.map(col): _*)
      .agg(
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${wBits + 1} - reg)")) +
          (lit(m.toLong) - count(lit(1))) * (1L << (wBits + 1)))
          .cast("long").as("s_scaled"),
        (lit(m.toLong) - count(lit(1))).cast("long").as("v_zero"))
    val raw = lit(HllC256) / col("s_scaled").cast("double")
    agg.select(groupCols.map(col) ++ Seq(
      when(raw <= lit(2.5 * m) && col("v_zero") > 0,
        r4(lit(m.toDouble) *
          log(lit(m.toDouble) / col("v_zero").cast("double"))))
        .otherwise(r4(raw)).as("hll_est"),
      col("v_zero"), col("s_scaled")): _*)
  }

  /** Distinct-cardinality report per group, HLL flavor:
    * (group..., n_exact, hll_est, rel_err, v_zero, s_scaled). The exact
    * count rides along only to grade the estimate (as in [[kmvDistinct]]).
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
      p: Int, salt: String): DataFrame = {
    val regs = hllRegisters(df, groupCols, value, p, salt)
    val est = hllReport(regs, groupCols, p)
    val exact = df
      .select(groupCols.map(col) :+
        TextFunctions.hash60(concat(lit(salt), value)).as("h"): _*)
      .distinct()
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_exact"))
    exact.join(est, groupCols)
      .select(groupCols.map(col) ++ Seq(col("n_exact"), col("hll_est"),
        r4(abs(col("hll_est") - col("n_exact").cast("double")) /
          col("n_exact").cast("double")).as("rel_err"),
        col("v_zero"), col("s_scaled")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** The HLL merge law: per-(group, day) register shards re-maxed per
    * (group, idx) must equal the direct whole-history registers — so a
    * year of daily sketch tables answers the yearly cardinality with a
    * grid-sized re-max instead of a re-read. `merge_consistent` must be
    * uniformly true (register-wise max is exactly associative — this
    * asserts the persisted-shard plumbing, as [[kmvMergeDaily]] does).
    */
  def hllMergeDaily(df: DataFrame, groupCols: Seq[String], dayCol: Column,
      value: Column, p: Int, salt: String): DataFrame = {
    val daily = hllRegisters(df.withColumn("day", dayCol),
      groupCols :+ "day", value, p, salt)
    val mergedRegs = daily.groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max(col("reg")).as("reg"))
    val merged = hllReport(mergedRegs, groupCols, p)
      .select(groupCols.map(col) ++ Seq(col("hll_est").as("merged_est"),
        col("s_scaled").as("s_merged")): _*)
    val direct = hllReport(hllRegisters(df, groupCols, value, p, salt),
        groupCols, p)
      .select(groupCols.map(col) ++ Seq(col("hll_est").as("direct_est"),
        col("s_scaled").as("s_direct")): _*)
    merged.join(direct, groupCols)
      .select(groupCols.map(col) ++ Seq(col("merged_est"), col("direct_est"),
        (col("merged_est") === col("direct_est") &&
          col("s_merged") === col("s_direct")).as("merge_consistent")): _*)
      .orderBy(groupCols.map(col): _*)
  }
}
