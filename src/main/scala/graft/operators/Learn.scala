package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** In-engine model training — the capstone of the feature operators
  * ([[DataQuality.cvFolds]] folds, [[DataQuality.targetEncodeOof]]
  * encodings, [[AsOf]] point-in-time assembly): a deterministic
  * full-batch logistic regression trained entirely inside the engine,
  * DuckDB-oracle-verified like every other operator. The point is not
  * to replace an ML stack — it is that a data engine which can compute
  * the gradient EXACTLY (decimal sums, no partitioning dependence) can
  * train simple models reproducibly where a float-summing trainer
  * cannot: same data, same weights, bit for bit, on any cluster
  * layout.
  *
  * Reference: behavioral conversion modeling (predict purchase from
  * activity volume/breadth); the reference pipeline has no learner —
  * this extends the engine the same way the sketch/graph families do.
  */
object Learn {

  /** Deterministic two-feature OLS by exact normal equations —
    * [[logitFit]]'s closed-form sibling: z = β₀ + β₁·x + β₂·y fit to
    * lineitem (x = quantity, y = discount in points, z = extended
    * price in cents), solved by Cramer's rule over EXACT integer
    * moment sums, so the fitted coefficients are bit-identical on any
    * cluster layout — the property a float-summing `X'X` never has.
    *
    * Numerics (every step mirrored in the DuckDB oracle):
    *  - inputs land on integer grids (cents / discount points) via
    *    one round of parquet doubles — identical both engines, no .5
    *    boundary can exist for 2-decimal money;
    *  - integer PSEUDO-means first (Σ div n) shrink every residual,
    *    then the ×n computational correction (n·Σuv − Σu·Σv) makes
    *    the centering EXACT — pseudo-means alone bias a small-range
    *    regressor: the first cut read β₁ 1.7% low because discount's
    *    truncated mean was 4 vs a true 4.99;
    *  - β's are truncated to exact 1e-6-unit integers (micro-cents):
    *    the ×1e6 numerators stay under HUGEINT/BigInt-in-plan bounds
    *    through sf100 where a ×1e12 target overflows at sf0.1;
    *  - the intercept absorbs the pseudo-mean remainders through the
    *    SAME truncated β's both engines hold;
    *  - R² comes from a third pass of exact integer residuals
    *    (per-row truncating `div` — Spark div ≡ DuckDB ≡ BigInt /,
    *    all toward zero), one double division at the boundary.
    *
    * Scale shape: three map-side scans over a checkpointed projection
    * with 1-row aggregates — the same embarrassing parallelism as
    * [[logitFit]], but closed-form: no iteration at all.
    */
  def olsFit(lineitem: DataFrame): DataFrame = {
    val base = lineitem.select(
        round(col("l_quantity"), 0).cast("long").as("x"),
        round(col("l_discount") * 100, 0).cast("long").as("y"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("z"))
      .localCheckpoint(false)
    val s1 = base.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("z")).as("sz")).collect().head
    val n = BigInt(s1.getAs[Long]("n"))
    val (mx, my, mz) = (BigInt(s1.getAs[Long]("sx")) / n,
      BigInt(s1.getAs[Long]("sy")) / n, BigInt(s1.getAs[Long]("sz")) / n)

    val dec0 = DecimalType(38, 0)
    val cent = base.select((col("x") - mx.toLong).as("u"),
        (col("y") - my.toLong).as("v"), (col("z") - mz.toLong).as("w"))
      .localCheckpoint(false)
    val s2 = cent.agg(
      sum(col("u") * col("u")).as("suu"),
      sum(col("v") * col("v")).as("svv"),
      sum(col("u") * col("v")).as("suv"),
      sum(col("u") * col("w")).as("suw"),
      sum(col("v") * col("w")).as("svw"),
      sum(col("w").cast(dec0) * col("w")).as("sww"),
      sum(col("u")).as("su"), sum(col("v")).as("sv"),
      sum(col("w")).as("sw"),
      max(abs(col("u"))).as("maxu"), max(abs(col("v"))).as("maxv"))
      .collect().head
    def lg(c: String) = BigInt(s2.getAs[Long](c))
    val (su, sv, sw) = (lg("su"), lg("sv"), lg("sw"))
    val ca = n * lg("suu") - su * su
    val cb = n * lg("suv") - su * sv
    val cc = n * lg("svv") - sv * sv
    val cd = n * lg("suw") - su * sw
    val ce = n * lg("svw") - sv * sw
    val det = ca * cc - cb * cb
    require(det > 0, "degenerate design: regressors are collinear")
    val scale = BigInt(1000000) // 1e-6-unit betas
    // BigInt / truncates toward zero — DuckDB // semantics exactly
    val b1t = (cd * cc - ce * cb) * scale / det
    val b2t = (ca * ce - cb * cd) * scale / det
    val ct = (sw * scale - b1t * su - b2t * sv) / n
    val b0t = mz * scale + ct - b1t * mx - b2t * my
    require(b1t.abs * lg("maxu") + b2t.abs * lg("maxv") + ct.abs <
      BigInt(Long.MaxValue) / 4, "per-row prediction would overflow a long")

    val sst = n * BigInt(s2.getDecimal(s2.fieldIndex("sww"))
      .toBigInteger) - sw * sw
    val sse = BigInt(cent
      .select((col("w") -
        expr(s"(${b1t}L * u + ${b2t}L * v + ${ct}L) div 1000000"))
        .as("rr"))
      .agg(sum(col("rr").cast(dec0) * col("rr")).as("sse"))
      .collect().head.getDecimal(0).toBigInteger)
    // R² truncated at micro precision in exact BigInt arithmetic
    // (mirrors the oracle's sign-pinned tdiv), then one int→double
    // conversion — never a round(double, 6) of a big-integer ratio.
    // Outputs are ints + doubles only: the usd betas are exact 1e-8
    // unit longs ÷ 1e8 (no DECIMAL columns — the driver-hash
    // envelope; see userEntropy).
    // constant response (sst == 0): R² is undefined — emit a NULL r2
    // row rather than throwing, mirroring the oracle's wdivStages
    // den-guard (den <= 0 → NULL quotient), so engine and oracle agree
    // on degenerate-data behavior.
    val r2Col =
      if (sst > 0) {
        val r2mu = BigInt(1000000) - (n * sse * 1000000 / sst)
        require(r2mu.isValidLong, s"r2 unit overflow: $r2mu")
        lit(r2mu.toLong.toDouble / 1.0e6)
      } else lit(null).cast("double")
    def usd(units: BigInt) = {
      require(units.isValidLong, s"usd unit overflow: $units")
      lit(units.toLong.toDouble / 1.0e8)
    }
    lineitem.sparkSession.range(1).select(
      lit(n.toLong).as("n_rows"),
      usd(b0t).as("intercept_usd"),
      usd(b1t).as("beta_qty_usd"),
      usd(b2t).as("beta_disc_pt_usd"),
      r2Col.as("r2"))
  }

  private val dW = DecimalType(14, 12)
  private val dX = DecimalType(8, 6)
  private val dG = DecimalType(20, 15)

  /** The per-user feature fold shared by [[logitFit]] and the eval
    * family: x₁ = round(ln(1 + non-conversion events), 6),
    * x₂ = round(active days / 30, 6), y = MORE than `heavyK`
    * conversion events ("heavy converter"; heavyK = 0 is plain
    * "converted"). The registry passes heavyK = 13 — the synthetic
    * corpus gives every user 2–26 purchases at every SF, so the plain
    * label is one-class and >13 splits near the median. Features
    * count only NON-conversion events (no label leakage). Keeps
    * `user_id` so callers can hash-split; checkpointed once per query.
    */
  private[operators] def logitFeatures(events: DataFrame,
                                       convType: String,
                                       heavyK: Int): DataFrame =
    events.groupBy(col("user_id")).agg(
        sum(when(col("event_type") =!= convType, 1L).otherwise(0L))
          .as("n_ev"),
        countDistinct(when(col("event_type") =!= convType,
          to_date(col("ts")))).as("n_days"),
        when(sum(when(col("event_type") === convType, 1L)
          .otherwise(0L)) > heavyK, 1).otherwise(0).as("y"))
      .select(col("user_id"),
        (round(log(lit(1.0) + col("n_ev").cast("double"))
          * lit(1.0e6), 0) / lit(1.0e6))
          .cast(dX).as("x1"),
        (round(col("n_days").cast("double") / 30.0 * lit(1.0e6), 0)
          / lit(1.0e6)).cast(dX).as("x2"),
        col("y"))
      .localCheckpoint(false)

  private def wLit(units: BigInt) =
    lit(new java.math.BigDecimal(units.bigInteger, 12)).cast(dW)

  /** σ(w·x) pinned to the 1e-9 grid — the ONLY libm rounding in the
    * whole train/eval family. Pinned as `round(σ·1e9, 0)` nano-units,
    * NOT `round(σ, 9)`: Spark's round(v, 9) works on the double's
    * FULL binary expansion (BigDecimal HALF_UP) while DuckDB's
    * multiplies first — they disagree whenever the expansion straddles
    * a 9-decimal half boundary (hit live: a 2e-15 brier_sum split).
    * Rounding the PRODUCT to an integer makes both engines round the
    * same IEEE double — the lm_score convention.
    */
  private def sigmaU(w0: BigInt, w1: BigInt, w2: BigInt) = {
    val z = wLit(w1) * col("x1") + wLit(w2) * col("x2") + wLit(w0)
    round((lit(1.0) / (lit(1.0) + exp(-z.cast("double")))) *
      lit(1000000000.0), 0).cast("long")
  }
  private def sigma(w0: BigInt, w1: BigInt, w2: BigInt) =
    (sigmaU(w0, w1, w2) * lit(new java.math.BigDecimal("0.000000001")))
      .cast(DecimalType(10, 9))

  /** The 8-step exact-decimal gradient loop of [[logitFit]], extracted
    * so the eval family can train on a hash-split subset. Returns the
    * driver-held 1e-12-unit weight integers.
    */
  private def trainLogit(feats: DataFrame,
                         iterations: Int): (BigInt, BigInt, BigInt) = {
    var (w0, w1, w2) = (BigInt(0), BigInt(0), BigInt(0))
    for (_ <- 1 to iterations) {
      val g = feats.select(sigma(w0, w1, w2).as("sg"), col("x1"),
          col("x2"), col("y"))
        .agg(count(lit(1)).as("n"),
          sum((col("sg") - col("y")).cast(dG)).as("g0"),
          sum(((col("sg") - col("y")) * col("x1")).cast(dG)).as("g1"),
          sum(((col("sg") - col("y")) * col("x2")).cast(dG)).as("g2"))
        .collect().head
      val n = BigInt(g.getAs[Long]("n"))
      // w ← w − g/(2n), all in 1e-12 units: gradient units are 1e-15,
      // so the divisor carries the 1000× rescale and the lr = 1/2
      def step(w: BigInt, idx: Int): BigInt = {
        val gUnits = BigInt(g.getDecimal(idx).setScale(15)
          .unscaledValue())
        // BigInt / truncates toward zero, exactly like DuckDB's //
        w - gUnits / (2000 * n)
      }
      w0 = step(w0, 1); w1 = step(w1, 2); w2 = step(w2, 3)
    }
    (w0, w1, w2)
  }

  /** Deterministic full-batch logistic regression on per-user
    * activity features: y = converted (emitted `convType`),
    * x₁ = round(ln(1 + non-conversion events), 6),
    * x₂ = round(active days / 30, 6), plus a bias.
    *
    * `iterations` fixed gradient steps (the unrolled-CTE oracle
    * convention — no convergence test). The numerics are built so the
    * ONLY cross-engine rounding of a libm result is σ itself
    * (round 9 after exp — a 1e-9 grid leaves ~1e8 ulps between
    * boundaries, so a last-ulp exp difference cannot flip it):
    *  - weights are EXACT integers in 1e-12 units (driver-held, the
    *    1-row-collect-per-round discipline of `bpe_learn`);
    *  - the margin w·x is EXACT decimal arithmetic (weights
    *    DECIMAL(14,12) × features DECIMAL(8,6)) — no FMA can touch
    *    it, no round() of a raw double anywhere;
    *  - gradient terms (σ − y)·x are exact decimals at scale 15,
    *    summed as decimals;
    *  - the update w ← w − lr·g/n happens in INTEGER units with
    *    TRUNCATING division — Scala's BigInt `/` truncates toward
    *    zero and so does DuckDB's `//` on negatives (measured:
    *    −7 // 2 = −3, truncation, NOT floor — a first cut assumed
    *    floor and split by one unit on the first negative gradient;
    *    a second cut that rounded doubles at 12 split on a rounding
    *    boundary; exact integer truncation cannot).
    *
    * Output: one row — n_users, the three 12-decimal weights,
    * training accuracy (decision at σ ≥ 0.5 on the exact decimal σ)
    * and mean log loss (σ clamped to [1e−12, 1−1e−12], ln terms
    * rounded 9, decimal-summed).
    *
    * Scale shape: one events scan folds to per-user features
    * (checkpointed once, reused by every step); each step is ONE
    * map-side pass + a 1-row aggregate. Gradient descent over exact
    * decimal sums is embarrassingly parallel and
    * partitioning-invariant — the determinism is the contribution.
    */
  def logitFit(events: DataFrame, convType: String = "purchase",
               iterations: Int = 8, heavyK: Int = 0): DataFrame = {
    val feats = logitFeatures(events, convType, heavyK)
    val (w0, w1, w2) = trainLogit(feats, iterations)

    // output envelope: ints + doubles only (no DECIMAL columns — see
    // userEntropy). Every double is forced: int64→double casts and
    // identical IEEE op chains in both engines; the loss pin is the
    // lm_score round(v·1e9, 0) form, never round(v, 9).
    val dec0 = DecimalType(38, 0)
    feats.select(col("y"), sigmaU(w0, w1, w2).as("sgu"))
      .select(col("y"), col("sgu"),
        least(greatest(col("sgu").cast("double") / lit(1000000000.0),
          lit(1e-12)), lit(1.0 - 1e-12)).as("sc"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(when(col("sgu") >= 500000000L, 1).otherwise(0)
          === col("y"), 1L).otherwise(0L)).as("n_correct"),
        sum(round(when(col("y") === 1, -log(col("sc")))
            .otherwise(-log(lit(1.0) - col("sc"))) *
            lit(1000000000.0), 0)
          .cast("long").cast(dec0)).as("loss9"))
      .select(col("n_users"),
        lit(w0.toLong.toDouble / 1.0e12).as("w0"),
        lit(w1.toLong.toDouble / 1.0e12).as("w1"),
        lit(w2.toLong.toDouble / 1.0e12).as("w2"),
        (col("n_correct").cast("double") /
          col("n_users").cast("double")).as("accuracy"),
        ((col("loss9").cast("double") / lit(1000000000.0)) /
          col("n_users").cast("double")).as("log_loss"))
  }

  /** The eval family's train/test hash split: a salted 60-bit hash of
    * user_id sends 20% of users to the held-out fold — content-stable
    * and partitioning-independent (the stratified_split discipline),
    * mirrored verbatim in the oracle.
    */
  private def isTest =
    pmod(graft.functions.TextFunctions.hash60(
      concat(lit("eval_"), col("user_id"))), lit(100)) >= 80

  /** The cumulative rank frame over the per-score aggregate
    * `byScore(sg, pos, neg)` — (pos, neg, cneg, cpos, cnegi) where
    * cneg is the exclusive and cpos/cnegi the inclusive running sums
    * in σ order — in the [[DataQuality.ksTest]] bucketed
    * parallel-prefix shape: σ ∈ [0, 1e9] nano-units → 256 fixed-width
    * buckets (width 3906251 = ceil((1e9+1)/256), so sg = 1e9 lands in
    * bucket 255), per-bucket totals cumulated on the 256-row bucket
    * table, within-bucket windows offset by the broadcast prefix.
    * (bucket, sg)-order ≡ sg-order and integer sums associate, so
    * offset + within-bucket running sum ≡ the global running sum.
    * Package-visible so PlanSpec can pin the no-fact-scale-
    * single-partition-window shape (the frame itself is consumed
    * eagerly inside [[rocAuc]]).
    */
  private[graft] def cumRank(byScore: DataFrame): DataFrame = {
    val bucketed = byScore
      .withColumn("bucket", expr("CAST(sg div 3906251 AS INT)"))
    val wB = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket")).rowsBetween(Long.MinValue, -1)
    val bucketPrefix = bucketed.groupBy(col("bucket"))
      .agg(sum(col("pos")).as("bp"), sum(col("neg")).as("bn"))
      .select(col("bucket"),
        coalesce(sum(col("bp")).over(wB), lit(0L)).as("off_pos"),
        coalesce(sum(col("bn")).over(wB), lit(0L)).as("off_neg"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("sg"))
    bucketed.join(broadcast(bucketPrefix), Seq("bucket"))
      .select(col("pos"), col("neg"),
        (col("off_neg") + coalesce(sum(col("neg"))
          .over(wIn.rowsBetween(Long.MinValue, -1)), lit(0L)))
          .as("cneg"),
        (col("off_pos") + sum(col("pos"))
          .over(wIn.rowsBetween(Long.MinValue, 0))).as("cpos"),
        (col("off_neg") + sum(col("neg"))
          .over(wIn.rowsBetween(Long.MinValue, 0))).as("cnegi"))
  }

  /** Held-out ROC evaluation of the [[logitFit]] model — the missing
    * half of the in-engine training loop: train on the 80% hash fold,
    * score the 20% holdout, and compute the exact Mann–Whitney AUC
    * with midrank tie handling, plus Gini (2·AUC−1) and the
    * Kolmogorov–Smirnov statistic.
    *
    * Numerics: σ lands on the 1e-9 grid (the one libm rounding), so
    * ties are well-defined; everything after is INTEGER arithmetic —
    * 2·U = Σ_s pos_s·(2·cumneg_<s + neg_s) over per-score counts,
    * KS numerator = max |cumpos_≤s·N − cumneg_≤s·P| (the exact-
    * integer form of max |TPR−FPR|), and the three outputs are
    * truncated 1e-6-unit integers (BigInt `/` ≡ DuckDB `//`, both
    * toward zero — Gini can be negative) emitted as driver literals,
    * the [[logitFit]] weight discipline.
    *
    * Scale shape: the rank statistic is computed from the per-SCORE
    * aggregate (bounded by distinct σ values on the 1e-9 grid, not by
    * test rows), and the cumulative sums over that aggregate run in
    * the [[DataQuality.ksTest]] PARALLEL-PREFIX form: fixed-width
    * σ-buckets (σ ∈ [0, 1e9] by construction, so no min/max pass is
    * needed), per-bucket totals cumulated on the 256-row bucket
    * table, then within-bucket cumulative windows offset by the
    * broadcast bucket prefix. At 100× the distinct-σ table approaches
    * the holdout size; partitioning the fact-sized window by bucket
    * keeps every fact-scale pass hash-distributed — the only ordered
    * single-task scan left is 256 rows.
    */
  def rocAuc(events: DataFrame, convType: String = "purchase",
             iterations: Int = 8, heavyK: Int = 13): DataFrame = {
    val feats = logitFeatures(events, convType, heavyK)
    val (w0, w1, w2) = trainLogit(feats.filter(!isTest), iterations)

    val byScore = feats.filter(isTest)
      .select(sigmaU(w0, w1, w2).as("sg"), col("y"))
      .groupBy(col("sg"))
      .agg(sum(col("y")).cast("long").as("pos"),
        (count(lit(1)) - sum(col("y"))).cast("long").as("neg"))
      .localCheckpoint(false)

    val tot = byScore
      .agg(sum(col("pos")).as("p"), sum(col("neg")).as("nn"))
      .collect().head
    val p = BigInt(tot.getAs[Long]("p"))
    val nn = BigInt(tot.getAs[Long]("nn"))

    // truncated micro-units emitted as DOUBLE (u/1e6, exact int64 →
    // one IEEE division — the no-DECIMAL-outputs envelope); BigInt
    // `/` truncates toward zero like the oracle's sign-pinned tdiv
    def micro(num: BigInt, den: BigInt) =
      lit((num * 1000000 / den).toLong.toDouble / 1.0e6)
    val metrics = if (p == 0 || nn == 0) {
      // one-class fold (possible at toy scale: the 20% fold of a
      // 15-user corpus is one user) — the ranking metrics are
      // undefined; mirror the oracle's CASE ... NULL
      val na = lit(null).cast("double")
      Seq(na.as("auc"), na.as("gini"), na.as("ks"))
    } else {
      val r = cumRank(byScore)
        .agg(
          sum(col("pos") * (lit(2L) * col("cneg") + col("neg")))
            .as("u2"),
          max(abs(col("cpos") * lit(nn.toLong) -
            col("cnegi") * lit(p.toLong))).as("ksnum"))
        .collect().head
      val u2 = BigInt(r.getAs[Long]("u2"))
      val ksn = BigInt(r.getAs[Long]("ksnum"))
      Seq(micro(u2, 2 * p * nn).as("auc"),
        micro(u2 - p * nn, p * nn).as("gini"),
        micro(ksn, p * nn).as("ks"))
    }
    feats.sparkSession.range(1).select(
      Seq(lit((p + nn).toLong).as("n_test"),
        lit(p.toLong).as("n_pos"), lit(nn.toLong).as("n_neg")) ++
        metrics: _*)
  }

  /** Reliability table for the [[logitFit]] model on the held-out
    * fold: fixed-width σ-deciles (floor(σ·10) — σ can round to 1.0 at
    * the 9-grid, so bin 10 exists by construction in both engines),
    * per-bin count, positives, mean predicted σ and observed rate as
    * truncated 1e-6-unit integers, and the exact-decimal Brier sum —
    * the calibration view [[rocAuc]]'s ranking view can't see (AUC is
    * invariant to any monotone miscalibration).
    *
    * All arithmetic after σ is exact: nano-unit integer score sums,
    * truncating integer division for the two rates, 1e-18-unit
    * integer squared-error sums truncated to micro precision at the
    * output boundary. Map-side score + one ≤11-group hash agg.
    */
  def calibrationBins(events: DataFrame, convType: String = "purchase",
                      iterations: Int = 8, heavyK: Int = 13): DataFrame = {
    val feats = logitFeatures(events, convType, heavyK)
    val (w0, w1, w2) = trainLogit(feats.filter(!isTest), iterations)
    // everything after σ is exact integer arithmetic on the nano
    // units; outputs are ints + doubles only (no DECIMAL columns) —
    // mean_pred/obs_rate truncated micro-units ÷ 1e6, and the Brier
    // sum truncated to micro precision from the exact 1e-18-unit
    // integer sum (per-row (sgu − y·1e9)² fits a long; the bin sum
    // needs the DECIMAL(38,0) accumulator)
    val dec0 = DecimalType(38, 0)
    def micro(c: Column) = c.cast("double") / lit(1000000.0)
    feats.filter(isTest)
      .select(sigmaU(w0, w1, w2).as("sgu"), col("y"))
      .select(expr("CAST(sgu div 100000000 AS INT)").as("bin"),
        col("sgu"),
        (col("sgu") - col("y").cast("long") * lit(1000000000L))
          .as("d9"),
        col("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("y")).cast("long").as("n_pos"),
        sum(col("sgu").cast(dec0)).as("snano"),
        sum((col("d9") * col("d9")).cast(dec0)).as("s18"))
      .select(col("bin"), col("n"), col("n_pos"),
        micro(expr("snano div (n * 1000)")).as("mean_pred"),
        micro(expr("(n_pos * 1000000) div n")).as("obs_rate"),
        micro(expr("s18 div 1000000000000")).as("brier_sum"))
      .orderBy(col("bin"))
  }

  /** In-engine discrete AdaBoost over decision stumps [Freund &
    * Schapire 1997] — the fourth trainable model, and the first
    * ENSEMBLE: `rounds` boosting rounds over a fixed stump grid
    * (feature ∈ {n_ev, n_days} × threshold grid × polarity) on the
    * per-user activity features, trained on the salted 80% fold with
    * staged held-out accuracy per round.
    *
    * Full determinism for an exp-reweighting algorithm:
    *  - a round's per-row weight is exp((logw6 − shift6)/1e6) pinned
    *    at 1e-12 units, where logw6 = Σ_k ±α6_k over previous rounds
    *    is an EXACT integer (+α misclassified, −α correct) and
    *    shift6 = Σ_k α6_k caps the exponent at 0 so the pinned value
    *    fits a long exactly (≤ 1e12 < 2^53) — exp sees the same IEEE
    *    double in both engines;
    *  - weighted errors are exact integer sums of those pinned
    *    weights (DECIMAL(38,0) accumulators — a 10^7-user corpus
    *    overflows a long);
    *  - the round's stump is the lexicographic argmin
    *    (error, feature, threshold, polarity) — total order;
    *  - α6 = round(ln((S−Ec)/Ec)·500000, 0) with Ec clamped to
    *    [1, S−1] weight units (a perfect stump would send α to ∞);
    *    the ln argument is a quotient of exact integers.
    *
    * Scale shape: each round is ONE pass — the feature fold explodes
    * across the |grid|-row broadcast stump table (parameter-bounded)
    * into a |grid|-row aggregate — plus two 1-row staged-accuracy
    * aggregates; the fold itself is checkpointed once. The driver
    * holds only α's and stump ids (the logitFit discipline).
    */
  /** The fixed stump grid shared by [[adaboostStumps]] and its oracle
    * builder: (feature, threshold, polarity).
    */
  val stumpGrid: Seq[(String, Long, Int)] = for {
    (f, thrs) <- Seq(
      ("n_days", (2L to 28L by 2).toSeq),
      ("n_ev", Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L)))
    t <- thrs; p <- Seq(1, -1)
  } yield (f, t, p)

  def adaboostStumps(events: DataFrame, convType: String = "purchase",
                     heavyK: Int = 13, rounds: Int = 5): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec0 = DecimalType(38, 0)
    val feats = events.groupBy(col("user_id")).agg(
        sum(when(col("event_type") =!= convType, 1L).otherwise(0L))
          .as("n_ev"),
        countDistinct(when(col("event_type") =!= convType,
          to_date(col("ts")))).as("n_days"),
        when(sum(when(col("event_type") === convType, 1L)
          .otherwise(0L)) > heavyK, 1).otherwise(-1).as("y"))
      .withColumn("tst", isTest)
      .select(col("n_ev"), col("n_days"), col("y"), col("tst"))
      .localCheckpoint(false)

    val grid = stumpGrid

    // h(x) for stump (f, thr, pol): pol * (v > thr ? +1 : -1)
    def h(f: String, thr: Long, pol: Int): Column =
      when(col(f) > thr, lit(pol)).otherwise(lit(-pol))

    var chosen = List.empty[(String, Long, Int, Long)] // (f, thr, pol, a6)
    def logw6: Column = chosen.foldLeft(lit(0L)) {
      case (acc, (f, thr, pol, a6)) =>
        acc + when(h(f, thr, pol) =!= col("y"), lit(a6))
          .otherwise(lit(-a6))
    }
    // weights are relative: shift the exponent by the fold's MAX
    // logw6 (an exact integer aggregate — deterministic) so the
    // heaviest row pins at exactly 1e12 and exponents stay ≤ 0. A
    // fixed shift = Σα underflowed the whole fold to zero on
    // separable data (all-correct rows sit at logw6 = −Σα).
    def w12(shift6: Long): Column =
      round(exp((logw6 - lit(shift6)).cast("double") / lit(1e6)) *
        lit(1e12), 0).cast("long")
    def maxLogw6(): Long =
      feats.filter(!col("tst")).agg(max(logw6).as("m"))
        .collect().head.getAs[Long]("m")
    // ensemble margin in alpha6 units; sign decides (0 -> negative)
    def score6: Column = chosen.foldLeft(lit(0L)) {
      case (acc, (f, thr, pol, a6)) => acc + h(f, thr, pol) * lit(a6)
    }

    val gridDf = feats.sparkSession
      .createDataFrame(grid.map(g => (g._1, g._2, g._3)))
      .toDF("feat", "thr", "pol")
    val out = Seq.newBuilder[(Int, String, Long, Int, BigInt, BigInt,
      BigInt, BigInt)]
    for (r <- 1 to rounds) {
      val shift6 = maxLogw6()
      // weighted error per stump, one pass over fold × grid
      val ge = feats.filter(!col("tst")).select(col("n_ev"),
          col("n_days"), col("y"), w12(shift6).as("w"))
        .crossJoin(broadcast(gridDf))
        .withColumn("v", when(col("feat") === "n_ev", col("n_ev"))
          .otherwise(col("n_days")))
        .withColumn("hx",
          when(col("v") > col("thr"), col("pol")).otherwise(-col("pol")))
        .groupBy(col("feat"), col("thr"), col("pol"))
        .agg(sum(when(col("hx") =!= col("y"), col("w")).otherwise(0L)
            .cast(dec0)).as("e"),
          sum(col("w").cast(dec0)).as("s"))
        .collect()
      val best = ge.map { row =>
        (BigInt(row.getDecimal(row.fieldIndex("e")).toBigInteger),
          BigInt(row.getDecimal(row.fieldIndex("s")).toBigInteger),
          row.getAs[String]("feat"), row.getAs[Long]("thr"),
          row.getAs[Int]("pol"))
      }.minBy { case (e, _, f, t, p) => (e, f, t, p) }
      val (e, sTot, f, thr, pol) = best
      val ec = e.max(BigInt(1)).min(sTot - 1)
      val a6 = BigInt(math.round(math.log(
        ((sTot - ec).toDouble / ec.toDouble)) * 500000.0))
      chosen = chosen :+ ((f, thr, pol, a6.toLong))

      // staged ensemble accuracy on both folds (exact counts)
      val acc = feats.select(col("tst"),
          ((score6 > 0) === (col("y") > 0)).as("ok"))
        .groupBy(col("tst"))
        .agg(sum(when(col("ok"), 1L).otherwise(0L)).as("c"),
          count(lit(1)).as("n"))
        .collect().map(x => x.getAs[Boolean]("tst") ->
          (BigInt(x.getAs[Long]("c")), BigInt(x.getAs[Long]("n"))))
        .toMap
      val (trC, trN) = acc(false)
      val (teC, teN) = acc.getOrElse(true, (BigInt(0), BigInt(0)))
      out += ((r, f, thr, pol, a6, e * 1000000 / sTot,
        trC * 1000000 / trN,
        if (teN > 0) teC * 1000000 / teN else BigInt(-1)))
    }

    val rows = out.result()
    import feats.sparkSession.implicits._
    // micro-unit integers emitted as DOUBLE (u/1e6 — int64→double is
    // exact, one IEEE division; the no-DECIMAL-outputs envelope)
    val df = rows.map { case (r, f, thr, pol, a6, eps, tra, tea) =>
      (r, f, thr, pol,
        a6.toLong.toDouble / 1.0e6,
        eps.toLong.toDouble / 1.0e6,
        tra.toLong.toDouble / 1.0e6,
        if (tea < 0) None else Some(tea.toLong.toDouble / 1.0e6))
    }.toDF("round_no", "feature", "threshold", "polarity", "alpha",
      "weighted_err", "train_acc", "test_acc")
    df.orderBy(col("round_no"))
  }

  /** In-engine multinomial Naive Bayes language classifier with a
    * held-out confusion matrix — the third trainable model beside
    * [[logitFit]] and [[olsFit]], and the supervised counterpart of
    * the heuristic `lang_id`: train Laplace-smoothed per-language
    * token models on the salted 80% doc fold, classify the 20%
    * holdout by exact-integer log-posterior, and emit the
    * (true_lang, pred_lang, n_docs) confusion table.
    *
    * Determinism (the lm_score discipline): every log-probability is
    * pinned PER (token, language) as round(ln·1e6, 0) integer units —
    * token log-prob ln((c+1)/(T_lang+V)), OOV floor ln(1/(T_lang+V)),
    * prior ln(n_lang/n_train) — so a document's per-language score is
    * an exact integer sum, order-independent under any partitioning,
    * and the argmax (score DESC, lang tie-break) is total.
    *
    * Scale shape: training is the lm_score vocabulary aggregation
    * keyed (lang, token); scoring replicates the test token stream
    * across the |langs|-row broadcast model header (the ANN
    * query-set pattern — parameter-bounded, PlanSpec-allowlisted),
    * hash-joins the vocabulary on (token, lang), and reduces per
    * (doc, lang). Shuffle = |langs| × test tokens — linear.
    */
  def nbLangConfusion(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.{hash60, tokensCol}
    val trn = pmod(hash60(concat(lit("nb_"), col("doc_id"))),
      lit(100)) < 80
    val d0 = docs.select(col("doc_id"), col("lang"), col("text"),
      trn.as("trn"))
    val toks = d0.select(col("doc_id"), col("lang"), col("trn"),
      explode(tokensCol(col("text"))).as("t"))

    val tc = toks.filter(col("trn")).groupBy(col("lang"), col("t"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // train pass shared by model + totals
    val tl = tc.groupBy(col("lang"))
      .agg(sum(col("c")).cast("double").as("tcount"))
    val vv = tc.agg(countDistinct(col("t")).cast("double").as("v"))
    val pr = d0.filter(col("trn")).groupBy(col("lang"))
      .agg(count(lit(1)).as("nd"))
    val nt = d0.filter(col("trn"))
      .agg(count(lit(1)).cast("double").as("n"))

    def pin6(c: Column) = round(c * lit(1e6), 0).cast("long")
    val langs = tl.join(pr, Seq("lang")).crossJoin(vv).crossJoin(nt)
      .select(col("lang"),
        pin6(log(lit(1.0) / (col("tcount") + col("v")))).as("lp0"),
        pin6(log(col("nd").cast("double") / col("n"))).as("prior6"))
    val model = tc.join(tl, Seq("lang")).crossJoin(vv)
      .select(col("lang"), col("t"),
        pin6(log((col("c").cast("double") + lit(1.0)) /
          (col("tcount") + col("v")))).as("lp6"))

    val scores = toks.filter(!col("trn")).select(col("doc_id"), col("t"))
      .crossJoin(broadcast(langs))
      .join(model, Seq("t", "lang"), "left_outer")
      .groupBy(col("doc_id"), col("lang"), col("prior6"))
      .agg(sum(coalesce(col("lp6"), col("lp0"))).as("tok6"))
      .select(col("doc_id"), col("lang"),
        (col("prior6") + col("tok6")).as("score"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("lang"))
    val pred = scores.withColumn("rn", row_number().over(byDoc))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"))

    pred.join(d0.filter(!col("trn")).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** Bradley–Terry preference-strength fit (Hunter 2004's MM
    * iteration) — the rating model behind pairwise PREFERENCE data
    * (RLHF comparison datasets, response A-vs-B judgments, arena
    * rankings): items compared in pairs, strengths w with
    * P(i beats j) = w_i/(w_i+w_j), fit by the closed-form
    * minorize-maximize update w_i ← W_i / Σ_j n_ij/(w_i+w_j)
    * (W_i = i's total wins, n_ij = comparisons between i and j),
    * sum-normalized each round for identifiability.
    *
    * Harness comparisons are derived deterministically from events:
    * within each user's (ts, event_id)-ordered stream, consecutive
    * DISTINCT event types form one comparison decided by the higher
    * `value` (exact double compare; ties go to the lexicographically
    * smaller type — total and portable). The derivation is the
    * fact-scale pass (user-partitioned window, type-vocabulary
    * output); the `iterations` MM rounds run on the |types|²-row
    * count table — vocabulary arithmetic, never a corpus rescan.
    *
    * Determinism (the knn_pagerank/logit discipline): strengths live
    * on a 1e-9 integer grid; each MM denominator term is pinned at
    * 1e-6 integer units and summed exactly; the update and the
    * normalization each do ONE double division before re-pinning, so
    * every iteration is order-free and the DuckDB oracle (the same
    * chain unrolled) matches bit for bit.
    */
  def btStrengths(events: DataFrame, iterations: Int = 8): DataFrame =
    mmFit(btWins(events), iterations)

  /** The decided comparisons (user_id, winner, loser) extracted from
    * the event stream — ONE user-partitioned lead window over the
    * facts, shared by every BT state derivation. Pairs attribute to
    * their EARLIER event.
    */
  private def btComparisons(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("nt", lead(col("event_type"), 1).over(w))
      .withColumn("nv", lead(col("value"), 1).over(w))
      .filter(col("nt").isNotNull && col("nt") =!= col("event_type"))
      .select(col("user_id"),
        when(col("value") > col("nv"), col("event_type"))
          .when(col("value") < col("nv"), col("nt"))
          .otherwise(least(col("event_type"), col("nt"))).as("winner"),
        when(col("value") > col("nv"), col("nt"))
          .when(col("value") < col("nv"), col("event_type"))
          .otherwise(greatest(col("event_type"), col("nt"))).as("loser"))
  }

  /** The persisted preference-state table: directed win counts
    * (winner, loser, nw) from per-user consecutive-event comparisons —
    * what a production deployment keeps on disk and folds deltas into
    * (counts are additive). Pairs attribute to their EARLIER event.
    */
  def btWins(events: DataFrame): DataFrame =
    btComparisons(events)
      .groupBy(col("winner"), col("loser"))
      .agg(count(lit(1)).as("nw"))

  /** The per-user win-count PROVENANCE table (user_id, winner, loser,
    * nw) — what a production preference store persists alongside the
    * aggregate [[btWins]] so user deletion never rescans the event
    * stream. Bounded by the comparison count (in practice far smaller:
    * distinct (user, ordered type pair) triples), additive like the
    * aggregate, and partitionable by user for takedown pruning.
    */
  def btWinsByUser(events: DataFrame): DataFrame =
    btComparisons(events)
      .groupBy(col("user_id"), col("winner"), col("loser"))
      .agg(count(lit(1)).as("nw"))

  /** Event projection the BT STREAMING hop keys its state machine on —
    * ts as a µs epoch long so the per-user state is flat scalars (the
    * Sessions.SessionState discipline).
    */
  case class BtEvent(user_id: Long, ts_us: Long, event_id: Long,
                     event_type: String, value: Double)

  /** One decided comparison emitted by the streaming state machine. */
  case class BtCmp(user_id: Long, winner: String, loser: String)

  /** One [[btComparisons]] decision in executor-side Scala — the
    * streaming state machine's step function, kept HERE beside the
    * Column form it mirrors so the two stay one diff apart: the
    * earlier event wins on higher `value` (Catalyst double compare —
    * `==` first so -0.0 equals 0.0 exactly as SQLOrderingUtil does),
    * ties go to the lexicographically smaller type (ASCII vocabulary,
    * so String order == UTF8String binary order). Parity with the
    * window form is machine-checked: `pipeline_bt_e2e`'s landed-state
    * gate multiset-compares the streamed output against
    * [[btWinsByUser]] over the same rows before any oracle hash.
    */
  private[graft] def btDecide(earlier: BtEvent, later: BtEvent): BtCmp = {
    val c = if (earlier.value == later.value) 0
            else java.lang.Double.compare(earlier.value, later.value)
    val (w, l) =
      if (c > 0) (earlier.event_type, later.event_type)
      else if (c < 0) (later.event_type, earlier.event_type)
      else if (earlier.event_type <= later.event_type)
        (earlier.event_type, later.event_type)
      else (later.event_type, earlier.event_type)
    BtCmp(earlier.user_id, w, l)
  }

  /** Each user's single last-before-cutoff event — the carry row
    * [[btIncremental]]'s fold input and the streaming hop's INITIAL
    * STATE share (pairs attribute to their earlier event, so the
    * boundary pair (carry, first delta event) belongs to the next
    * fold; one row per user by construction here, and both consumers
    * enforce it loudly — the require in btIncremental, the
    * initial-state API's duplicate-key error in the stream).
    */
  def btCarry(hist: DataFrame): DataFrame =
    hist.withColumn("bt_rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("bt_rn") === 1).drop("bt_rn")

  /** The MM fit over an ALREADY-FOLDED (winner, loser, nw) state table
    * — the entry the streaming hop's sink-side compaction shares with
    * [[btIncremental]]/[[btRetire]]: every lifecycle leg is "refresh
    * the additive counts, re-run the vocabulary-sized MM".
    */
  def btFromWins(winCounts: DataFrame, iterations: Int = 8): DataFrame =
    mmFit(winCounts, iterations)

  /** [[btStrengths]]' nightly-delta twin (the lifecycle discipline
    * every stateful family carries): the persisted win-count table is
    * refreshed by the DELTA's comparisons and the MM rounds re-run on
    * the vocabulary-sized fold — the historical event stream is never
    * rescanned. `deltaWithCarry` must be the delta events PLUS each
    * user's single last-before-cutoff event (the carry row): pairs
    * attribute to their earlier event, so history-internal pairs were
    * counted last run, the boundary pair (carry, first delta event)
    * belongs to this fold, and carry rows alone (users with no delta
    * activity) produce nothing. Counts are additive, so the refreshed
    * strengths EQUAL a full rebuild by construction — the oracle is
    * [[btStrengths]]' own chain over the full stream.
    *
    * The carry contract is ENFORCED, not prose (the Valuation-divisor
    * lesson): `cutoff` is the fold boundary, and any user carrying
    * MORE than one pre-cutoff row fails diagnosably — two carry rows
    * per user would silently double-count a boundary comparison
    * (history-internal pairs re-derived this fold on top of last
    * run's counts). A MISSING carry is legal degraded input (the user
    * genuinely had no pre-cutoff activity, or the caller accepts
    * losing that boundary pair — count-visible, not silent).
    */
  def btIncremental(histWins: DataFrame, deltaWithCarry: DataFrame,
                    cutoff: Column, iterations: Int = 8): DataFrame = {
    // delta-sized eager check (the frame is a nightly delta by
    // contract); limit(3) bounds the driver fetch to a diagnostic
    // sample
    val offending = deltaWithCarry.filter(col("ts") < cutoff)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_carry"))
      .filter(col("n_carry") > 1)
      .select(col("user_id")).limit(3).collect()
    require(offending.isEmpty,
      "btIncremental: carry contract violated — users " +
        offending.map(_.get(0)).mkString(", ") +
        " (sample) carry >1 pre-cutoff row; pass exactly ONE " +
        "last-before-cutoff event per historical user or boundary " +
        "comparisons double-count")
    mmFit(histWins.unionByName(btWins(deltaWithCarry))
        .groupBy(col("winner"), col("loser"))
        .agg(sum(col("nw")).as("nw")),
      iterations)
  }

  /** User takedown over the persisted BT state — the `exact_retire`
    * discipline applied to preference data, where deletion requests
    * are USER-keyed (comparisons are derived from user activity).
    * Win counts are additive, so retire = SUBTRACT the retired users'
    * contributions (read from the [[btWinsByUser]] provenance table,
    * pruned by the broadcast retired set) from the aggregate
    * [[btWins]] state and re-run the vocabulary-sized MM — the event
    * stream is never rescanned. Pairs whose every comparison came
    * from retired users net to zero and are DROPPED, so items wholly
    * supported by retired users vanish exactly as a full rebuild
    * would have them vanish; the oracle is [[btStrengths]]' chain
    * over the surviving users' events.
    */
  def btRetire(wins: DataFrame, winsByUser: DataFrame,
               retiredUsers: DataFrame, iterations: Int = 8): DataFrame = {
    val removed = winsByUser
      .join(broadcast(retiredUsers.select(col("user_id"))), Seq("user_id"))
      .groupBy(col("winner"), col("loser"))
      .agg((-sum(col("nw"))).as("nw"))
    mmFit(wins.unionByName(removed)
        .groupBy(col("winner"), col("loser"))
        .agg(sum(col("nw")).as("nw"))
        .filter(col("nw") > 0),
      iterations)
  }

  /** The MM rounds over a (winner, loser, nw) count table. */
  private def mmFit(winCounts: DataFrame, iterations: Int): DataFrame = {
    // EAGER: one pass over the count-table lineage feeds every MM
    // round, and the iteration below must start from a materialized
    // table (see cur)
    val wins = winCounts.localCheckpoint(true)
    // symmetric per-directed-pair comparison totals + per-item wins
    val nij = wins.select(col("winner").as("i"), col("loser").as("j"),
        col("nw"))
      .unionByName(wins.select(col("loser").as("i"),
        col("winner").as("j"), col("nw")))
      .groupBy(col("i"), col("j")).agg(sum(col("nw")).as("n"))
    val wtot = wins.groupBy(col("winner").as("i"))
      .agg(sum(col("nw")).as("wi"))
    var cur = nij.select(col("i")).distinct()
      .withColumn("w9", lit(1000000000L))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val d = nij
        .join(cur.select(col("i"), col("w9").as("wi9")), Seq("i"))
        .join(cur.select(col("i").as("j"), col("w9").as("wj9")), Seq("j"))
        .select(col("i"),
          // greatest(,1) keeps the term total if two zero-win items
          // ever meet (disconnected comparison graphs)
          round(col("n") * lit(1.0e9)
            / greatest(col("wi9") + col("wj9"), lit(1L)).cast("double")
            * lit(1.0e6), 0).cast("long").as("t6"))
        // DECIMAL(38,0) sums (the heapsFit dec0 discipline): the
        // oracle sums into HUGEINT, and a long sum here would WRAP
        // silently under non-ANSI mode when huge comparison counts
        // meet near-zero pinned strengths (t6 ~ n·1e15) — decimal
        // overflows to null → loud divide-by-null, never a silent
        // divergence
        .groupBy(col("i"))
        .agg(sum(col("t6").cast(DecimalType(38, 0))).as("d6"))
      val unnorm = d.join(wtot, Seq("i"), "left")
        .select(col("i"),
          round(coalesce(col("wi"), lit(0L)).cast("double") * lit(1.0e6)
            / col("d6").cast("double") * lit(1.0e9), 0)
            .cast("long").as("u9"))
      val s = unnorm.agg(sum(col("u9").cast(DecimalType(38, 0))).as("s"))
      // per-round EAGER checkpoint (the Dedup.clusters CC-loop
      // discipline): cur is referenced twice per round, so without the
      // cut its lineage doubles every iteration — 2^8 plan leaves by
      // round 8, which is a Catalyst-analysis heap blowup, not a data
      // problem (the table is |types| rows)
      cur = unnorm.crossJoin(broadcast(s))
        .select(col("i"),
          round(col("u9") * lit(1.0e9) / col("s").cast("double"), 0)
            .cast("long").as("w9"))
        .localCheckpoint(true)
    }
    val ncmp = nij.groupBy(col("i")).agg(sum(col("n")).as("n_comparisons"))
    cur.join(ncmp, Seq("i"))
      .join(wtot, Seq("i"), "left")
      .select(col("i").as("event_type"),
        coalesce(col("wi"), lit(0L)).as("n_wins"), col("n_comparisons"),
        (col("w9").cast("double") / lit(1.0e9)).as("bt_strength"))
      .orderBy(col("event_type"))
  }
}
