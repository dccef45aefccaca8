package graft.operators

import org.apache.spark.sql.DataFrame
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
               iterations: Int = 8): DataFrame = {
    val dW = DecimalType(14, 12)
    val dX = DecimalType(8, 6)
    val dG = DecimalType(20, 15)
    val feats = events.groupBy(col("user_id")).agg(
        sum(when(col("event_type") =!= convType, 1L).otherwise(0L))
          .as("n_ev"),
        countDistinct(when(col("event_type") =!= convType,
          to_date(col("ts")))).as("n_days"),
        max(when(col("event_type") === convType, 1).otherwise(0))
          .as("y"))
      .select(
        round(log(lit(1.0) + col("n_ev").cast("double")), 6)
          .cast(dX).as("x1"),
        round(col("n_days").cast("double") / 30.0, 6).cast(dX).as("x2"),
        col("y"))
      .localCheckpoint(false)

    def wLit(units: BigInt) =
      lit(new java.math.BigDecimal(units.bigInteger, 12)).cast(dW)

    def sigma(w0: BigInt, w1: BigInt, w2: BigInt) = {
      val z = wLit(w1) * col("x1") + wLit(w2) * col("x2") + wLit(w0)
      round(lit(1.0) / (lit(1.0) + exp(-z.cast("double"))), 9)
        .cast(DecimalType(10, 9))
    }

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

    val sg = sigma(w0, w1, w2)
    val scl = least(greatest(sg.cast("double"), lit(1e-12)),
      lit(1.0 - 1e-12))
    feats.select(col("y"), sg.as("sg"), scl.as("sc"))
      .agg(count(lit(1)).as("n_users"),
        sum(when((col("sg") >= 0.5).cast("int") === col("y"), 1L)
          .otherwise(0L)).as("n_correct"),
        sum(round(when(col("y") === 1, -log(col("sc")))
          .otherwise(-log(lit(1.0) - col("sc"))), 9)
          .cast(DecimalType(28, 12))).as("loss_sum"))
      .select(col("n_users"),
        wLit(w0).as("w0"), wLit(w1).as("w1"), wLit(w2).as("w2"),
        round(col("n_correct").cast("double") /
          col("n_users").cast("double"), 6).as("accuracy"),
        round(col("loss_sum").cast("double") /
          col("n_users").cast("double"), 6).as("log_loss"))
  }
}
