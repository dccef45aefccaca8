package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Slowly-changing-dimension (Type 2) construction and point-in-time
  * lookup — the lakehouse dimension-management pattern the warehouse
  * layer (Bronze/Silver/Gold) feeds: collapse a stream of per-key
  * attribute OBSERVATIONS into versioned validity intervals
  * `[valid_from, valid_to)`, then join facts against the version that
  * was current when the fact happened (the same leakage discipline as
  * [[AsOf]] / features_pit, expressed as a dimension table).
  *
  * Reference scope: the reference pipeline keeps only current-state
  * dims; SCD2 is the standard extension a real lakehouse operator
  * needs the moment history questions arrive ("what tier was this
  * user on when they bought?").
  */
object Scd {

  /** The observed attribute: the user's k-tier (props.k div 25) at
    * each event — deterministic, integer, and engine-independent.
    */
  private def observations(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("ts"), col("event_id"),
      expr("CAST(get_json_object(props, '$.k') AS INT) div 25")
        .cast("int").as("tier"))

  /** Build the SCD2 version table: consecutive same-tier observations
    * per user collapse into one version row with `[valid_from,
    * valid_to)` validity, a 1-based version number, the observation
    * count, and an `is_current` flag (open interval, NULL valid_to).
    *
    * Determinism: the per-user order is (ts, event_id) — a total
    * order; everything else is integer run-length algebra.
    *
    * Scale shape: ONE shuffle on user_id serves both the lag and the
    * running change-count (same window frame → one sort); the lead()
    * that closes the intervals runs on the collapsed VERSION table
    * (≤ observation count, typically ≪), partitioned by the same key.
    * No skew risk beyond per-user event counts — the same profile as
    * the session family.
    */
  def build(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val versioned = observations(events)
      .withColumn("chg",
        when(lag(col("tier"), 1).over(byUser).isNull ||
          lag(col("tier"), 1).over(byUser) =!= col("tier"), 1L)
          .otherwise(0L))
      .withColumn("version_no",
        sum(col("chg")).over(byUser.rowsBetween(Long.MinValue, 0)))
      .groupBy(col("user_id"), col("version_no"))
      .agg(min(col("tier")).as("tier"), // constant within the run
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_obs"))
    val byVersion = Window.partitionBy(col("user_id"))
      .orderBy(col("version_no"))
    versioned
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .select(col("user_id"), col("version_no"), col("tier"),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"), col("n_obs"))
      .orderBy(col("user_id"), col("version_no"))
  }

  /** Point-in-time dimension lookup: each purchase joins the ONE tier
    * version valid at its timestamp (`valid_from <= ts < valid_to`,
    * open current interval), then revenue rolls up by tier — the
    * history question a current-state dim answers WRONG (it would
    * credit every past purchase to today's tier).
    *
    * A purchase observes its own tier, so every purchase matches
    * exactly one version by construction (no unmatched rows, no
    * dedup needed).
    *
    * Scale shape: equi-join on user_id with a residual range
    * predicate — SortMergeJoin on the key, never a nested loop; the
    * version side is the collapsed table. Money stays decimal
    * end-to-end.
    */
  def revenueByTier(events: DataFrame): DataFrame = {
    val dim = build(events)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        // micro-unit pin (round(v·1e6, 0), the lm_score form): both
        // engines round the same IEEE double to an integer; revenue
        // sums stay exact integers and the output is a double —
        // round(v, 6)+decimal-cast pins and DECIMAL output columns
        // are the round-8 driver-red constructs
        round(col("value") * lit(1000000.0), 0).cast("long").as("rev6"))
    purchases.join(dim,
        purchases("user_id") === dim("user_id") &&
          purchases("ts") >= dim("valid_from") &&
          (dim("valid_to").isNull || purchases("ts") < dim("valid_to")))
      .groupBy(dim("tier"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("rev6").cast(DecimalType(38, 0))).as("s6"))
      .select(col("tier"), col("n_purchases"),
        (col("s6").cast("double") / lit(1000000.0)).as("revenue"))
      .orderBy(col("tier"))
  }
}
