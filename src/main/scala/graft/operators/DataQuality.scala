package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over the lakehouse tables —
  * the constraint-suite a 100 TB ingestion runs before promoting a drop
  * (the Deequ/"expectations" pattern, re-expressed as plain Catalyst
  * aggregation so the whole audit stays inside whole-stage codegen).
  *
  * The reference pipeline validates implicitly (PERMISSIVE `from_json`
  * nulls + `_rejects` audit, `spark/jobs/kafka_to_bronze_trades.py`);
  * this makes the contract explicit and *measurable*: every check
  * yields a (violations, rows, pass) row, so drift is a diffable table
  * rather than a silent null.
  *
  * Scale shape — the audit cost is one pass per table, not per check:
  *   - All [[RowCheck]]s (null / range / domain / regex) of one table
  *     fold into a SINGLE conditional-aggregation scan (map-side
  *     partial agg → 1 row). Adding a check adds a column, not a scan.
  *   - [[Uniqueness]] is the only per-check shuffle: a two-stage hash
  *     agg on the key (surplus rows = Σ(group count − 1) = rows −
  *     distinct keys). At 100 TB this is the same shuffle the dedup
  *     family already pays; an HLL sketch would make it approximate
  *     and map-only, at the cost of exactness (see `approx_profile`'s
  *     note on sketch oracles).
  *   - [[Inclusion]] (referential integrity) is a left-anti join
  *     against the DISTINCT parent key; Spark broadcasts it when the
  *     parent is a dim, and AQE handles the fact-fact case.
  * The audit result itself is O(checks) rows — union of 1-row aggs.
  */
object DataQuality {

  /** One declared expectation; `id` is the stable report key. */
  sealed trait Check { def id: String; def table: String }

  /** Row-level predicate expectation: a row violates the check when
    * `valid` evaluates to false OR null (so `isNotNull` completeness,
    * range, domain-membership, and regex checks are all this shape).
    */
  final case class RowCheck(id: String, table: String, valid: Column)
      extends Check

  /** Key-uniqueness expectation; violations = surplus duplicate rows
    * (rows − distinct keys), 0 iff `cols` is a candidate key.
    */
  final case class Uniqueness(id: String, table: String, cols: Seq[String])
      extends Check

  /** Referential-integrity expectation: every non-null `col` value in
    * `table` must appear in `parent(parentCol)`. Null FKs are NOT
    * violations here — declare a separate completeness [[RowCheck]] if
    * the FK is also mandatory (SQL's FK semantics, kept separable so
    * the report distinguishes "missing" from "dangling").
    */
  final case class Inclusion(id: String, table: String, col: String,
      parent: String, parentCol: String) extends Check

  /** Runs every check and returns one row per check:
    * (check_id, table_name, n_rows, n_violations, pass), sorted by
    * check_id. `tables` maps the names used in checks to DataFrames.
    */
  def audit(tables: Map[String, DataFrame], checks: Seq[Check]): DataFrame = {
    val row = checks.collect { case c: RowCheck => c }.groupBy(_.table)
    val perTable: Seq[DataFrame] = row.toSeq.map { case (t, cs) =>
      val df = tables(t)
      // one scan: count(*) plus one conditional sum per check
      val aggs = cs.map(c =>
        sum(when(c.valid, 0L).otherwise(1L)).as(s"v_${c.id}"))
      val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      val stackArgs = cs.map(c => s"'${c.id}', `v_${c.id}`").mkString(", ")
      one.select(
        expr(s"stack(${cs.size}, $stackArgs)").as(Seq("check_id", "n_violations")),
        col("n_rows"))
        .select(col("check_id"), lit(t).as("table_name"), col("n_rows"),
          col("n_violations"))
    }
    val uniq: Seq[DataFrame] = checks.collect { case c: Uniqueness =>
      tables(c.table)
        .groupBy(c.cols.map(col): _*).agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n_rows"),
          sum(col("cnt") - 1).as("n_violations"))
        .select(lit(c.id).as("check_id"), lit(c.table).as("table_name"),
          col("n_rows"), col("n_violations"))
    }
    val incl: Seq[DataFrame] = checks.collect { case c: Inclusion =>
      val child = tables(c.table).select(col(c.col)).where(col(c.col).isNotNull)
      val parent = tables(c.parent).select(col(c.parentCol).as(c.col)).distinct()
      val dangling = child.join(parent, Seq(c.col), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      val total = child.agg(count(lit(1)).as("n_rows"))
      total.crossJoin(dangling) // both sides are 1-row aggregates
        .select(lit(c.id).as("check_id"), lit(c.table).as("table_name"),
          col("n_rows"), col("n_violations"))
    }
    (perTable ++ uniq ++ incl)
      .reduce(_.unionByName(_))
      .select(col("check_id"), col("table_name"),
        col("n_rows").cast("long").as("n_rows"),
        col("n_violations").cast("long").as("n_violations"),
        (col("n_violations") === 0).as("pass"))
      .orderBy(col("check_id"))
  }

  /** Population-stability-index drift monitor — the numeric complement
    * of [[audit]]'s boolean gate: compares the `value` distribution of
    * the month's first half (reference) against the second (current)
    * per event_type, over `nBins` equal-width bins with Laplace
    * smoothing (so empty bins contribute finite terms), reporting
    * PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref). The conventional
    * reading: <0.1 stable, 0.1–0.25 moderate shift, >0.25 drifted.
    *
    * Determinism: bin ids are floor arithmetic off the global bounds;
    * the 10 per-bin terms are rounded to 12 decimals and summed as
    * DECIMAL (double Σ is merge-order-dependent; decimal Σ is
    * associative), matching the house vwap/corr convention. The full
    * (type × bin) grid is materialized so missing bins smooth
    * identically in both engines.
    *
    * Scale shape: one bounds agg (1-row broadcast), one conditional
    * count per (type, side, bin) — map-side combinable — and
    * grid-sized (|types|·nBins) arithmetic after that. The monitor
    * reads the fact table once.
    */
  def psiDrift(events: DataFrame, nBins: Int = 10): DataFrame = {
    val base = events.select(col("event_type"), col("value"),
      when(dayofmonth(col("ts")) <= 15, "ref").otherwise("cur").as("side"))
    val bounds = base.agg(min(col("value")).as("vmin"),
      max(col("value")).as("vmax"))
    val counts = base.crossJoin(broadcast(bounds))
      .withColumn("bin", least(lit(nBins - 1),
        floor((col("value") - col("vmin")) * nBins /
          (col("vmax") - col("vmin")))))
      .groupBy(col("event_type"), col("side"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val totals = base.groupBy(col("event_type"), col("side"))
      .agg(count(lit(1)).as("n"))
    val grid = base.select(col("event_type")).distinct()
      .crossJoin(broadcast(events.sparkSession.range(nBins.toLong)
        .select(col("id").as("bin"))))
    def sideP(s: String) = grid
      .join(counts.where(col("side") === s).drop("side"),
        Seq("event_type", "bin"), "left")
      .join(totals.where(col("side") === s).drop("side"), Seq("event_type"))
      .select(col("event_type"), col("bin"), col("n").as(s"n_$s"),
        ((coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
          (col("n") + nBins).cast("double")).as(s"p_$s"))
    sideP("ref").join(sideP("cur"), Seq("event_type", "bin"))
      .withColumn("term_u",
        round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref"))
          * lit(1.0e12), 0).cast("long"))
      .groupBy(col("event_type"))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        (round(sum(col("term_u")).cast("double") / lit(1.0e12)
          * lit(1.0e6), 0) / lit(1.0e6)).as("psi"))
      .orderBy(col("event_type"))
  }

  /** Seasonal volume-anomaly monitor: hourly event counts scored
    * against the same hour-of-day's baseline distribution — the
    * traffic-shape watchdog beside value drift ([[psiDrift]]) and
    * digit conformity ([[benfordAudit]]). Days ≤ `baselineDays` train a
    * per-(type, hour) mean/std over hourly counts; later days score
    * z = (c − μ)/σ and flag |z| ≥ `zThresh`. The full
    * type × date × hour grid is materialized so SILENT hours count as
    * zeros on both sides — a feed that stops emitting is an anomaly,
    * not a missing row (the failure mode a groupBy-only monitor
    * cannot see).
    *
    * Determinism: counts are exact longs, so Σc and Σc² are exact; μ,
    * σ and z are fixed double expressions over those integers —
    * bit-identical cross-engine — rounded to 6 only at the output.
    * Scale shape: one count agg, a calendar-sized grid join, one
    * (type, hour)-sized baseline agg broadcast back.
    */
  def seasonalAnomaly(events: DataFrame, baselineDays: Int = 21,
      zThresh: Double = 3.0): DataFrame = {
    val base = events.select(col("event_type"), to_date(col("ts")).as("day"),
      hour(col("ts")).as("hod"))
    val grid = base.select(col("event_type")).distinct()
      .crossJoin(base.select(col("day")).distinct())
      .crossJoin(broadcast(events.sparkSession.range(24)
        .select(col("id").cast("int").as("hod"))))
    val counts = base.groupBy(col("event_type"), col("day"), col("hod"))
      .agg(count(lit(1)).as("cnt"))
    val full = grid.join(counts, Seq("event_type", "day", "hod"), "left")
      .withColumn("c", coalesce(col("cnt"), lit(0L)))
    val bl = full.filter(dayofmonth(col("day")) <= baselineDays)
      .groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n_slots"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("sc2"))
    val mu = col("sc").cast("double") / col("n_slots").cast("double")
    val variance = (col("sc2").cast("double") -
      col("sc").cast("double") * col("sc").cast("double") /
        col("n_slots").cast("double")) /
      (col("n_slots").cast("double") - lit(1.0d))
    full.filter(dayofmonth(col("day")) > baselineDays)
      .join(bl, Seq("event_type", "hod"))
      .withColumn("mu", mu)
      .withColumn("sd", when(variance > 0, sqrt(variance)))
      .withColumn("z", when(col("sd").isNotNull,
        round((col("c").cast("double") - col("mu")) / col("sd")
          * lit(1.0e6), 0) / lit(1.0e6)))
      .select(col("event_type"), col("day"), col("hod").as("hour"),
        col("c").as("n_events"),
        (round(col("mu") * lit(1.0e6), 0) / lit(1.0e6)).as("mu"),
        (round(col("sd") * lit(1.0e6), 0) / lit(1.0e6)).as("sd"), col("z"),
        coalesce(abs(col("z")) >= zThresh, lit(false)).as("anomalous"))
      .orderBy(col("event_type"), col("day"), col("hour"))
  }

  /** Benford first-digit conformity audit per event type — the
    * fabricated-data / instrumentation-bug detector beside schema
    * checks ([[audit]]) and distribution drift ([[psiDrift]]): natural
    * multi-scale quantities follow P(d) = log10(1 + 1/d) for their
    * first significant digit; synthetic, capped, or hand-entered
    * values do not. Reports the chi-square statistic and Nigrini's
    * mean-absolute-deviation with the standard 0.015 acceptability
    * cut — a breached cut on a feed that used to conform is the audit
    * signal, not absolute conformity.
    *
    * Determinism: the first digit comes from the CENTS integer
    * (round(value·100) → long → leading decimal digit via the string
    * form) — integer→string is bit-identical across engines, where
    * floor(log10(value)) is one ulp from flipping digits at powers of
    * ten. Per-digit terms are 12-decimal rounded and summed as DECIMAL
    * (the [[psiDrift]] convention). Map-only until a 9-row-per-type
    * aggregation.
    */
  def benfordAudit(events: DataFrame): DataFrame = {
    val base = events.filter(col("value") > 0)
      .select(col("event_type"),
        substring(round(col("value") * 100, 0).cast("long").cast("string"),
          1, 1).cast("int").as("digit"))
    val counts = base.groupBy(col("event_type"), col("digit"))
      .agg(count(lit(1)).as("cnt"))
    val totals = base.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val grid = base.select(col("event_type")).distinct()
      .crossJoin(broadcast(events.sparkSession.range(1L, 10L)
        .select(col("id").cast("int").as("digit"))))
    grid.join(counts, Seq("event_type", "digit"), "left")
      .join(totals, Seq("event_type"))
      .withColumn("obs",
        coalesce(col("cnt"), lit(0L)).cast("double") / col("n").cast("double"))
      .withColumn("expd", log10(lit(1.0) + lit(1.0) / col("digit").cast("double")))
      .withColumn("chi_term_u",
        round(pow(col("obs") - col("expd"), 2) / col("expd")
          * lit(1.0e12), 0).cast("long"))
      .withColumn("mad_term_u",
        round(abs(col("obs") - col("expd")) * lit(1.0e12), 0).cast("long"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        (round(sum(col("chi_term_u")).cast("double") / lit(1.0e12)
          * max(col("n")).cast("double") * lit(1.0e6), 0) / lit(1.0e6))
          .as("chi2"),
        (round(sum(col("mad_term_u")).cast("double") / lit(1.0e12) / 9
          * lit(1.0e6), 0) / lit(1.0e6)).as("mad"))
      .withColumn("conforms", col("mad") <= 0.015)
      .orderBy(col("event_type"))
  }

  /** The persisted-baseline form of the drift monitor — the family's
    * incremental shape: [[referenceHistogram]] is the nightly index
    * (per-(type, bin) counts PLUS the frozen bounds it was built
    * with), and [[psiVsBaseline]] scores any later slice against it
    * WITHOUT re-reading reference data. Freezing the bounds matters:
    * recomputing them over ref∪cur (what [[psiDrift]] does for the
    * one-shot audit) silently re-bins history; the production monitor
    * bins today's data with yesterday's committed edges, and values
    * beyond them clamp into the edge bins — where the drift then
    * shows up, as it should.
    */
  def referenceHistogram(events: DataFrame, nBins: Int = 10): DataFrame = {
    val bounds = events.agg(min(col("value")).as("vmin"),
      max(col("value")).as("vmax"))
    events.crossJoin(broadcast(bounds))
      .withColumn("bin", least(lit(nBins - 1), greatest(lit(0L),
        floor((col("value") - col("vmin")) * nBins /
          (col("vmax") - col("vmin"))))))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("cnt"), max(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"))
  }

  /** PSI of `current` against a persisted [[referenceHistogram]] —
    * same smoothing/summation discipline as [[psiDrift]], but the
    * reference side is read from the index (never re-scanned) and the
    * current side is binned with the index's FROZEN bounds, clamped
    * into the edge bins beyond them.
    */
  def psiVsBaseline(baseline: DataFrame, current: DataFrame,
      nBins: Int = 10): DataFrame = {
    val meta = baseline.agg(max(col("vmin")).as("vmin"),
      max(col("vmax")).as("vmax"))
    val curCounts = current.crossJoin(broadcast(meta))
      .withColumn("bin", least(lit(nBins - 1), greatest(lit(0L),
        floor((col("value") - col("vmin")) * nBins /
          (col("vmax") - col("vmin"))))))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val grid = baseline.select(col("event_type")).distinct()
      .crossJoin(broadcast(baseline.sparkSession.range(nBins.toLong)
        .select(col("id").as("bin"))))
    def smooth(counts: DataFrame, tag: String) = {
      val totals = counts.groupBy(col("event_type"))
        .agg(sum(col("cnt")).as("n"))
      grid.join(counts.select(col("event_type"), col("bin"), col("cnt")),
          Seq("event_type", "bin"), "left")
        .join(totals, Seq("event_type"))
        .select(col("event_type"), col("bin"), col("n").as(s"n_$tag"),
          ((coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
            (col("n") + nBins).cast("double")).as(s"p_$tag"))
    }
    smooth(baseline, "ref").join(smooth(curCounts, "cur"),
        Seq("event_type", "bin"))
      .withColumn("term_u",
        round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref"))
          * lit(1.0e12), 0).cast("long"))
      .groupBy(col("event_type"))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        (round(sum(col("term_u")).cast("double") / lit(1.0e12)
          * lit(1.0e6), 0) / lit(1.0e6)).as("psi"))
      .orderBy(col("event_type"))
  }

  /** The standard constraint suite for the harness tables — the checks
    * a promotion gate would run on every drop. Uses only deterministic,
    * ANSI-expressible predicates so the DuckDB oracle mirrors exactly.
    */
  def standardChecks: Seq[Check] = Seq(
    // orders
    Uniqueness("orders_pk_unique", "orders", Seq("o_orderkey")),
    RowCheck("orders_custkey_complete", "orders", col("o_custkey").isNotNull),
    RowCheck("orders_totalprice_positive", "orders", col("o_totalprice") > 0),
    RowCheck("orders_status_domain", "orders",
      col("o_orderstatus").isin("F", "O", "P")),
    Inclusion("orders_custkey_in_customer", "orders", "o_custkey",
      "customer", "c_custkey"),
    // customer
    Uniqueness("customer_pk_unique", "customer", Seq("c_custkey")),
    RowCheck("customer_name_pattern", "customer",
      col("c_name").rlike("^Customer#[0-9]+$")),
    Inclusion("customer_nation_in_nation", "customer", "c_nationkey",
      "nation", "n_nationkey"),
    // lineitem
    Uniqueness("lineitem_pk_unique", "lineitem",
      Seq("l_orderkey", "l_linenumber")),
    RowCheck("lineitem_discount_range", "lineitem",
      col("l_discount") >= 0 && col("l_discount") <= 1),
    RowCheck("lineitem_quantity_positive", "lineitem", col("l_quantity") > 0),
    RowCheck("lineitem_ship_after_1990", "lineitem",
      col("l_shipdate") >= to_timestamp(lit("1990-01-01"))),
    Inclusion("lineitem_order_in_orders", "lineitem", "l_orderkey",
      "orders", "o_orderkey"),
    // events
    Uniqueness("events_pk_unique", "events", Seq("event_id")),
    RowCheck("events_ts_complete", "events", col("ts").isNotNull),
    RowCheck("events_value_complete", "events", col("value").isNotNull),
    // documents
    Uniqueness("documents_pk_unique", "documents", Seq("doc_id")),
    RowCheck("documents_text_complete", "documents",
      col("text").isNotNull && length(col("text")) > 0),
    RowCheck("documents_nchars_consistent", "documents",
      col("n_chars") === length(col("text"))),
    // embeddings
    Uniqueness("embeddings_pk_unique", "embeddings", Seq("vec_id")),
    RowCheck("embeddings_dim_consistent", "embeddings",
      size(col("embedding")) === 64)
  )

  /** Grouped k-fold cross-validation assignment over the event stream:
    * every event lands in fold `hash60("fold_" ++ user_id) mod k`, so
    * ALL of a user's events share one fold — the GROUPED k-fold that
    * keeps correlated rows (one user's behavior) out of both train and
    * held-out folds simultaneously (row-level random folds leak, a
    * near-duplicate of the dedup rationale applied to supervised
    * evaluation). Assignment is content-stable (salted hash of the
    * group key, the [[graft.operators.TextAnalysis.splitAudit]]
    * convention), so folds are reproducible across engines, runs, and
    * repartitionings with no stored fold table.
    *
    * Output: one row per fold — user and event counts, the event
    * share (exact-integer quotient), and `n_leaky_users`, the number
    * of users observed in more than one fold. Zero by construction
    * here, but computed FROM THE DATA: in production the fold column
    * is materialized and can rot (backfills joining stale fold
    * tables), and this audit is what catches it.
    *
    * Scale shape: fold tagging is map-only; the per-fold and per-user
    * aggregations are two independent hash aggs over the same tagged
    * stream (the user-level one reuses the shuffle the per-fold
    * countDistinct already pays); the 1-row leak count rides the plan
    * as a broadcast cross join — nothing collected.
    */
  /** Exact two-sample Kolmogorov–Smirnov test between the `value`
    * distributions of two event types — the bin-free companion of
    * [[psiDrift]]: PSI sees what a fixed grid sees; KS finds the
    * supremum CDF gap at ANY observed point, so shape changes inside
    * one PSI bin still register. Emits D, both sample sizes, the
    * α=0.05 asymptotic critical value c·√((n₁+n₂)/(n₁n₂)) with
    * c = 1.358, and the rejection flag.
    *
    * Scale shape — the textbook "sort and scan the pooled sample" is a
    * single-partition cumulative window; this is the PARALLEL-PREFIX
    * form instead: (1) one hash agg to per-distinct-value counts,
    * (2) fixed-width value buckets from a 1-row min/max broadcast,
    * (3) per-bucket totals cumulated on the BUCKET table (tiny — one
    * window over nBuckets rows), (4) within-bucket cumulative windows
    * partitioned by bucket, offset by the broadcast bucket prefix.
    * Every fact-sized pass is hash-partitioned; the only ordered scan
    * is bucket-count-sized. The CDF quotients are exact-integer
    * divisions (bit-identical cross-engine), and max is
    * order-independent, so D needs no rounding.
    */
  def ksTest(events: DataFrame, typeA: String, typeB: String,
             nBuckets: Int = 256): DataFrame = {
    val v = events
      .filter(col("event_type").isin(typeA, typeB))
      .select(col("value"),
        (col("event_type") === typeA).cast("long").as("a"))
    val d = v.groupBy(col("value"))
      .agg(sum(col("a")).as("ca"),
        (count(lit(1)) - sum(col("a"))).as("cb"))
    val rng = d.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val bucketed = d.crossJoin(broadcast(rng))
      .withColumn("bucket",
        least(lit(nBuckets - 1),
          floor((col("value") - col("lo")) /
            ((col("hi") - col("lo")) / nBuckets + lit(1e-300))))
          .cast("int"))
    val bucketTotals = bucketed.groupBy(col("bucket"))
      .agg(sum(col("ca")).as("ba"), sum(col("cb")).as("bb"))
    val bucketPrefix = bucketTotals
      .withColumn("off_a",
        coalesce(sum(col("ba")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("off_b",
        coalesce(sum(col("bb")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("bucket"), col("off_a"), col("off_b"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("value"))
      .rowsBetween(Long.MinValue, 0)
    val cum = bucketed.join(broadcast(bucketPrefix), Seq("bucket"))
      .withColumn("cum_a", col("off_a") + sum(col("ca")).over(wIn))
      .withColumn("cum_b", col("off_b") + sum(col("cb")).over(wIn))
    val tot = d.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cum.crossJoin(broadcast(tot))
      .select((abs(col("cum_a").cast("double") / col("na").cast("double") -
        col("cum_b").cast("double") / col("nb").cast("double")))
        .as("gap"), col("na"), col("nb"))
      .groupBy(col("na"), col("nb"))
      .agg(max(col("gap")).as("gap_max"))
      // a one-sided pool (na or nb = 0) has no defined KS statistic:
      // emit NULLs, never the NaN/Infinity the raw CDF division yields
      .select(lit(typeA).as("type_a"), lit(typeB).as("type_b"),
        col("na").as("n_a"), col("nb").as("n_b"),
        when(col("na") > 0 && col("nb") > 0, col("gap_max"))
          .as("ks_stat"),
        when(col("na") > 0 && col("nb") > 0,
          lit(1.358) * sqrt((col("na") + col("nb")).cast("double") /
            (col("na") * col("nb")).cast("double"))).as("ks_crit"))
      .withColumn("rejected", col("ks_stat") > col("ks_crit"))
  }

  def cvFolds(events: DataFrame, k: Int = 5): DataFrame = {
    import graft.functions.TextFunctions.hash60
    val tagged = events.select(
      pmod(hash60(concat(lit("fold_"), col("user_id"))), lit(k))
        .cast("int").as("fold"),
      col("user_id"))
    val perFold = tagged.groupBy(col("fold"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
    val leak = tagged
      .groupBy(col("user_id"))
      .agg(countDistinct(col("fold")).as("nf"))
      .agg(count(when(col("nf") > 1, 1)).as("n_leaky_users"))
    val total = perFold.agg(sum(col("n_events")).as("tot"))
    perFold.crossJoin(broadcast(leak)).crossJoin(broadcast(total))
      .select(col("fold"), col("n_users"), col("n_events"),
        (col("n_events").cast("double") / col("tot").cast("double"))
          .as("event_share"),
        col("n_leaky_users"))
      .orderBy(col("fold"))
  }

  /** Leakage-safe out-of-fold target encoding — the feature-
    * engineering companion of [[cvFolds]]: encode a categorical
    * (event_type) by the mean of a target (value) computed WITHOUT the
    * fold being encoded, so a model trained on fold i never sees a
    * statistic that contains its own rows (naive whole-corpus target
    * encoding is one of the classic silent leaks). Folds reuse
    * [[cvFolds]]'s exact salted USER hash — the same correlated-rows
    * discipline, and the two operators agree on membership by
    * construction.
    *
    * The OOF mean is (S_type − S_fold)/(N_type − N_fold) over EXACT
    * integer sums (values pinned to 1e-6-unit longs — round(v·1e6, 0),
    * never round(v, 6) — then summed exactly; no order dependence),
    * with one double division at the boundary; a
    * group-total window rides the same (type, fold) aggregation, so
    * nothing rescans the facts.
    */
  def targetEncodeOof(events: DataFrame, k: Int = 5): DataFrame = {
    import graft.functions.TextFunctions.hash60
    val wType = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    events.select(col("event_type"),
        pmod(hash60(concat(lit("fold_"), col("user_id"))),
          lit(k.toLong)).cast("int").as("fold"),
        round(col("value") * lit(1.0e6), 0).cast("long").as("vu"))
      .groupBy(col("event_type"), col("fold"))
      .agg(count(lit(1)).as("n_f"), sum(col("vu")).as("s_f"))
      .withColumn("n_tot", sum(col("n_f")).over(wType))
      .withColumn("s_tot", sum(col("s_f")).over(wType))
      .select(col("event_type"), col("fold"),
        col("n_f").as("n_in_fold"),
        (col("n_tot") - col("n_f")).as("n_oof"),
        when(col("n_tot") - col("n_f") > 0,
          round((col("s_tot") - col("s_f")).cast("double") / lit(1.0e6) /
            (col("n_tot") - col("n_f")).cast("double")
            * lit(1.0e6), 0) / lit(1.0e6))
          .as("oof_mean"))
      .orderBy(col("event_type"), col("fold"))
  }

  /** Cochran–Mantel–Haenszel stratified A/B test — the
    * Simpson's-paradox guard beside [[abTestZ]]: the pooled z can
    * flip sign when arms are imbalanced across strata (here:
    * first-activity cohort weeks), because a lurking stratum variable
    * confounds the marginal table. CMH tests the common effect ACROSS
    * the per-stratum 2×2 tables: χ² = (Σaᵢ − ΣEᵢ)² / ΣVᵢ with
    * Eᵢ = n1ᵢm1ᵢ/Tᵢ and Vᵢ = n1ᵢn0ᵢm1ᵢm0ᵢ/(Tᵢ²(Tᵢ−1)). Arms reuse
    * [[abTestZ]]'s salted user hash, so the two tests read the same
    * experiment.
    *
    * Determinism: per-stratum E/V are exact 1e-12-unit truncating
    * integer divisions of integer count products (never a
    * round(double, 12) pin), their sums exact integers, and the χ²
    * a micro-truncated integer ratio — E/V/χ² emit as doubles from
    * int64 units (the no-DECIMAL-outputs envelope). Scale: one
    * per-user fold, one |strata|-row table, a 1-row totals
    * broadcast.
    */
  def abTestCmh(events: DataFrame,
                targetType: String = "purchase"): DataFrame = {
    import graft.functions.TextFunctions.hash60
    import org.apache.spark.sql.types.DecimalType
    val per = events.groupBy(col("user_id")).agg(
        min(col("ts")).as("first_ts"),
        max(when(col("event_type") === targetType, 1).otherwise(0))
          .as("conv"))
      // week bucket pinned to DATE: DuckDB's date_trunc return type
      // (TIMESTAMP vs DATE) moved across versions, so an unpinned
      // stratum column is an engine-version output type
      .select(date_trunc("week", col("first_ts")).cast("date")
          .as("stratum"),
        col("conv"),
        pmod(hash60(concat(lit("ab_"), col("user_id"))), lit(2L))
          .as("arm"))
    val tab = per.groupBy(col("stratum")).agg(
        sum(when(col("arm") === 0 && col("conv") === 1, 1L)
          .otherwise(0L)).as("a"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n0"),
        sum(when(col("conv") === 1, 1L).otherwise(0L)).as("m1"))
      .withColumn("t", col("n1") + col("n0"))
      .withColumn("m0", col("t") - col("m1"))
      .filter(col("t") > 1)
      // E and V as exact 1e-12-unit truncating integer divisions of
      // integer products — never round(double, 12): a 12-rounded
      // double cast to DECIMAL re-rounds binary→decimal in
      // engine-version territory (the round-8 driver-red construct)
      .withColumn("e12", expr("(CAST(n1 AS DECIMAL(38,0)) * m1 " +
        "* 1000000000000) div t"))
      .withColumn("v12", expr("(CAST(n1 AS DECIMAL(38,0)) * n0 " +
        "* m1 * m0 * 1000000000000) div (t * t * (t - 1))"))
    val tot = tab.agg(sum(col("a")).as("sum_a"),
      sum(col("e12").cast(DecimalType(38, 0))).as("se12"),
      sum(col("v12").cast(DecimalType(38, 0))).as("sv12"))
    tab.crossJoin(broadcast(tot))
      // χ² = Δ²/V truncated at micro precision over exact integers:
      // Δ first reduced to 1e-6 units so Δ² stays within 38 digits
      .withColumn("d6", expr(
        "(CAST(sum_a AS DECIMAL(38,0)) * 1000000000000 - se12) " +
          "div 1000000"))
      .select(col("stratum"), col("a"), col("n1"), col("n0"),
        col("m1"), col("m0"),
        (col("e12").cast("double") / lit(1.0e12)).as("e"),
        (col("v12").cast("double") / lit(1.0e12)).as("v"),
        when(col("sv12") > 0,
          expr("(CAST(d6 AS DECIMAL(38,0)) * d6 * 1000000) div sv12")
            .cast("double") / lit(1000000.0)).as("cmh_chi2"))
      .orderBy(col("stratum"))
  }

  /** Two-proportion z-test per event type between salted-hash A/B
    * arms — the EXPERIMENT readout beside the drift monitors: KS/PSI
    * ask "did the distribution move over time", this asks "do two
    * concurrent user populations differ", the primitive behind every
    * A/B conversion comparison. Arm assignment is the content-stable
    * salted hash (the [[cvFolds]] discipline: a USER-keyed hash, so
    * correlated events never straddle arms and reruns are exact).
    *
    * z = (x_a·n_b − x_b·n_a) / √(x·(n−x)·n_a·n_b / n) — the pooled
    * two-proportion statistic algebraically cleared of nested
    * fractions, so both engines compute ONE double expression over
    * exact integer products in a pinned order (products stay in
    * signed-long range up to ~10⁹ users); degenerate pools (x = 0 or
    * x = n) yield NULL, and significance flags from the ROUNDED z so
    * both engines branch on identical operands.
    *
    * Scale shape: one distinct-user pass for arms (1-row broadcast),
    * one distinct (user, type) pass for conversions, then the output
    * is |event types| rows. No per-user state after the two hash aggs.
    */
  def abTestZ(events: DataFrame, salt: String = "ab_"): DataFrame = {
    import graft.functions.TextFunctions.hash60
    val users = events.select(col("user_id")).distinct()
      .withColumn("arm",
        pmod(hash60(concat(lit(salt), col("user_id"))), lit(2L)))
    val arms = users.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
    val perType = events.select(col("user_id"), col("event_type"))
      .distinct()
      .join(users, Seq("user_id"))
      .groupBy(col("event_type")).agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("x_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("x_b"))
    perType.crossJoin(broadcast(arms))
      .withColumn("x", col("x_a") + col("x_b"))
      .withColumn("n", col("n_a") + col("n_b"))
      .withColumn("z",
        when(col("x") > 0 && col("x") < col("n"),
          round((col("x_a") * col("n_b") - col("x_b") * col("n_a"))
            .cast("double") /
            sqrt((col("x") * (col("n") - col("x"))).cast("double") *
              (col("n_a") * col("n_b")).cast("double") / col("n"))
            * lit(1.0e6), 0) / lit(1.0e6)))
      .select(col("event_type"), col("n_a"), col("n_b"),
        col("x_a"), col("x_b"),
        (round(col("x_a").cast("double") / col("n_a") * lit(1.0e6), 0)
          / lit(1.0e6)).as("rate_a"),
        (round(col("x_b").cast("double") / col("n_b") * lit(1.0e6), 0)
          / lit(1.0e6)).as("rate_b"),
        col("z"),
        (col("z").isNotNull && abs(col("z")) > 1.96).as("significant"))
      .orderBy(col("event_type"))
  }

  /** Additive seasonal decomposition of per-type hourly event counts
    * — observed = trend + seasonal + remainder, the classical-
    * decomposition view beside [[seasonalAnomaly]]'s z-scores: trend
    * is a centered 25-point (±12 h RANGE) moving mean emitted only
    * where the window is COMPLETE (25 observed hours — a gap leaves
    * trend NULL rather than silently averaging fewer points),
    * seasonal is the per-(type, hour-of-day) mean of the detrended
    * series, remainder is what's left.
    *
    * Numerics: counts are integers, both means are truncating
    * micro-unit integer divisions (Spark `div` ≡ DuckDB `//` ≡ BigInt
    * `/`, toward zero — detrended values go negative), so every
    * output is an exact 1e-6-unit integer.
    *
    * Scale shape: one (type, hour) count agg, one RANGE window and
    * one (type, hod) window over the HOURLY table — calendar-bounded
    * (types × hours), not data-bounded; the raw scan reduces
    * map-side.
    */
  def seasonalDecompose(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    def micro(c: Column) = c.cast("double") / lit(1000000.0)
    val hourly = events
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("n"))
      .withColumn("ts_s", col("hour_ts").cast("long"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts_s"))
      .rangeBetween(-43200L, 43200L)
    val t = hourly
      .withColumn("wsum", sum(col("n")).over(w))
      .withColumn("wcnt", count(lit(1)).over(w))
      .withColumn("trend6",
        when(col("wcnt") === 25, expr("(wsum * 1000000) div 25")))
      .withColumn("det6", col("n") * lit(1000000L) - col("trend6"))
    val wh = Window.partitionBy(col("event_type"),
      hour(col("hour_ts")))
    t.withColumn("ssum", sum(col("det6")).over(wh))
      .withColumn("scnt", count(col("det6")).over(wh))
      .withColumn("seas6",
        when(col("scnt") > 0, expr("ssum div scnt")))
      .filter(col("trend6").isNotNull)
      .select(col("event_type"), col("hour_ts"), col("n").as("n_events"),
        micro(col("trend6")).as("trend"),
        micro(col("seas6")).as("seasonal"),
        micro(col("det6") - col("seas6")).as("remainder"))
      .orderBy(col("event_type"), col("hour_ts"))
  }

  /** Heterogeneous treatment effect by segment — the question the
    * pooled [[abTestZ]] averages away: the same salted-hash arms, the
    * heavy-buyer outcome, users segmented by activity (distinct
    * non-purchase days: low ≤ 10 < mid ≤ 20 < high), and per-segment
    * uplift = treated rate − control rate. A pooled test can read
    * zero while the low segment gains exactly what the high segment
    * loses; this is the table that shows it.
    *
    * Numerics: rates are truncating 1e-6-unit integer divisions, so
    * uplift is an EXACT integer difference (can be negative); the
    * only libm value is the per-segment two-proportion z, pinned as
    * round(z·1e6, 0) — the safe product-pin, not round(z, 6).
    *
    * Scale shape: one per-user fold (the logit feature shuffle), one
    * |segments|-row aggregation. No cross joins at all.
    */
  def upliftBySegment(events: DataFrame, convType: String = "purchase",
                      salt: String = "ab_",
                      heavyK: Int = 13): DataFrame = {
    import graft.functions.TextFunctions.hash60
    import org.apache.spark.sql.types.DecimalType
    val f = events.groupBy(col("user_id")).agg(
        countDistinct(when(col("event_type") =!= convType,
          to_date(col("ts")))).as("n_days"),
        when(sum(when(col("event_type") === convType, 1L)
          .otherwise(0L)) > heavyK, 1L).otherwise(0L).as("y"))
      .select(
        when(col("n_days") <= 10, "low")
          .when(col("n_days") <= 20, "mid")
          .otherwise("high").as("segment"),
        pmod(hash60(concat(lit(salt), col("user_id"))), lit(2L))
          .as("arm"),
        col("y"))
    val g = f.groupBy(col("segment")).agg(
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
      sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("x_t"),
      sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("x_c"))
    def micro(c: Column) = c.cast("double") / lit(1000000.0)
    g.withColumn("x", col("x_t") + col("x_c"))
      .withColumn("n", col("n_t") + col("n_c"))
      .withColumn("z6",
        when(col("x") > 0 && col("x") < col("n") &&
            col("n_t") > 0 && col("n_c") > 0,
          round((col("x_t") * col("n_c") - col("x_c") * col("n_t"))
            .cast("double") /
            sqrt((col("x") * (col("n") - col("x"))).cast("double") *
              (col("n_t") * col("n_c")).cast("double") / col("n"))
            * lit(1e6), 0).cast("long")))
      .select(col("segment"), col("n_t"), col("n_c"),
        col("x_t"), col("x_c"),
        // ANSI div-by-zero guards: an empty arm yields NULL rates
        micro(when(col("n_t") > 0, expr("(x_t * 1000000) div n_t")))
          .as("rate_t"),
        micro(when(col("n_c") > 0, expr("(x_c * 1000000) div n_c")))
          .as("rate_c"),
        micro(when(col("n_t") > 0 && col("n_c") > 0,
          expr("(x_t * 1000000) div n_t - (x_c * 1000000) div n_c")))
          .as("uplift"),
        micro(col("z6")).as("z"),
        (col("z6").isNotNull && abs(col("z6")) > 1960000L)
          .as("significant"))
      .orderBy(col("segment"))
  }
}
