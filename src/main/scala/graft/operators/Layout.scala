package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout optimization audit — measures what multi-dimensional
  * (Z-order) clustering buys in FILE SKIPPING, the dominant scan lever
  * at 100 TB (Delta OPTIMIZE ZORDER / Iceberg sort orders do exactly
  * this; parquet row-group min/max stats are the skipping mechanism).
  *
  * The model: rows are totally ordered by a layout key and cut into
  * `nFiles` equal-row files (ntile — the write-time sort). Each file
  * keeps per-column min/max (the footer stats a scan consults). A MIXED
  * probe workload (2-D rectangles alternating with value-only bands)
  * then counts how many files' stat ranges intersect each probe —
  * files_hit IS the I/O a predicate-pushdown scan would do. Three
  * layouts face the same probes:
  *   - `time`:   ingest order (the do-nothing baseline) — stats on the
  *               probe dims are unclustered, nearly every file hits;
  *   - `user`:   single-dim sort — prunes the user dim fully, but each
  *               hit file spans the whole value range;
  *   - `zorder`: bit-interleaved (user, value) buckets — both dims
  *               cluster, so a rectangle touches ~probe-area · nFiles
  *               files (for power-of-2-aligned squares an interleaved
  *               square is ONE contiguous z-range).
  * Everything is integer arithmetic on bucket ids, so the DuckDB oracle
  * reproduces the audit bit-for-bit — including the ntile file cuts.
  *
  * Scale shape: one bounds agg (broadcast as a 1-row build side), one
  * global sort per layout (the real write-time cost Z-ordering pays),
  * one per-file stats agg, and a probes×files join where both sides are
  * tiny (nFiles·layouts rows vs nProbes rows). Nothing scales with raw
  * row count except the sorts — which ARE the operation being modeled.
  */
object Layout {

  /** Morton/Z value: interleaves the low `bits` bits of two non-negative
    * bucket columns (a gets even positions, b odd). Plain integer
    * arithmetic — no engine-specific bit intrinsics — so the oracle can
    * mirror it verbatim; codegen folds it to shifts.
    */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      val p = 1L << i
      // floor(double-div) == integer floor-div exactly while operands
      // stay far under 2^52 (bucket ids are < 2^bits); keeps the
      // expression portable to any engine without bit intrinsics
      (floor(a.cast("long") / p) % 2) * (1L << (2 * i)) +
        (floor(b.cast("long") / p) % 2) * (1L << (2 * i + 1))
    }.reduce(_ + _)

  /** The same z-value as DuckDB SQL over columns `a`, `b`. */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      val p = 1L << i
      s"(($a // $p) % 2) * ${1L << (2 * i)} + (($b // $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** Exact distributed `ntile(n)` over a totally-ordered frame — the
    * bucketed parallel-prefix discipline ([[graft.operators.Learn]]
    * `cumRank`, `epoch_shuffle_audit`): `bucket` must be a MONOTONE
    * non-decreasing integer function of the order key (equal keys →
    * equal bucket), so (bucket, order) ≡ order. Per-bucket counts fold
    * to a ≤`buckets`-row table whose exclusive prefix (a parameter-
    * bounded single-partition window) broadcasts back as per-bucket
    * row-number offsets; the fact-scale window is PARTITIONED by
    * bucket. `file_id` then applies the standard-SQL ntile cut from the
    * exact global row number rn and total N: the first N mod n tiles
    * get ceil(N/n) rows, the rest floor(N/n) — bit-identical to any
    * engine's `ntile` (the DuckDB oracle keeps the plain window form).
    * Never an `Exchange SinglePartition → Sort → Window` over the fact
    * table (the round-14 verdict's last registry-wide instance).
    */
  private[graft] def ntileDistributed(df: DataFrame, bucket: Column,
      n: Int, order: Column*): DataFrame = {
    // the six working columns are injected by name; an input already
    // carrying one would be silently clobbered (withColumn replaces)
    // or turn ambiguous downstream — fail diagnosably instead
    val clash = df.columns.toSet.intersect(
      Set("lb", "lb_off", "lb_n", "lb_rn", "lb_base", "lb_rem"))
    require(clash.isEmpty,
      s"ntileDistributed: input schema carries reserved working " +
        s"column(s) $clash — rename them before the ntile cut")
    val b = df.withColumn("lb", bucket)
    val wPre = Window.orderBy(col("lb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("lb"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val prefix = b.groupBy(col("lb")).agg(count(lit(1)).as("lb_c"))
      .select(col("lb"),
        coalesce(sum(col("lb_c")).over(wPre), lit(0L)).as("lb_off"),
        sum(col("lb_c")).over(wAll).as("lb_n"))
    val wIn = Window.partitionBy(col("lb")).orderBy(order: _*)
    b.join(broadcast(prefix), Seq("lb"))
      .withColumn("lb_rn", col("lb_off") + row_number().over(wIn))
      .withColumn("lb_base", expr(s"lb_n div $n"))
      .withColumn("lb_rem", col("lb_n") % n)
      .withColumn("file_id",
        when(col("lb_rn") <= (col("lb_base") + 1) * col("lb_rem"),
          expr("(lb_rn - 1) div (lb_base + 1)") + 1)
        .otherwise(col("lb_rem") +
          // greatest(,1) is inert: this branch is only selected when
          // lb_base >= 1 (CaseWhen is lazy, the guard just keeps the
          // ANSI div total)
          expr("(lb_rn - lb_rem * (lb_base + 1) - 1) div greatest(lb_base, 1L)")
          + 1))
      .drop("lb", "lb_off", "lb_n", "lb_rn", "lb_base", "lb_rem")
  }

  /** Runs the skipping audit over the events table. Returns one row per
    * layout: (layout, n_files, n_probes, files_hit, rows_scanned,
    * rows_total) — files_hit/rows_scanned summed over the probe set.
    */
  def skippingAudit(events: DataFrame, nFiles: Int = 64, nProbes: Int = 16,
      zBits: Int = 8): DataFrame = {
    val nb = 1L << zBits // buckets per dimension
    val base = events.select(
      col("event_id"), col("ts"), col("user_id"),
      floor(col("value") * 100).cast("long").as("vcents"))
    val bounds = base.agg(
      min(col("user_id")).as("umin"), max(col("user_id")).as("umax"),
      min(col("vcents")).as("vmin"), max(col("vcents")).as("vmax"),
      min(unix_micros(col("ts"))).as("tmin"),
      max(unix_micros(col("ts"))).as("tmax"))
    // 1-row build side; every row needs the global bounds
    val withB = base.crossJoin(broadcast(bounds))
      .withColumn("uspan", col("umax") - col("umin") + 1)
      .withColumn("vspan", col("vmax") - col("vmin") + 1)
      .withColumn("ub",
        floor((col("user_id") - col("umin")) * nb / col("uspan")))
      .withColumn("vb",
        floor((col("vcents") - col("vmin")) * nb / col("vspan")))
      .withColumn("z", zValue(col("ub"), col("vb"), zBits))
      // per-layout prefix buckets, each monotone in its layout's sort
      // key (exact long `div` arithmetic — no double rounding):
      //   time:   256 equal-width epoch-micro slices of [tmin, tmax]
      //   user:   ub itself (monotone floor of user_id, 256 buckets)
      //   zorder: the z value's high zBits bits (z div 2^zBits)
      .withColumn("tbucket", expr(
        s"((unix_micros(ts) - tmin) * $nb) div (tmax - tmin + 1)"))
      .withColumn("zbucket", shiftright(col("z"), zBits))
      // referenced once per layout leg (time/user/zorder): pin so the
      // scan + bounds cross + bit-interleave runs once, not three times
      .localCheckpoint(false)
    def files(layout: String, bucket: Column, order: Column*) =
      ntileDistributed(withB, bucket, nFiles, order: _*)
        .groupBy(lit(layout).as("layout"), col("file_id"))
        .agg(min(col("user_id")).as("f_umin"), max(col("user_id")).as("f_umax"),
          min(col("vcents")).as("f_vmin"), max(col("vcents")).as("f_vmax"),
          count(lit(1)).as("f_rows"))
    val stats = files("time", col("tbucket"), col("ts"), col("event_id"))
      .unionByName(files("user", col("ub"), col("user_id"), col("event_id")))
      .unionByName(files("zorder", col("zbucket"), col("z"), col("event_id")))
    // probe workload: half-step-offset rectangles, each spanning
    // 1/nProbes of a dimension (integer grid arithmetic so the oracle
    // is exact); half-offset keeps them from snapping to file
    // boundaries and flattering any layout. The workload is MIXED —
    // even probes constrain both dims, odd probes constrain only the
    // value dim — because that heterogeneity is what motivates Z-order:
    // a single-dim sort answers only its own dim's probes, the
    // interleaved layout prunes both kinds.
    val probes = events.sparkSession.range(nProbes.toLong)
      .select(col("id").as("p")).crossJoin(broadcast(bounds))
      .withColumn("uspan", col("umax") - col("umin") + 1)
      .withColumn("vspan", col("vmax") - col("vmin") + 1)
      .select(col("p"),
        when(col("p") % 2 === 0,
          col("umin") + floor(col("uspan") * (lit(2) * col("p") + 1) / (2 * nProbes)))
          .otherwise(col("umin")).as("p_ulo"),
        when(col("p") % 2 === 0,
          col("umin") + floor(col("uspan") * (lit(2) * col("p") + 3) / (2 * nProbes)) - 1)
          .otherwise(col("umax")).as("p_uhi"),
        (col("vmin") + floor(col("vspan") * (lit(2) * col("p") + 1) / (2 * nProbes)))
          .as("p_vlo"),
        (col("vmin") + floor(col("vspan") * (lit(2) * col("p") + 3) / (2 * nProbes)) - 1)
          .as("p_vhi"))
    // per-layout totals stay in-plan (no driver-side count action).
    // rows_total is layout-INDEPENDENT — every layout partitions all of
    // withB's rows into files, so Σ f_rows per layout == count(withB)
    // exactly; deriving it from the pinned withB keeps `stats` (three
    // fact-scale ntile legs) referenced exactly once instead of twice
    val totals = withB.agg(count(lit(1)).as("rows_total"))
    stats.join(broadcast(probes),
        col("f_umin") <= col("p_uhi") && col("f_umax") >= col("p_ulo") &&
          col("f_vmin") <= col("p_vhi") && col("f_vmax") >= col("p_vlo"))
      .groupBy(col("layout"))
      .agg(count(lit(1)).as("files_hit"), sum(col("f_rows")).as("rows_scanned"))
      .crossJoin(broadcast(totals))
      .select(col("layout"), lit(nFiles).as("n_files"),
        lit(nProbes).as("n_probes"), col("files_hit"),
        col("rows_scanned"), col("rows_total"))
      .orderBy(col("layout"))
  }

  /** Footer-statistics aggregate pushdown: COUNT/MIN/MAX answered from
    * parquet metadata without decoding a single data page — at 100 TB
    * the difference between a sub-second catalog probe ("how many rows
    * landed yesterday, what key range") and a full-table scan. Needs
    * the DSv2 parquet reader (`useV1SourceList` minus parquet) plus
    * `parquet.aggregatePushdown`; both are set on an ISOLATED
    * `newSession` (shared SparkContext, private conf) so the rest of
    * the engine keeps its planner behavior byte-identical. The
    * pushdown is exact — footer stats are written from the data — and
    * PlanSpec pins `PushedAggregation` in the scan so a silent
    * fallback to a real scan is a test failure, not a perf mystery.
    */
  def scanPushdownStats(spark: org.apache.spark.sql.SparkSession,
                        dir: String): DataFrame = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    s2.conf.set("spark.sql.sources.useV1SourceList",
      s2.conf.get("spark.sql.sources.useV1SourceList", "")
        .split(",").filterNot(_.trim == "parquet").mkString(","))
    s2.read.parquet(s"$dir/lineitem.parquet")
      .agg(expr("count(*)").as("n_rows"),
        min(col("l_orderkey")).as("min_orderkey"),
        max(col("l_orderkey")).as("max_orderkey"),
        min(col("l_quantity")).as("min_quantity"),
        max(col("l_quantity")).as("max_quantity"))
  }
}
