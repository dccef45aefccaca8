package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Trade sessionization: consecutive activity runs per symbol separated
  * by silence gaps > `gapMinutes`.
  *
  * Two implementations with identical semantics:
  *  - [[assign]]/[[stats]]: batch, pure window functions (gap flag via
  *    lag, session id via running sum) — one shuffle per symbol,
  *    oracle-able in ANSI SQL.
  *  - [[streamingStats]]: incremental via `flatMapGroupsWithState` — the
  *    KeyValueGroupedDataset custom-state API. State per symbol is O(1)
  *    (current session aggregate only); sessions are emitted when the
  *    gap closes them or the event-time timeout fires. This is the shape
  *    session-windowing takes at 100 TB: state bounded by |symbols|, not
  *    by history.
  */
object Sessions {

  /** Batch: adds session_id (0-based per symbol, time order). */
  def assign(trades: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("event_time")
    val gapSec = gapMinutes * 60L
    trades
      .withColumn("__prev_ts", lag(col("event_time"), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_timestamp(col("event_time")) - unix_timestamp(col("__prev_ts"))
            > gapSec, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__prev_ts", "__new_session")
  }

  /** Batch session aggregates. */
  def stats(trades: DataFrame, gapMinutes: Int = 30): DataFrame =
    assign(trades, gapMinutes)
      .groupBy(col("symbol"), col("session_id"))
      .agg(
        min(col("event_time")).as("session_start"),
        max(col("event_time")).as("session_end"),
        count(lit(1)).as("n_trades"),
        sum(col("size").cast(org.apache.spark.sql.types.DecimalType(20, 6)))
          .cast("double").as("volume"))

  /** Batch session aggregates via Spark's NATIVE `session_window`
    * expression (the engine's own merging-session-state path — also the
    * shape Structured Streaming uses for session state at scale),
    * row-identical to [[stats]].
    *
    * Semantics alignment (why the floor-to-seconds): [[assign]] opens a
    * new session when `floor_sec(t) - floor_sec(prev) > gap`, i.e.
    * merges on `floor diff <= gap`. `session_window` merges TOUCHING
    * windows inclusively (`t <= prev + gap`, µs precision — verified by
    * the boundary cases in SessionsSpec). Feeding it floor-second
    * timestamps with the same gap merges exactly when
    * `floor diff <= gap` — the identical partition. Aggregates still use
    * the original µs timestamps; the ordinal session_id is recovered by
    * session order per symbol.
    */
  def statsNative(trades: DataFrame, gapMinutes: Int = 30): DataFrame = {
    trades
      .withColumn("__ts_s", timestamp_seconds(unix_timestamp(col("event_time"))))
      .groupBy(col("symbol"),
        session_window(col("__ts_s"), s"${gapMinutes * 60} seconds").as("sw"))
      .agg(
        min(col("event_time")).as("session_start"),
        max(col("event_time")).as("session_end"),
        count(lit(1)).as("n_trades"),
        sum(col("size").cast(org.apache.spark.sql.types.DecimalType(20, 6)))
          .cast("double").as("volume"))
      .withColumn("session_id",
        (row_number().over(
          Window.partitionBy("symbol").orderBy(col("sw.start"))) - 1)
          .cast("long"))
      .select(col("symbol"), col("session_id"), col("session_start"),
        col("session_end"), col("n_trades"), col("volume"))
  }

  case class SessionState(start: Long, end: Long, n: Long, volume: Double)
  case class SessionOut(symbol: String, session_start: Timestamp,
                        session_end: Timestamp, n_trades: Long, volume: Double)

  /** The same session machine on Spark 4's `transformWithState` API —
    * the successor to flatMapGroupsWithState (typed ValueState handles,
    * explicit event-time TIMERS instead of a single timeout slot, state
    * TTL support). One open-session ValueState per symbol; a timer at
    * `end + gap` closes idle sessions when the watermark passes it, and
    * extending a session re-arms the timer (deleting the stale one).
    * Emissions are identical to [[streamingStats]] (asserted in
    * SessionsSpec).
    */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, (String, Timestamp, Double), SessionOut] {
    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(symbol: String,
                                 rows: Iterator[(String, Timestamp, Double)],
                                 timerValues: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(_._2.getTime)
      var closed = List.empty[SessionOut]
      var cur = if (session.exists()) Some(session.get()) else None
      val hadTimer = cur.map(_.end + gapMs)
      sorted.foreach { case (_, ts, size) =>
        val t = ts.getTime
        cur match {
          case Some(s) if t - s.end <= gapMs =>
            cur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1,
              volume = s.volume + size))
          case Some(s) =>
            closed ::= SessionOut(symbol, new Timestamp(s.start),
              new Timestamp(s.end), s.n, s.volume)
            cur = Some(SessionState(t, t, 1, size))
          case None =>
            cur = Some(SessionState(t, t, 1, size))
        }
      }
      cur.foreach { s =>
        session.update(s)
        hadTimer.filter(_ != s.end + gapMs)
          .foreach(getHandle.deleteTimer)
        getHandle.registerTimer(s.end + gapMs)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(symbol: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] =
      if (session.exists() &&
          session.get().end + gapMs == expiredTimerInfo.getExpiryTimeInMs) {
        val s = session.get()
        session.clear()
        Iterator(SessionOut(symbol, new Timestamp(s.start),
          new Timestamp(s.end), s.n, s.volume))
      } else Iterator.empty // stale timer of an extended session
  }

  /** [[streamingStats]] semantics through `transformWithState`.
    * Requires the RocksDB state store provider (the API stores each
    * state variable in its own column family, which the HDFS-backed
    * store does not support) — set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `...state.RocksDBStateStoreProvider`.
    */
  def streamingStatsTws(spark: SparkSession, trades: DataFrame,
                        gapMinutes: Int = 30): Dataset[SessionOut] = {
    import spark.implicits._
    trades
      .selectExpr("symbol", "event_time", "size")
      .withWatermark("event_time", s"$gapMinutes minutes")
      .as[(String, Timestamp, Double)]
      .groupByKey(_._1)
      .transformWithState(new SessionProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming sessionization over (symbol, event_time µs, size) rows.
    * Emits a session when a trade arrives more than `gapMinutes` after
    * the previous one, or when the event-time timeout (watermark past
    * last activity + gap) closes it.
    */
  def streamingStats(spark: SparkSession, trades: DataFrame,
                     gapMinutes: Int = 30): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    trades
      .selectExpr("symbol", "event_time", "size")
      .withWatermark("event_time", s"$gapMinutes minutes")
      .as[(String, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (symbol: String, rows: Iterator[(String, Timestamp, Double)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(symbol, new Timestamp(s.start),
              new Timestamp(s.end), s.n, s.volume))
          } else {
            val sorted = rows.toSeq.sortBy(_._2.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { case (_, ts, size) =>
              val t = ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1,
                    volume = s.volume + size))
                case Some(s) =>
                  closed ::= SessionOut(symbol, new Timestamp(s.start),
                    new Timestamp(s.end), s.n, s.volume)
                  cur = Some(SessionState(t, t, 1, size))
                case None =>
                  cur = Some(SessionState(t, t, 1, size))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Sequential conversion funnel over the raw event stream: per user,
    * the earliest 'view', the earliest 'click' AFTER that view, the
    * earliest 'signup' after that click, the earliest 'purchase' after
    * that signup — strict event-order semantics (a purchase before the
    * signup does not count), the standard product-analytics funnel.
    * Output: one row per stage with surviving-user count and the median
    * seconds from the previous stage.
    *
    * Scale shape: each stage is a filtered slice of the fact table
    * hash-joined on user_id to the (shrinking) previous stage and
    * re-aggregated — no per-user event list is ever collected (the
    * one-pass collect_list formulation holds a user's whole history in
    * one buffer; this one's state is one row per surviving user).
    * Stage frames are lazily pinned: each is consumed twice (next
    * stage's build side + its own summary row) — the funnel tables a
    * product pipeline would persist between steps.
    */
  def eventFunnel(events: DataFrame,
                  stages: Seq[String] =
                    Seq("view", "click", "signup", "purchase")): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"), col("ts"))
    def firstAfter(prev: DataFrame, typ: String, prevT: String,
                   outT: String): DataFrame =
      e.filter(col("event_type") === typ)
        .join(prev.select(col("user_id"), col(prevT)), Seq("user_id"))
        .filter(col("ts") > col(prevT))
        .groupBy(col("user_id"))
        .agg(max(col(prevT)).as(prevT), min(col("ts")).as(outT))
        // localCheckpoint truncates lineage to executor-local blocks: an
        // executor loss makes the frame unrecoverable and FAILS the job
        // rather than recomputing. Deliberate here (frames are tiny,
        // per-user rows; a cluster pipeline would persist each stage as
        // a table between jobs) — use persist() instead if
        // recompute-on-loss matters more than lineage truncation.
        .localCheckpoint(false)
    def summaryRow(df: DataFrame, idx: Int, name: String,
                   prevT: Option[String], t: String): DataFrame = {
      // raw quotient, NOT rounded: the percentile interpolates exact
      // integer µs (medians land on half-µs values), and rounding an
      // integer-derived quotient can hit the half-micro boundary where
      // engine round()s disagree
      val aggs = count(lit(1)).as("n_users") +: prevT.map(pt =>
        (expr(s"percentile(unix_micros($t) - unix_micros($pt), 0.5)")
          / lit(1e6)).as("median_secs_from_prev")).toSeq
      df.agg(aggs.head, aggs.tail: _*)
        .select(lit(s"${idx + 1}_$name").as("stage"), col("n_users"),
          prevT.map(_ => col("median_secs_from_prev"))
            .getOrElse(lit(null).cast("double")
              .as("median_secs_from_prev")))
    }
    val first = e.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      .localCheckpoint(false)
    val frames = stages.tail.zipWithIndex.scanLeft(first) {
      case (prev, (typ, i)) => firstAfter(prev, typ, s"t$i", s"t${i + 1}")
    }
    frames.zip(stages).zipWithIndex.map { case ((df, name), i) =>
      summaryRow(df, i, name,
        if (i == 0) None else Some(s"t${i - 1}"), s"t$i")
    }.reduce(_ unionByName _).orderBy(col("stage"))
  }

  /** Cohort retention matrix: users grouped by first-activity date,
    * retention at each day offset = distinct users of that cohort
    * active that many days later — the standard product-analytics
    * triangle, exact (no sampling).
    *
    * Scale shape: first-activity is one user-keyed hash agg; the
    * (user, day) activity set is one distinct (map-side partial);
    * the cohort join broadcasts nothing data-scale (it's a user-keyed
    * equi join that reuses the distinct's partitioning); the final agg
    * is (cohort × offset)-cardinality — calendar-bounded, tiny.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val firsts = events
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_date"))
    val activity = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val cohortSizes = firsts.groupBy(col("cohort_date"))
      .agg(count(lit(1)).as("cohort_size"))
    activity.join(firsts, Seq("user_id"))
      .groupBy(col("cohort_date"),
        datediff(col("d"), col("cohort_date")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .join(cohortSizes, Seq("cohort_date"))
      .select(col("cohort_date"), col("day_offset"), col("n_users"),
        col("cohort_size"),
        (round(col("n_users").cast("double")
          / col("cohort_size").cast("double") * lit(1.0e6), 0)
          / lit(1.0e6)).as("retention"))
      .orderBy(col("cohort_date"), col("day_offset"))
  }

  /** Rolling active users — DAU and trailing-7-day WAU per calendar
    * day. Exact form: the distinct (user, day) activity set expands
    * each activity day onto the 7 target days it contributes to
    * (day+0..6), is re-deduped per (user, target), and counted —
    * standard window-expand distinct. Only days that actually occur in
    * the data are reported (the semi-join against the day universe).
    *
    * Scale shape: the expand is a constant ×7 on the (user, day)
    * DISTINCT set — users×days, not raw events — and the count is a
    * two-stage distinct agg per target day. At 100 TB the exact form is
    * the expensive nightly job; the sketch twin (`kmvRolling` in
    * [[Sketches]]) answers the same question from the per-day sketch
    * table with bounded state — that pairing is the point.
    */
  /** First-order event-type transition matrix — the Markov view of user
    * journeys: for each user's time-ordered event stream, count
    * (from → to) adjacent pairs and report each transition's share of
    * its from-type's outgoing edges. One lead() window per user + one
    * count agg; the matrix itself is |types|² rows. Ties on ts are
    * ordered by event_id so the sequence is total.
    *
    * Scale shape: the window partitions by user_id (naturally parallel,
    * no global sort), and the agg output is type-vocabulary-sized —
    * the classic map-heavy/tiny-result funnel-analytics shape.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val outTotals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_out"))
    pairs.join(outTotals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        (round(col("n").cast("double") / col("n_out").cast("double")
          * lit(1.0e6), 0) / lit(1.0e6))
          .as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Last-touch conversion attribution: each conversion event credits
    * the most recent preceding touch event by the same user inside the
    * lookback window, or "direct" when none exists — the channel-credit
    * primitive behind every marketing-mix report, and the inverse lens
    * of [[eventFunnel]] (which walks forward from exposure; this walks
    * backward from conversion). Emits per credited type: conversions,
    * share, and the mean touch→conversion latency.
    *
    * One window pass carries the latest touch forward per user
    * (`last(..., ignoreNulls)` over rows-preceding — O(1) running state
    * per partition, no self-join of conversions against touches);
    * everything after is a type-cardinality aggregation. Ties on ts are
    * ordered by event_id so "latest" is total. Latencies are exact µs
    * diffs, 6-decimal-rounded minutes summed as DECIMAL.
    */
  def lastTouchAttribution(events: DataFrame,
      touchTypes: Seq[String] = Seq("click", "view"),
      convType: String = "purchase", lookbackHours: Int = 72): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val touch = when(col("event_type").isin(touchTypes: _*),
      struct(col("ts").as("t_ts"), col("event_type").as("t_type")))
    val conv = events
      .withColumn("lt", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === convType)
      .withColumn("in_window", col("lt").isNotNull &&
        col("lt.t_ts") >= col("ts") - expr(s"INTERVAL $lookbackHours HOURS"))
      .select(
        when(col("in_window"), col("lt.t_type")).otherwise(lit("direct"))
          .as("credited_type"),
        when(col("in_window"),
          (round((unix_micros(col("ts")) - unix_micros(col("lt.t_ts")))
            .cast("double") / 6e7 * lit(1.0e6), 0) / lit(1.0e6))
            .cast(DecimalType(18, 6))).as("mins"))
    val byType = conv.groupBy(col("credited_type"))
      .agg(count(lit(1)).as("n_conversions"), sum(col("mins")).as("mins_sum"),
        count(col("mins")).as("n_attributed"))
    byType
      .withColumn("share", round(col("n_conversions").cast("double") /
        sum(col("n_conversions")).over(
          org.apache.spark.sql.expressions.Window.partitionBy())
        * lit(1.0e6), 0) / lit(1.0e6))
      .select(col("credited_type"), col("n_conversions"), col("share"),
        when(col("n_attributed") > 0,
          round(col("mins_sum").cast("double") /
            col("n_attributed").cast("double") * lit(1.0e6), 0)
            / lit(1.0e6)).as("avg_mins"))
      .orderBy(col("credited_type"))
  }

  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val ud = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val days = ud.select(col("d").as("day")).distinct()
    val dau = ud.groupBy(col("d").as("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val wau = ud
      .withColumn("k", explode(sequence(lit(0), lit(windowDays - 1))))
      .select(col("user_id"), date_add(col("d"), col("k")).as("day"))
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"))
      .orderBy(col("day"))
  }

  /** Top event-type PATHS (length-3 windows of consecutive events
    * inside one user session): the path-mining view of the event
    * stream — [[eventTransitions]] is its first-order marginal, this
    * keeps enough order to see *routes* (view>click>purchase vs
    * click>view>purchase are different products decisions). Sessions
    * are gap-based per user (same rule as [[assign]], `gapMinutes`);
    * windows never cross a session boundary. Emits the top `k` paths
    * with occurrence and distinct-session counts.
    *
    * Scale shape: ONE user-partitioned window chain computes the
    * session ids (running sum over the gap flag) and both leads —
    * Catalyst collapses them into a single Exchange+Sort+Window — and
    * the lead-based trigram build is O(events), never an explode of
    * per-session collect_lists (a whale session would blow an array
    * agg; leads carry O(1) state). The path roll-up is one
    * path-cardinality hash agg + TakeOrderedAndProject.
    */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30,
                   k: Int = 50): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    val sessioned = events
      .withColumn("__prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("__prev_ts"))
            > gapSec, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("s2", lead(col("session_id"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .withColumn("s3", lead(col("session_id"), 2).over(w))
    sessioned
      .where(col("s2") === col("session_id") &&
        col("s3") === col("session_id"))
      .groupBy(concat_ws(">", col("event_type"), col("t2"), col("t3"))
        .as("path"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id"), col("session_id")).as("n_sessions"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Markov removal-effect attribution [Anderl et al. 2014] — the
    * model-based answer to the question [[lastTouchAttribution]]
    * answers heuristically: how much conversion does each channel
    * actually CARRY? Journeys (start → touch types → conv/null,
    * truncated at the first conversion) define a first-order absorbing
    * chain; a channel's credit is its removal effect — how much the
    * start→conv absorption probability drops when every transition
    * into that channel redirects to null. Last-touch provably
    * over-credits closers; removal effect counts every path a channel
    * participates in.
    *
    * All removal chains run TOGETHER: the transition table replicates
    * per removed-channel key (|channels|+1 copies of a
    * types²-sized table), and `iterations` fixed value-iteration
    * steps propagate absorption mass — each step one (rm, state)
    * equi-join + one hash agg, the [[graft.operators.Similarity]]
    * PageRank schedule with the same determinism discipline:
    * per-step products in doubles rounded to 12 and SUMMED AS EXACT
    * DECIMALS, so iterations are bit-stable cross-engine and the
    * oracle unrolls the same k stages. Shares divide exact
    * micro-scaled integers, so no double summation order exists
    * anywhere.
    *
    * Scale: journeys are one user-keyed window pass over the events;
    * everything after is (types²)-sized.
    */
  def attributionMarkov(events: DataFrame, convType: String = "purchase",
                        iterations: Int = 12): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val spark = events.sparkSession
    import spark.implicits._
    val dec = DecimalType(28, 12)
    val u = events.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === convType, col("ts")))
        .as("conv_ts"))
    val touches = events.join(u, Seq("user_id"))
      .filter(col("event_type") =!= convType &&
        (col("conv_ts").isNull || col("ts") < col("conv_ts")))
      .select(col("user_id"), lit(1).as("phase"),
        unix_micros(col("ts")).as("uu"), col("event_id").as("eid"),
        col("event_type").as("state"))
    val startRows = u.select(col("user_id"), lit(0).as("phase"),
      lit(0L).as("uu"), lit(0L).as("eid"), lit("start").as("state"))
    val termRows = u.select(col("user_id"), lit(2).as("phase"),
      lit(0L).as("uu"), lit(0L).as("eid"),
      when(col("conv_ts").isNotNull, lit("conv")).otherwise(lit("null"))
        .as("state"))
    val wSeq = Window.partitionBy(col("user_id"))
      .orderBy(col("phase"), col("uu"), col("eid"))
    val trans = touches.unionByName(startRows).unionByName(termRows)
      .withColumn("to", lead(col("state"), 1).over(wSeq))
      .filter(col("to").isNotNull)
      .groupBy(col("state").as("from"), col("to"))
      .agg(count(lit(1)).as("n"))
    val outN = trans.groupBy(col("from")).agg(sum(col("n")).as("o"))
    val t = trans.join(outN, Seq("from"))
      .select(col("from"), col("to"),
        (round(col("n").cast("double") / col("o").cast("double")
          * lit(1.0e12), 0) / lit(1.0e12))
          .cast(DecimalType(16, 12)).as("p"))
    val rms = touches.select(col("state").as("rm")).distinct()
      .unionByName(Seq("__none__").toDF("rm"))
    val trm = t.crossJoin(broadcast(rms))
      .filter(col("from") =!= col("rm"))
      .select(col("rm"), col("from"),
        when(col("to") === col("rm"), lit("null")).otherwise(col("to"))
          .as("to"), col("p"))
      .localCheckpoint(false)
    val absorbing = rms
      .withColumn("sv", explode(array(
        struct(lit("conv").as("state"), lit(1.0).as("x")),
        struct(lit("null").as("state"), lit(0.0).as("x")))))
      .select(col("rm"), col("sv.state").as("state"),
        col("sv.x").cast(dec).as("v"))
    var v = absorbing.localCheckpoint(false)
    for (_ <- 1 to iterations) {
      val nv = trm
        .join(v.select(col("rm"), col("state").as("to"), col("v")),
          Seq("rm", "to"))
        .groupBy(col("rm"), col("from").as("state"))
        .agg(sum((round(col("p").cast("double") * col("v").cast("double")
          * lit(1.0e12), 0) / lit(1.0e12)).cast(dec)).as("v"))
      v = absorbing.unionByName(nv).localCheckpoint(false)
    }
    val starts = v.filter(col("state") === "start")
      .select(col("rm"), col("v"))
    val p0 = starts.filter(col("rm") === "__none__")
      .select(col("v").as("pv"))
    val eff = starts.filter(col("rm") =!= "__none__")
      .crossJoin(broadcast(p0))
      .select(col("rm").as("channel"),
        (round(col("pv").cast("double") * lit(1.0e6), 0)
          / lit(1.0e6)).as("p_conv_base"),
        (round(col("v").cast("double") * lit(1.0e6), 0)
          / lit(1.0e6)).as("p_conv_removed"),
        when(col("pv").cast("double") > 0,
          (round((col("pv").cast("double") - col("v").cast("double")) /
            col("pv").cast("double") * lit(1.0e6), 0) / lit(1.0e6)))
          .as("removal_effect"))
      .withColumn("re_micro",
        when(col("removal_effect") > 0,
          round(col("removal_effect") * lit(1e6), 0).cast("long"))
          .otherwise(lit(0L)))
    val tot = eff.agg(sum(col("re_micro")).as("te"))
    eff.crossJoin(broadcast(tot))
      .select(col("channel"), col("p_conv_base"), col("p_conv_removed"),
        col("removal_effect"),
        when(col("te") > 0 && col("re_micro") > 0,
          (round(col("re_micro").cast("double") / col("te").cast("double")
            * lit(1.0e6), 0) / lit(1.0e6))).as("share"))
      .orderBy(col("channel"))
  }

  /** Inter-arrival burstiness per event type: Goh–Barabási
    * B = (σ−μ)/(σ+μ) over successive gaps, with the coefficient of
    * variation beside it — the stream-characterization audit that
    * separates Poisson-like arrivals (B ≈ 0) from bursty ones (B → 1)
    * and pacemaker-regular ones (B → −1). Capacity planning, anomaly
    * thresholds and backpressure tuning all key off this, and none of
    * the drift monitors measures it (they compare distributions of
    * VALUES; this is the time structure of the arrival process).
    *
    * Determinism: gaps are exact µs integers; Σg is a long and Σg² an
    * exact DECIMAL(18,0)² sum; μ and σ come from those exact sums in
    * the pinned double shape ([[graft.operators.Analytics]]'s CUSUM
    * convention), rounded to 6; CV and B divide the ROUNDED values so
    * both engines branch on identical operands. A non-negative
    * variance guard nulls instead of NaN-sqrt.
    *
    * Scale shape: one type-keyed lag window + one hash agg; output is
    * |event types| rows.
    */
  def burstiness(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("u"), col("event_id"))
    val gaps = events
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("u"))
      .withColumn("prev_u", lag(col("u"), 1).over(w))
      .filter(col("prev_u").isNotNull)
      .select(col("event_type"), (col("u") - col("prev_u")).as("g"))
    val dec0 = DecimalType(18, 0)
    val st = gaps.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_gaps"),
      sum(col("g")).as("s"),
      sum(col("g").cast(dec0) * col("g").cast(dec0)).as("s2"))
    val mean = col("s").cast("double") / col("n_gaps").cast("double")
    val varE = col("s2").cast("double") / col("n_gaps").cast("double") -
      (col("s").cast("double") / col("n_gaps").cast("double")) *
      (col("s").cast("double") / col("n_gaps").cast("double"))
    st.select(col("event_type"), col("n_gaps"),
        (round(mean * lit(1.0e6), 0) / lit(1.0e6)).as("mean_gap_us"),
        when(varE >= 0, round(sqrt(varE) * lit(1.0e6), 0) / lit(1.0e6))
          .as("sigma_gap_us"))
      .withColumn("cv",
        when(col("sigma_gap_us").isNotNull && col("mean_gap_us") > 0,
          round(col("sigma_gap_us") / col("mean_gap_us")
            * lit(1.0e6), 0) / lit(1.0e6)))
      .withColumn("burstiness",
        when(col("sigma_gap_us").isNotNull &&
            col("sigma_gap_us") + col("mean_gap_us") > 0,
          round((col("sigma_gap_us") - col("mean_gap_us")) /
            (col("sigma_gap_us") + col("mean_gap_us"))
            * lit(1.0e6), 0) / lit(1.0e6)))
      .orderBy(col("event_type"))
  }

  /** Survival analysis of time-to-conversion: the Nelson–Aalen
    * cumulative-hazard estimator over hours from a user's FIRST event
    * to their first `targetType` event, right-censored at
    * `windowHours` (or at corpus end for late joiners) — the
    * time-to-event family none of the funnel/retention operators
    * answer: [[funnel]] says HOW MANY convert, this says WHEN, with
    * non-converters contributing exactly their observed exposure
    * instead of being dropped (the bias a naive avg-time-to-convert
    * has).
    *
    * H(t) = Σ_{s ≤ t} d_s / n_s over event times s, where d_s =
    * conversions at hour s and n_s = users still at risk (not yet
    * converted, not yet censored). Hazards are EXACT integer
    * micro-units: d·10¹² DIV n (both engines' integral division
    * truncates identically on positives), cumulated as plain long
    * sums — no doubles anywhere, so no libm or rounding trap can
    * split the engines. (d ≤ 9·10⁶ keeps d·10¹² in a signed long;
    * widen to DECIMAL(26,0) for corpora beyond that.)
    *
    * Scale shape: ONE events scan folded to a per-user row (min ts,
    * max ts, min conversion ts in the same hash agg), a 1-row
    * corpus-end broadcast, then everything is tenure-vocabulary-sized
    * (≤ windowHours rows): the risk set is a reverse cumulative sum,
    * never a per-user rescan.
    */
  def conversionSurvival(events: DataFrame,
                         targetType: String = "purchase",
                         windowHours: Long = 336L): DataFrame = {
    val per = events.groupBy(col("user_id")).agg(
      min(unix_micros(col("ts"))).as("first_us"),
      max(unix_micros(col("ts"))).as("last_us"),
      min(when(col("event_type") === targetType,
        unix_micros(col("ts")))).as("conv_us"))
    val m = per.agg(max(col("last_us")).as("corpus_us"))
    val timed = per.crossJoin(broadcast(m))
      .withColumn("t_conv", expr("(conv_us - first_us) div 3600000000"))
      .withColumn("obs_h",
        least(expr("(corpus_us - first_us) div 3600000000"),
          lit(windowHours)))
      .withColumn("event",
        col("t_conv").isNotNull && col("t_conv") <= lit(windowHours))
      .withColumn("t_h",
        when(col("event"), col("t_conv")).otherwise(col("obs_h")))
    val byT = timed.groupBy(col("t_h").as("t_hours"))
      .agg(count(lit(1)).as("ended"),
        sum(when(col("event"), 1L).otherwise(0L)).as("d_conv"))
    val wRisk = Window.orderBy(col("t_hours"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("t_hours"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk", sum(col("ended")).over(wRisk))
      .withColumn("hazard_micro",
        expr("(d_conv * 1000000000000) div n_risk"))
      .withColumn("cum_hazard_micro", sum(col("hazard_micro")).over(wCum))
      .withColumn("c_censored", col("ended") - col("d_conv"))
      .filter(col("d_conv") > 0)
      .select(col("t_hours"), col("n_risk"), col("d_conv"),
        col("c_censored"), col("hazard_micro"), col("cum_hazard_micro"))
      .orderBy(col("t_hours"))
  }

  /** Cohort lifetime-value curves: users grouped by the week of their
    * FIRST event, then cumulative revenue per cohort over calendar
    * weeks since — the "is newer acquisition worth less?" diagnostic
    * that [[cohortRetention]]'s count-based view can't answer (a
    * cohort can retain users and still monetize worse). LTV per user
    * divides by the FULL cohort size, not the week's actives —
    * inactive users stay in the denominator (the defensible
    * definition; actives-only inflates late weeks).
    *
    * Determinism: values enter as exact micro-unit integers
    * (round(v·1e6, 0)) and every sum — including the running
    * cumulative — stays integer; the per-user LTV is a truncating
    * integer division and all three money outputs are micro doubles
    * (u/1e6). Week offsets are integer day arithmetic on
    * Monday-truncated dates, identical across engines.
    *
    * Scale shape: one user-keyed first-event agg (map-side
    * combinable), one join back, one (cohort, offset) agg, a
    * cohort-keyed running window over O(weeks) rows, cohort sizes as
    * a broadcast.
    */
  def cohortLtv(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val first = events.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        date_trunc("week", col("first_ts")).cast("date").as("cohort_week"))
    val sizes = first.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    val weekly = events.join(first, Seq("user_id"))
      .select(col("cohort_week"),
        expr("CAST(datediff(CAST(date_trunc('week', ts) AS DATE), " +
          "cohort_week) AS BIGINT) div 7").as("week_offset"),
        col("user_id"),
        // micro-unit money pin (the revenueByTier convention): exact
        // integer sums, doubles only at the output boundary
        round(col("value") * lit(1000000.0), 0).cast("long").as("v6"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"),
        sum(col("v6").cast(DecimalType(38, 0))).as("rev6"))
    val run = Window.partitionBy(col("cohort_week"))
      .orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly
      .withColumn("cum6", sum(col("rev6")).over(run))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        (col("rev6").cast("double") / lit(1000000.0)).as("revenue"),
        (col("cum6").cast("double") / lit(1000000.0)).as("cum_revenue"),
        col("cohort_size"),
        (expr("cum6 div cohort_size").cast("double") /
          lit(1000000.0)).as("ltv_per_user"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Hill tail-index estimator per event type [Hill 1975]: over the
    * top k order statistics of positive `value`s,
    * hill_sum = Σ_{i≤k} ln(x_(i)/x_(k+1)) and α = k / hill_sum — the
    * heavy-tail diagnostic behind every "can I trust the mean?"
    * question (α ≤ 2: infinite variance, sample means never settle;
    * α ≤ 1: infinite MEAN — alerting/SLO arithmetic on such a value
    * column is meaningless and needs quantiles instead).
    *
    * Determinism: each ln is pinned at the 9-grid, the k-term sum is
    * exact decimal, and k = 100 so the mean is a pure decimal scale
    * shift — α's single double division rounds once at the boundary.
    * Ties straddling the k-boundary are harmless: order statistics
    * are multiset values, identical whichever tied ROW wins.
    *
    * Scale shape: one type-keyed rank window that Spark rewrites to
    * WindowGroupLimit (each map task keeps its local top k+1 before
    * the shuffle), a |types|-row threshold broadcast, one hash agg.
    * Types with fewer than k+1 positive values drop out (the
    * estimator is undefined there).
    */
  def hillTailIndex(events: DataFrame, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(k % 100 == 0, "k must be a multiple of 100: the Hill mean " +
      "must stay a pure decimal scale shift (oracle determinism)")
    val byVal = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc)
    val v = events.filter(col("value") > 0)
      .select(col("event_type"), col("value"))
      .withColumn("rn", row_number().over(byVal))
    val n = v.groupBy(col("event_type")).agg(count(lit(1)).as("n_pos"))
    val thresh = v.filter(col("rn") === k + 1)
      .select(col("event_type"), col("value").as("x_k"))
    v.filter(col("rn") <= k)
      .join(broadcast(thresh), Seq("event_type"))
      .groupBy(col("event_type"))
      // per-term ln pinned at 1e-9 units (round(v·1e9, 0), never
      // round(v, 9)+decimal-cast); the k-term sum is an exact long
      .agg(sum(round(log(col("value") / col("x_k")) *
          lit(1000000000.0), 0).cast("long")).as("s9"))
      .join(broadcast(n), Seq("event_type"))
      .join(broadcast(thresh), Seq("event_type"))
      .select(col("event_type"), col("n_pos"), col("x_k"),
        (col("s9").cast("double") / lit(1000000000.0)).as("hill_sum"),
        when(col("s9") > 0,
          expr(s"${k.toLong * 1000000000000000L}L div s9")
            .cast("double") / lit(1000000.0)).as("tail_alpha"))
      .orderBy(col("event_type"))
  }


  /** Behavioral-predictability audit: Shannon entropy of each user's
    * event-type mix (H = −Σ p·ln p, nats), rolled into a corpus
    * histogram of quarter-nat bins — the "are users specialists or
    * generalists?" profile that complements [[eventTransitions]]'
    * pairwise view (a user with H ≈ 0 does one thing; H ≈ ln k uses
    * all k types evenly).
    *
    * Numerics: ln(c/n) is pinned once per (user, type) at 1e-6 units
    * (exact-integer quotient under one IEEE division), a user's
    * entropy is the exact integer −(Σ c·lnp6) div n, and the
    * histogram statistics are truncating integer divisions. The three
    * entropy outputs are DOUBLE = micro-units/1e6 (exact long → one
    * IEEE division, identical in both engines) — not DECIMAL: decimal
    * output columns hash differently across oracle environments even
    * when value-equal (the round-8 driver-red cohort), so the output
    * envelope is ints/doubles/strings only.
    *
    * Scale shape: one (user, type) count agg, a user-keyed window on
    * that (types-per-user)-bounded table, one ≤|bins| aggregation.
    */
  def userEntropy(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def micro(c: org.apache.spark.sql.Column) =
      c.cast("double") / lit(1000000.0)
    val tc = events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val ue = tc
      .withColumn("n",
        sum(col("c")).over(Window.partitionBy(col("user_id"))))
      .select(col("user_id"), col("n"),
        (col("c") * round(log(col("c").cast("double") /
            col("n").cast("double")) * lit(1e6), 0).cast("long"))
          .as("t6"))
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n"), sum(col("t6")).as("s6"))
      .select(col("user_id"), expr("(-s6) div n").as("h6"))
    ue.groupBy(expr("h6 div 250000").as("bin"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("h6")).as("sh"), min(col("h6")).as("mn"),
        max(col("h6")).as("mx"))
      .select(col("bin"), col("n_users"),
        micro(expr("sh div n_users")).as("mean_entropy"),
        micro(col("mn")).as("min_entropy"),
        micro(col("mx")).as("max_entropy"))
      .orderBy(col("bin"))
  }
}
