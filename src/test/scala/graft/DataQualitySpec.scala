package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality
import graft.operators.DataQuality.{Inclusion, RowCheck, Uniqueness}

/** Declarative data-quality audit: known-dirty fixtures must yield
  * exact violation counts, and the report must be one row per check.
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  // 6 rows: one null id (completeness), ids 1,1 duplicated (uniqueness
  // surplus 1), one negative amount, one dangling FK (9), one null FK
  // (NOT an inclusion violation).
  private def child = Seq(
    (Option(1L), Option(1L), 10.0),
    (Option(1L), Option(2L), 20.0),
    (Option(2L), Option(9L), -5.0),
    (Option(3L), None, 30.0),
    (None, Option(1L), 40.0),
    (Option(4L), Option(2L), 50.0)
  ).toDF("id", "fk", "amount")

  private def parent = Seq(1L, 2L, 3L).toDF("pk")

  private val checks = Seq(
    RowCheck("child_id_complete", "child", col("id").isNotNull),
    RowCheck("child_amount_positive", "child", col("amount") > 0),
    Uniqueness("child_id_unique", "child", Seq("id")),
    Inclusion("child_fk_in_parent", "child", "fk", "parent", "pk"))

  private def report = DataQuality
    .audit(Map("child" -> child, "parent" -> parent), checks)
    .collect().map(r => r.getAs[String]("check_id") ->
      ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"),
        r.getAs[Boolean]("pass")))).toMap

  test("row checks count null-or-false as violations in one scan") {
    assert(report("child_id_complete") == ((6L, 1L, false)))
    assert(report("child_amount_positive") == ((6L, 1L, false)))
  }

  test("uniqueness counts surplus duplicate rows") {
    // ids: 1,1,2,3,null,4 -> 6 rows, 5 distinct (null is its own group)
    assert(report("child_id_unique") == ((6L, 1L, false)))
  }

  test("inclusion counts dangling non-null FKs only") {
    // 5 non-null FKs, one (9) dangling; the null FK is excluded
    assert(report("child_fk_in_parent") == ((5L, 1L, false)))
  }

  test("a clean table passes every check") {
    val clean = Seq((1L, 1L, 1.0), (2L, 2L, 2.0)).toDF("id", "fk", "amount")
    val rep = DataQuality.audit(Map("child" -> clean, "parent" -> parent), checks)
      .collect()
    assert(rep.length == checks.length)
    assert(rep.forall(_.getAs[Boolean]("pass")))
  }

  test("corpus card: sections complete and internally consistent") {
    val card = SparkEntry.queries("corpus_card")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[String]("section"), r.getAs[String]("metric")) ->
        r.getAs[Double]("value")).toMap
    val nDocs = card(("volume", "n_docs"))
    assert(nDocs > 0)
    // mixes partition the corpus exactly
    assert(card.collect { case (("language_mix", _), v) => v }.sum == nDocs)
    assert(card.collect { case (("source_mix", _), v) => v }.sum == nDocs)
    // length percentiles are ordered; dup count is within range
    assert(card(("length", "p50_chars")) <= card(("length", "p90_chars")))
    val dups = card(("dedup", "exact_dup_docs"))
    assert(dups >= 0 && dups < nDocs)
  }

  test("standard suite runs green on the sf0.001 harness tables") {
    val dir = "/root/testdata/sf0.001"
    val rep = SparkEntry.queries("dq_audit")(spark, dir).collect()
    assert(rep.length == DataQuality.standardChecks.length)
    // report keys are exactly the declared check ids, sorted
    assert(rep.map(_.getAs[String]("check_id")).toSeq ==
      DataQuality.standardChecks.map(_.id).sorted)
    // the harness generator emits clean data EXCEPT lineitem, whose
    // l_linenumber is drawn randomly — (l_orderkey, l_linenumber) is
    // genuinely not a key there, and the audit must say so rather than
    // rubber-stamp. Everything else passes.
    val failing = rep.filterNot(_.getAs[Boolean]("pass"))
      .map(_.getAs[String]("check_id")).toSet
    assert(failing == Set("lineitem_pk_unique"), failing.mkString(", "))
  }

  test("benford: conforming feed passes, single-digit feed fails, digits from cents") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    // 'natural': first-digit counts proportional to log10(1 + 1/d)
    // out of 1000 -> MAD is just the rounding residue, well under 0.015
    val benfordCounts = (1 to 9).map(d =>
      d -> math.round(1000 * math.log10(1.0 + 1.0 / d)).toInt)
    val natural = benfordCounts.flatMap { case (d, c) =>
      (0 until c).map(i => (1L, t0, 1L, "natural", d * 10.0 + i % 10, ""))
    }
    // 'flat': every value starts with digit 4 -> maximal nonconformity
    val flat = (0 until 500).map(i => (2L, t0, 2L, "flat", 400.0 + i % 100, ""))
    // digit extraction edge: 0.05 -> cents 5 -> digit 5 (not 0)
    val tiny = (0 until 100).map(i => (3L, t0, 3L, "tiny", 0.05, ""))
    val df = (natural ++ flat ++ tiny)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rep = DataQuality.benfordAudit(df).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rep("natural").getAs[Boolean]("conforms"))
    assert(rep("natural").getAs[Double]("mad") < 0.002)
    assert(!rep("flat").getAs[Boolean]("conforms"))
    assert(rep("flat").getAs[Double]("chi2") >
      rep("natural").getAs[Double]("chi2"))
    // all 'tiny' mass lands on digit 5: same as a single-digit feed on
    // digit 5 -> MAD = (|1 - p5| + sum of the other eight p_d)/9
    val p = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
    val expectedMad = ((1.0 - p(4)) + p.patch(4, Nil, 1).sum) / 9
    assert(math.abs(rep("tiny").getAs[Double]("mad") - expectedMad) < 1e-5)
  }

  test("seasonalAnomaly: spike and silence both flag; quiet hours stay quiet") {
    import java.sql.Timestamp
    def at(day: Int, hourOfDay: Int, k: Int) = (0 until k).map { i =>
      (1L, Timestamp.valueOf(f"2024-01-$day%02d $hourOfDay%02d:10:00"),
        1L, "a", 1.0, s"$i")
    }
    // hours 5 and 6 both alternate 9/11 across days 1..21 (sd ~ 1);
    // hour 7 is a constant 10 (sd = 0, exercises the guard)
    val baseline = (1 to 21).flatMap(d =>
      at(d, 5, if (d % 2 == 0) 9 else 11) ++
        at(d, 6, if (d % 2 == 0) 9 else 11) ++ at(d, 7, 10))
    // day 22: hour 5 explodes to 100; hour 6 goes SILENT (no rows at
    // all -> the grid must still score it as 0); hour 7 stays 10
    val probe = at(22, 5, 100) ++ at(22, 7, 10)
    val df = (baseline ++ probe)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rep = DataQuality.seasonalAnomaly(df).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[Int]("hour")) -> r).toMap
    val spike = rep(("2024-01-22", 5))
    assert(spike.getAs[Long]("n_events") == 100L &&
      spike.getAs[Boolean]("anomalous"))
    assert(spike.getAs[Double]("z") > 50)
    // silent hour 6 on day 22 exists in the grid as 0 events and its
    // z is a LARGE NEGATIVE anomaly — a feed that stops is a flag,
    // which a groupBy-only monitor (no grid) can never emit
    val silent = rep(("2024-01-22", 6))
    assert(silent.getAs[Long]("n_events") == 0L)
    assert(silent.getAs[Double]("z") < -5 &&
      silent.getAs[Boolean]("anomalous"))
    // constant baseline: sd = 0 -> guard nulls z, no division blowup
    val steady = rep(("2024-01-22", 7))
    assert(steady.isNullAt(steady.fieldIndex("z")) &&
      !steady.getAs[Boolean]("anomalous"))
    // an hour that was always silent: all-zero baseline, sd = 0, quiet
    val never = rep(("2024-01-22", 3))
    assert(never.getAs[Long]("n_events") == 0L &&
      !never.getAs[Boolean]("anomalous"))
  }

  test("ksTest: hand-computed D, A/A does not reject, a shifted " +
      "sample does; bucketed prefix equals the textbook scan") {
    // A = {1,2,3,4}, B = {3,4,5,6}: D = 1/2 at value 2 (F_A=0.5, F_B=0)
    val ab = (Seq(1.0, 2.0, 3.0, 4.0).map(("a", _)) ++
      Seq(3.0, 4.0, 5.0, 6.0).map(("b", _)))
      .toDF("event_type", "value")
    val r = DataQuality.ksTest(ab, "a", "b").collect().head
    assert(r.getAs[Double]("ks_stat") == 0.5)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    // A/A: two salted halves of one distribution — D stays under crit
    val big = (1 to 2000).map(i =>
      (if (i % 2 == 0) "x" else "y", (i % 97).toDouble + i * 1e-4))
      .toDF("event_type", "value")
    val aa = DataQuality.ksTest(big, "x", "y").collect().head
    assert(!aa.getAs[Boolean]("rejected"))
    // location shift: same shape, +50 offset — reject
    val shifted = ((1 to 1000).map(i => ("x", (i % 97).toDouble)) ++
      (1 to 1000).map(i => ("y", (i % 97).toDouble + 50.0)))
      .toDF("event_type", "value")
    assert(DataQuality.ksTest(shifted, "x", "y")
      .collect().head.getAs[Boolean]("rejected"))
    // bucketed parallel-prefix == textbook single-scan D, and the
    // bucket count cannot change the answer (internal detail only)
    val d1 = DataQuality.ksTest(big, "x", "y", nBuckets = 1)
      .collect().head.getAs[Double]("ks_stat")
    val d7 = DataQuality.ksTest(big, "x", "y", nBuckets = 7)
      .collect().head.getAs[Double]("ks_stat")
    assert(d1 == aa.getAs[Double]("ks_stat") &&
      d7 == aa.getAs[Double]("ks_stat"))
  }

  test("cvFolds: grouped assignment, zero leakage, shares sum to 1, " +
      "content-stable under repartitioning") {
    val events = (1L to 200L).flatMap(u =>
      (1 to (u % 3).toInt + 1).map(i => (u * 10 + i, u)))
      .toDF("event_id", "user_id")
    val folds = DataQuality.cvFolds(events, k = 5).collect()
    assert(folds.length == 5)
    assert(folds.forall(_.getAs[Long]("n_leaky_users") == 0L))
    assert(folds.map(_.getAs[Long]("n_events")).sum == events.count())
    assert(folds.map(_.getAs[Long]("n_users")).sum == 200L)
    assert(math.abs(folds.map(_.getAs[Double]("event_share")).sum - 1.0)
      < 1e-12)
    // content-stable: the fold of a given user is a pure hash, so a
    // different physical partitioning cannot move it
    val re = DataQuality.cvFolds(events.repartition(7), k = 5).collect()
    assert(folds.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      re.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq)
    // the audit really reads the data: a user duplicated into a second
    // fold via a poisoned fold column is invisible here (fold is
    // derived), so instead check the leak counter's mechanics on a
    // 1-fold degenerate k: every user in fold 0, still zero leaks
    val one = DataQuality.cvFolds(events, k = 1).collect()
    assert(one.length == 1 && one.head.getAs[Long]("n_leaky_users") == 0L)
  }

  test("targetEncodeOof: the spike user's own fold never sees its " +
      "value; constant targets encode to the constant in every fold") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = ((1L to 10L).map(u => (u, "x", 1.0)) :+
      (99L, "x", 101.0))
      .map { case (u, ty, v) => (u, ty, v, t0) }
      .toDF("user_id", "event_type", "value", "ts")
    val r = DataQuality.targetEncodeOof(events).collect()
    assert(r.map(_.getAs[Long]("n_in_fold")).sum == 11L)
    r.foreach { row =>
      assert(row.getAs[Long]("n_oof") ==
        11L - row.getAs[Long]("n_in_fold"))
    }
    // the fold containing user 99 excludes the spike -> exactly 1.0;
    // every other fold's OOF mean contains it -> strictly above 1.0
    val means = r.map(_.getAs[Double]("oof_mean"))
    assert(means.count(_ == 1.0) == 1)
    assert(means.filter(_ != 1.0).forall(_ > 1.0))
  }

  test("btStrengths: MM strengths order by win rate, normalize, and " +
      "recover the pairwise odds on a clean 2-item design") {
    import graft.operators.Learn
    // one user, alternating A/B events where A's value is higher in
    // 3 of every 4 consecutive comparisons -> A beats B 3:1
    var eid = 0L
    val rows = (0 until 160).map { i =>
      eid += 1
      val t = if (i % 2 == 0) "A" else "B"
      // comparison k = (events 2k, 2k+1): A wins unless k % 4 == 3
      val aWins = (i / 2) % 4 != 3
      val v = (t, aWins) match {
        case ("A", true) => 10.0; case ("A", false) => 1.0
        case ("B", true) => 5.0;  case ("B", false) => 7.0
      }
      (eid, 1L, t, v,
        java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
    val r = Learn.btStrengths(rows).collect()
    assert(r.length == 2)
    val byT = r.map(x => x.getString(0) -> x).toMap
    val (wA, wB) = (byT("A").getDouble(3), byT("B").getDouble(3))
    // strengths are sum-normalized and ordered by the win record
    assert(math.abs(wA + wB - 1.0) < 1e-6)
    assert(wA > wB)
    // 2-item BT has a closed form: w_A/(w_A+w_B) = A's win rate.
    // Consecutive-pair comparisons include (B, next A) pairs too, so
    // derive the realized win rate from the output's own counts
    val winRate = byT("A").getLong(1).toDouble / byT("A").getLong(2)
    assert(math.abs(wA - winRate) < 1e-3, s"wA=$wA rate=$winRate")
    // deterministic rerun
    assert(Learn.btStrengths(rows).collect().toSeq == r.toSeq)

    // incremental fold == full rebuild, and the carry row is what
    // makes it so: split the stream at event 120, carry the user's
    // last pre-cutoff event into the delta leg
    val hist = rows.filter(col("event_id") <= 120)
    val delta = rows.filter(col("event_id") > 120)
    val carry = hist.orderBy(col("event_id").desc).limit(1)
    // event 120 is i=119 (ts 00:01:59); the delta starts at 00:02:00
    val cutoff = lit("2024-01-01 00:02:00").cast("timestamp")
    val inc = Learn.btIncremental(Learn.btWins(hist),
      carry.unionByName(delta), cutoff).collect()
    assert(inc.toSeq == r.toSeq, "incremental != full rebuild")
    // WITHOUT the carry row the boundary comparison is lost and the
    // counts (column 2) drop — the contract the harness split encodes
    val noCarry =
      Learn.btIncremental(Learn.btWins(hist), delta, cutoff).collect()
    assert(noCarry.map(_.getLong(2)).sum < r.map(_.getLong(2)).sum)
    // a DUPLICATED carry row double-counts a boundary comparison —
    // the contract is a require, not scaladoc: it fails loudly and
    // names the offending user
    val dup = intercept[IllegalArgumentException] {
      Learn.btIncremental(Learn.btWins(hist),
        carry.unionByName(carry).unionByName(delta), cutoff)
    }
    assert(dup.getMessage.contains("carry contract"))
  }

  test("btRetire: provenance subtraction equals full-rebuild-minus-" +
      "retired, flips a ranking, and drops wholly-retired pairs") {
    import graft.operators.Learn
    // 3 items, 3 users. User 1 gives C a big head-to-head record over
    // A and B; users 2-3 give A a modest record over B and C. With
    // user 1 present C ranks first; retiring user 1 removes EVERY
    // (C, A) and (C, B) comparison the C-dominant user produced and A
    // takes the top rank — and the (A,C)/(B,C) pairs from users 2-3
    // keep C alive (it must not vanish, only fall).
    var eid = 0L
    def stream(u: Long, types: Seq[(String, Double)], day: Int) =
      types.zipWithIndex.map { case ((t, v), i) =>
        eid += 1
        (eid, u, t, v,
          java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:${i / 60}%02d:${i % 60}%02d"))
      }
    // user 1: C beats A then C beats B, 10 times each (alternating)
    val u1 = stream(1L, (0 until 10).flatMap(_ =>
      Seq("C" -> 9.0, "A" -> 1.0, "C" -> 9.0, "B" -> 1.0)), 1)
    // users 2-3: A beats B, A beats C, 3 times each
    val u23 = Seq(2L, 3L).flatMap(u => stream(u, (0 until 3).flatMap(_ =>
      Seq("A" -> 8.0, "B" -> 2.0, "A" -> 8.0, "C" -> 2.0)), 2))
    val events = (u1 ++ u23)
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val retired = Seq(Tuple1(1L)).toDF("user_id")

    val ret = Learn.btRetire(Learn.btWins(events),
      Learn.btWinsByUser(events), retired).collect()
    val full = Learn.btStrengths(events).collect()
    val rebuilt =
      Learn.btStrengths(events.filter(col("user_id") =!= 1L)).collect()
    assert(ret.toSeq == rebuilt.toSeq,
      "retire != full rebuild over surviving users")
    def top(rs: Array[org.apache.spark.sql.Row]) =
      rs.maxBy(_.getDouble(3)).getString(0)
    assert(top(full) == "C" && top(ret) == "A",
      s"retiring user 1 must flip the top rank: full=${top(full)} ret=${top(ret)}")

    // wholly-retired-supported pairs DROP: retire users 2 and 3 and
    // item-pair (A,C)'s surviving comparisons all come from user 1 —
    // but retire ALL of A's supporters entirely: a stream where only
    // retired users ever compared item D removes D from the output
    val d4 = stream(4L, Seq("D" -> 5.0, "E" -> 1.0, "D" -> 5.0), 3)
    val ev2 = (u1 ++ u23 ++ d4)
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val ret2 = Learn.btRetire(Learn.btWins(ev2),
      Learn.btWinsByUser(ev2), Seq(Tuple1(4L)).toDF("user_id")).collect()
    assert(!ret2.map(_.getString(0)).contains("D") &&
      !ret2.map(_.getString(0)).contains("E"),
      "items supported only by retired users must vanish")
    assert(ret2.toSeq == full.toSeq,
      "retiring user 4 must restore the 3-item result exactly")
  }

  test("logitFit: separable activity data learns a positive volume " +
      "weight and beats the uninformed log loss, deterministically") {
    import graft.operators.Learn
    def ev(eid: Long, u: Long, t: String, day: Int, hour: Int) =
      (eid, u, t,
        java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00"))
    var eid = 0L
    val events = (
      // 20 heavy users: 20 events over 10 days, all convert
      (1L to 20L).flatMap { u =>
        (0 until 20).map { i =>
          eid += 1; ev(eid, u, "view", 1 + (i % 10), i % 24)
        } :+ { eid += 1; ev(eid, u, "purchase", 11, 0) }
      } ++
      // 20 light users: one event, never convert
      (21L to 40L).map { u => eid += 1; ev(eid, u, "view", 1, 0) })
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Learn.logitFit(events).collect().head
    assert(r.getAs[Long]("n_users") == 40L)
    assert(r.getAs[Double]("w1") > 0) // volume
    assert(r.getAs[Double]("accuracy") >= 0.9)
    assert(r.getAs[Double]("log_loss") < 0.693147) // beats p=0.5
    assert(Learn.logitFit(events).collect().head == r) // rerun-stable
  }

  test("rocAuc + calibrationBins: a separable heavy-buyer corpus " +
      "evaluates to AUC = KS = 1 on the held-out fold, bins " +
      "partition the fold, and both are rerun-stable") {
    import graft.operators.Learn
    def ev(eid: Long, u: Long, t: String, day: Int, hour: Int) =
      (eid, u, t,
        java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00"))
    var eid = 0L
    val events = (
      // 100 heavy users: 30 views over 15 days + 14 purchases (y=1
      // under heavyK=13); 100 light users: 1 view + 2 purchases (y=0)
      (1L to 100L).flatMap { u =>
        (0 until 30).map { i =>
          eid += 1; ev(eid, u, "view", 1 + (i % 15), i % 24)
        } ++ (0 until 14).map { i =>
          eid += 1; ev(eid, u, "purchase", 16, i % 24)
        }
      } ++
      (101L to 200L).flatMap { u =>
        Seq({ eid += 1; ev(eid, u, "view", 1, 0) },
          { eid += 1; ev(eid, u, "purchase", 2, 0) },
          { eid += 1; ev(eid, u, "purchase", 3, 0) })
      })
      .toDF("event_id", "user_id", "event_type", "ts")

    val r = Learn.rocAuc(events).collect().head
    val nTest = r.getAs[Long]("n_test")
    assert(nTest > 0 && nTest < 200) // a real 20% fold
    assert(r.getAs[Long]("n_pos") > 0 && r.getAs[Long]("n_neg") > 0)
    // x1 separates the classes perfectly -> perfect ranking
    assert(r.getAs[Double]("auc") == 1.0)
    assert(r.getAs[Double]("gini") == 1.0)
    assert(r.getAs[Double]("ks") == 1.0)
    assert(Learn.rocAuc(events).collect().head == r) // rerun-stable

    val bins = Learn.calibrationBins(events).collect()
    assert(bins.map(_.getAs[Long]("n")).sum == nTest)
    bins.foreach { b =>
      val mp = b.getAs[Double]("mean_pred")
      val or = b.getAs[Double]("obs_rate")
      assert(mp >= 0.0 && mp <= 1.0 && or >= 0.0 && or <= 1.0)
      assert(b.getAs[Double]("brier_sum") >= 0.0)
      // bin index brackets its own mean predicted score
      val bin = b.getAs[Int]("bin")
      assert(mp >= bin / 10.0 - 1e-6 && mp <= (bin + 1) / 10.0 + 1e-6)
    }
    assert(Learn.calibrationBins(events).collect().toSeq == bins.toSeq)
  }

  test("seasonalDecompose: constant series decomposes to zero " +
      "seasonal/remainder; trend only on complete windows; the " +
      "additive identity holds exactly") {
    import graft.operators.DataQuality
    var eid = 0L
    // type A: constant 3 events/hour for 49h; type B: 2 + (hod % 2)
    val events = (0 until 49).flatMap { h =>
      val ts = java.sql.Timestamp.valueOf(
        f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:30:00")
      (1 to 3).map { _ => eid += 1; (eid, 1L, "A", ts, 0.0, "{}") } ++
        (1 to 2 + (h % 24) % 2).map { _ =>
          eid += 1; (eid, 1L, "B", ts, 0.0, "{}")
        }
    }.toDF("event_id", "user_id", "event_type", "ts", "value", "props")
    val r = DataQuality.seasonalDecompose(events).collect()
    val a = r.filter(_.getString(0) == "A")
    // 49 hours -> complete 25-point windows at offsets 12..36
    assert(a.length == 25)
    a.foreach { row =>
      assert(row.getAs[Double]("trend") == 3.0)
      assert(row.getAs[Double]("seasonal") == 0.0)
      assert(row.getAs[Double]("remainder") == 0.0)
    }
    // additive identity: n = trend + seasonal + remainder, exactly
    r.foreach { row =>
      // micro-doubles (n/1e6): recover integer units, sum exactly
      val sum = math.round(row.getAs[Double]("trend") * 1e6) +
        math.round(row.getAs[Double]("seasonal") * 1e6) +
        math.round(row.getAs[Double]("remainder") * 1e6)
      assert(sum == row.getAs[Long]("n_events") * 1000000L)
    }
    assert(DataQuality.seasonalDecompose(events).collect().toSeq
      == r.toSeq)
  }

  test("upliftBySegment: fully effective treatment shows uplift " +
      "exactly 1 in every segment; rates are exact micro-integers") {
    import graft.operators.DataQuality
    import graft.functions.TextFunctions.hash60
    // recover each user's hash arm with the engine's own function,
    // then make treatment PERFECTLY effective: treated users buy 14
    // times (y=1 under heavyK=13), control users buy once (y=0)
    val arms = spark.range(1, 61)
      .select($"id", pmod(hash60(concat(lit("ab_"), $"id")), lit(2L))
        .as("arm")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var eid = 0L
    def ev(u: Long, t: String, day: Int, h: Int) = {
      eid += 1
      (eid, u, t,
        java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00"),
        1.0, "{}")
    }
    val events = (1L to 60L).flatMap { u =>
      val days = if (u <= 30) 5 else 25 // low vs high segment
      val views = (0 until days).map(d => ev(u, "view", 1 + d, 1))
      val buys =
        if (arms(u) == 1L) (1 to 14).map(i => ev(u, "purchase", 28, i % 24))
        else Seq(ev(u, "purchase", 28, 0))
      views ++ buys
    }.toDF("event_id", "user_id", "event_type", "ts", "value", "props")
    val r = DataQuality.upliftBySegment(events).collect()
    assert(r.map(_.getAs[String]("segment")).toSet == Set("low", "high"))
    r.foreach { row =>
      assert(row.getAs[Long]("n_t") + row.getAs[Long]("n_c") == 30L)
      assert(row.getAs[Double]("rate_t") == 1.0)
      assert(row.getAs[Double]("rate_c") == 0.0)
      assert(row.getAs[Double]("uplift") == 1.0)
      assert(row.getAs[Boolean]("significant"))
    }
    assert(DataQuality.upliftBySegment(events).collect().toSeq == r.toSeq)
  }

  test("adaboostStumps: a single separating stump drives train " +
      "accuracy to 1 in round 1 and boosting keeps it there") {
    import graft.operators.Learn
    var eid = 0L
    def ev(u: Long, t: String, day: Int, h: Int) = {
      eid += 1
      (eid, u, t,
        java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00"),
        1.0, "{}")
    }
    // heavy buyers are active 25 days, light buyers 5 -> the stump
    // (n_days > t, t in [6, 24]) separates perfectly
    val events = (1L to 40L).flatMap { u =>
      val heavy = u <= 20
      val days = if (heavy) 25 else 5
      (1 to days).map(d => ev(u, "view", d, 1)) ++
        (1 to (if (heavy) 14 else 1)).map(i => ev(u, "purchase", 28, i % 24))
    }.toDF("event_id", "user_id", "event_type", "ts", "value", "props")
    val r = Learn.adaboostStumps(events).collect()
    assert(r.map(_.getAs[Int]("round_no")).toSeq == (1 to 5))
    val r1 = r.head
    assert(r1.getAs[String]("feature") == "n_days")
    assert(r1.getAs[Double]("alpha") > 1.0)
    assert(r1.getAs[Double]("weighted_err") < 0.05)
    r.foreach { row =>
      assert(row.getAs[Double]("train_acc") == 1.0)
    }
    assert(Learn.adaboostStumps(events).collect().toSeq == r.toSeq)
  }

  test("nbLangConfusion: disjoint vocabularies classify the holdout " +
      "perfectly (diagonal confusion), deterministically") {
    import graft.operators.Learn
    // 60 docs per lang, each lang a disjoint vocabulary
    val docs = (for {
      (lang, word) <- Seq(("aa", "alpha"), ("bb", "beta"), ("cc", "gamma"))
      i <- 1 to 60
    } yield (lang.hashCode.toLong * 1000 + i,
      s"$word $word$i $word", lang, "src", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Learn.nbLangConfusion(docs).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.getString(0) == x.getString(1))) // diagonal
    val total = r.map(_.getAs[Long]("n_docs")).sum
    assert(total > 0 && total < 180) // a real 20% holdout
    assert(Learn.nbLangConfusion(docs).collect().toSeq == r.toSeq)
  }

  test("olsFit: an exact linear law is recovered to the last " +
      "micro-unit with R^2 = 1, deterministically") {
    import graft.operators.Learn
    // z cents = 500 + 700*qty + 6800*disc_pt, exactly, on a 50x11 grid
    val rows = for (x <- 1 to 50; y <- 0 to 10) yield
      (x.toDouble, y / 100.0, (500 + 700 * x + 6800 * y) / 100.0)
    val df = rows.toDF("l_quantity", "l_discount", "l_extendedprice")
    val r = Learn.olsFit(df).collect().head
    assert(r.getAs[Long]("n_rows") == 550L)
    assert(r.getAs[Double]("intercept_usd") == 5.0)
    assert(r.getAs[Double]("beta_qty_usd") == 7.0)
    assert(r.getAs[Double]("beta_disc_pt_usd") == 68.0)
    assert(r.getAs[Double]("r2") == 1.0)
    // partitioning-invariant: the whole point of exact moment sums
    assert(Learn.olsFit(df.repartition(13)).collect().head == r)
  }

  test("abTestCmh: 2x2 margins are consistent, chi2 is shared across " +
      "strata rows, and zero pooled variance nulls the statistic") {
    def ev(u: Long, t: String, day: Int) =
      (u, t, 1.0, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"))
    // two cohort weeks; roughly a third convert
    val events = ((1L to 30L).map { u =>
      ev(u, "view", if (u <= 15) 1 else 10)
    } ++ (1L to 30L).filter(_ % 3 == 0).map { u =>
      ev(u, "purchase", if (u <= 15) 2 else 11)
    }).toDF("user_id", "event_type", "value", "ts")
    val r = DataQuality.abTestCmh(events).collect()
    assert(r.length == 2) // two strata
    r.foreach { row =>
      assert(row.getAs[Long]("a") <= row.getAs[Long]("n1"))
      assert(row.getAs[Long]("m0") ==
        row.getAs[Long]("n1") + row.getAs[Long]("n0") -
          row.getAs[Long]("m1"))
      assert(row.getAs[Double]("cmh_chi2") >= 0.0)
    }
    assert(r.map(_.getAs[Double]("cmh_chi2")).distinct.length == 1)
    // universal conversion -> every stratum's V = 0 -> NULL statistic
    val all = ((1L to 10L).map(ev(_, "purchase", 1)))
      .toDF("user_id", "event_type", "value", "ts")
    val r2 = DataQuality.abTestCmh(all).collect()
    assert(r2.forall(_.isNullAt(r2.head.fieldIndex("cmh_chi2"))))
  }

  test("abTestZ: pooled z matches the hand formula; universal " +
      "conversion degenerates to NULL z, not a division blow-up") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = (1L to 40L).flatMap { u =>
      Seq((u, "view", t0)) ++
        (if (u % 3 == 0) Seq((u, "purchase", t0)) else Nil)
    }.toDF("user_id", "event_type", "ts")
    val r = DataQuality.abTestZ(events).collect()
    val byType = r.map(x => x.getString(0) -> x).toMap
    // every user views -> x == n -> pooled variance 0 -> NULL z
    val v = byType("view")
    assert(v.getAs[Long]("x_a") == v.getAs[Long]("n_a"))
    assert(v.isNullAt(v.fieldIndex("z")))
    assert(!v.getAs[Boolean]("significant"))
    // purchase: recompute z from the emitted integer counts
    val p = byType("purchase")
    val (na, nb) = (p.getAs[Long]("n_a"), p.getAs[Long]("n_b"))
    val (xa, xb) = (p.getAs[Long]("x_a"), p.getAs[Long]("x_b"))
    assert(na + nb == 40L && xa + xb == 13L)
    val x = xa + xb; val n = na + nb
    val expected = BigDecimal((xa * nb - xb * na).toDouble /
        math.sqrt((x * (n - x)).toDouble * (na * nb).toDouble / n))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(p.getAs[Double]("z") == expected)
    // arm assignment is content-stable: rerun gives identical rows
    assert(DataQuality.abTestZ(events).collect().toSeq == r.toSeq)
  }
}
