package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** KMV distinct sketch: exactness below k, estimator accuracy, and the
  * merge law (union of partial sketches == direct sketch).
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def values(group: String, n: Int) =
    (1 to n).map(i => (group, s"${group}_v$i"))

  test("below k the sketch reports the exact distinct count") {
    // 10 distinct values, k=64 -> exact path, rel_err 0
    val df = (values("a", 10) ++ values("a", 10)).toDF("g", "v")
    val rep = Sketches.kmvDistinct(df, Seq("g"), col("v"), 64, "t_").collect()
    assert(rep.length == 1)
    assert(rep.head.getAs[Long]("n_exact") == 10L)
    assert(rep.head.getAs[Double]("kmv_est") == 10.0)
    assert(rep.head.getAs[Double]("rel_err") == 0.0)
  }

  test("above k the estimate lands within the theoretical error band") {
    // 2000 distinct, k=64: KMV relative error concentrates around
    // 1/sqrt(k-2) ~ 0.13; assert a generous 3-sigma band
    val df = values("a", 2000).toDF("g", "v")
    val rep = Sketches.kmvDistinct(df, Seq("g"), col("v"), 64, "t_").collect()
    assert(rep.head.getAs[Long]("n_exact") == 2000L)
    assert(rep.head.getAs[Double]("rel_err") < 0.4,
      s"rel_err ${rep.head.getAs[Double]("rel_err")}")
  }

  test("merge law: daily partials re-capped equal the direct sketch") {
    // values spread over 7 'days' with heavy cross-day overlap
    val rows = for {
      d <- 1 to 7; i <- 1 to 300
    } yield ("g1", d, s"v${(i * d) % 900}")
    val df = rows.toDF("g", "day", "v")
    val rep = Sketches.kmvMergeDaily(df, Seq("g"), col("day"), col("v"),
      32, "t_").collect()
    assert(rep.length == 1)
    assert(rep.head.getAs[Boolean]("merge_consistent"),
      s"merged ${rep.head.getAs[Double]("merged_est")} != " +
        s"direct ${rep.head.getAs[Double]("direct_est")}")
  }

  test("merge law holds per group across many random groups") {
    val rng = new scala.util.Random(42)
    val rows = for {
      g <- 1 to 8; d <- 1 to 5; _ <- 1 to 200
    } yield (s"g$g", d, s"v${rng.nextInt(100 * g)}")
    val rep = Sketches.kmvMergeDaily(rows.toDF("g", "day", "v"),
      Seq("g"), col("day"), col("v"), 16, "t_").collect()
    assert(rep.length == 8)
    assert(rep.forall(_.getAs[Boolean]("merge_consistent")))
  }

  test("overlap below k is exact: union, intersection, jaccard") {
    // A = v1..v30, B = v21..v50 -> |A|=|B|=30, |A∩B|=10, |A∪B|=50, J=0.2
    val rows = (1 to 30).map(i => ("A", s"v$i")) ++
      (21 to 50).map(i => ("B", s"v$i"))
    val rep = Sketches.kmvOverlap(rows.toDF("t", "v"), "t", col("v"),
      64, "t_").collect()
    assert(rep.length == 1)
    val r = rep.head
    assert(r.getAs[Double]("est_a") == 30.0)
    assert(r.getAs[Double]("est_b") == 30.0)
    assert(r.getAs[Double]("est_union") == 50.0)
    assert(r.getAs[Double]("est_intersection") == 10.0)
    assert(r.getAs[Double]("est_jaccard") == 0.2)
  }

  test("overlap above k estimates within a coarse band at J=0.25") {
    // A = 1..2000, B = 1001..4000: union 4000, intersection 1000, J=0.25
    val rows = (1 to 2000).map(i => ("A", s"v$i")) ++
      (1001 to 4000).map(i => ("B", s"v$i"))
    val r = Sketches.kmvOverlap(rows.toDF("t", "v"), "t", col("v"),
      128, "t_").collect().head
    val u = r.getAs[Double]("est_union")
    val i = r.getAs[Double]("est_intersection")
    assert(math.abs(u - 4000) / 4000 < 0.35, s"union $u")
    assert(math.abs(i - 1000) / 1000 < 0.6, s"intersection $i")
  }

  test("bloom: no false negatives, and shard filters bit_or-merge exactly") {
    import graft.functions.TextFunctions
    def keys(ids: Seq[Int]) = ids.toDF("id").select(
      col("id").cast("string").as("key"),
      TextFunctions.hash60(concat(lit("bf_"), col("id"))).as("h"))
    val a = keys(1 to 50)
    val b = keys(40 to 90)
    val m = 512; val k = 4
    // merge law: build(A ∪ B) == per-word bit_or of build(A), build(B)
    val direct = Sketches.bloomWords(a.unionByName(b).distinct(), m, k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = Sketches.bloomWords(a, m, k)
      .unionByName(Sketches.bloomWords(b, m, k))
      .groupBy(col("word")).agg(bit_or(col("bits")).as("bits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(direct == merged)
    // no false negatives: every member of A ∪ B probes positive
    val words = Sketches.bloomWords(a.unionByName(b).distinct(), m, k)
    val hits = Sketches.bloomPositions(a.unionByName(b).distinct(), m, k)
      .join(words, Seq("word"), "left")
      .withColumn("hit",
        coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) === col("mask"))
      .groupBy(col("key")).agg(min(col("hit")).as("all_hit"))
    assert(hits.collect().forall(_.getAs[Boolean]("all_hit")))
  }

  test("sketch state is bounded: k-min retains at most k rows per group") {
    // the registered query at sf0.001: 15 users/type, k=64 -> exact
    val rep = SparkEntry.queries("sketch_kmv_distinct")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rep.length == 5)
    assert(rep.forall(r => r.getAs[Double]("kmv_est") ==
      r.getAs[Long]("n_exact").toDouble))
    val merge = SparkEntry.queries("sketch_kmv_merge")(
      spark, "/root/testdata/sf0.001").collect()
    assert(merge.forall(_.getAs[Boolean]("merge_consistent")))
  }

  test("cms: never underestimates; exact when the table out-sizes the keys") {
    // 3 keys with counts 50/30/20 into a wide sketch (w=256, 3 keys):
    // collision probability negligible per row, and min-over-4-rows
    // needs ALL rows collided to overestimate -> exact counts
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c"))
      .toDF("k")
    val wide = Sketches.cmsTopK(df, col("k"), d = 4, w = 256).collect()
    assert(wide.length == 3)
    assert(wide.forall(_.getAs[Long]("overestimate") == 0L))
    assert(wide.map(r => r.getAs[String]("key") -> r.getAs[Long]("cms_est"))
      .toMap == Map("a" -> 50L, "b" -> 30L, "c" -> 20L))
    // 200 distinct keys into w=8: collisions guaranteed in every row,
    // but CMS NEVER undercounts — the one-sided error guarantee
    val crowded = (1 to 200).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i")).toDF("k")
    val rep = Sketches.cmsTopK(crowded, col("k"), d = 4, w = 8).collect()
    assert(rep.forall(_.getAs[Long]("overestimate") >= 0L))
    assert(rep.exists(_.getAs[Long]("overestimate") > 0L))
  }

  test("cms merge law: daily cell sums equal the direct sketch, L1 = N") {
    val rows = for { d <- 1 to 5; i <- 1 to 100 }
      yield (java.sql.Date.valueOf(f"2024-02-$d%02d"), s"u${i % 37}")
    val df = rows.toDF("day", "k")
    val rep = Sketches.cmsMergeDaily(df, col("day"), col("k"),
      d = 4, w = 32).collect()
    assert(rep.length == 4)
    assert(rep.forall(_.getAs[Boolean]("merge_consistent")))
    assert(rep.forall(_.getAs[Boolean]("l1_ok")))
    assert(rep.forall(_.getAs[Long]("l1") == 500L))
  }

  test("hll small range uses linear counting and stays within its " +
      "error band (sigma ~ 4.7% at n=100, m=256; assert 3 sigma)") {
    val df = values("a", 100).toDF("g", "v")
    val r = Sketches.hllDistinct(df, Seq("g"), col("v"), 8, "t_")
      .collect().head
    assert(r.getAs[Long]("n_exact") == 100L)
    assert(r.getAs[Long]("v_zero") > 0L) // far below m -> zeros exist
    assert(r.getAs[Double]("rel_err") < 0.15,
      s"rel_err ${r.getAs[Double]("rel_err")}")
  }

  test("hll above m the harmonic estimate lands in the 1.04/sqrt(m) " +
      "error band (generous 4 sigma)") {
    val df = values("a", 20000).toDF("g", "v")
    val r = Sketches.hllDistinct(df, Seq("g"), col("v"), 8, "t_")
      .collect().head
    assert(r.getAs[Long]("n_exact") == 20000L)
    // 1.04/sqrt(256) = 0.065 -> 4 sigma = 0.26
    assert(r.getAs[Double]("rel_err") < 0.26,
      s"rel_err ${r.getAs[Double]("rel_err")}")
    // the harmonic sum is exact and bounded by m * 2^53
    assert(r.getAs[Long]("s_scaled") > 0L &&
      r.getAs[Long]("s_scaled") <= 256L * (1L << 53))
  }

  test("hll register sum accounts for every one of the m registers") {
    // a single value: 1 observed register, 255 empty -> s_scaled =
    // 2^(53-reg) + 255 * 2^53 and v_zero = 255, exactly
    val df = Seq(("a", "only")).toDF("g", "v")
    val regs = Sketches.hllRegisters(df, Seq("g"), col("v"), 8, "t_")
      .collect()
    assert(regs.length == 1)
    val reg = regs.head.getAs[Int]("reg")
    val r = Sketches.hllDistinct(df, Seq("g"), col("v"), 8, "t_")
      .collect().head
    assert(r.getAs[Long]("v_zero") == 255L)
    assert(r.getAs[Long]("s_scaled") ==
      (1L << (53 - reg)) + 255L * (1L << 53))
  }

  test("streaming fold parity: micro-batch KMV/HLL state folds equal " +
      "the one-shot sketch, and re-folding a batch is a no-op") {
    import graft.functions.TextFunctions.hash60
    val rows = (1 to 900).map(i => ("g1", s"u${i % 300}")) ++
      (1 to 400).map(i => ("g2", s"u${i % 170}"))
    val df = rows.toDF("g", "v")
    val slices = Seq(
      df.filter(crc32(col("v")) % 3 === 0),
      df.filter(crc32(col("v")) % 3 === 1),
      df.filter(crc32(col("v")) % 3 === 2))
    // KMV: fold k-min state per "micro-batch" exactly like sketchE2E
    val k = 64
    def hashes(d: org.apache.spark.sql.DataFrame) =
      d.select(col("g"), hash60(concat(lit("t_"), col("v"))).as("h"))
    var kmvState = hashes(slices.head).limit(0)
    slices.foreach { sl =>
      kmvState = Sketches.kmvStateFold(
        kmvState.unionByName(hashes(sl)), Seq("g"), k)
        .localCheckpoint(true)
    }
    // idempotence: re-folding the last batch changes nothing
    val replayed = Sketches.kmvStateFold(
      kmvState.unionByName(hashes(slices.last)), Seq("g"), k)
    assert(replayed.orderBy("g", "h").collect().toSeq ==
      kmvState.orderBy("g", "h").collect().toSeq)
    val folded = Sketches.kmvEstimateFromState(kmvState, Seq("g"), k)
      .orderBy("g").collect().toSeq
    val direct = Sketches.kmvDistinct(df, Seq("g"), col("v"), k, "t_")
      .select(col("g"), col("kmv_est")).orderBy("g").collect().toSeq
    assert(folded == direct)
    // HLL: register-wise max fold per batch == direct registers
    def regs(d: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(d, Seq("g"), col("v"), 8, "t_")
    var hllState = regs(slices.head).limit(0)
    slices.foreach { sl =>
      hllState = hllState.unionByName(regs(sl))
        .groupBy(col("g"), col("idx")).agg(max(col("reg")).as("reg"))
        .localCheckpoint(true)
    }
    val hFolded = Sketches.hllReport(hllState, Seq("g"), 8)
      .orderBy("g").collect().toSeq
    val hDirect = Sketches.hllReport(regs(df), Seq("g"), 8)
      .orderBy("g").collect().toSeq
    assert(hFolded == hDirect)
  }

  test("hll merge law: daily register shards re-maxed equal the " +
      "direct sketch, estimates and exact sums both") {
    val rows = for {
      d <- 1 to 7; i <- 1 to 500
    } yield ("g1", d, s"v${(i * d) % 1500}")
    val rep = Sketches.hllMergeDaily(rows.toDF("g", "day", "v"),
      Seq("g"), col("day"), col("v"), 8, "t_").collect()
    assert(rep.length == 1)
    assert(rep.head.getAs[Boolean]("merge_consistent"),
      s"merged ${rep.head.getAs[Double]("merged_est")} != " +
        s"direct ${rep.head.getAs[Double]("direct_est")}")
  }
}
