package graft

import org.apache.spark.sql.functions._

import graft.operators.EntityResolution

/** Entity resolution on a constructed customer frame: deterministic
  * corruption, blocking coverage, Fellegi–Sunter classification of the
  * known true links, and survivorship.
  */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  // 40 customers across 4 nations / the 5 real segments — enough for
  // blocks to be non-trivial and the u-sample to be non-empty
  private val segs =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val customers = (0 until 40).map { i =>
    (i.toLong, f"Customer#$i%09d", i % 4, 1000.0 + 13.37 * i, segs(i % 5))
  }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  private val a = EntityResolution.sourceA(customers)
  private val b = EntityResolution.sourceB(customers)

  test("corruption is deterministic and keeps ~90% of records") {
    val n1 = b.collect().toSet
    val n2 = EntityResolution.sourceB(customers).collect().toSet
    assert(n1 == n2)
    val kept = b.count()
    assert(kept < 40 && kept >= 30, s"kept $kept of 40")
    // every B id maps back to an existing A id
    val aIds = a.select("rec_id").as[Long].collect().toSet
    val bTwins = b.select((col("rec_id") - EntityResolution.BIdOffset)
      .as[Long]).collect().toSet
    assert(bTwins.subsetOf(aIds))
  }

  test("blocking recovers every twin whose nation survived corruption") {
    val cand = EntityResolution.candidates(a, b)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    // twins whose nation was NOT perturbed share the (nation, segment)
    // key unless the segment was ALSO re-labelled AND the balance
    // crossed a band edge; with both passes, only a double corruption
    // (nation moved) can sever all keys
    val natA = a.select(col("rec_id"), col("nat"))
      .as[(Long, Long)].collect().toMap
    val bRows = b.select(col("rec_id"), col("nat"))
      .as[(Long, Long)].collect()
    val severed = bRows.count { case (bid, nat) =>
      natA(bid - EntityResolution.BIdOffset) != nat
    }
    val truePairsFound = bRows.count { case (bid, _) =>
      cand.contains((bid - EntityResolution.BIdOffset, bid))
    }
    assert(truePairsFound >= bRows.length - severed,
      s"found $truePairsFound of ${bRows.length} (severed: $severed)")
  }

  test("true links classify as match; eval row internals are consistent") {
    val ev = EntityResolution.erEval(a, b).collect()
    val at6 = ev.find(_.getDouble(0) == EntityResolution.ThMatch).get
    val rec = at6.getDouble(5)
    val blockRec = at6.getDouble(7)
    assert(rec >= 0.8, s"recall at ThMatch = $rec")
    assert(blockRec >= rec, "classified recall cannot exceed blocking recall")
    // precision sanity: matches are dominated by true links
    assert(at6.getDouble(4) >= 0.8, s"precision ${at6.getDouble(4)}")
  }

  test("incremental: delta candidates equal the full run's delta slice " +
      "when caps don't bind") {
    val splitH = graft.functions.TextFunctions.hash60(
      concat(lit("er_inc_"), col("rec_id").cast("string"))) % 100
    val bHist = b.filter(splitH < 80)
    val bDelta = b.filter(splitH >= 80)
    val deltaIds = bDelta.select("rec_id").as[Long].collect().toSet
    assert(deltaIds.nonEmpty && deltaIds.size < b.count())
    val inc = EntityResolution.incrementalMatches(a, bHist, bDelta)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    // the incremental path blocks under the production key set (finer
    // 3-pass at MasterCap) — compare against the full run under the
    // SAME keys
    val full = EntityResolution.matchScores(a, b,
        cap = EntityResolution.MasterCap, finerKeys = true)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
      .filter(p => deltaIds(p._2))
    assert(inc == full, s"inc ${inc.size} vs full-slice ${full.size}")
    // frozen-history u: the true twins in the delta still classify
    val incMatch = EntityResolution.incrementalMatches(a, bHist, bDelta)
      .filter(col("verdict") === "match")
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect()
      .count(p => p._2 - EntityResolution.BIdOffset == p._1)
    assert(incMatch >= (deltaIds.size * 0.7).toInt,
      s"$incMatch of ${deltaIds.size} delta twins matched")
  }

  test("retire: empty takedown is identity; full takedown empties the table") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rec_id",
          org.apache.spark.sql.types.LongType))))
    val base = EntityResolution.entities(a, b).collect().toSeq
    val idem = EntityResolution.entitiesAfterRetire(a, b, empty)
      .collect().toSeq
    assert(base == idem)
    val all = a.select(col("rec_id"))
    assert(EntityResolution.entitiesAfterRetire(a, b, all).isEmpty)
  }

  test("stream-static ER candidates: batch parity against the master index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val splitH = graft.functions.TextFunctions.hash60(
      concat(lit("er_inc_"), col("rec_id").cast("string"))) % 100
    val bDelta = b.filter(splitH >= 80)
    val masterIdx = EntityResolution.masterIndex(a).localCheckpoint(true)
    val deltaRows = bDelta
      .select(col("rec_id"), col("name"), col("nat"), col("seg"),
        col("ab_c"))
      .as[(Long, String, Long, String, Long)].collect().toSeq
    val in = MemoryStream[(Long, String, Long, String, Long)]
    val q = graft.streaming.Streams.erCandidateStream(
        in.toDF.toDF("rec_id", "name", "nat", "seg", "ab_c"), masterIdx)
      .writeStream.format("memory").queryName("er_cand_stream")
      .outputMode("append").start()
    try {
      in.addData(deltaRows: _*)
      q.processAllAvailable()
      val landed = spark.table("er_cand_stream").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch parity: the fixture is far below the caps, so the
      // streamed candidates equal the batch incremental candidates
      // (both sides block under the production 3-pass key set)
      val batch = EntityResolution.candidates(a, bDelta,
          cap = EntityResolution.MasterCap, finerKeys = true)
        .select(col("a_id"), col("b_id")).as[(Long, Long)]
        .collect().toSet
      assert(landed.nonEmpty)
      assert(landed == batch,
        s"stream != batch:\n  landed=$landed\n  batch=$batch")
    } finally q.stop()
  }

  test("index consumers: eval/entities/retire served off a persisted " +
      "parquet match index equal the self-contained forms") {
    val dir = java.nio.file.Files
      .createTempDirectory("er_idx_spec").toString
    EntityResolution.matchScores(a, b)
      .write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    assert(EntityResolution.erEvalFromIndex(idx, b).collect().toSeq ==
      EntityResolution.erEval(a, b).collect().toSeq)
    assert(
      EntityResolution.entitiesFromIndex(idx, a, b).collect().toSeq ==
        EntityResolution.entities(a, b).collect().toSeq)
    val retired = a.filter(col("rec_id") % 7 === 3).select(col("rec_id"))
    assert(EntityResolution
      .entitiesAfterRetireFromIndex(idx, a, b, retired).collect().toSeq ==
      EntityResolution.entitiesAfterRetire(a, b, retired).collect().toSeq)
  }

  test("eval emits a row for EVERY requested threshold, zero-pair " +
      "thresholds included (n_pred 0, prec NULL)") {
    // threshold 99 is unreachable (3-field FS score tops out ~13)
    val ev = EntityResolution.erEval(a, b, Seq(0, 6, 99)).collect()
    assert(ev.length == 3, s"curve thinned: ${ev.length} rows")
    val z = ev.find(_.getDouble(0) == 99.0).get
    assert(z.getLong(1) == 0L && z.getLong(2) == 0L)
    assert(z.isNullAt(4), "prec must be NULL at a zero-pair threshold")
    assert(z.getDouble(5) == 0.0) // rec
  }

  test("entities: clean-source survivorship and pair provenance") {
    val ents = EntityResolution.entities(a, b)
    val rows = ents.collect()
    assert(rows.nonEmpty)
    // every entity rep is an A-side id (A ids < B ids by construction)
    assert(rows.forall(_.getLong(0) < EntityResolution.BIdOffset))
    // canonical name comes from the lowest id (the A record): it must
    // be an uncorrupted Customer#NNNNNNNNN name
    assert(rows.forall(_.getString(3).matches("Customer#\\d{9}")))
    // 2-member entities spanning both sources dominate
    val both = rows.count(r => r.getLong(2) == 2)
    assert(both >= rows.length / 2, s"$both of ${rows.length} span A+B")
  }
}
