package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Index lifecycle: RETIREMENT (takedowns / opt-outs) and compaction —
  * the inverse of the incremental-append family. The contract every
  * test pins is full-recompute-minus-retired parity:
  *   retire(indexOf(docs), R) == indexOf(docs \ R)
  * plus the two fixpoints a daily pipeline needs: re-ingesting a
  * retired batch restores the index, and retiring a just-appended
  * batch undoes the append.
  */
class RetireSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private def ids(xs: Long*) = xs.toDF("doc_id")

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val corpus = Tables.documents(spark, sfDir)
  private lazy val corpusRetired = corpus
    .filter(pmod(graft.functions.TextFunctions.hash60(
      concat(lit("ret_"), col("doc_id"))), lit(100)) >= 90)
    .select(col("doc_id"))
  private lazy val corpusKept = corpus.join(corpusRetired, Seq("doc_id"),
    "left_anti")

  private def sortedRows(df: DataFrame) =
    df.collect().toSeq.sortBy(_.toString)

  // ---- per-row indexes: anti-join retire is exact parity ----

  test("signature index retire equals rebuild on survivors") {
    assert(sortedRows(
      Dedup.retireRows(Dedup.minhashSignatures(corpus), corpusRetired)) ==
      sortedRows(Dedup.minhashSignatures(corpusKept)))
  }

  test("bm25 index retire: index-served top-k equals full recompute on survivors") {
    val served = TextAnalysis.bm25QueryIndex(
      Dedup.retireRows(TextAnalysis.bm25Index(corpus), corpusRetired))
    assert(served.collect().toSeq ==
      TextAnalysis.bm25TopK(corpusKept).collect().toSeq)
  }

  test("IVF assignment retire under a frozen quantizer equals assigning survivors") {
    val emb = Similarity.normed(Tables.embeddings(spark, sfDir))
    val cents = Similarity.kmeansCentroids(emb)
    val retired = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    val kept = emb.join(retired, Seq("vec_id"), "left_anti")
    assert(sortedRows(
      Dedup.retireRows(Similarity.assignCells(emb, cents), retired, "vec_id")
        .select(col("vec_id"), col("cell"))) ==
      sortedRows(Similarity.assignCells(kept, cents)
        .select(col("vec_id"), col("cell"))))
  }

  // ---- provenanced membership indexes (span / CDC) ----

  test("provenanced span index retire equals membership rebuilt on survivors") {
    val retiredM = TextAnalysis.spanIndexMembership(
      Dedup.retireRows(TextAnalysis.spanShingleIndexProv(corpus),
        corpusRetired))
    assert(sortedRows(retiredM) ==
      sortedRows(TextAnalysis.spanShingleIndex(corpusKept)))
  }

  test("provenanced CDC index retire equals membership rebuilt on survivors") {
    val retiredM = TextAnalysis.cdcIndexMembership(
      Dedup.retireRows(TextAnalysis.cdcChunkIndexProv(corpus),
        corpusRetired))
    assert(sortedRows(retiredM) ==
      sortedRows(TextAnalysis.cdcChunkIndex(corpusKept)))
  }

  test("span hash shared with a surviving doc stays a member after retirement") {
    val d = docs(
      1L -> "a b c d e f g h tail one",   // shares the 8-token span with doc 2
      2L -> "a b c d e f g h tail two",
      3L -> "totally different eight token window content sits here now")
    val prov = TextAnalysis.spanShingleIndexProv(d)
    val m = TextAnalysis.spanIndexMembership(Dedup.retireRows(prov, ids(2L)))
    // doc 1 still contains "a b c d e f g h" — the hash must survive
    val delta = docs(10L -> "a b c d e f g h")
    assert(TextAnalysis.incrementalSpans(m, delta).count() == 1)
    // retire BOTH holders and the span is genuinely forgotten
    val m2 = TextAnalysis.spanIndexMembership(
      Dedup.retireRows(prov, ids(1L, 2L)))
    assert(TextAnalysis.incrementalSpans(m2, delta).count() == 0)
  }

  // ---- exact dedup: representative re-election ----

  test("exact retire re-elects the smallest surviving rep; empty groups vanish") {
    val d = docs(
      1L -> "same text", 2L -> "same text", 3L -> "same text",
      7L -> "loner text")
    val fps = Dedup.fingerprints(d)
    val r1 = Dedup.retireExact(fps, ids(1L)).collect()
    val g = r1.find(_.getAs[Long]("n_docs") == 2L).get
    assert(g.getAs[Long]("rep_doc_id") == 2L) // re-elected past retired rep
    // retiring every member removes the group entirely
    val r2 = Dedup.retireExact(fps, ids(1L, 2L, 3L)).collect()
    assert(r2.length == 1 && r2.head.getAs[Long]("rep_doc_id") == 7L)
    // parity with a rebuild on survivors
    assert(sortedRows(Dedup.retireExact(fps, ids(1L))) ==
      sortedRows(Dedup.exact(d.filter(col("doc_id") =!= 1L))))
  }

  // ---- clusters: re-election, splits, cap transitions ----

  private def fullClusters(d: DataFrame, maxDf: Int = Dedup.MaxShingleDf) =
    Dedup.clusters(Dedup.ngramJaccardPairs(d, maxDf = maxDf))

  private def retireParity(d: DataFrame, retired: DataFrame,
                           maxDf: Int = Dedup.MaxShingleDf): Unit = {
    val got = Dedup.retireClusters(Dedup.shingled(d), fullClusters(d, maxDf),
      retired, maxDf = maxDf)
    val want = fullClusters(d.join(retired, Seq("doc_id"), "left_anti"),
      maxDf)
    assert(sortedRows(got) == sortedRows(want))
  }

  test("clusters retire: rep retired, survivors re-elect the next minimum") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "alpha beta gamma delta epsilon zeta eta theta",
      9L -> "unrelated content that clusters with nothing else at all")
    retireParity(d, ids(1L))
    val r = Dedup.retireClusters(Dedup.shingled(d), fullClusters(d), ids(1L))
      .collect()
    assert(r.forall(_.getAs[Long]("cluster_rep") == 2L))
  }

  test("clusters retire: bridge doc splits its cluster; stranded singletons drop") {
    // sliding 16-token windows at stride 4 over w1..w24: adjacent
    // windows share 12 tokens (jaccard ≈ 0.56 ≥ 0.5) but the end
    // windows share only 8 (≈ 0.27 < 0.5) — one chain cluster rep=1.
    // Retiring bridge 2 must strand 1 and 3 (no pairs left → both
    // leave the assignment), exactly like a full rerun.
    def w(from: Int) = (from until from + 16).map(i => s"w$i").mkString(" ")
    val d = docs(
      1L -> w(1), 2L -> w(5), 3L -> w(9),
      9L -> "completely separate island of text over here with nothing shared")
    val full = fullClusters(d).collect()
    assert(full.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 3L))
    retireParity(d, ids(2L))
    assert(Dedup.retireClusters(Dedup.shingled(d), fullClusters(d), ids(2L))
      .isEmpty)
  }

  test("clusters retire: cap transition re-admits a shingle and merges untouched docs") {
    // shingle block "x y z" sits in 3 docs -> df 3 > maxDf 2: capped OUT
    // of the full-corpus index, so docs 1,2 DON'T cluster. Retiring doc
    // 3 (which shares nothing else with anyone) drops df to 2: the
    // shingles return and 1-2 become near-dups — new pairs between two
    // docs NEITHER of which shares a cluster with the retired doc.
    val d = docs(
      1L -> "x y z w p q",
      2L -> "x y z w p r",
      3L -> "x y z w unrelated tail of completely different words here")
    val full = fullClusters(d, maxDf = 2)
    assert(full.isEmpty) // capped: nothing clusters before retirement
    retireParity(d, ids(3L), maxDf = 2)
    val r = Dedup.retireClusters(Dedup.shingled(d), full, ids(3L), maxDf = 2)
      .collect()
    assert(r.map(x => (x.getAs[Long]("doc_id"),
      x.getAs[Long]("cluster_rep"))).toSet == Set((1L, 1L), (2L, 1L)))
  }

  test("clusters retire parity on the real corpus (salted takedown set)") {
    retireParity(corpus, corpusRetired)
  }

  test("clusters retire parity on random capped corpora (property)") {
    // tiny vocabulary + tiny df cap = dense shared-shingle structure
    // with caps ACTIVE and takedowns constantly uncapping shingles —
    // the adversarial regime for the blast-radius argument. ~25% of
    // docs retired per seed; parity must be exact every time.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (seed <- 71L to 74L) {
      val texts = Gen.listOfN(30,
          Gen.listOfN(6, Gen.oneOf(vocab)).map(_.mkString(" ")))
        .pureApply(Gen.Parameters.default, Seed(seed))
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val retired = d.filter(pmod(col("doc_id") * 7 + lit(seed), lit(4)) === 0)
        .select(col("doc_id"))
      retireParity(d, retired, maxDf = 4)
    }
  }

  // ---- fixpoints: retire ∘ append = identity ----

  test("re-ingesting a retired batch restores the signature index") {
    val sigs = Dedup.minhashSignatures(corpus)
    val restored = Dedup.appendSignatures(
      Dedup.retireRows(sigs, corpusRetired),
      corpus.join(corpusRetired, Seq("doc_id"), "left_semi"))
    assert(sortedRows(restored) == sortedRows(sigs))
  }

  test("retiring a just-appended batch undoes the bm25 refresh") {
    val hist = corpusKept
    val delta = corpus.join(corpusRetired, Seq("doc_id"), "left_semi")
    val idx = TextAnalysis.bm25Index(hist)
    val undone = Dedup.retireRows(
      TextAnalysis.refreshBm25Index(idx, delta), corpusRetired)
    assert(sortedRows(undone) == sortedRows(idx))
  }

  test("retire then re-ingest reproduces the full cluster assignment") {
    val postings = Dedup.shingled(corpus)
    val assign = fullClusters(corpus)
    val afterRetire = Dedup.retireClusters(postings, assign, corpusRetired)
    val retiredPostings = Dedup.retireRows(postings, corpusRetired)
    val back = Dedup.incrementalClusters(retiredPostings, afterRetire,
      corpus.join(corpusRetired, Seq("doc_id"), "left_semi"))
    assert(sortedRows(back) == sortedRows(assign))
  }

  // ---- streaming: takedowns reach the stream-static serving path ----

  test("stream-static dedup serves the retired index: taken-down twins stop flagging") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val hist = docs(
      0L -> "the quick brown fox jumps over the lazy dog near the river bank",
      1L -> "some other historical content entirely unlike the rest here")
    val histSigs = Dedup.minhashSignatures(hist)
    // takedown: doc 0 — the only doc the delta duplicates
    val servedIndex = Dedup.retireRows(histSigs, ids(0L))
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.Streams.incrementalDedupStream(
        in.toDF.toDF("doc_id", "text"), servedIndex)
      .writeStream.format("memory").queryName("retired_dedup_stream")
      .outputMode("append").start()
    try {
      in.addData(
        (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (11L, "completely novel streaming content sharing nothing with history"))
      q.processAllAvailable()
      // pre-takedown this flags (0, 10) with a full signature (the
      // batch spec in StreamingSpec); against the retired index the
      // duplicate of taken-down content ships clean
      assert(spark.table("retired_dedup_stream").count() == 0)
    } finally q.stop()
  }

  // ---- compaction ----

  test("compaction keeps reps and unclustered docs; stats add up") {
    val sigs = Dedup.minhashSignatures(corpus)
    val assign = fullClusters(corpus)
    val compacted = Dedup.compactSignatureIndex(sigs, assign)
    val nonReps = assign.filter(col("doc_id") =!= col("cluster_rep"))
    assert(compacted.join(nonReps, Seq("doc_id"), "left_semi").isEmpty)
    assert(compacted.count() == sigs.count() - nonReps.count())
    val st = Dedup.compactionStats(sigs, assign).collect().head
    assert(st.getAs[Long]("n_index_rows") == sigs.count())
    assert(st.getAs[Long]("n_kept") == compacted.count())
    assert(st.getAs[Long]("n_dropped") == nonReps.count())
  }

  test("a delta duplicating a compacted-away member still flags via its rep") {
    // 1 and 2 are exact dups (cluster rep 1); compaction drops 2's
    // signatures. A new doc equal to the dropped member must still be
    // caught — through the rep's identical signature.
    val d = docs(
      1L -> "the exact same boilerplate passage repeated verbatim here",
      2L -> "the exact same boilerplate passage repeated verbatim here",
      9L -> "an unrelated document that belongs to no cluster at all")
    val sigs = Dedup.minhashSignatures(d)
    val compacted = Dedup.compactSignatureIndex(sigs, fullClusters(d))
    assert(compacted.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet == Set(1L, 9L))
    val flagged = Dedup.incrementalNearDups(compacted,
      docs(10L -> "the exact same boilerplate passage repeated verbatim here"))
      .collect()
    assert(flagged.length == 1 && flagged.head.getAs[Long]("hist_doc") == 1L)
  }
}
