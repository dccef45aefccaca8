package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Incremental dedup: a new batch checked against a PERSISTED minhash
  * signature index — the daily-pipeline shape where the historical
  * corpus is never re-shingled (only its signature table is read).
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val histDocs = docs(
    0L -> "the quick brown fox jumps over the lazy dog near the river bank",
    1L -> "completely different content about distributed query engines here",
    2L -> "a third historical document with its own unique token stream")

  test("identical delta doc matches its history twin with a full signature") {
    val r = Dedup.incrementalNearDups(
      Dedup.minhashSignatures(histDocs),
      docs(10L -> "the quick brown fox jumps over the lazy dog near the river bank",
           11L -> "totally unrelated new content sharing nothing with history"))
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("hist_doc") == 0L)
    assert(row.getAs[Long]("delta_doc") == 10L)
    assert(row.getAs[Int]("n_matching") == Dedup.NumHashes)
    assert(row.getAs[Double]("est_jaccard") == 1.0)
  }

  test("near-duplicate delta doc matches with a partial signature") {
    val r = Dedup.incrementalNearDups(
      Dedup.minhashSignatures(histDocs),
      // one token changed vs hist doc 0 — most shingles survive
      docs(10L -> "the quick brown fox leaps over the lazy dog near the river bank"))
      .collect()
    assert(r.length == 1)
    val m = r.head.getAs[Int]("n_matching")
    assert(m >= Dedup.NumHashes / 2 && m < Dedup.NumHashes,
      s"expected partial signature agreement, got $m/${Dedup.NumHashes}")
  }

  test("persisted index: one scan of the signature table, one of the delta") {
    val base = Files.createTempDirectory("graft_inc").toString
    val sigPath = s"$base/hist_sigs.parquet"
    val deltaPath = s"$base/delta_docs.parquet"
    // the "nightly" write: signatures persisted once
    Dedup.minhashSignatures(histDocs).write.mode("overwrite").parquet(sigPath)
    docs(10L -> "the quick brown fox jumps over the lazy dog near the river bank")
      .write.mode("overwrite").parquet(deltaPath)

    val out = Dedup.incrementalNearDups(
      spark.read.parquet(sigPath), spark.read.parquet(deltaPath))

    // the history contract: its TEXT is never touched (only the
    // signature table is a plan input), and each input is scanned
    // exactly once — signatures ride the band rows, so verification
    // needs no second join back to the index
    val leaves = out.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.length == 2, s"expected 2 scan leaves, got:\n$leaves")

    // hot-bucket cap plans as a rank cut before the join, not a full
    // bucket sort (WindowGroupLimit pushes the row_number <= cap down)
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")

    val r = out.collect()
    assert(r.length == 1 && r.head.getAs[Int]("n_matching") == Dedup.NumHashes)
  }

  test("row-wise signatures equal the batch explode+groupBy signatures") {
    val edge = docs(
      0L -> "a b c d e", 1L -> "a b", 2L -> "solo",
      3L -> "the quick brown fox jumps over the lazy dog",
      4L -> ("tok " * 150).trim)
    val a = Dedup.minhashSignatures(edge).orderBy("doc_id").collect().toSeq
    val b = Dedup.minhashSignaturesRowwise(edge).orderBy("doc_id").collect().toSeq
    assert(a == b)
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val ra = Dedup.minhashSignatures(real).orderBy("doc_id").collect().toSeq
    val rb = Dedup.minhashSignaturesRowwise(real).orderBy("doc_id").collect().toSeq
    assert(ra.nonEmpty && ra == rb)
  }

  test("apply ships only unflagged delta docs; append makes the check idempotent") {
    val histSigs = Dedup.minhashSignatures(histDocs)
    val delta = docs(
      10L -> "the quick brown fox jumps over the lazy dog near the river bank", // dup of hist 0
      11L -> "a genuinely new document with content the history never saw")
    val shipped = Dedup.incrementalApply(histSigs, delta)
    assert(shipped.select("doc_id").as[Long].collect().toSeq == Seq(11L))

    // close the loop: after appending the survivors' signatures, the
    // SAME delta re-checked against the updated index is fully flagged
    // (10 by hist 0, 11 by its own signature) — the idempotence a daily
    // job relies on to make reruns safe
    val updated = Dedup.appendSignatures(histSigs, shipped)
    val reflagged = Dedup.incrementalNearDups(updated, delta)
      .select("delta_doc").as[Long].collect().toSet
    assert(reflagged == Set(10L, 11L))
  }

  test("incremental spans: only against-history content is flagged") {
    import graft.operators.TextAnalysis
    val hist = docs(0L -> "h1 h2 h3 h4 h5 h6", 1L -> "z1 z2 z3 z4")
    // delta 10 embeds hist-0's token run mid-document; 11/12 duplicate
    // EACH OTHER but not history — out of scope for the incremental
    // check (delta-internal dedup is the batch operator's job)
    val delta = docs(
      10L -> "n1 n2 h1 h2 h3 h4 h5 h6 n3",
      11L -> "d1 d2 d3 d4 d5", 12L -> "d1 d2 d3 d4 d5")
    val r = TextAnalysis.incrementalSpans(
      TextAnalysis.spanShingleIndex(hist, k = 3), delta, k = 3).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("doc_id") == 10L &&
      r.head.getAs[Long]("span_start") == 3L &&
      r.head.getAs[Long]("span_end") == 8L &&
      r.head.getAs[Long]("n_windows") == 4L)
  }

  test("persisted span index: one scan each, semi join, text never read") {
    import graft.operators.TextAnalysis
    val base = Files.createTempDirectory("graft_incspan").toString
    val idxPath = s"$base/span_idx.parquet"
    val deltaPath = s"$base/delta_docs.parquet"
    TextAnalysis.spanShingleIndex(histDocs, k = 3)
      .write.mode("overwrite").parquet(idxPath)
    docs(10L -> "prefix the quick brown fox jumps over suffix")
      .write.mode("overwrite").parquet(deltaPath)
    val out = TextAnalysis.incrementalSpans(
      spark.read.parquet(idxPath), spark.read.parquet(deltaPath), k = 3)
    // the history contract: only the 8-byte hash index is a plan input,
    // and each input is scanned exactly once
    val leaves = out.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.length == 2, s"expected 2 scan leaves, got:\n$leaves")
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("LeftSemi"), s"no semi join:\n$plan")
    val r = out.collect()
    // "the quick brown fox jumps over" sits at tokens 2-7 of the delta
    assert(r.length == 1 &&
      r.head.getAs[Long]("span_start") == 2L &&
      r.head.getAs[Long]("span_end") == 7L)
  }

  test("incremental CDC: copied and context-wrapped passages flagged, new content not") {
    import graft.operators.TextAnalysis
    val hist = docs(
      0L -> (1 to 24).map(i => s"h$i").mkString(" "),
      1L -> "z1 z2 z3 z4 z5 z6 z7 z8")
    // 10 = verbatim copy of hist 0 (every chunk must match); 11 = hist 0
    // wrapped in new context (content-defined boundaries resynchronize
    // after at most one chunk, so interior chunks still match); 12 =
    // genuinely new (nothing matches)
    val delta = docs(
      10L -> (1 to 24).map(i => s"h$i").mkString(" "),
      11L -> ("prefix0 " + (1 to 24).map(i => s"h$i").mkString(" ") + " suffix0"),
      12L -> "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10")
    val idx = TextAnalysis.cdcChunkIndex(hist, divisor = 4)
    val r = TextAnalysis.incrementalCdcDups(idx, delta, divisor = 4)
    val byDoc = r.collect().groupBy(_.getAs[Long]("doc_id"))
    // the verbatim copy is fully covered
    val copyChunks = byDoc(10L).map(_.getAs[Int]("n_chunk_tokens")).sum
    assert(copyChunks == 24, s"copy coverage $copyChunks/24")
    // the wrapped copy resynchronizes: interior chunks match even
    // though its first and last chunks differ
    assert(byDoc.contains(11L) && byDoc(11L).nonEmpty)
    assert(byDoc(11L).map(_.getAs[Int]("n_chunk_tokens")).sum < 26)
    // new content stays unflagged
    assert(!byDoc.contains(12L))
    // one scan each side, semi join — history text never re-chunked
    // when the index comes from parquet
    val base = Files.createTempDirectory("graft_inccdc").toString
    idx.write.mode("overwrite").parquet(s"$base/cdc_idx.parquet")
    delta.write.mode("overwrite").parquet(s"$base/delta.parquet")
    val out = TextAnalysis.incrementalCdcDups(
      spark.read.parquet(s"$base/cdc_idx.parquet"),
      spark.read.parquet(s"$base/delta.parquet"), divisor = 4)
    val leaves = out.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.length == 2, s"expected 2 scan leaves, got:\n$leaves")
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("LeftSemi"), s"no semi join:\n$plan")
  }

  test("CDC index append makes the incremental CDC check idempotent") {
    import graft.operators.TextAnalysis
    val hist = docs(0L -> (1 to 16).map(i => s"h$i").mkString(" "))
    val delta = docs(10L -> (1 to 16).map(i => s"d$i").mkString(" "))
    val idx = TextAnalysis.cdcChunkIndex(hist, divisor = 4)
    // nothing shared → no chunks flagged on first check
    assert(TextAnalysis.incrementalCdcDups(idx, delta, divisor = 4)
      .collect().isEmpty)
    // after ingesting the delta, a rerun flags every chunk of the doc —
    // the idempotence a daily job relies on to make reruns safe
    val updated = TextAnalysis.appendCdcChunkIndex(idx, delta, divisor = 4)
    val r = TextAnalysis.incrementalCdcDups(updated, delta, divisor = 4)
      .collect()
    assert(r.nonEmpty && r.map(_.getAs[Int]("n_chunk_tokens")).sum == 16)
  }

  test("span index append makes the incremental span check idempotent") {
    import graft.operators.TextAnalysis
    val hist = docs(0L -> "h1 h2 h3 h4 h5 h6")
    val delta = docs(10L -> "d1 d2 d3 d4 d5 d6 d7")
    val idx = TextAnalysis.spanShingleIndex(hist, k = 3)
    // nothing shared → no spans on first check
    assert(TextAnalysis.incrementalSpans(idx, delta, k = 3)
      .collect().isEmpty)
    // after ingesting the delta, a rerun flags it whole-doc — the
    // idempotence a daily job relies on to make reruns safe
    val updated = TextAnalysis.appendSpanIndex(idx, delta, k = 3)
    val r = TextAnalysis.incrementalSpans(updated, delta, k = 3).collect()
    assert(r.length == 1 &&
      r.head.getAs[Long]("span_start") == 1L &&
      r.head.getAs[Long]("span_end") == 7L &&
      r.head.getAs[Long]("span_tokens") == 7L)
  }

  // --- incremental ANN: the IVF index refresh (Similarity) ---

  private def embs(rows: (Long, Seq[Double])*) =
    rows.map { case (id, v) =>
      (id, v.map(_.toFloat).toArray, (id % 3).toInt)
    }.toDF("vec_id", "embedding", "label")

  // two obvious clusters in 4 dims plus per-vector jitter, ids 0-11
  private val allVecs = embs((0L until 12L).map { i =>
    val base = if (i % 2 == 0) Seq(1.0, 0.05 * i, 0.0, 0.1)
               else Seq(0.0, 0.1, 1.0, 0.05 * i)
    i -> base.map(_ + 0.001 * i)
  }: _*)

  private val annHist = allVecs.filter(col("vec_id") < 9)

  test("IVF refresh: index-then-query equals assigning everything to the frozen quantizer") {
    val n = operators.Similarity.normed(annHist)
    val cents = operators.Similarity.kmeansCentroids(n, k = 2, iters = 2)
    val refreshed = operators.Similarity.refreshIvfAssignments(
      cents, operators.Similarity.assignCells(n, cents), allVecs)
    val direct = operators.Similarity.annQueryIvf(
      cents, operators.Similarity.assignCells(
        operators.Similarity.normed(allVecs), cents), nProbe = 1)
    val served = operators.Similarity.annQueryIvf(cents, refreshed, nProbe = 1)
    assert(served.collect().toSeq == direct.collect().toSeq)
  }

  test("persisted IVF index: serving scans only the index tables, refresh only ids+delta") {
    val base = Files.createTempDirectory("graft_ivf").toString
    val n = operators.Similarity.normed(annHist)
    val cents = operators.Similarity.kmeansCentroids(n, k = 2, iters = 2)
    // the "retrain" write: quantizer + assignments persisted once
    cents.write.mode("overwrite").parquet(s"$base/cents.parquet")
    operators.Similarity.assignCells(n, cents)
      .write.mode("overwrite").parquet(s"$base/assign.parquet")
    allVecs.write.mode("overwrite").parquet(s"$base/batch.parquet")
    val centsT = spark.read.parquet(s"$base/cents.parquet")
    val assignT = spark.read.parquet(s"$base/assign.parquet")
    val batchT = spark.read.parquet(s"$base/batch.parquet")

    // refresh: history EMBEDDINGS are never a plan input — only the
    // id-projected assignment table (twice: ids for the anti join, rows
    // for the union) and the delta batch
    val refreshed = operators.Similarity.refreshIvfAssignments(
      centsT, assignT, batchT)
    val refLeaves = refreshed.queryExecution.optimizedPlan.collectLeaves()
    assert(refLeaves.length == 4, s"expected 4 scan leaves, got:\n$refLeaves")

    // serving off the persisted index alone: centroids + assignments,
    // no raw-embedding or document scan anywhere in the plan
    val served = operators.Similarity.annQueryIvf(centsT, assignT, nProbe = 1)
    val leaves = served.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.length == 3, // q + probe both read assignT, + cents
      s"expected 3 scan leaves, got:\n$leaves")
    assert(!served.queryExecution.optimizedPlan.toString.contains("batch.parquet"))
    assert(served.collect().nonEmpty)
  }

  test("IVF refresh is idempotent and never touches history assignments") {
    val n = operators.Similarity.normed(annHist)
    val cents = operators.Similarity.kmeansCentroids(n, k = 2, iters = 2)
    val hist = operators.Similarity.assignCells(n, cents)
    val once = operators.Similarity.refreshIvfAssignments(cents, hist, allVecs)
    val twice = operators.Similarity.refreshIvfAssignments(cents, once, allVecs)
    val key = Seq("vec_id", "cell")
    assert(twice.select(key.head, key.tail: _*).orderBy("vec_id").collect().toSeq ==
      once.select(key.head, key.tail: _*).orderBy("vec_id").collect().toSeq)
    // history rows pass through byte-identical (never re-assigned)
    val histRows = hist.orderBy("vec_id").collect().toSeq
    val histInRefreshed = once.filter(col("vec_id") < 9).orderBy("vec_id").collect().toSeq
    assert(histInRefreshed == histRows)
  }

  // --- incremental cluster maintenance -------------------------------

  // shared-block construction: TA = C+X, TB = C+Y with block sizes tuned
  // so jaccard(TA,TB) ≈ 0.40 (< 0.5 → A,B stay separate clusters in
  // history) while the bridge doc D = C alone has jaccard ≈ 0.57 with
  // BOTH (≥ 0.5 → delta edges to each) — the transitive-merge case.
  private val blockC = (1 to 14).map(i => s"c$i").mkString(" ")
  private val blockX = (1 to 9).map(i => s"x$i").mkString(" ")
  private val blockY = (1 to 9).map(i => s"y$i").mkString(" ")
  private val ta = s"$blockC $blockX"
  private val tb = s"$blockC $blockY"
  private val tc = "an untouched history cluster keeps its representative forever"
  private val te = "a brand new duplicated document arriving twice in the delta"

  test("incrementalClusters: delta bridge merges two history clusters; untouched clusters survive") {
    val hist = docs(0L -> ta, 2L -> ta, 4L -> tb, 6L -> tb,
      8L -> tc, 9L -> tc, 3L -> "a lone history document matching nothing else at all")
    val delta = docs(100L -> blockC, // bridges A(0,2) and B(4,6)
      101L -> te, 102L -> te, // new delta-only cluster
      103L -> "an unmatched delta document that joins no cluster")
    val out = Dedup.incrementalClusters(
      Dedup.shingled(hist),
      Dedup.clusters(Dedup.ngramJaccardPairs(hist)),
      delta)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep"))
    assert(out.toMap == Map(
      0L -> 0L, 2L -> 0L, 4L -> 0L, 6L -> 0L, 100L -> 0L, // merged via bridge
      8L -> 8L, 9L -> 8L, // untouched
      101L -> 101L, 102L -> 101L), // new cluster
      s"got ${out.toSeq}")
    // lone history doc and unmatched delta doc are absent (no edges)
    assert(!out.map(_._1).toSet(3L) && !out.map(_._1).toSet(103L))
  }

  test("incrementalClusters equals the full-corpus rerun on real data") {
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
    val isHist = pmod(graft.functions.TextFunctions.hash60(
      concat(lit("inc_"), col("doc_id"))), lit(100)) < 80
    val full = Dedup.clusters(Dedup.ngramJaccardPairs(all))
      .orderBy("doc_id").collect().toSeq
    assert(full.nonEmpty, "parity test is vacuous without near-dup clusters")
    val inc = Dedup.incrementalClusters(
      Dedup.shingled(all.filter(isHist)),
      Dedup.clusters(Dedup.ngramJaccardPairs(all.filter(isHist))),
      all.filter(!isHist))
      .collect().toSeq
    assert(inc == full)
  }

  test("persisted cluster state: history text never read; append+rerun is a fixpoint") {
    val base = Files.createTempDirectory("graft_incclu").toString
    val hist = docs(0L -> ta, 2L -> ta, 4L -> tb, 6L -> tb, 8L -> tc, 9L -> tc)
    val delta = docs(100L -> blockC, 101L -> te, 102L -> te)
    // the "nightly" write: posting index + assignment persisted once
    Dedup.shingled(hist).write.mode("overwrite").parquet(s"$base/postings.parquet")
    Dedup.clusters(Dedup.ngramJaccardPairs(hist))
      .write.mode("overwrite").parquet(s"$base/assign.parquet")
    delta.write.mode("overwrite").parquet(s"$base/delta.parquet")
    val postingsT = spark.read.parquet(s"$base/postings.parquet")
    val assignT = spark.read.parquet(s"$base/assign.parquet")
    val deltaT = spark.read.parquet(s"$base/delta.parquet")

    val out = Dedup.incrementalClusters(postingsT, assignT, deltaT)
    val outRows = out.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep")).toMap
    assert(outRows == Map(0L -> 0L, 2L -> 0L, 4L -> 0L, 6L -> 0L,
      100L -> 0L, 8L -> 8L, 9L -> 8L, 101L -> 101L, 102L -> 101L))

    // close the loop: index absorbs the delta (idempotent append), the
    // output becomes the new assignment — rerunning the SAME delta
    // against the updated state changes nothing (the fixpoint a daily
    // job relies on for safe retries)
    val updPostings = Dedup.appendPostings(postingsT, deltaT)
    assert(Dedup.appendPostings(updPostings, deltaT).count() == updPostings.count())
    val rerun = Dedup.incrementalClusters(updPostings, out, deltaT)
      .collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep")).toMap
    assert(rerun == outRows)
  }

  test("exactIncremental: delta byte-dups flagged against the fp index; append merges reps") {
    val base = Files.createTempDirectory("graft_exinc").toString
    val hist = docs(0L -> "same exact text", 2L -> "same exact text",
      4L -> "other history content")
    Dedup.exact(hist).write.mode("overwrite").parquet(s"$base/fps.parquet")
    val idx = spark.read.parquet(s"$base/fps.parquet")
    val delta = docs(10L -> "same exact text", // dup of the (0,2) group
      11L -> "a brand new unseen document")
    val out = Dedup.exactIncremental(idx, delta)
    // history text is not a plan input: fp index + delta = 2 scan leaves
    assert(out.queryExecution.optimizedPlan.collectLeaves().length == 2)
    val got = out.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"))).toSeq
    assert(got == Seq(10L -> 0L))
    // append the survivors: group reps stay minimal, counts accumulate
    val survivors = delta.join(out.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val upd = Dedup.appendExact(idx, survivors).collect()
      .map(r => (r.getAs[Long]("rep_doc_id"), r.getAs[Long]("n_docs"))).toSet
    assert(upd == Set(0L -> 2L, 4L -> 1L, 11L -> 1L))
    // re-check after append: the ingested survivor now flags itself
    val re = Dedup.exactIncremental(Dedup.appendExact(idx, survivors), delta)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"))).toSet
    assert(re == Set(10L -> 0L, 11L -> 11L))
  }

  test("simhashIncremental: identical delta doc matches at hamming 0, parity with full pairs") {
    val hist = histDocs
    val idxed = Dedup.simhash(hist)
    val delta = docs(
      10L -> "the quick brown fox jumps over the lazy dog near the river bank",
      11L -> "entirely novel delta content overlapping with no history at all")
    val got = Dedup.simhashIncremental(idxed, delta).collect()
      .map(r => (r.getAs[Long]("hist_doc"), r.getAs[Long]("delta_doc"),
        r.getAs[Int]("hamming"))).toSeq
    assert(got == Seq((0L, 10L, 0)))
    // parity on real data: full simhash pairs over the corpus,
    // restricted to cross-split pairs, equal the incremental check
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
    val isHist = pmod(graft.functions.TextFunctions.hash60(
      concat(lit("inc_"), col("doc_id"))), lit(100)) < 80
    val inc = Dedup.simhashIncremental(
        Dedup.simhash(all.filter(isHist)), all.filter(!isHist))
      .collect().map(r => (r.getAs[Long]("hist_doc"),
        r.getAs[Long]("delta_doc"), r.getAs[Int]("hamming"))).toSet
    val deltaIds = all.filter(!isHist).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val full = Dedup.simhashNearDupPairs(all).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming")))
      .filter { case (a, b, _) => deltaIds(a) != deltaIds(b) }
      .map { case (a, b, h) =>
        if (deltaIds(b)) (a, b, h) else (b, a, h) }.toSet
    assert(inc == full)
  }

  test("history bucket cap keeps the smallest doc_ids (representatives)") {
    // many identical history docs: every band bucket holds all of them;
    // with a tiny cap only the smallest `cap` doc_ids stay joinable
    val flood = docs((0L until 6L).map(i => i -> "same boilerplate text repeated here every time"): _*)
    val r = Dedup.incrementalNearDups(
      Dedup.minhashSignatures(flood),
      docs(100L -> "same boilerplate text repeated here every time"),
      maxBucket = 2)
      .collect()
    assert(r.map(_.getAs[Long]("hist_doc")).toSeq == Seq(0L, 1L),
      s"expected the 2 smallest history docs, got ${r.toSeq}")
  }
}
