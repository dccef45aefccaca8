package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VocabTokenize

import graft.operators.TextAnalysis

/** Vocab-constrained greedy subword tokenization — the compiled
  * longest-match walk and its budget fold.
  */
class VocabTokenizeSpec extends SparkSpec {
  import spark.implicits._

  private def piecesOf(text: String,
                       vocab: Seq[String] = VocabTokenize.DefaultVocab) =
    Seq(Tuple1(text)).toDF("text")
      .select(explode(VocabTokenize.column(col("text"), vocab)).as("p"))
      .select(col("p.piece"), col("p.is_oov"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq

  test("greedy longest match: full word beats prefixes, merges chain") {
    assert(piecesOf("window") == Seq(("window", false)))
    // "ba" + "t" + "ch" — never the shorter "a"/"t" path
    assert(piecesOf("batch") ==
      Seq(("ba", false), ("t", false), ("ch", false)))
    // OOV fallback characters interleave with matches
    assert(piecesOf("merge") == Seq(("m", true), ("er", false),
      ("g", true), ("e", false)))
  }

  test("empty text and doubled spaces contribute zero pieces") {
    assert(piecesOf("") == Seq())
    assert(piecesOf("the  the") == // empty middle token: no pieces
      Seq(("the", false), ("the", false)))
  }

  test("budget equals the piece stream's counts, words count empties") {
    val d = Seq((1L, "the  batch merge"), (2L, ""), (3L, "zzz"))
      .toDF("doc_id", "text")
    val st = TextAnalysis.tokenBudgetStats(d).collect()
    val r1 = st.find(_.getLong(0) == 1L).get
    // words: "the","","batch","merge" = 4; pieces: 1+0+3+4 = 8; oov: m,g,z?
    assert(r1.getAs[Int]("n_words") == 4)
    assert(r1.getAs[Int]("n_subtokens") == 8)
    assert(r1.getAs[Int]("n_oov") == 2) // m, g
    assert(r1.getAs[Double]("fertility") == 8.0 / 4.0)
    assert(r1.getAs[Double]("oov_rate") == 2.0 / 8.0)
    val r2 = st.find(_.getLong(0) == 2L).get
    assert(r2.getAs[Int]("n_words") == 1 && r2.getAs[Int]("n_subtokens") == 0
      && r2.getAs[Double]("oov_rate") == 0.0)
    val r3 = st.find(_.getLong(0) == 3L).get
    assert(r3.getAs[Int]("n_subtokens") == 3 && r3.getAs[Int]("n_oov") == 3)
  }

  test("multi-byte characters fall back as whole characters, never byte shears") {
    // "über" = 2-byte 'ü' then b, e, r: ü is one OOV piece (valid
    // UTF-8), then b(oov), then "er" matches — identical to a
    // per-character oracle walk
    assert(piecesOf("über") ==
      Seq(("ü", true), ("b", true), ("er", false)))
    assert(piecesOf("αβ") == Seq(("α", true), ("β", true)))
  }

  test("custom vocab: 1-char entries always beat fallback") {
    val v = Seq("ab", "b", "c")
    assert(piecesOf("abcb", v) ==
      Seq(("ab", false), ("c", false), ("b", false)))
    assert(piecesOf("xb", v) == Seq(("x", true), ("b", false)))
  }

  test("epoch order is identical across partitionings and distinct across epochs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = TextAnalysis.epochOrder(docs).collect().toSeq
    // content-stable: any physical layout reproduces the same order
    assert(TextAnalysis.epochOrder(docs.repartition(7)).collect().toSeq
      == base)
    assert(TextAnalysis.epochOrder(docs.coalesce(1)).collect().toSeq
      == base)
    // a permutation: every doc exactly once, positions 1..n per shard
    assert(base.map(_.getAs[Long]("doc_id")).distinct.size == base.size)
    val perShard = base.groupBy(_.getAs[Long]("shard"))
    assert(perShard.values.forall(rs =>
      rs.map(_.getAs[Int]("epoch_pos")).sorted == (1 to rs.size)))
    // a new epoch re-salts: a genuinely different permutation
    val e1 = TextAnalysis.epochOrder(docs, epoch = 1).collect().toSeq
    assert(e1 != base &&
      e1.map(_.getAs[Long]("doc_id")).toSet ==
        base.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("curriculum order: easy band streams first, shuffle inside a " +
      "band is epoch_order-stable across partitionings") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = TextAnalysis.curriculumOrder(docs).collect().toSeq
    assert(TextAnalysis.curriculumOrder(docs.repartition(7)).collect().toSeq
      == base)
    // bands are emitted in ascending difficulty and partition the docs
    assert(base.map(_.getAs[Int]("band")) == base.map(_.getAs[Int]("band"))
      .sorted)
    assert(base.map(_.getAs[Long]("doc_id")).distinct.size == base.size)
    // band membership is content-stable: fixed fk_grade cuts, so a
    // doc's band must agree with its own readability row
    val grades = TextAnalysis.readability(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("fk_grade")).toMap
    for (r <- base) {
      val g = grades(r.getAs[Long]("doc_id"))
      val want = if (g < 8.0) 0 else if (g < 12.0) 1 else 2
      assert(r.getAs[Int]("band") == want)
    }
    // positions are 1..n within each (band, shard)
    val per = base.groupBy(r =>
      (r.getAs[Int]("band"), r.getAs[Long]("shard")))
    assert(per.values.forall(rs =>
      rs.map(_.getAs[Int]("band_pos")).sorted == (1 to rs.size)))
  }

  test("tokenizer expressions whole-stage-codegen, methods under JIT limit") {
    // a Janino failure would silently fall back to interpreted eval —
    // the exact regression class the compiled walk exists to avoid
    // (same guard as PlanSpec's cdc_dup_chunks codegen test)
    for (name <- Seq("token_budget_stats", "tokenize_vocab")) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      val executed = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val stages =
        org.apache.spark.sql.execution.debug.codegenStringSeq(executed)
      assert(stages.nonEmpty, s"$name: no WholeStageCodegen stages")
      stages.foreach { case (subtree, _, stats) =>
        assert(stats.maxMethodCodeSize > 0,
          s"$name: codegen compile failed in:\n" +
            subtree.linesIterator.take(4).mkString("\n"))
        assert(stats.maxMethodCodeSize < 8000,
          s"$name: ${stats.maxMethodCodeSize}B exceeds JIT limit")
      }
    }
  }

  test("BPE merge learning: hand-computed merges, greedy non-overlap, exhaustion stop") {
    import spark.implicits._
    val docs = Seq((0L, "abab ab"), (1L, "abab")).toDF("doc_id", "text")
    // vocab: abab(2), ab(1); stage 1: 'a b' = 2*2+1 = 5 beats 'b a' = 2
    // stage 2: 'ab ab' = 2; then no pairs remain -> stops at 2 of 4
    val got = TextAnalysis.bpeLearn(docs, numMerges = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == Seq((1, "a b", "ab", 5L), (2, "ab ab", "abab", 2L)))
    // greedy left-to-right non-overlap: 'aaa' merges (a,a) once per scan
    val odd = Seq((0L, "aaa aaa")).toDF("doc_id", "text")
    val g2 = TextAnalysis.bpeLearn(odd, numMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // stage 1: 'a a' appears twice per 'aaa' (overlapping pairs both
    // count in the COUNTING step) * freq 2 = 4; after the merge each
    // word is 'aa a'; stage 2: 'aa a' = 2
    assert(g2 == Seq((1, "a a", "aa", 4L), (2, "aa a", "aaa", 2L)))
  }

  test("BPE learning is partitioning-independent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = TextAnalysis.bpeLearn(docs, 4).collect().map(_.toString).toSeq
    val b = TextAnalysis.bpeLearn(docs.repartition(13), 4)
      .collect().map(_.toString).toSeq
    assert(a == b && a.length == 4)
  }

  test("WordPiece picks the correlated pair where BPE picks the frequent one") {
    // 'xq' occurs 6 times but x and q occur ONLY together (likelihood
    // ratio 6/(6*6)=0.167); 'ab' occurs 10 times but a and b are
    // everywhere (10/(24*24)~0.017). BPE must merge (a ##b) first
    // (frequency); WordPiece must merge (x ##q) first (likelihood).
    val docs = Seq(
      (1L, ("ab " * 10 + "xq " * 6 + "a " * 14 + "b " * 14).trim))
      .toDF("doc_id", "text")
    val wp = TextAnalysis.wordpieceLearn(docs, numMerges = 1).collect()
    assert(wp.head.getString(1) == "x ##q" && wp.head.getString(2) == "xq",
      s"wordpiece picked ${wp.head.getString(1)}")
    val bpe = TextAnalysis.bpeLearn(docs, numMerges = 1).collect()
    assert(bpe.head.getString(1) == "a b",
      s"bpe picked ${bpe.head.getString(1)}")
  }

  test("WordPiece ## convention: initial symbols bare, merges strip the marker") {
    val docs = Seq((1L, "abc abc abd")).toDF("doc_id", "text")
    val m = TextAnalysis.wordpieceLearn(docs, numMerges = 2)
      .collect().map(r => (r.getString(1), r.getString(2)))
    m.foreach { case (pair, merged) =>
      val Array(pa, pb) = pair.split(" ", 2)
      assert(pb.startsWith("##"), s"continuation side unmarked: $pair")
      assert(merged == pa + pb.stripPrefix("##"), s"merge kept ##: $merged")
    }
    // segmentation coverage: every token segments, fertility >= 1
    val seg = TextAnalysis.wordpieceSegment(docs, numMerges = 2).collect()
    assert(seg.head.getLong(1) == 3 &&
      seg.head.getLong(2) >= seg.head.getLong(1))
  }

  test("piece frequencies reconcile with per-doc budgets on the corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val freq = TextAnalysis.tokenizeVocab(docs)
    val totalPieces = freq.agg(sum(col("n"))).collect().head.getLong(0)
    val totalOov = freq.filter(col("is_oov"))
      .agg(sum(col("n"))).collect().head.getLong(0)
    val st = TextAnalysis.tokenBudgetStats(docs)
      .agg(sum(col("n_subtokens")), sum(col("n_oov"))).collect().head
    assert(st.getLong(0) == totalPieces && st.getLong(1) == totalOov)
  }
}
