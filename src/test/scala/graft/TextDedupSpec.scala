package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Training-data pipeline operators: text stats, dedup, similarity. */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("text stats: counts and ratios") {
    val r = TextAnalysis.stats(docs("the cat sat on the mat")).collect().head
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(r.getAs[Int]("n_distinct_tokens") == 5) // 'the' twice
    assert(r.getAs[Double]("stopword_ratio") ==
      BigDecimal(3.0 / 6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("exact dedup groups identical texts, keeps min doc_id") {
    val r = Dedup.exact(docs("a b c", "a b c", "x y z")).collect()
    assert(r.length == 2)
    val dup = r.find(_.getAs[Long]("n_docs") == 2).get
    assert(dup.getAs[Long]("rep_doc_id") == 0L)
  }

  test("codegen SimHash60 equals the higher-order reference form") {
    // edge cases the byte-slice tokenizer must get right: multi-space
    // (empty tokens), leading/trailing spaces, unicode multibyte, long
    // repeated text — plus the real corpus
    val edge = docs("a b c", "a  b", " a", "b ", "über café émoji",
      ("tok " * 200).trim, "x")
    val a = Dedup.simhash(edge).orderBy("doc_id").collect().toSeq
    val b = Dedup.simhashHof(edge).orderBy("doc_id").collect().toSeq
    assert(a == b)
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val ra = Dedup.simhash(real).orderBy("doc_id").collect().toSeq
    val rb = Dedup.simhashHof(real).orderBy("doc_id").collect().toSeq
    assert(ra.nonEmpty && ra == rb)
  }

  test("codegen ShingleHash60 equals the higher-order reference form") {
    val edge = docs("a b c d e", "a b", "a  b c", " a b c", "b c d ",
      "über café émoji tokens here", "x", "a b c a b c a b c")
    val a = Dedup.shingled(edge).orderBy("doc_id", "shingle").collect().toSeq
    val b = Dedup.shingledHof(edge).orderBy("doc_id", "shingle").collect().toSeq
    assert(a == b)
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val ra = Dedup.shingled(real).orderBy("doc_id", "shingle").collect().toSeq
    val rb = Dedup.shingledHof(real).orderBy("doc_id", "shingle").collect().toSeq
    assert(ra.nonEmpty && ra == rb)
  }

  test("codegen ShingleStrings equals the HOF shinglesCol for n=2 and n=3") {
    import graft.functions.TextFunctions
    val edge = docs("a b c d", "a b", "a  b c", " x", "y ", "solo",
      "über café naïve", "t t t t")
    for (n <- Seq(2, 3)) {
      val a = edge.select(col("doc_id"),
          explode(org.apache.spark.sql.graft.ShingleStrings.column(col("text"), n))
            .as("s"))
        .orderBy("doc_id", "s").collect().toSeq
      val b = edge.select(col("doc_id"),
          explode(TextFunctions.shinglesCol(
            TextFunctions.tokensCol(col("text")), n)).as("s"))
        .orderBy("doc_id", "s").collect().toSeq
      assert(a == b, s"n=$n")
    }
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val ra = real.select(col("doc_id"),
        explode(org.apache.spark.sql.graft.ShingleStrings.column(col("text"), 2)).as("s"))
      .orderBy("doc_id", "s").collect().toSeq
    val rb = real.select(col("doc_id"),
        explode(TextFunctions.shinglesCol(
          TextFunctions.tokensCol(col("text")), 2)).as("s"))
      .orderBy("doc_id", "s").collect().toSeq
    assert(ra.nonEmpty && ra == rb)
  }

  test("codegen CdcChunks equals the higher-order reference form") {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.DataFrame
    // the original HOF form of cdcChunkStream, kept here as the
    // executable reference semantics for the byte-slice expression
    def hof(d: DataFrame, divisor: Int): DataFrame = {
      val toks = TextFunctions.tokensCol(col("text"))
      val n = size(toks)
      val starts = filter(sequence(lit(1), n), i =>
        when(i === 1, lit(true)).otherwise(
          pmod(TextFunctions.hash60(
            concat(lit("cdc_"), element_at(toks, (i - 1).cast("int")))),
            lit(divisor)) === 0))
      d.select(col("doc_id"), toks.as("toks"), n.as("n"), starts.as("starts"))
        .filter(col("n") >= 1)
        .select(col("doc_id"),
          posexplode(transform(col("starts"), (s, j) => {
            val len = coalesce(
              try_element_at(col("starts"), (j + 2).cast("int")) - s,
              col("n") - s + 1)
            struct(s.as("start_i"), len.as("n_chunk_tokens"),
              md5(concat_ws(" ", slice(col("toks"), s, len))).as("chunk_md5"))
          })).as(Seq("idx0", "c")))
        .select(col("doc_id"), (col("idx0") + 1).as("chunk_idx"),
          col("c.start_i").as("start_i"),
          col("c.n_chunk_tokens").as("n_chunk_tokens"),
          col("c.chunk_md5").as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }
    val edge = docs("a b c", "a  b", " a", "b ", "über café émoji",
      ("tok " * 200).trim, "x",
      (1 to 300).map(i => s"w$i").mkString(" "))
    for (divisor <- Seq(2, 16)) {
      val a = TextAnalysis.cdcChunks(edge, divisor).collect().toSeq
      val b = hof(edge, divisor).collect().toSeq
      assert(a == b, s"divisor=$divisor")
    }
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val ra = TextAnalysis.cdcChunks(real).collect().toSeq
    val rb = hof(real, 16).collect().toSeq
    assert(ra.nonEmpty && ra == rb)
  }

  test("identical docs have identical minhash signatures and simhash") {
    val d = docs("a b c d e f g h", "a b c d e f g h")
    val sigs = Dedup.minhashSignatures(d).collect()
    assert(sigs.length == 2)
    assert(sigs(0).toSeq.tail == sigs(1).toSeq.tail)
    val sims = Dedup.simhash(d).collect()
    assert(sims(0).getAs[Long]("simhash") == sims(1).getAs[Long]("simhash"))
  }

  test("LSH catches near-identical docs; jaccard verified exactly") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val near = (1 to 30).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
    val far = (100 to 130).map(i => s"other$i").mkString(" ")
    val pairs = Dedup.minhashLshPairs(docs(base, near, far), threshold = 0.5)
      .collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("d1") == 0L)
    assert(pairs.head.getAs[Long]("d2") == 1L)
    // 28 shingles each; the changed LAST token is only in the final
    // shingle => 27 shared, union 29 => jaccard 27/29
    assert(pairs.head.getAs[Double]("jaccard") ==
      BigDecimal(27.0 / 29).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("ngram jaccard finds the same verified pairs as LSH on near-dups") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val near = (1 to 30).map(i => if (i == 15) "CHANGED" else s"tok$i").mkString(" ")
    val lsh = Dedup.minhashLshPairs(docs(base, near), 0.5).collect().toSeq
    val ng = Dedup.ngramJaccardPairs(docs(base, near), 0.5).collect().toSeq
    assert(ng == lsh)
  }

  test("cluster-safe split: near-dup clusters land whole on one side; " +
      "the audit measures the naive split's leak") {
    // 3 near-dup families of 2-3 members + 2 singletons — enough
    // members that at least one family's naive per-doc hashes disagree
    val fams = Seq(
      (1 to 30).map(i => s"alpha$i"),
      (200 to 230).map(i => s"beta$i"),
      (400 to 430).map(i => s"gam$i"))
    val texts = fams.flatMap { toks =>
      Seq(toks.mkString(" "),
        toks.updated(3, "CHANGED").mkString(" "),
        toks.updated(7, "ALTERED").mkString(" "))
    } ++ Seq("lonely one off text completely different",
      "another unrelated singleton entirely")
    val d = docs(texts: _*)
    val split = Dedup.clusterSafeSplit(d).collect()
    assert(split.length == texts.length)
    // every doc in a group shares the group's fold
    val byGroup = split.groupBy(_.getAs[Long]("group_key"))
    byGroup.foreach { case (g, rows) =>
      assert(rows.map(_.getAs[String]("fold")).distinct.length == 1,
        s"group $g split across folds")
    }
    // the three families really did cluster (group sizes 3,3,3,1,1)
    assert(byGroup.values.map(_.length).toSeq.sorted == Seq(1, 1, 3, 3, 3))
    val audit = Dedup.splitLeakAudit(d).collect().head
    assert(audit.getAs[Long]("n_dup_pairs") == 9) // 3 pairs per family
    assert(audit.getAs[Long]("safe_straddle") == 0L)
    // naive_leak_frac is exactly naive_straddle / n_dup_pairs
    assert(audit.getAs[Double]("naive_leak_frac") ==
      BigDecimal(audit.getAs[Long]("naive_straddle") / 9.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("incremental cluster-safe split: merges promote into train, " +
      "never into test; untouched folds are stable") {
    // 6 chains T -> D1..D4 -> S where adjacent docs are near-dups
    // (~0.6 shingle jaccard) but T and S are not (~0.33): hist holds
    // every T and S (unclustered singletons), the delta holds the
    // bridge docs — folding the delta in merges each chain's T and S
    // groups, and whenever their hist folds DIFFER the group must
    // promote to train.
    def chain(v: Int): Seq[String] = {
      val a = (1 to 30).map(i => s"v${v}a$i")
      val b = (1 to 30).map(i => s"v${v}b$i")
      (0 to 5).map(k => (a.drop(0).take(30 - 6 * k) ++ b.take(6 * k))
        .mkString(" "))
    }
    val chains = (0 until 6).map(chain)
    // ids: doc 12*v + j lays hist (j=0 -> T, j=1 -> S) and delta
    // (j=2..5 -> D1..D4) per chain — built as ONE docs() frame so ids
    // are stable, then split by position
    val all = chains.zipWithIndex.flatMap { case (c, v) =>
      Seq(c.head, c.last) ++ c.slice(1, 5)
    }
    val d = docs(all: _*)
    val isHist = col("doc_id") % 6 < 2 // T and S of each chain
    val hist = d.filter(isHist)
    val delta = d.filter(!isHist)
    val histSplit = Dedup.clusterSafeSplit(hist)
    val updated = Dedup.clusterSafeSplitIncremental(
      Dedup.shingled(hist),
      Dedup.clusters(Dedup.ngramJaccardPairs(hist)),
      histSplit, delta)
    val before = histSplit.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val after = updated.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // 1. one fold per group
    after.groupBy(_._2).foreach { case (g, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"group $g mixed folds")
    }
    // 2. NO train -> test transition, ever
    after.foreach { case (id, _, f) =>
      if (before.get(id).contains("train"))
        assert(f == "train", s"doc $id trained yesterday, now $f")
    }
    // 3. test -> train only under a train-member merge
    val groupHasTrain = after.groupBy(_._2).map { case (g, rows) =>
      g -> rows.exists(r => before.get(r._1).contains("train"))
    }
    after.foreach { case (id, g, f) =>
      if (before.get(id).contains("test") && f == "train")
        assert(groupHasTrain(g), s"doc $id promoted without a train member")
    }
    // 4. the fixture actually exercises the promotion: at least one
    // chain's T and S started on different folds and merged
    val promoted = after.count { case (id, _, f) =>
      before.get(id).contains("test") && f == "train"
    }
    assert(promoted > 0, "no cross-fold merge in the fixture - " +
      "recut the chain vocab")
  }

  test("docs shorter than the shingle size still dedup (whole-doc shingle)") {
    val d = docs("one two", "one two", "three")
    val sigs = Dedup.minhashSignatures(d).collect()
    assert(sigs.length == 3)
    val pairs = Dedup.minhashLshPairs(d, threshold = 0.5).collect()
    assert(pairs.length == 1) // the two identical 2-token docs
    assert(pairs.head.getAs[Double]("jaccard") == 1.0)
  }

  test("repetition signals: planted repetition moves every fraction") {
    val d = Seq(
      (0L, "a b c d e f g h"),             // all-distinct tokens
      (1L, "x x x x x x x x"),             // one token repeated
      (2L, "p q p q p q p q"))             // repeated bigram "p q"
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(d).orderBy("doc_id").collect()
    // doc 0: nothing repeats
    assert(r(0).getAs[Double]("top_token_frac") == 0.125)
    assert(r(0).getAs[Double]("dup_trigram_frac") == 0.0)
    // doc 1: a single token everywhere; all 6 trigrams identical -> 5/6 dup
    assert(r(1).getAs[Double]("top_token_frac") == 1.0)
    assert(r(1).getAs[Double]("top_bigram_frac") == 1.0)
    assert(math.abs(r(1).getAs[Double]("dup_trigram_frac") - 5.0 / 6.0) < 1e-6)
    // doc 2: "p q" appears 4 of 7 bigrams
    assert(math.abs(r(2).getAs[Double]("top_bigram_frac") - 4.0 / 7.0) < 1e-6)
    // one-token doc: no bigrams/trigrams, fractions are 0 not null/error
    val tiny = TextAnalysis.repetitionSignals(Seq((9L, "solo")).toDF("doc_id", "text"))
      .collect().head
    assert(tiny.getAs[Double]("top_bigram_frac") == 0.0)
    assert(tiny.getAs[Double]("dup_trigram_frac") == 0.0)
  }

  test("repetition profile: dominant gram identified; agrees with the in-row signals") {
    val d = Seq(
      (0L, "a b c d e f g h"),             // all-distinct tokens
      (1L, "x x x x x x x x"),             // one token repeated
      (2L, "p q p q p q p q"))             // repeated bigram "p q"
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionProfile(d).collect()
    // doc 2: "p q" is the top bigram, 4 occurrences over 15 chars of "p q"(3) = 12/15
    assert(r(2).getAs[String]("top_gram") == "p q")
    assert(r(2).getAs[Long]("top_cnt") == 4L)
    assert(math.abs(r(2).getAs[Double]("top_char_frac") - 12.0 / 15.0) < 1e-9)
    // doc 0: every bigram unique -> top_cnt 1, no dup trigrams/tokens
    assert(r(0).getAs[Long]("top_cnt") == 1L)
    assert(r(0).getAs[Double]("dup_gram_frac") == 0.0)
    assert(r(0).getAs[Double]("dup_token_frac") == 0.0)
    // doc 1: everything repeats
    assert(r(1).getAs[String]("top_gram") == "x x")
    assert(r(1).getAs[Double]("dup_gram_frac") == 1.0)
    assert(r(1).getAs[Double]("dup_token_frac") == 1.0)
    // shared quantity agrees with the in-row operator: top 2-gram
    // position share == repetitionSignals.top_bigram_frac (rounded 6)
    val prof = r.map(x => x.getAs[Long]("doc_id") ->
      (x.getAs[Long]("top_cnt").toDouble / (x.getAs[Int]("n_tokens") - 1))).toMap
    TextAnalysis.repetitionSignals(d).collect().foreach { row =>
      val expected = BigDecimal(prof(row.getAs[Long]("doc_id")))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getAs[Double]("top_bigram_frac") == expected)
    }
    // one-token doc: no bigram exists; fractions 0, gram null, no error
    val tiny = TextAnalysis.repetitionProfile(Seq((9L, "solo")).toDF("doc_id", "text"))
      .collect().head
    assert(tiny.getAs[String]("top_gram") == null)
    assert(tiny.getAs[Double]("top_char_frac") == 0.0)
    assert(tiny.getAs[Double]("dup_gram_frac") == 0.0)
  }

  test("compiled repetition profile equals the exploded distributed form") {
    val edge = Seq(
      0L -> "",                               // empty text: one empty token
      1L -> "solo",                           // no bigram, no trigram
      2L -> "two tokens",                     // one bigram, no trigram
      3L -> "a  b",                           // doubled space: empty token kept
      4L -> " leading and trailing ",         // empty edge tokens
      5L -> "b a b a b a",                    // tie candidates "b a" vs "a b"
      6L -> "z z z z z z z z z z",            // degenerate repeat
      7L -> ("w1 w2 w3 " * 40).trim,          // longer cyclic doc
      8L -> (null: String))                   // null text: dropped by BOTH forms
      .toDF("doc_id", "text")
    val a = TextAnalysis.repetitionProfile(edge).collect().toSeq
    val b = TextAnalysis.repetitionProfileExploded(edge).collect().toSeq
    assert(a == b)
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val ra = TextAnalysis.repetitionProfile(real).collect().toSeq
    val rb = TextAnalysis.repetitionProfileExploded(real).collect().toSeq
    assert(ra.nonEmpty && ra == rb)
  }

  test("bm25Passages: MaxP surfaces a passage buried in a long document") {
    val filler = (1 to 200).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (0L, s"$filler spark window agg $filler"), // passage at tokens 201-203
      (1L, "spark something here"),
      (2L, (1 to 30).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bm25Passages(d, chunkTokens = 32, stride = 24).collect()
    // the long doc ranks FIRST: its best passage holds all three query
    // terms under PASSAGE length norm — whole-doc scoring would bury it
    // under the 403-token document norm
    assert(r.head.getAs[Long]("doc_id") == 0L)
    assert(r.head.getAs[Long]("n_query_terms") == 3L)
    // and best_chunk points at the chunk containing the planted passage
    // (chunk 8 spans token positions 193..224 ⊇ 201..203)
    assert(r.head.getAs[Int]("best_chunk") == 8)
    // the irrelevant doc never appears
    assert(!r.map(_.getAs[Long]("doc_id")).contains(2L))
  }

  test("bm25Passages reduces to document BM25 when every doc is one chunk") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val p = TextAnalysis.bm25Passages(docs,
        chunkTokens = 100000, stride = 100000)
      .select("doc_id", "n_query_terms", "bm25").collect().toSeq
    val d = TextAnalysis.bm25TopK(docs)
      .select("doc_id", "n_query_terms", "bm25").collect().toSeq
    assert(p.nonEmpty && p == d)
  }

  test("maxSimRerank: identical doc is rank 1 with MaxSim exactly 1.0") {
    // doc 0 is the query; doc 3 is byte-identical -> every chunk-pair
    // cosine is exactly 1.0, so the MaxSim sum is n_chunks * 1e6 units
    val d = docs(
      "alpha beta gamma delta epsilon",
      "alpha beta unrelated words here",
      "totally different tokens everywhere now",
      "alpha beta gamma delta epsilon")
    val r = TextAnalysis.maxSimRerank(d, nQueries = 1, legK = 3, k = 3)
      .collect()
    val top = r.filter(_.getAs[Long]("doc_id") == 3L).head
    assert(top.getAs[Int]("rank") == 1)
    assert(top.getAs[Double]("maxsim") == 1.0)
  }

  test("maxSimRerank single-chunk geometry = whole-doc cosine ordering") {
    val d = docs(
      "alpha beta gamma delta",
      "alpha beta gamma delta noise1 noise2 noise3 noise4",
      "alpha noise5 noise6 noise7 noise8 noise9 noise10 noise11")
    // chunkTok far above every doc length -> one chunk per doc, MaxSim
    // degenerates to plain cosine of whole-doc hashed count vectors:
    // the near-copy must outrank the one-shared-token doc
    val r = TextAnalysis.maxSimRerank(d, nQueries = 1, legK = 3, k = 3,
      chunkTok = 100000).collect()
    val byDoc = r.map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("maxsim")).toMap
    assert(byDoc(1L) > byDoc(2L))
    assert(r.filter(_.getAs[Int]("rank") == 1).head.getAs[Long]("doc_id") == 1L)
  }

  test("maxsim retire: anti-joined persisted index == rebuild from survivors") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val isRet = pmod(graft.functions.TextFunctions.hash60(
      concat(lit("ret_"), col("doc_id"))), lit(100)) >= 90
    val survivors = d.filter(!isRet)
    val served = TextAnalysis.maxSimRerank(survivors,
      index = Some(Dedup.retireRows(TextAnalysis.maxSimChunkVectors(d),
        d.filter(isRet).select(col("doc_id"))))).collect().toSeq
    val rebuilt = TextAnalysis.maxSimRerank(survivors).collect().toSeq
    assert(served.nonEmpty && served == rebuilt)
  }

  test("span corruption pack round-trips: input + target rebuild the doc") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val packed = TextAnalysis.spanCorruptionPack(d).collect()
    val original = d.select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(packed.nonEmpty)
    packed.foreach { r =>
      val spans = r.getAs[String]("target_text").split("<extra_id_")
        .filter(_.nonEmpty)
        .map { part =>
          val Array(id, rest) = part.split("> ", 2)
          id.toInt -> rest.stripSuffix(" ")
        }.toMap
      val rebuilt = r.getAs[String]("input_text").split(" ").flatMap { tok =>
        if (tok.startsWith("<extra_id_"))
          spans(tok.stripPrefix("<extra_id_").stripSuffix(">").toInt)
            .split(" ")
        else Array(tok)
      }.mkString(" ")
      assert(rebuilt == original(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")} did not round-trip")
      assert(r.getAs[Int]("n_spans") ==
        "<extra_id_".r.findAllIn(r.getAs[String]("input_text")).length)
    }
  }

  test("unigram Viterbi prefers the cheaper multi-char piece") {
    // 'ab' occurs 3x -> pieces a(3), b(3), ab(3), c(1); tot = 10.
    // cost(ab) = -ln(0.3) < cost(a)+cost(b) = -2ln(0.3), so the word
    // "ab" segments as the single piece, and "c" as itself.
    val d = docs("ab ab ab c")
    val seg = TextAnalysis.unigramSegment(d).collect()
      .map(r => r.getAs[String]("w") -> r.getAs[String]("seg")).toMap
    assert(seg("ab") == "ab")
    assert(seg("c") == "c")
  }

  test("unigram segmentation covers every word exactly (sf0.001)") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = TextAnalysis.unigramSegment(d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("seg").replace(" ", "") == r.getAs[String]("w"))
      assert(r.getAs[Int]("n_pieces") >= 1)
    }
  }

  test("decontaminate flags planted passage overlap, ignores vocab overlap") {
    // find doc_ids on each side of the deterministic split first
    val ids = (0L until 40L)
    val isTest = ids.map { id =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"split_$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      id -> (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 100 < 10)
    }.toMap
    val testId = ids.find(isTest).get
    val trainIds = ids.filterNot(isTest).take(3)
    val passage = "the quick brown fox jumps over the lazy dog tonight"
    val rows = Seq(
      (testId, s"held out eval doc says $passage and more words here"),
      // train doc 0: contains the full passage -> flagged
      (trainIds(0), s"training doc copies $passage exactly in the middle"),
      // train doc 1: shares vocabulary but no 8-token run -> clean
      (trainIds(1), "quick dog fox brown lazy the over jumps tonight says eval"),
      // train doc 2: unrelated -> clean
      (trainIds(2), "completely different content about spark shuffles and joins plans"))
      .toDF("doc_id", "text")
    val flagged = TextAnalysis.decontaminate(rows)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged == Set(trainIds(0)))
  }

  test("balancedSample: per-source cap, determinism, and membership") {
    val d = (0L until 100L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val s1 = TextAnalysis.balancedSample(d, perSource = 10).collect()
    val s2 = TextAnalysis.balancedSample(d, perSource = 10).collect()
    assert(s1.toSeq == s2.toSeq) // deterministic
    val bySource = s1.groupBy(_.getString(1))
    assert(bySource.keySet == Set("src0", "src1", "src2"))
    assert(bySource.values.forall(_.length == 10))
    assert(s1.map(_.getInt(2)).forall(r => r >= 1 && r <= 10))
  }

  test("curate output is a subset of every stage's survivors") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val out = SparkEntry.queries("corpus_curate")(spark, "/root/testdata/sf0.01")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val quality = TextAnalysis.qualityFilter(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = graft.operators.Dedup.keepRepresentatives(
        docs.join(TextAnalysis.qualityFilter(docs).select("doc_id"), Seq("doc_id")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.subsetOf(quality))
    assert(out.subsetOf(kept))
    assert(out.nonEmpty)
  }

  test("domain profile: one row per source, shares sum to 1, rates bounded") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val prof = TextAnalysis.domainProfile(docs).collect()
    assert(prof.length ==
      docs.select("source").distinct().count())
    // 1e-6-pinned shares: each sums to 1 within one pin per row
    val docShare = prof.map(_.getDouble(2)).sum
    val tokShare = prof.map(_.getDouble(4)).sum
    assert(math.abs(docShare - 1.0) < 1e-6 * prof.length)
    assert(math.abs(tokShare - 1.0) < 1e-6 * prof.length)
    prof.foreach { r =>
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1) // exact_dup_rate
      assert(r.getDouble(8) >= 0 && r.getDouble(8) <= 1) // neardup_rate
      assert(r.getDouble(9) >= 0 && r.getDouble(9) <= 1) // mean_quality
    }
    // near-dup participation matches the pair build it derives from
    val ndTotal = prof.map(_.getLong(7)).sum
    val ndDirect = graft.operators.Dedup
      .ngramJaccardPairs(docs)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.col("d1"),
          org.apache.spark.sql.functions.col("d2"))).as("doc_id"))
      .distinct().count()
    assert(ndTotal == ndDirect)
  }

  test("domain profile incremental: fold == full rebuild, exact-dup flips " +
      "and near-dup blast radius land in the right domains") {
    // history: doc0 unique in src1; doc1/doc2 a near-dup pair in src2
    // (jaccard 0.5); doc3 a lone src1 doc the DELTA will near-dup.
    // delta: doc10 byte-duplicates doc0 (flips doc0's exact-dup status
    // — the non-additive case); doc11 near-dups doc3 (pulls a HISTORY
    // doc into participation — the blast radius case); doc12 fresh
    // unique text in a NEW domain src3.
    val hist = Seq(
      (0L, "alpha beta gamma delta epsilon", "src1"),
      (1L, "one two three four five", "src2"),
      (2L, "one two three four six", "src2"),
      (3L, "red green blue cyan magenta", "src1"))
      .toDF("doc_id", "text", "source")
    val delta = Seq(
      (10L, "alpha beta gamma delta epsilon", "src1"),
      (11L, "red green blue cyan yellow", "src1"),
      (12L, "totally fresh unrelated words here", "src3"))
      .toDF("doc_id", "text", "source")
    val union = hist.unionByName(delta)
    val inc = TextAnalysis.domainProfileIncremental(
      TextAnalysis.domainAdditiveStats(hist),
      TextAnalysis.fpDomainIndex(hist),
      Dedup.shingled(hist),
      TextAnalysis.ndParticipants(hist),
      hist.select(col("doc_id"), col("source")),
      delta).collect()
    val full = TextAnalysis.domainProfile(union).collect()
    assert(inc.toSeq == full.toSeq, "incremental != full rebuild")
    val bySrc = inc.map(r => r.getString(0) -> r).toMap
    // exact-dup flip: doc0 AND doc10 both count in src1
    assert(bySrc("src1").getLong(5) == 2L,
      s"src1 n_exact_dup: ${bySrc("src1").getLong(5)}")
    // blast radius: doc3 (history) + doc11 (delta) participate in src1,
    // and the byte-identical doc0/doc10 pair (jaccard 1.0) adds both;
    // the history-only pair doc1/doc2 persists in src2
    assert(bySrc("src1").getLong(7) == 4L,
      s"src1 n_neardup: ${bySrc("src1").getLong(7)}")
    assert(bySrc("src2").getLong(7) == 2L)
    // the new domain appears with clean counts
    assert(bySrc("src3").getLong(1) == 1L &&
      bySrc("src3").getLong(5) == 0L && bySrc("src3").getLong(7) == 0L)
  }

  test("gated curate: denied and threshold-failing domains never ship; " +
      "admitted-domain cascade is the plain curate over the slice") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val gated = TextAnalysis.curateGated(docs, denyDomains = Seq("src19"))
      .collect()
    assert(gated.nonEmpty)
    val shippedSources = gated.map(_.getString(1)).toSet
    assert(!shippedSources.contains("src19"), "denied domain shipped")
    // recompute the gate's admitted set independently and check both
    // directions: no shipped doc outside it, and the gated output
    // equals plain curate over exactly the admitted slice
    // mirror the gate's exact integer inputs: per-source pinned-q6 sum
    // recomputed directly, near-dup counts from the profile
    import org.apache.spark.sql.functions.{col, round, lit, sum, count}
    val q6BySrc = docs.groupBy(col("source"))
      .agg(sum(round(TextAnalysis.qualityScoreCol * lit(1.0e6), 0)
        .cast("long")).as("q6_sum"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val prof = TextAnalysis.domainProfile(docs).collect()
    val admitted = prof.filter { r =>
      val (q6sum, nDocs) = q6BySrc(r.getString(0))
      val nNd = r.getLong(7)
      q6sum >= 330000L * nDocs && nNd * 100 <= 16 * nDocs &&
        r.getString(0) != "src19"
    }.map(_.getString(0)).toSet
    assert(shippedSources.subsetOf(admitted))
    val slice = docs.filter(org.apache.spark.sql.functions.col("source")
      .isInCollection(admitted))
    val plain = TextAnalysis.curate(slice).collect()
    assert(gated.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      == plain.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet)
  }

  test("curation ledger: one row per input doc, shipped set == curate output, cascade consistent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val ledger = TextAnalysis.curationLedger(docs).collect()
    assert(ledger.length == docs.count())
    val shipped = ledger.filter(_.getString(8) == "shipped")
      .map(_.getLong(0)).toSet
    val curated = TextAnalysis.curate(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(shipped == curated && shipped.nonEmpty)
    // cascade: a verdict is NULL iff the doc never reached the stage
    ledger.foreach { r =>
      val qualityPass = r.getBoolean(3)
      val nearDup = if (r.isNullAt(4)) None else Some(r.getBoolean(4))
      val isTest = r.getBoolean(5)
      val contam = if (r.isNullAt(6)) None else Some(r.getBoolean(6))
      val status = r.getString(8)
      assert(nearDup.isDefined == qualityPass)
      assert(contam.isDefined == (qualityPass && nearDup.contains(false) && !isTest))
      status match {
        case "quality"      => assert(!qualityPass)
        case "near_dup"     => assert(nearDup.contains(true))
        case "test_split"   => assert(qualityPass && nearDup.contains(false) && isTest)
        case "contaminated" => assert(contam.contains(true))
        case "source_cap"   => assert(r.getInt(7) > 10)
        case "shipped"      => assert(contam.contains(false) && r.getInt(7) <= 10)
      }
    }
  }

  test("ship manifest: fingerprint stable under any partitioning/order; funnel sums to corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val a = TextAnalysis.shipManifest(docs).collect().toSeq.map(_.toString)
    val b = TextAnalysis.shipManifest(
      docs.repartition(7, col("source")).sortWithinPartitions(col("text")))
      .collect().toSeq.map(_.toString)
    assert(a == b)
    val funnel = TextAnalysis.curationFunnel(docs).collect()
    assert(funnel.map(_.getLong(2)).sum == docs.count())
  }

  test("codegen VecL2Sq equals the HOF zip-fold, bit for bit") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 6.0, 3.5)),
                 (Seq(0.1, -0.2, 0.3), Seq(-0.4, 0.5, 0.6)))
      .toDF("a", "b")
    val rows = df.select(
      org.apache.spark.sql.graft.VecL2Sq.column(col("a"), col("b")).as("x"),
      expr("aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0D, (acc, e) -> acc + e)")
        .as("y")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows.head.getDouble(0) == 9.0 + 16.0 + 0.25)
  }

  test("scrubDenylist: whole words only, hit counts, idempotent md5") {
    val d = Seq(
      (0L, "customer data and vector math"),      // 2 whole-word hits
      (1L, "customers vectorize accustomed"),     // substrings only: 0 hits
      (2L, "customer customer customer"),         // repeated term
      (3L, "clean text")).toDF("doc_id", "text")
    val r = TextAnalysis.scrubDenylist(d).orderBy("doc_id").collect()
    assert(r.map(_.getAs[Int]("n_hits")).toSeq == Seq(2, 0, 3, 0))
    // unhit docs keep their original text byte-for-byte
    assert(r(3).getAs[String]("scrub_md5") ==
      d.filter($"doc_id" === 3L).select(md5($"text")).collect().head.getString(0))
    // scrubbed text really replaces the terms
    val scrubbed = Seq((9L, "customer one")).toDF("doc_id", "text")
    assert(TextAnalysis.scrubDenylist(scrubbed).collect().head
      .getAs[String]("scrub_md5") ==
      Seq("x").toDF("x").select(md5(lit("[REDACTED] one"))).collect().head.getString(0))
  }

  test("DenylistScrub trie equals the longest-first alternation regex " +
      "on adversarial prefix/phrase/boundary fixtures and the corpus") {
    // the regex mirror the oracle keeps at oracle-sized lists: one
    // \b-anchored alternation ordered longest-first, so leftmost-first
    // backtracking picks the longest boundary-valid branch — exactly
    // the trie's leftmost-longest contract
    def regexForm(d: org.apache.spark.sql.DataFrame,
                  terms: Seq[String]) = {
      val pattern = terms.sortBy(t => (-t.length, t))
        .mkString("\\b(", "|", ")\\b")
      d.select($"doc_id",
        regexp_count($"text", lit(pattern)).cast("int").as("n_hits"),
        md5(regexp_replace($"text", pattern, "[REDACTED]"))
          .as("scrub_md5"))
    }
    def check(d: org.apache.spark.sql.DataFrame, terms: Seq[String]) =
      assert(TextAnalysis.scrubDenylist(d, terms)
          .orderBy("doc_id").collect().toSeq ==
        regexForm(d, terms).orderBy("doc_id").collect().toSeq)

    val terms = Seq("sort agg", "sort", "merge slow join", "merge slow",
      "batch batch", "a")
    val adversarial = Seq(
      "sort aggx sort agg sort",      // phrase end-boundary fails -> word
      "merge slow joint merge slow join", // ditto at 3-word depth
      "batch batch batch",            // overlap consumed left-to-right
      "_sort sort_ sort_agg",         // underscore is a word char: 0 hits
      "über sort café",               // multibyte neighbors are non-word
      "sort",                         // whole text is one term
      "a a aa a",                     // 1-char term, repeated + embedded
      "",                             // empty text
      "SORT agg")                     // case-sensitive: no hit
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    check(adversarial, terms)
    // the real corpus against the registered phrase list
    check(Tables.documents(spark, "/root/testdata/sf0.001")
        .select($"doc_id", $"text"),
      Seq("merge slow join", "batch batch", "merge slow", "table scan",
        "sort agg", "stream", "vector", "sort"))
    // misuse fails at plan time: empty list, regex metacharacters,
    // double spaces
    for (bad <- Seq(Seq.empty[String], Seq("bad-term!"), Seq("two  gaps")))
      intercept[IllegalArgumentException] {
        TextAnalysis.scrubDenylist(adversarial, bad)
      }
  }

  test("scrubPii: planted identifiers redacted in order, counts exact, clean text untouched") {
    val d = Seq(
      (0L, "contact me at john.doe+spam@example.co.uk today"),
      (1L, "server at 192.168.100.200 and 10.0.0.1 responded"),
      (2L, "call 5551234567 or 12345678901 now"),
      // the order trap: the email's digits/dots must NOT double-count as
      // IP or number; the IP's octets must not count as digit runs
      (3L, "mail 12345678@9876543.com from 1.2.3.4 ref 99999990"),
      (4L, "clean text with no identifiers at all"),
      (5L, "short digits 123456 stay"))          // 6 digits < threshold
      .toDF("doc_id", "text")
    val r = TextAnalysis.scrubPii(d).orderBy("doc_id").collect()
    assert(r.map(_.getAs[Int]("n_emails")).toSeq == Seq(1, 0, 0, 1, 0, 0))
    assert(r.map(_.getAs[Int]("n_ipv4")).toSeq == Seq(0, 2, 0, 1, 0, 0))
    assert(r.map(_.getAs[Int]("n_long_nums")).toSeq == Seq(0, 0, 2, 1, 0, 0))
    assert(r.map(_.getAs[Boolean]("changed")).toSeq ==
      Seq(true, true, true, true, false, false))
    // redaction really lands where expected
    def cleanMd5(s: String) =
      Seq("x").toDF("x").select(md5(lit(s))).collect().head.getString(0)
    assert(r(3).getAs[String]("clean_md5") ==
      cleanMd5("mail <EMAIL> from <IP> ref <NUM>"))
    assert(r(4).getAs[String]("clean_md5") ==
      cleanMd5("clean text with no identifiers at all"))
    // idempotent: scrubbing scrubbed text changes nothing
    val once = TextAnalysis.scrubPii(d)
    val redone = TextAnalysis.scrubPii(
      Seq((9L, "mail <EMAIL> from <IP> ref <NUM>")).toDF("doc_id", "text"))
      .collect().head
    assert(!redone.getAs[Boolean]("changed"))
    assert(once.collect().length == 6)
  }

  test("docShards: every doc lands in exactly one shard, totals preserved") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val shards = TextAnalysis.docShards(d, nShards = 16).collect()
    assert(shards.map(_.getAs[Long]("n_docs")).sum == d.count())
    assert(shards.map(_.getAs[Long]("sum_chars")).sum ==
      d.agg(sum("n_chars")).collect().head.getLong(0))
    assert(shards.forall(r => r.getAs[Long]("shard") >= 0 &&
      r.getAs[Long]("shard") < 16))
  }

  test("packSequences: docs never split, packs bounded by start offset") {
    // single shard so the packing order is fully deterministic here
    val d = Seq(
      (1L, ("t " * 300).trim),   // 300 tokens
      (2L, ("t " * 300).trim),   // starts at 300 -> pack 0 (starts < 512)
      (3L, ("t " * 10).trim),    // starts at 600 -> pack 1
      (4L, ("t " * 700).trim)    // oversized doc: own pack, not split
    ).toDF("doc_id", "text")
    val r = TextAnalysis.packSequences(d, packTokens = 512, nShards = 1)
      .orderBy("pack_id").collect()
    assert(r.map(_.getAs[Long]("n_docs")).sum == 4)
    assert(r.map(_.getAs[Long]("n_tokens")).sum == 1310)
    val byPack = r.map(x => x.getAs[Long]("pack_id") -> x.getAs[Long]("n_docs"))
    assert(byPack.toSeq == Seq(0L -> 2L, 1L -> 2L))
  }

  test("VecL2Sq and VecDot are NULL on ragged inputs, like the HOF form") {
    // zip_with pads the shorter array with nulls and null propagates
    // through the fold, so the HOF form returns NULL on a length
    // mismatch; the codegen expressions pin the same semantics.
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 6.0)))
      .toDF("a", "b")
    val r = df.select(
      org.apache.spark.sql.graft.VecL2Sq.column(col("a"), col("b")).as("l2"),
      org.apache.spark.sql.graft.VecDot.column(col("a"), col("b")).as("dot"),
      expr("aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0D, (acc, e) -> acc + e)")
        .as("hof")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("vecDot matches manual dot product; norm is L2") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
      .select(Vectors.vecDot(col("a"), col("b")).as("d"),
        Vectors.vecNorm(col("a")).as("n"))
    val r = df.collect().head
    assert(r.getAs[Double]("d") == 32.0)
    assert(r.getAs[Double]("n") == math.sqrt(14.0))
  }

  test("lmScore: Laplace-smoothed unigram log-probs, exact averages") {
    val corpus = Seq(
      (0L, "the cat sat", "en"),
      (1L, "the the the", "en"),
      (2L, "zebra quux corge", "de")) // every token OOV for the en model
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.lmScore(corpus).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(r.forall(_.getAs[Long]("n_tokens") == 3))
    // train slice (docs 0,1): the=4, cat=1, sat=1 → T=6, V=3
    // p(the)=(4+1)/10=0.5, p(cat)=p(sat)=0.2, p(OOV)=1/10=0.1;
    // per-token ln rounded to 6 dp and scaled before the exact sum:
    // ln(.5)→−0.693147, ln(.2)→−1.609438, ln(.1)→−2.302585
    // raw exact-integer quotients (no final round — the half-micro
    // boundary where engine round()s disagree): s6 / 1e6 / n
    val lp = r.map(_.getAs[Double]("avg_logprob")).toSeq
    assert(lp == Seq(-3912023.0 / 1e6 / 3.0, -2079441.0 / 1e6 / 3.0,
      -6907755.0 / 1e6 / 3.0))
    assert(r.map(_.getAs[Double]("oov_rate")).toSeq == Seq(0.0, 0.0, 1.0))
    // the reference-like doc scores above the repetitive one? No —
    // repetition of a HIGH-probability token scores higher; the OOV doc
    // is the one a perplexity filter cuts
    assert(lp(2) < lp(0))
  }

  test("lmScoreIndexed: index-served scores == ad-hoc lmScore; " +
      "retire drops counts exactly; drift slices roll up doc scores") {
    val corpus = Seq(
      (0L, "the cat sat", "en"),
      (1L, "the the the", "en"),
      (2L, "zebra quux corge", "de"))
      .toDF("doc_id", "text", "lang")
    // one index, two consumers: the BM25 postings table's Σtf-per-term
    // roll-up must reproduce the ad-hoc train-slice counts exactly
    val index = TextAnalysis.bm25Index(corpus.filter($"lang" === "en"))
    val served = TextAnalysis.lmScoreIndexed(index, corpus).collect()
    val adhoc = TextAnalysis.lmScore(corpus).collect()
    assert(served.map(_.toSeq).toSeq == adhoc.map(_.toSeq).toSeq)
    // retire doc 1 from the index: the model loses 3 'the' counts
    // (T=3, V=3) and scoring the survivors equals a full recompute
    // over the surviving corpus — the family's parity contract
    val surv = corpus.filter($"doc_id" =!= 1L)
    val retired = graft.operators.Dedup.retireRows(
      index, Seq(Tuple1(1L)).toDF("doc_id"))
    val afterRetire = TextAnalysis.lmScoreIndexed(retired, surv).collect()
    val fullRecompute = TextAnalysis.lmScore(surv).collect()
    assert(afterRetire.map(_.toSeq).toSeq == fullRecompute.map(_.toSeq).toSeq)
    // drift: slice sums are the doc-level exact sums re-grouped
    val drift = TextAnalysis.lmDrift(index,
      corpus.filter($"lang" === "en"), corpus.filter($"lang" === "de"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(drift("history").getAs[Long]("n_docs") == 2L)
    assert(drift("history").getAs[Long]("n_tokens") == 6L)
    assert(drift("delta").getAs[Double]("oov_rate") == 1.0)
    // all-OOV delta scores strictly below the history self-score —
    // the signal the drift audit exists to surface
    assert(drift("delta").getAs[Double]("avg_logprob") <
      drift("history").getAs[Double]("avg_logprob"))
  }

  test("tokenPmi: a fixed phrase outranks a frequent stopword pair; " +
      "minCount floors hapax pairs") {
    // "new york" always co-occurs (8x); "the" pairs with everything;
    // "rare gem" appears once (below minCount)
    val docs = (
      (1L to 8L).map(i => (i, s"new york is the city $i the end")) :+
      (9L, "rare gem the city the end the a")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenPmi(docs, minCount = 3, k = 10).collect()
    val byPair = r.map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(byPair.contains(("new", "york")))
    // perfect collocation beats the stopword-adjacent pair
    val pmiNy = byPair(("new", "york")).getAs[Double]("pmi")
    val theCity = byPair.get(("the", "city"))
    assert(theCity.forall(_.getAs[Double]("pmi") < pmiNy))
    assert(r.head.getString(0) == "new" && r.head.getString(1) == "york")
    // hapax pair filtered by the count floor
    assert(!byPair.contains(("rare", "gem")))
    assert(r.forall(_.getAs[Long]("n_pair") >= 3))
  }

  test("bm25Prf: feedback docs donate rare terms, expanded ranking " +
      "surfaces docs the seed query cannot see; stopword gate holds") {
    // seed query hits docs 1-2; those docs also contain the rare term
    // "needle", which doc 5 (no seed terms at all) is rich in.
    // "common" appears everywhere -> df gate must exclude it.
    val docs = Seq(
      (1L, "spark window agg needle common one two three"),
      (2L, "spark window needle common four five six seven"),
      (3L, "common eight nine ten eleven twelve thirteen x"),
      (4L, "common fourteen fifteen sixteen seventeen y z w"),
      (5L, "needle needle needle common a b c d"),
      (6L, "common e f g h i j kk"),
      (7L, "common l m nn o p q r"),
      (8L, "common s tt u v ww xx yy"),
      (9L, "common z1 z2 z3 z4 z5 z6 z7"),
      (10L, "common z8 z9 za zb zc zd ze"),
      (11L, "common zf zg zh zi zj zk zl")
    ).toDF("doc_id", "text")
    val prf = TextAnalysis.bm25Prf(docs, fbDocs = 2, fbTerms = 2, k = 5)
      .collect()
    val plain = TextAnalysis.bm25TopK(docs, k = 5).collect()
    // doc 5 has zero seed terms -> invisible to the plain query...
    assert(!plain.map(_.getLong(0)).contains(5L))
    // ...and "needle" (df 3) fails the df gate here (3·10 > 11), so
    // only the feedback docs' singleton terms (df 1) expand — doc 5
    // STAYS invisible, while a feedback doc gets boosted by its own
    // donated terms ("common", df 11, must never expand)
    assert(!prf.map(_.getLong(0)).contains(5L))
    assert(prf.map(_.getLong(0)).toSet.subsetOf(Set(1L, 2L)))
    // widen the corpus so needle's df clears the gate: 30 filler docs
    val wide = docs.unionByName((12L to 41L).map(i =>
      (i, s"common filler$i fa$i fb$i fc$i fd$i fe$i ff$i"))
      .toDF("doc_id", "text"))
    val prf2 = TextAnalysis.bm25Prf(wide, fbDocs = 2, fbTerms = 2, k = 5)
      .collect()
    // now needle (df 3, 30 <= 41) expands the query and doc 5 surfaces
    assert(prf2.map(_.getLong(0)).contains(5L))
    // determinism across partitionings
    val re = TextAnalysis.bm25Prf(wide.repartition(7),
      fbDocs = 2, fbTerms = 2, k = 5).collect()
    assert(re.map(_.toSeq).toSeq == prf2.map(_.toSeq).toSeq)
  }

  test("budgetSelect: the best docs are admitted until the token " +
      "budget is spent; a budget below the best doc admits nothing") {
    // all docs 10 tokens; qualities 0.2 (all distinct), 0.1 (half
    // distinct), 0.0 (all stopword)
    val a = (1 to 10).map(i => s"tok$i").mkString(" ")
    val b = (1 to 5).map(i => s"tok$i tok$i").mkString(" ")
    val c = Seq.fill(10)("the").mkString(" ")
    val docsDf = Seq((1L, a, "en", "s1"), (2L, b, "en", "s1"),
      (3L, c, "en", "s1")).toDF("doc_id", "text", "lang", "source")
    val r40 = TextAnalysis.budgetSelect(docsDf, budgetPctTokens = 40)
      .collect().head
    assert(r40.getAs[Long]("budget_tokens") == 12L) // 40% of 30
    assert(r40.getAs[Long]("n_selected") == 1L)     // only doc 1 fits
    assert(r40.getAs[Long]("tokens_selected") == 10L)
    assert(r40.getAs[Double]("quality_bar") == 0.2)
    assert(r40.getAs[Double]("utilization") ==
      BigDecimal(10.0 / 12).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // budget 9 < the best doc's 10 tokens -> greedy prefix is empty
    val r30 = TextAnalysis.budgetSelect(docsDf, budgetPctTokens = 30)
      .collect().head
    assert(r30.getAs[Long]("n_selected") == 0L)
    assert(r30.isNullAt(r30.fieldIndex("quality_bar")))
  }

  test("qualityRankCorr: perfectly disagreeing signals score rho = -1; " +
      "a single-doc language nulls out") {
    // docA: 50x 'the' -> quality 0 (all stopword) but TOP lm score
    // (the most frequent token); docB: 50 distinct rare tokens ->
    // quality 1 but the worst lm score. Ranks exactly reversed.
    val a = Seq.fill(50)("the").mkString(" ")
    val b = (1 to 50).map(i => s"rare$i").mkString(" ")
    val docsDf = Seq((1L, a, "en", "s"), (2L, b, "en", "s"),
      (3L, "solo doc text", "zh", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.qualityRankCorr(docsDf).collect()
      .map(x => x.getAs[String]("lang") -> x).toMap
    val en = r("en")
    assert(en.getAs[Long]("n_docs") == 2L)
    assert(en.getAs[Long]("sum_d2") == 2L) // (1-2)^2 + (2-1)^2
    assert(en.getAs[Double]("spearman_rho") == -1.0)
    assert(r("zh").isNullAt(r("zh").fieldIndex("spearman_rho")))
  }

  test("ccnetBuckets: terciles split 2/2/2 with monotone score cuts " +
      "and basis-point token shares that cover the language") {
    // frequency ladder: 'a' x8 beats 'b'/'c' x4 beats four singletons
    val docsDf = Seq(
      (1L, "a a a a", "en", "s"), (2L, "a a a a", "en", "s"),
      (3L, "b c b c", "en", "s"), (4L, "b c b c", "en", "s"),
      (5L, "q r s t", "en", "s"), (6L, "u v w x", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.ccnetBuckets(docsDf).collect()
    assert(r.length == 3)
    assert(r.map(_.getAs[String]("bucket")).toSeq ==
      Seq("head", "middle", "tail"))
    assert(r.forall(_.getAs[Long]("n_docs") == 2L))
    assert(r.forall(_.getAs[Long]("token_share_bp") == 3333L))
    val cuts = r.map(_.getAs[Double]("cut_logprob"))
    assert(cuts(0) > cuts(1) && cuts(1) > cuts(2), cuts.toSeq)
  }

  test("boilerplateAudit: a shared header tops its source at " +
      "rate 10000 bp; short docs audit their whole text") {
    val hdr = "h1 h2 h3 h4 h5"
    val docsDf = Seq(
      (1L, s"$hdr body one ff1 f2 f3 f4 f5", "en", "s1"),
      (2L, s"$hdr body two gg1 g2 g3 g4 g5", "en", "s1"),
      (3L, s"$hdr body three ff1 f2 f3 f4 f5", "en", "s1"),
      (4L, s"$hdr body four hh1 h2 h3 h4 h5", "en", "s1"),
      (5L, "tiny doc", "en", "s2")) // < 5 tokens
      .toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.boilerplateAudit(docsDf).collect()
    val s1h = r.filter(x => x.getAs[String]("source") == "s1" &&
      x.getAs[String]("kind") == "header")
    assert(s1h.head.getAs[String]("snippet") == hdr)
    assert(s1h.head.getAs[Long]("cnt") == 4L)
    assert(s1h.head.getAs[Long]("rate_bp") == 10000L)
    val s1f = r.filter(x => x.getAs[String]("source") == "s1" &&
      x.getAs[String]("kind") == "footer")
    assert(s1f.head.getAs[String]("snippet") == "ff1 f2 f3 f4 f5")
    assert(s1f.head.getAs[Long]("cnt") == 2L)
    assert(s1f.head.getAs[Long]("rate_bp") == 5000L)
    // the 2-token doc contributes its whole text as both candidates
    val s2 = r.filter(_.getAs[String]("source") == "s2")
    assert(s2.length == 2 &&
      s2.forall(_.getAs[String]("snippet") == "tiny doc"))
  }

  test("dsirSelect: a raw doc that shares the target slice's grams " +
      "outranks one that shares none; only raw-pool docs are emitted") {
    val tgtText = "alpha beta alpha beta gamma alpha"
    val docsDf = (
      (1L to 4L).map(i => (i, tgtText, "en", "tgt")) ++ Seq(
        (10L, "alpha beta alpha beta", "en", "raw"),  // target-like
        (11L, "zeta eta theta iota", "en", "raw")))   // alien grams
      .toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.dsirSelect(docsDf, Seq("tgt")).collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSet == Set(10L, 11L))
    val byId = r.map(x => x.getAs[Long]("doc_id") -> x).toMap
    // 4 unigrams + 3 bigrams each
    assert(r.forall(_.getAs[Long]("n_feats") == 7L))
    val w10 = byId(10L).getAs[Double]("logw")
    val w11 = byId(11L).getAs[Double]("logw")
    assert(w10 > w11, s"w10=$w10 w11=$w11")
    assert(r.head.getAs[Long]("doc_id") == 10L) // ordered by logw desc
    // content-stable across partitionings
    val re = TextAnalysis.dsirSelect(docsDf.repartition(5), Seq("tgt"))
      .collect()
    assert(re.map(_.toSeq).toSeq == r.map(_.toSeq).toSeq)
  }

  test("stratifiedSplit: quotas are exact in every stratum, a " +
      "1-doc stratum lands in train, assignment is rerun-stable") {
    val docsDf = ((1L to 10L).map(i => (i, "t", "en", "s1")) :+
      (99L, "t", "zh", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.stratifiedSplit(docsDf).collect()
    val en = r.filter(_.getAs[String]("lang") == "en")
    assert(en.count(_.getAs[String]("split") == "train") == 8)
    assert(en.count(_.getAs[String]("split") == "val") == 1)
    assert(en.count(_.getAs[String]("split") == "test") == 1)
    // quota order: train ranks strictly below val below test
    val bySplit = en.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("rank_in_stratum")).max).toMap
    assert(bySplit("train") < bySplit("val") &&
      bySplit("val") < bySplit("test"))
    // ceil quota puts a singleton stratum entirely in train
    val zh = r.filter(_.getAs[String]("lang") == "zh")
    assert(zh.length == 1 && zh.head.getAs[String]("split") == "train")
    assert(TextAnalysis.stratifiedSplit(docsDf).collect().toSeq ==
      r.toSeq) // content-stable
  }

  test("heapsFit: growth points accumulate tokens and first-seen " +
      "types; the log-log OLS recovers the hand-computed slope") {
    val docsDf = Seq((1L, "a b"), (2L, "a c"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.heapsFit(docsDf).collect().head
    assert(r.getAs[Long]("n_points") == 3L)
    assert(r.getAs[Long]("n_tokens") == 8L) // 2 + 2 + 4
    assert(r.getAs[Long]("n_types") == 4L)  // a b c d
    // points: (2,2) (4,3) (8,4) — recompute with the impl's exact
    // decimal accumulation and boundary double formula
    val xs = Seq(2L, 4L, 8L).map(v =>
      BigDecimal(math.log10(v.toDouble))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP))
    val ys = Seq(2L, 3L, 4L).map(v =>
      BigDecimal(math.log10(v.toDouble))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP))
    val xys = xs.zip(ys).map { case (a, b) =>
      BigDecimal(a.toDouble * b.toDouble)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP) }
    val xxs = xs.map(a => BigDecimal(a.toDouble * a.toDouble)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP))
    val (sx, sy, sxy, sxx) =
      (xs.sum.toDouble, ys.sum.toDouble, xys.sum.toDouble, xxs.sum.toDouble)
    val n = 3.0
    val den = n * sxx - sx * sx
    val beta = BigDecimal((n * sxy - sx * sy) / den)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("heaps_beta") == beta)
    assert(beta > 0 && beta < 1) // sublinear growth
  }

  test("rakeKeyphrases: multi-word phrases outrank constituents via " +
      "degree; stopwords split runs; long runs dropped") {
    val docsDf = Seq((1L, "new york is the big apple"),
      (2L, "big apple pie")).toDF("doc_id", "text")
    val r = TextAnalysis.rakeKeyphrases(docsDf).collect()
    val m = r.map(x => x.getString(0) -> x).toMap
    // freq/deg: big 2/5, apple 2/5, pie 1/3, new 1/2, york 1/2
    // -> ratios 2.5, 2.5, 3, 2, 2 (x1e12, exact)
    assert(r.head.getString(0) == "big apple pie") // 8e12 leads
    assert(m("big apple pie").getAs[Long]("score_micro") ==
      8000000000000L)
    assert(m("big apple").getAs[Long]("score_micro") == 5000000000000L)
    assert(m("new york").getAs[Long]("score_micro") == 4000000000000L)
    assert(m("new york").getAs[Int]("n_words") == 2)
    assert(m("big apple").getAs[Long]("n_occurrences") == 1L)
    assert(!m.contains("is") && !m.contains("the")) // stop tokens
    // a 5-word non-stop run exceeds maxPhraseLen and is dropped
    val long5 = TextAnalysis.rakeKeyphrases(
      Seq((1L, "a b c d e f")).toDF("doc_id", "text")).collect()
    assert(long5.isEmpty)
  }

  test("assocRules: co-occurring pair gets confidence/lift; ubiquitous " +
      "token df-capped; rarest-K itemset cap bounds pairs") {
    // "ale" and "rye" co-occur in 3 of 6 docs; "common" is in all 6
    // (df-capped at 0.8*6=4.8); "solo" appears twice but never with a
    // partner at support >= 2 except via doc 5's capped itemset
    val docs = Seq(
      (1L, "common ale rye"), (2L, "common ale rye"),
      (3L, "common ale rye"), (4L, "common solo"),
      (5L, "common solo zzzz"), (6L, "common zzzz")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.assocRules(docs, minSupport = 2,
      dfCapFrac = 0.8, minLen = 3, itemsPerDoc = 12, k = 10).collect()
    val byPair = r.map(x => (x.getString(0), x.getString(1)) -> x).toMap
    // common is in 6/6 docs -> df 6 > 4.8 -> excluded everywhere
    assert(!byPair.keys.exists(p => p._1 == "common" || p._2 == "common"))
    val ar = byPair(("ale", "rye"))
    assert(ar.getAs[Long]("supp_ab") == 3L)
    assert(ar.getAs[Double]("conf_a_b") == 1.0) // ale -> rye always
    // lift = 6*3/(3*3) = 2.0
    assert(ar.getAs[Double]("lift") == 2.0)
    // solo+zzzz co-occur once -> below the support floor
    assert(!byPair.contains(("solo", "zzzz")))
    // itemset cap: with itemsPerDoc=1 no doc contributes a pair
    assert(TextAnalysis.assocRules(docs, minSupport = 1,
      dfCapFrac = 1.0, minLen = 3, itemsPerDoc = 1, k = 10).count() == 0L)
  }

  test("corpusGini: uniform mass scores ~0, full concentration " +
      "approaches 1, hand-computed middle case") {
    def doc(id: Long, lang: String, nTok: Int) =
      (id, (1 to nTok).map(i => s"w$i").mkString(" "), lang)
    val docs = (
      (1L to 4L).map(doc(_, "eq", 10)) ++            // all equal -> G=0
      (Seq(doc(10L, "cc", 1), doc(11L, "cc", 1),
        doc(12L, "cc", 1), doc(13L, "cc", 97)) ++    // one whale
      Seq(doc(20L, "mid", 1), doc(21L, "mid", 2),
        doc(22L, "mid", 3)))                          // G = 2*... hand
      ).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.corpusGini(docs).collect()
      .map(x => x.getString(0) -> x.getAs[Double]("gini")).toMap
    assert(r("eq") == 0.0)
    // whale: x=(1,1,1,97) asc, swx=1+2+3+388=394, n=4, S=100
    // G = 2*394/400 - 5/4 = 1.97 - 1.25 = 0.72
    assert(math.abs(r("cc") - 0.72) < 1e-12)
    // mid: x=(1,2,3), swx=1+4+9=14, G = 28/18 - 4/3 = 2/9
    assert(math.abs(r("mid") - 2.0 / 9.0) < 1e-12)
  }

  test("readability: heuristic counters and fixed-coefficient scores") {
    val docs = Seq(
      // 6 words, 2 sentences, syllable groups counted as vowel runs
      (0L, "the cat sat down. the end!"),
      // no terminator -> sentence floor of 1
      (1L, "no punctuation here")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs).collect()
    val d0 = r(0)
    assert(d0.getAs[Long]("n_words") == 6L)
    assert(d0.getAs[Long]("n_sentences") == 2L)
    // e|a|a|o(w)|e|e -> "the"=1, "cat"=1, "sat"=1, "down"=1 (ow run),
    // "the"=1, "end"=1 = 6 vowel runs
    assert(d0.getAs[Long]("n_syllables") == 6L)
    val wps = 6.0 / 2.0; val spw = 6.0 / 6.0
    assert(d0.getAs[Double]("flesch_ease") ==
      206.835 - 1.015 * wps - 84.6 * spw)
    assert(d0.getAs[Double]("fk_grade") ==
      0.39 * wps + 11.8 * spw - 15.59)
    assert(r(1).getAs[Long]("n_sentences") == 1L)
  }

  test("qualityTopDecile keeps exactly each source's top decile") {
    // 10 docs, one source, strictly increasing quality (more distinct
    // non-stop tokens → higher length factor) → ntile(10) puts one doc
    // per decile and only the best survives
    val corpus = (0 until 10).map { i =>
      (i.toLong, (0 to i + 1).map(j => s"w$j").mkString(" "), "A")
    }.toDF("doc_id", "text", "source")
    val r = TextAnalysis.qualityTopDecile(corpus).collect()
    assert(r.length == 1)
    assert((r.head.getString(0), r.head.getLong(1)) == (("A", 9L)))
  }

  test("lmScoreBigram: seen bigrams score c(b)/c(prefix), unseen back off") {
    val corpus = Seq(
      (0L, "a b a b", "en"), // train bigrams: (a,b)×2, (b,a)×1
      (1L, "a b", "en"),     // train: (a,b) → bigram (a,b) total 3
      (2L, "a z", "de"))     // unseen bigram → stupid backoff
      .toDF("doc_id", "text", "lang")
    // train unigrams: a=3, b=3 → T=6, V=2
    val r = TextAnalysis.lmScoreBigram(corpus).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(r.map(_.getAs[Long]("n_bigrams")).toSeq == Seq(3L, 1L, 1L))
    val lp = r.map(_.getAs[Double]("avg_logscore")).toSeq
    // doc0: ln(3/3)=0 twice + ln(1/3)→−1098612 → s6/1e6/3
    // doc1: ln(3/3) = 0
    // doc2: ln(0.4 · (0+1)/(6+2+1)) = ln(0.044444…) → −3113515
    assert(lp == Seq(-1098612.0 / 1e6 / 3.0, 0.0, -3113515.0 / 1e6))
    assert(r.map(_.getAs[Double]("backoff_rate")).toSeq == Seq(0.0, 0.0, 1.0))
  }

  test("mixtureTemperature: α=0.5 up-weights small sources, exact rates") {
    // A: 400 docs, B: 100 → √: 20 + 10 = 30; N = 500, targetFrac = 0.5
    // keep_A = 0.5·500·(20/30)/400 = 0.416667, keep_B = …(10/30)/100 = 0.833333
    val corpus = ((0 until 400).map(i => (i.toLong, s"tok$i", "A")) ++
      (400 until 500).map(i => (i.toLong, s"tok$i", "B")))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.mixtureTemperature(corpus).collect()
    val bySrc = r.map(x => x.getString(0) ->
      ((x.getAs[Long]("n_total"), x.getAs[Double]("keep_rate"),
        x.getAs[Long]("n_kept")))).toMap
    // raw rate doubles (no final round), same op order as the Column
    assert(bySrc("A")._1 == 400 &&
      bySrc("A")._2 == 0.5 * 500 * (20.0 / 30.0) / 400)
    assert(bySrc("B")._1 == 100 &&
      bySrc("B")._2 == 0.5 * 500 * (10.0 / 30.0) / 100)
    // the Bernoulli is content-stable; counts land near n·rate
    assert(bySrc("A")._3 > 100 && bySrc("A")._3 < 300)
    assert(bySrc("B")._3 > 50 && bySrc("B")._3 <= 100)
  }

  test("vocabCoverage: cumulative fractions over the top-k vocabulary") {
    val r = TextAnalysis.vocabCoverage(docs("a a a b b c"), k = 2).collect()
    assert(r.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2))
    assert(r.map(_.getAs[String]("t")).toSeq == Seq("a", "b"))
    assert(r.map(_.getAs[Long]("cnt")).toSeq == Seq(3L, 2L))
    // 3/6 and 5/6 of all token occurrences (raw quotients)
    assert(r.map(_.getAs[Double]("cum_frac")).toSeq ==
      Seq(3.0 / 6.0, 5.0 / 6.0))
  }

  test("chunkDocs: overlapping windows cover every token, trailing chunk kept") {
    // 5 tokens, chunk 3, stride 2 → starts 1,3,5 → windows of 3,3,1
    val r = TextAnalysis.chunkDocs(docs("t0 t1 t2 t3 t4"),
      chunkTokens = 3, stride = 2).collect()
    assert(r.map(_.getAs[Int]("chunk_idx")).toSeq == Seq(0, 1, 2))
    assert(r.map(_.getAs[Int]("n_chunk_tokens")).toSeq == Seq(3, 3, 1))
    def hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.map(_.getAs[String]("chunk_md5")).toSeq ==
      Seq(hex("t0 t1 t2"), hex("t2 t3 t4"), hex("t4")))
  }

  test("cdcChunks: chunks partition the token stream, boundaries are content-defined") {
    val text = (1 to 64).map(i => s"w$i").mkString(" ")
    val r = TextAnalysis.cdcChunks(docs(text), divisor = 4).collect()
    // partition: starts chain (each chunk begins where the previous
    // ended) and lengths cover every token exactly once
    assert(r.head.getAs[Int]("start_i") == 1)
    r.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Int]("start_i") ==
          a.getAs[Int]("start_i") + a.getAs[Int]("n_chunk_tokens"))
      case _ =>
    }
    assert(r.map(_.getAs[Int]("n_chunk_tokens")).sum == 64)
    assert(r.length > 1) // divisor 4 over 64 tokens must cut somewhere
  }

  test("cdcChunks resynchronize after an insertion; fixed-stride does not") {
    val base = (1 to 48).map(i => s"w$i").mkString(" ")
    val orig = TextAnalysis.cdcChunks(docs(base), divisor = 4)
      .collect().map(_.getAs[String]("chunk_md5")).toSet
    val shifted = TextAnalysis.cdcChunks(docs("zz0 zz1 zz2 " + base), divisor = 4)
      .collect().map(_.getAs[String]("chunk_md5")).toSet
    // every chunk after the first cut point inside `base` is unchanged
    // by the 3-token prefix insertion — the CDC property
    assert((orig intersect shifted).size >= orig.size - 1)
    // the fixed-stride chunker loses every chunk to the same shift
    val fsOrig = TextAnalysis.chunkDocs(docs(base),
        chunkTokens = 8, stride = 8)
      .collect().map(_.getAs[String]("chunk_md5")).toSet
    val fsShift = TextAnalysis.chunkDocs(docs("zz0 zz1 zz2 " + base),
        chunkTokens = 8, stride = 8)
      .collect().map(_.getAs[String]("chunk_md5")).toSet
    assert((fsOrig intersect fsShift).isEmpty)
  }

  test("cdcDupChunks: shared passage found at different offsets") {
    val shared = (1 to 40).map(i => s"s$i").mkString(" ")
    val r = TextAnalysis.cdcDupChunks(docs(
        "x1 x2 " + shared,
        "y1 " + shared + " y2"), divisor = 4).collect()
    // resynchronized chunks inside the shared passage dedup across the
    // two docs despite the different offsets
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Long]("n_copies") == 2L))
    assert(r.forall(_.getAs[Long]("first_doc") == 0L))
  }

  test("bm25TopK: coverage beats repetition, absent terms drop the doc") {
    val corpus = docs(
      "spark window agg runs fast",       // all 3 query terms once
      "spark spark spark spark the the",  // one term, saturated tf
      "the cat sat on the mat",           // no query terms
      "window filler filler filler filler filler filler filler")
    val r = TextAnalysis.bm25TopK(corpus).collect()
    // doc 2 has no query terms → absent entirely
    assert(!r.map(_.getAs[Long]("doc_id")).contains(2L))
    val byId = r.map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(byId(0L).getAs[Long]("n_query_terms") == 3L)
    assert(byId(1L).getAs[Long]("n_query_terms") == 1L)
    // 3 distinct terms in a short doc outrank 4 copies of one term
    assert(r.head.getAs[Long]("doc_id") == 0L)
    // k1 saturation: 4× tf is worth far less than 4× the single-hit
    // score of the same term at similar length
    val single = byId(3L).getAs[Double]("bm25")
    assert(byId(1L).getAs[Double]("bm25") < 4.0 * single)
  }

  test("bm25TopK: second query set — decontaminate-style passage query ranks its source doc first") {
    // the decontamination-triage use: tokenize a benchmark passage and
    // BM25 the corpus with its terms — the doc embedding the passage
    // must outrank topical chatter that shares only scattered terms
    val passage = "eval benchmark answer exact match score"
    val corpus = docs(
      "intro text then " + passage + " then trailing text",   // embeds it
      "benchmark the score of the score of the benchmark",     // 2 terms, repeated
      "eval things answer things match things",                // 3 terms spread
      "totally unrelated filler tokens here")
    val terms = passage.split(" ").toSeq
    val r = TextAnalysis.bm25TopK(corpus, queryTerms = terms, k = 3).collect()
    assert(r.head.getAs[Long]("doc_id") == 0L)
    assert(r.head.getAs[Long]("n_query_terms") == 6L)
    assert(!r.map(_.getAs[Long]("doc_id")).contains(3L))
    // and the parameterization really changes the ranking: the default
    // set scores this corpus entirely differently (no spark/window/agg)
    assert(TextAnalysis.bm25TopK(corpus).collect().isEmpty)
  }

  test("langIdConfusion: diagonal is per-language recall, mislabels land off-diagonal") {
    val corpus = Seq(
      (0L, "the cat of a house is here", "en"),
      (1L, "a list of the and to in is", "en"),
      (2L, "el la de que y en", "es"),
      (3L, "the dog of a yard is there", "es"), // mislabeled: English text
      (4L, "zz qq ww rr", "fr"))               // no markers -> 'und'
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.langIdConfusion(corpus).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(r(("en", "en")).getAs[Long]("n") == 2L)
    assert(r(("en", "en")).getAs[Double]("share") == 1.0)
    assert(r(("en", "en")).getAs[Boolean]("correct"))
    // the mislabeled doc shows up as an es->en cell at share 0.5
    assert(r(("es", "en")).getAs[Long]("n") == 1L)
    assert(r(("es", "en")).getAs[Double]("share") == 0.5)
    assert(!r(("es", "en")).getAs[Boolean]("correct"))
    assert(r(("es", "es")).getAs[Double]("share") == 0.5)
    assert(r(("fr", "und")).getAs[Long]("n") == 1L)
  }

  test("lshRecallAudit: identical docs always detected, theory tracks the S-curve") {
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'z').map(_.toString)
    val base = (0 until 30).map { _ =>
      (0 until (10 + rnd.nextInt(15)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // 5 exact duplicates on top of the random chatter
    val corpus = docs(base ++ base.take(5): _*)
    val r = Dedup.lshRecallAudit(corpus).collect()
    val byBand = r.map(x => x.getInt(0) -> x).toMap
    // J = 1.0: identical shingle sets -> identical signatures -> every
    // band collides -> measured recall 1.0, and the S-curve agrees
    assert(byBand(9).getAs[Double]("recall") == 1.0)
    assert(byBand(9).getAs[Double]("recall_theoretical") == 1.0)
    r.foreach { row =>
      val rec = row.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(row.getAs[Long]("n_detected") <= row.getAs[Long]("n_truth"))
      val th = row.getAs[Double]("recall_theoretical")
      assert(th >= 0.0 && th <= 1.0)
    }
  }

  test("containmentPairs: a quote inside a long doc is caught where Jaccard misses") {
    val quote = "q1 q2 q3 q4 q5"
    val corpus = docs(
      quote,                                                    // 0: the excerpt
      s"x1 x2 x3 $quote y1 y2 y3 y4 y5 y6 y7 y8 y9 y10",        // 1: embeds it
      "totally different words in this one entirely unrelated") // 2
    val r = Dedup.containmentPairs(corpus, threshold = 0.6).collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getLong(0), row.getLong(1)) == ((0L, 1L)))
    // every shingle of the quote appears in doc 1 -> containment 1.0,
    // while the size mismatch keeps Jaccard far below the 0.5 dedup cut
    assert(row.getAs[Double]("containment") == 1.0)
    assert(row.getAs[Double]("jaccard") < 0.5)
  }

  test("zipfFit: exact power-law slope, flat distribution fits slope 0") {
    // counts 8 and 2 at ranks 1 and 2: slope = log10(2/8)/log10(2) = -2
    // exactly, intercept = log10(8)
    val twoPoint = Seq((0L, (("aa " * 8) + ("bb " * 2)).trim, "en"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.zipfFit(twoPoint).collect().head
    assert(r.getAs[Long]("n_types") == 2L && r.getAs[Long]("n_tokens") == 10L)
    assert(r.getAs[Double]("zipf_slope") == -2.0)
    assert(r.getAs[Double]("zipf_intercept") ==
      BigDecimal(math.log10(8)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // every type equally frequent -> y constant -> slope exactly 0
    val flat = Seq((0L, "aa bb cc aa bb cc", "fr")).toDF("doc_id", "text", "lang")
    val f = TextAnalysis.zipfFit(flat).collect().head
    assert(f.getAs[Double]("zipf_slope") == 0.0)
  }

  test("prefixSimJoin: exact pairs, and equals uncapped brute force on a random corpus") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = base.replace("kappa", "lambda") // differs in 1 of 8 shingles
    val boiler = (0 until 5).map(i => s"common one two three unique$i tail$i end$i")
    val corpus = docs(Seq(base, base, near) ++ boiler: _*)
    val r = Dedup.prefixSimJoin(corpus).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    // dup pair at 1.0, near pair at 7/9; boilerplate docs share only
    // their 2 template shingles (J = 0.25) -> below tau, absent
    assert(r == Set((0L, 1L, 1.0), (0L, 2L, 0.777778), (1L, 2L, 0.777778)))

    // completeness: prefix filtering must equal the UNCAPPED inverted-
    // index brute force on an arbitrary corpus (seeded random)
    val rnd = new scala.util.Random(42)
    val vocab = ('a' to 'p').map(_.toString)
    val randomDocs = docs((0 until 40).map { _ =>
      (0 until (8 + rnd.nextInt(20))).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }: _*)
    val pf = Dedup.prefixSimJoin(randomDocs, tau = 0.3).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val bf = Dedup.ngramJaccardPairs(randomDocs, threshold = 0.3,
      maxDf = Int.MaxValue).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(pf == bf)
  }

  test("hybridSearch: RRF favors both-leg hits; dense-only and lex-only docs both surface") {
    val corpus = docs(
      "alpha beta gamma",         // 0: query doc
      "delta epsilon zeta",       // 1: query doc
      "alpha beta gamma",         // 2: full lex match of q0
      "alpha filler filler",      // 3: partial lex match of q0
      "nolex tokens here",        // 4: dense-only neighbor of q0
      "unrelated words entirely") // 5: neither leg
    val emb = Seq(
      (0L, Array(1f, 0f, 0f), 0),
      (1L, Array(0f, 1f, 0f), 0),
      (2L, Array(0.9f, 0.1f, 0f), 0),     // cos(q0) ~ .994
      (3L, Array(0f, 0f, 1f), 0),         // orthogonal to q0
      (4L, Array(0.95f, 0f, 0.05f), 0),   // cos(q0) ~ .999 -> dense rank 1
      (5L, Array(0f, 0.1f, 1f), 0)).toDF("vec_id", "embedding", "label")
    val r = TextAnalysis.hybridSearch(corpus, emb, nQueries = 2, legK = 3, k = 4)
      .collect().filter(_.getAs[Long]("query_id") == 0L)
    val byDoc = r.map(x => x.getAs[Long]("doc_id") -> x).toMap
    // doc 2 hits BOTH legs (lex 1, dense 2) -> fused rank 1, and its
    // rrf is exactly the two-reciprocal sum
    assert(r.head.getAs[Long]("doc_id") == 2L)
    assert(byDoc(2L).getAs[Double]("rrf") ==
      BigDecimal(1.0 / 61 + 1.0 / 62)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // doc 4 shares no terms: surfaces through the dense leg alone
    assert(byDoc(4L).isNullAt(byDoc(4L).fieldIndex("lex_rank")))
    assert(byDoc(4L).getAs[Int]("rank") == 2)
    // doc 3's embedding is orthogonal: surfaces through lex alone
    assert(byDoc(3L).isNullAt(byDoc(3L).fieldIndex("ann_rank")))
    // both-legs beats any single leg; leg rank 1 beats leg rank 2
    assert(byDoc(2L).getAs[Double]("rrf") > byDoc(4L).getAs[Double]("rrf"))
    assert(byDoc(4L).getAs[Double]("rrf") > byDoc(3L).getAs[Double]("rrf"))
  }

  test("incremental BM25: refreshed index equals full recompute; refresh is idempotent") {
    val hist = docs(
      "spark stream merge runs in a batch window",
      "merge merge merge batch",
      "the quick brown fox")
    val delta = Seq(
      (10L, "stream batch stream merge"),
      (11L, "nothing relevant here"))
      .toDF("doc_id", "text")
    val full = hist.unionByName(delta)
    val terms = Seq("stream", "merge", "batch")
    val idx = TextAnalysis.bm25Index(hist)
    val refreshed = TextAnalysis.refreshBm25Index(idx, delta)
    val viaIndex = TextAnalysis.bm25QueryIndex(refreshed, terms).collect().toSeq
    val direct = TextAnalysis.bm25TopK(full, terms).collect().toSeq
    assert(viaIndex.nonEmpty && viaIndex == direct)
    // idempotence: re-appending the same batch must not double-count
    val twice = TextAnalysis.refreshBm25Index(refreshed, delta)
    assert(TextAnalysis.bm25QueryIndex(twice, terms).collect().toSeq == direct)
    // history text is never re-tokenized: with the index from parquet,
    // the query plan reads exactly the index scan (plus nothing else)
    val base = Files.createTempDirectory("graft_bm25inc").toString
    refreshed.write.mode("overwrite").parquet(s"$base/idx.parquet")
    val out = TextAnalysis.bm25QueryIndex(
      spark.read.parquet(s"$base/idx.parquet"), terms)
    val leaves = out.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.length == 3, // corpus stats, tf, dfreq — all off the index
      s"expected 3 index-scan leaves, got ${leaves.length}")
    assert(out.collect().toSeq == direct)
  }

  test("incremental passage BM25: index-served MaxP equals the live form; no text at query time") {
    val filler = (1 to 80).map(i => s"f$i").mkString(" ")
    val hist = docs(
      s"$filler stream merge batch $filler",
      "stream something here",
      "the quick brown fox")
    val delta = Seq(
      (10L, s"merge batch $filler stream stream"),
      (11L, "nothing relevant here"))
      .toDF("doc_id", "text")
    val full = hist.unionByName(delta)
    val terms = Seq("stream", "merge", "batch")
    val idx = TextAnalysis.bm25PassageIndex(hist, 32, 24)
    val refreshed = TextAnalysis.refreshBm25PassageIndex(idx, delta, 32, 24)
    val viaIndex = TextAnalysis.bm25QueryPassageIndex(refreshed, terms)
      .collect().toSeq
    val direct = TextAnalysis.bm25Passages(full, terms,
      chunkTokens = 32, stride = 24).collect().toSeq
    assert(viaIndex.nonEmpty && viaIndex == direct)
    // idempotence: re-appending the same batch must not double-count
    val twice = TextAnalysis.refreshBm25PassageIndex(refreshed, delta, 32, 24)
    assert(TextAnalysis.bm25QueryPassageIndex(twice, terms)
      .collect().toSeq == direct)
    // the corpus is chunked exactly ONCE (at index build): with the
    // index from parquet, query-time leaves are index scans only —
    // corpus stats, tf, and chunk-frequency all derive from the index
    val base = Files.createTempDirectory("graft_bm25pinc").toString
    refreshed.write.mode("overwrite").parquet(s"$base/idx.parquet")
    val out = TextAnalysis.bm25QueryPassageIndex(
      spark.read.parquet(s"$base/idx.parquet"), terms)
    val leaves = out.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.length == 3,
      s"expected 3 index-scan leaves, got ${leaves.length}")
    assert(out.collect().toSeq == direct)
  }

  test("noveltySpanScores: 0 for copies, 1 for new, exact fraction between") {
    val hist = docs("h1 h2 h3 h4 h5")
    val idx = TextAnalysis.spanShingleIndex(hist, k = 3)
    val delta = Seq(
      (10L, "h1 h2 h3 h4 h5"),   // verbatim copy → novelty 0
      (11L, "h1 h2 h3 n1 n2"),   // 1 of 3 windows seen → 2/3
      (12L, "z1 z2 z3 z4"),      // fully new → 1
      (13L, "q1 q2"))            // < k tokens → excluded
      .toDF("doc_id", "text")
    val r = TextAnalysis.noveltySpanScores(idx, delta, k = 3)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_windows"), x.getAs[Long]("n_seen"),
          x.getAs[Double]("novelty"))).toMap
    assert(r.keySet == Set(10L, 11L, 12L))
    assert(r(10L) == ((3L, 3L, 0.0)))
    assert(r(11L) == ((3L, 1L, 2.0 / 3.0)))
    assert(r(12L) == ((2L, 0L, 1.0)))
  }

  test("chunkClusters: shared passages bridge documents transitively") {
    // doc0~doc1 share block B, doc1~doc2 share block C (4-token chunks,
    // stride 4): one transitive cluster {0,1,2} with rep 0; doc3 shares
    // nothing and stays out of the cluster frame entirely
    val r = TextAnalysis.chunkClusters(docs(
        "a1 a2 a3 a4 b1 b2 b3 b4",
        "b1 b2 b3 b4 c1 c2 c3 c4",
        "c1 c2 c3 c4 d1 d2 d3 d4",
        "e1 e2 e3 e4"),
      chunkTokens = 4, stride = 4).collect()
    assert(r.map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("cluster_rep")))
      .toSeq == Seq((0L, 0L), (1L, 0L), (2L, 0L)))
  }

  test("qualityDrift: halves partition each source, shares are exact") {
    val corpus = (0 until 300).map { i =>
      (i.toLong, (("tok" + i % 7 + " ") * (10 + i % 40)).trim, s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    val r = TextAnalysis.qualityDrift(corpus).collect()
    // every doc lands in exactly one (source, decile, half) cell
    assert(r.map(x => x.getAs[Long]("n_a") + x.getAs[Long]("n_b")).sum == 300)
    r.foreach { x =>
      val d = x.getAs[Int]("decile")
      assert(d >= 0 && d <= 9)
      assert(x.getAs[Double]("abs_drift") >= 0.0)
    }
    // per-source shares each sum to 1 (exact-integer quotients)
    r.groupBy(_.getAs[String]("source")).values.foreach { rows =>
      assert(math.abs(rows.map(_.getAs[Double]("share_a")).sum - 1.0) < 1e-12)
      assert(math.abs(rows.map(_.getAs[Double]("share_b")).sum - 1.0) < 1e-12)
    }
    // partitioning-invariant: the salted-hash halves and integer
    // arithmetic cannot depend on physical layout
    val r2 = TextAnalysis.qualityDrift(corpus.repartition(7)).collect()
    assert(r.toSeq == r2.toSeq)
  }

  test("splitAudit: shares sum to 1 per split, totals preserved") {
    val corpus = (0 until 200)
      .map(i => (i.toLong, s"doc $i", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.splitAudit(corpus).collect()
    assert(r.map(_.getAs[Long]("n")).sum == 200)
    val bySplit = r.groupBy(_.getString(0))
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    bySplit.values.foreach { rows =>
      assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-12)
    }
  }

  test("chunkDupes groups repeated passages across documents") {
    // docs 0 and 1 share their only chunk verbatim; doc 2 is unique
    val r = TextAnalysis.chunkDupes(docs("x y z", "x y z", "a b c"),
      chunkTokens = 3, stride = 3).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_chunks") == 2)
    assert(r.head.getAs[Long]("n_docs") == 2)
    assert(r.head.getAs[Long]("rep_doc") == 0L)
  }

  test("duplicatedSpans: exact shared substrings become maximal spans") {
    // doc0 and doc1 share the 5-token run "a b c d e" at DIFFERENT
    // offsets — the any-offset case fixed-stride chunk dedup misses
    val r = TextAnalysis.duplicatedSpans(
      docs("a b c d e x y z", "p q a b c d e r"), k = 3)
      .collect().map(x => (x.getAs[Long]("doc_id"),
        x.getAs[Long]("span_start"), x.getAs[Long]("span_end"),
        x.getAs[Long]("span_tokens"), x.getAs[Long]("n_windows")))
    assert(r.toSeq == Seq((0L, 1L, 5L, 5L, 3L), (1L, 3L, 7L, 5L, 3L)))
  }

  test("duplicatedSpans: windows within gap k merge, beyond k break") {
    // docX's duplicated positions are {1,4} (gap 3 = k → one merged
    // span over the whole doc); docY's are {1,5} (gap 4 > k → two
    // separate spans around the unshared middle token)
    val r = TextAnalysis.duplicatedSpans(
      docs("a b c d e f", "a b c X d e f"), k = 3)
      .collect().map(x => (x.getAs[Long]("doc_id"),
        x.getAs[Long]("span_start"), x.getAs[Long]("span_end"),
        x.getAs[Long]("n_windows")))
    assert(r.toSeq == Seq((0L, 1L, 6L, 2L),
      (1L, 1L, 3L, 1L), (1L, 5L, 7L, 1L)))
  }

  test("duplicatedSpans: within-doc repetition, short docs, maxOcc cap") {
    // "r s t u r s t u": positions {1,2} and {5,6} duplicate WITHIN the
    // doc; 5 ≤ 2+k so everything merges into one whole-doc span
    val rep = TextAnalysis.duplicatedSpans(docs("r s t u r s t u"), k = 3)
      .collect()
    assert(rep.length == 1)
    assert(rep.head.getAs[Long]("span_start") == 1L &&
      rep.head.getAs[Long]("span_end") == 8L &&
      rep.head.getAs[Long]("n_windows") == 4L)
    // shorter than k → no windows at all (the sequence guard)
    assert(TextAnalysis.duplicatedSpans(docs("a b", "a b"), k = 3)
      .collect().isEmpty)
    // a shingle in 3 places is boilerplate under maxOcc=2 → excluded
    val capped = docs("h i j", "h i j", "h i j")
    assert(TextAnalysis.duplicatedSpans(capped, k = 3, maxOcc = 2)
      .collect().isEmpty)
    assert(TextAnalysis.duplicatedSpans(capped, k = 3).count() == 3)
  }

  test("spanStats: exact coverage ratios, zero-coverage docs kept") {
    val r = TextAnalysis.spanStats(
      docs("a b c d e x y z", "p q a b c d e r", "u1 u2 u3"), k = 3)
      .collect().map(x => (x.getAs[Long]("doc_id"),
        x.getAs[Long]("n_tokens"), x.getAs[Long]("n_spans"),
        x.getAs[Long]("dup_tokens"), x.getAs[Double]("dup_ratio")))
    assert(r.toSeq == Seq((0L, 8L, 1L, 5L, 0.625),
      (1L, 8L, 1L, 5L, 0.625), (2L, 3L, 0L, 0L, 0.0)))
  }

  test("spanScrub: cuts every copy exactly, empty and untouched edges") {
    // docs 0/1 share "a b c d e"; doc 2 is untouched; docs 3/4 are
    // full duplicates of each other (scrub to empty)
    val r = TextAnalysis.spanScrub(
      docs("a b c d e x y z", "p q a b c d e r", "u1 u2 u3",
        "w1 w2 w3 w4", "w1 w2 w3 w4"), k = 3)
      .collect().map(x => (x.getAs[Long]("doc_id"),
        x.getAs[Long]("n_kept"), x.getAs[Long]("n_cut"),
        x.getAs[String]("scrubbed_md5")))
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(r.toSeq == Seq(
      (0L, 3L, 5L, m("x y z")), (1L, 3L, 5L, m("p q r")),
      (2L, 3L, 0L, m("u1 u2 u3")), (3L, 0L, 4L, m("")),
      (4L, 0L, 4L, m(""))))
  }

  test("hardNegatives: wrong-label impostor is the top negative") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), // query
      (1L, Array(0.9f, 0.1f), 0), // positive, cos≈0.994
      (2L, Array(1.0f, 0.0f), 1), // identical impostor → top neg, cos=1
      (3L, Array(0.0f, 1.0f), 1), // orthogonal negative
      (4L, Array(0.5f, 0.5f), 0)) // positive, cos≈0.707
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.hardNegatives(vecs, nQueries = 1, k = 2).collect()
    val negs = r.filter(_.getAs[String]("role") == "neg")
    assert(negs.head.getAs[Long]("neighbor_id") == 2L)
    assert(negs.head.getAs[Double]("cosine") == 1.0)
    assert(r.filter(_.getAs[String]("role") == "pos")
      .map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 4L))
    assert(r.forall(_.getAs[Int]("rank") <= 2))
  }

  test("brute-force ANN: identical vector is the top neighbor with cosine 1") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f, 0.0f), 0),  // identical to query 0
      (2L, Array(0.0f, 1.0f, 0.0f), 1),
      (3L, Array(0.7f, 0.7f, 0.0f), 1)).toDF("vec_id", "embedding", "label")
    val r = Similarity.annBruteForce(vecs, nQueries = 1, k = 3).collect()
    assert(r.head.getAs[Long]("neighbor_id") == 1L)
    assert(r.head.getAs[Double]("cosine") == 1.0)
    // ranks are 1..3, cosine non-increasing
    assert(r.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    val cosines = r.map(_.getAs[Double]("cosine")).toSeq
    assert(cosines == cosines.sorted.reverse)
  }

  test("IVF ANN with nProbe=all cells matches brute force") {
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 7.0 + j).toFloat), (i % 4).toInt)
    }.toDF("vec_id", "embedding", "label")
    val bf = Similarity.annBruteForce(vecs, nQueries = 3, k = 5).collect().toSeq
    val ivf = Similarity.annIvf(vecs, nQueries = 3, k = 5, nProbe = 4).collect().toSeq
    assert(ivf == bf)
  }

  test("lshThresholdSweep: counts are per-threshold cumulative and a " +
      "threshold nothing clears yields no row") {
    // three collinear vectors: every pairwise cosine is exactly 1
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(2.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val r = Similarity.lshThresholdSweep(vecs,
      thresholds = Seq(0.5, 1.5)).collect()
    assert(r.length == 1) // nothing reaches 1.5
    assert(r.head.getAs[Double]("threshold") == 0.5)
    assert(r.head.getAs[Long]("n_edges") == 3L) // all C(3,2) pairs
    assert(r.head.getAs[Long]("n_nodes") == 3L)
    assert(r.head.getAs[Double]("mean_degree") == 2.0)
  }

  test("retrievalEval: full probing scores perfect nDCG/MRR; a missed " +
      "cell costs exactly the unreached graded gain") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),   // the query
      (1L, Array(2.0f, 0.0f), 0),   // exact rank 1 (cos 1), query's cell
      (2L, Array(1.0f, 0.2f), 1),   // exact rank 2, the OTHER cell
      (3L, Array(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val full = Similarity.retrievalEval(vecs,
      nQueries = 1, k = 2, nProbe = 2).collect()
    assert(full.length == 1)
    val f = full.head
    assert(f.getAs[Long]("n_truth") == 2L && f.getAs[Long]("n_hits") == 2L)
    assert(f.getAs[Int]("first_hit_rank") == 1)
    assert(f.getAs[Double]("ndcg") == 1.0 && f.getAs[Double]("rr") == 1.0)
    // nProbe=1 probes only the query's own cell: rank-2 truth (vec 2)
    // is unreachable -> DCG loses rel 1 at discount(2)
    val m = Similarity.retrievalEval(vecs,
      nQueries = 1, k = 2, nProbe = 1).collect().head
    assert(m.getAs[Long]("n_hits") == 1L)
    assert(m.getAs[Double]("rr") == 1.0) // the hit is still rank 1
    val discs = Similarity.dcgDiscounts(2).map(BigDecimal(_))
    val idcg = BigDecimal(2) * discs(0) + discs(1)
    val expected = BigDecimal(
        (BigDecimal(2) * discs(0)).toDouble / idcg.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m.getAs[Double]("ndcg") == expected)
  }


  test("textrankChunks: the hub chunk that bridges otherwise-disjoint " +
      "chunks ranks first; an edge-free doc falls back to chunk order") {
    import graft.operators.TextAnalysis
    // doc 1, 3 chunks of 10: chunk 1 shares 5 tokens with chunk 0 and
    // 5 with chunk 2; chunks 0 and 2 share nothing -> 1 is the hub.
    val c0 = (1 to 5).map(i => s"a$i") ++ (1 to 5).map(i => s"p$i")
    val c1 = (1 to 5).map(i => s"a$i") ++ (1 to 5).map(i => s"b$i")
    val c2 = (1 to 5).map(i => s"b$i") ++ (1 to 5).map(i => s"q$i")
    // doc 2: 20 all-distinct tokens -> no edges, teleport-only ranks
    val iso = (1 to 20).map(i => s"z$i")
    val docs = Seq(
      (1L, (c0 ++ c1 ++ c2).mkString(" "), "en", "s", 1L),
      (2L, iso.mkString(" "), "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.textrankChunks(docs).collect()
    val d1 = r.filter(_.getLong(0) == 1L)
    assert(d1.head.getAs[Int]("chunk_no") == 1) // the hub wins
    assert(d1.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    assert(d1.head.getAs[Double]("score") >
      d1.last.getAs[Double]("score"))
    val d2 = r.filter(_.getLong(0) == 2L)
    // teleport-only scores tie; chunk_no breaks them
    assert(d2.map(_.getAs[Int]("chunk_no")).toSeq == Seq(0, 1))
    assert(d2.map(_.getAs[Double]("score")).distinct.length == 1)
    assert(TextAnalysis.textrankChunks(docs).collect().toSeq == r.toSeq)
  }
}
