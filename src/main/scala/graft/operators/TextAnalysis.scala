package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text analysis for training-data pipelines over the `documents` table:
  * token counting, quality scoring, language ID, document fingerprinting.
  *
  * All pure Column expressions (no UDFs) — each operator is a map-only
  * stage that fuses into the parquet scan under whole-stage codegen; at
  * 100 TB these parallelize embarrassingly with zero shuffle.
  *
  * Determinism: every ratio is rounded to 6 decimals at the output
  * boundary; decisions (lang_pred) are made FROM the rounded scores so
  * both engines branch on bit-identical operands.
  */
object TextAnalysis {

  /** Token/char statistics + quality score per document.
    * quality = distinct_ratio × (1 − stopword_ratio) × min(n_tokens/50, 1)
    * — repetition-, boilerplate- and length-penalized, the standard shape
    * of heuristic quality filters for LLM corpora.
    */
  /** quality = distinct_ratio × (1 − stopword_ratio) × min(n_tokens/50, 1)
    * as a standalone Column (shared by [[stats]] and
    * [[balanceByLanguage]] so the formula can't diverge).
    */
  def qualityScoreCol: Column = {
    val toks = tokensCol(col("text"))
    val nTok = size(toks).cast("double")
    val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
    val stopRatio =
      size(filter(toks, t => array_contains(array(stopwords.map(lit): _*), t)))
        .cast("double") / nTok
    val lengthFactor = least(nTok / lit(50.0), lit(1.0))
    round(distinctRatio * (lit(1.0) - stopRatio) * lengthFactor
      * lit(1.0e6), 0) / lit(1.0e6)
  }

  def stats(docs: DataFrame): DataFrame = {
    val toks = tokensCol(col("text"))
    val nTok = size(toks).cast("double")
    val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
    val stopRatio =
      size(filter(toks, t => array_contains(array(stopwords.map(lit): _*), t)))
        .cast("double") / nTok
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars_text"),
      size(toks).as("n_tokens"),
      // BPE-ish regex tokenization: letter runs, digit runs, and single
      // punctuation marks each count as one token (subword-style
      // segmentation without a merges table)
      size(regexp_extract_all(col("text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("n_tokens_re"),
      size(array_distinct(toks)).as("n_distinct_tokens"),
      (round(distinctRatio * lit(1.0e6), 0) / lit(1.0e6))
        .as("distinct_ratio"),
      (round((length(col("text")) - (size(toks) - lit(1))).cast("double")
        / nTok * lit(1.0e6), 0) / lit(1.0e6)).as("avg_token_len"),
      (round(stopRatio * lit(1.0e6), 0) / lit(1.0e6))
        .as("stopword_ratio"),
      qualityScoreCol.as("quality_score"))
  }

  /** All n-gram occurrences of a token array WITH multiplicity — unlike
    * [[shinglesCol]]/ShingleStrings (which dedup for MinHash set
    * semantics), repetition metrics need every position. Docs shorter
    * than n carry no n-gram.
    */
  private def gramsAll(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - lit(n - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(n)))))
      .otherwise(expr("CAST(array() AS array<string>)"))

  /** The repetition PROFILE per document — [[repetitionSignals]]'s
    * big-document twin, reporting the identity of the dominant n-gram,
    * not just its share:
    *   - `top_gram` / `top_cnt`  — the most frequent topN-gram (ties →
    *     lexicographically smallest) and its occurrence count;
    *   - `top_char_frac`         — fraction of the document's characters
    *     covered by occurrences of that gram (count × gram chars /
    *     doc chars), Gopher's "top n-gram character fraction" (Rae et
    *     al. 2021, Table A1);
    *   - `dup_gram_frac`         — fraction of dupN-gram positions whose
    *     gram occurs more than once in the doc;
    *   - `dup_token_frac`        — fraction of token positions holding a
    *     token that repeats within the doc.
    * High values = looped/boilerplate text; thresholding composes
    * exactly like [[qualityFilter]].
    *
    * Backed by the codegen'd
    * [[org.apache.spark.sql.graft.RepetitionProfile]] expression: one
    * compiled pass per document over the raw bytes, counting gram spans
    * in an open-addressed map — O(tokens) time, O(distinct grams)
    * transient memory, ZERO shuffle (the only exchange left is the
    * output sort). Where [[repetitionSignals]]'s HOF form is O(tokens ×
    * distinct-grams) per doc, the compiled map is linear, so even a
    * pathological 1M-token doc stays a single cheap task. The exploded
    * distributed form survives as [[repetitionProfileExploded]] and is
    * asserted equal in TextDedupSpec; fractions are exact-integer
    * quotients (bit-identical cross-engine); where the two operators
    * measure the same quantity (top 2-gram position share) they agree
    * exactly (spec-asserted).
    */
  def repetitionProfile(docs: DataFrame, topN: Int = 2,
                        dupN: Int = 3): DataFrame = {
    val prof = org.apache.spark.sql.graft.RepetitionProfile
      .column(col("text"), topN, dupN)
    // null-text docs carry no profile; dropping them (rather than
    // emitting a null-fraction row) keeps this form and the exploded
    // parity form identical on any corpus — explode() would drop the
    // row anyway in the distributed form
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), length(col("text")).as("n_chars"),
        size(tokensCol(col("text"))).as("n_tokens"), prof.as("prof"))
      .select(col("doc_id"), col("n_tokens"),
        col("prof.top_gram").as("top_gram"),
        col("prof.top_cnt").as("top_cnt"),
        when(col("prof.top_gram").isNotNull,
          col("prof.top_cnt").cast("double") *
            length(col("prof.top_gram")).cast("double") /
            col("n_chars").cast("double")).otherwise(lit(0.0))
          .as("top_char_frac"),
        when(col("prof.n_grams") > 0,
          col("prof.dup_positions").cast("double") /
            col("prof.n_grams").cast("double")).otherwise(lit(0.0))
          .as("dup_gram_frac"),
        (col("prof.dup_tok_positions").cast("double") /
          col("n_tokens").cast("double")).as("dup_token_frac"))
      .orderBy(col("doc_id"))
  }

  /** The distributed reference form of [[repetitionProfile]] — one
    * explode of the three position streams tagged by family, ONE
    * shuffle keyed (doc_id, family, gram) with map-side partial counts
    * (per-doc sizes ride the exploded rows and fold back out with
    * max(), so there is no join back to a second corpus scan), a
    * per-doc roll-up on the doc_id prefix of the same key. Linear in
    * corpus tokens at ~20 shuffle bytes per token; kept as the
    * parity-asserted spec oracle for the compiled in-row form (and the
    * shape to fall back to if a corpus ever held single documents too
    * large for in-row counting).
    */
  private[graft] def repetitionProfileExploded(
      docs0: DataFrame, topN: Int = 2, dupN: Int = 3): DataFrame = {
    // same null-text posture as the compiled form (see above)
    val docs = docs0.filter(col("text").isNotNull)
    val toks = tokensCol(col("text"))
    def fam(name: String, grams: Column): Column =
      transform(grams, g => struct(lit(name).as("fam"), g.as("gram")))
    val tagged = docs.select(col("doc_id"),
      length(col("text")).as("n_chars"), size(toks).as("n_tokens"),
      explode(concat(
        fam("top", gramsAll(toks, topN)),
        fam("dup", gramsAll(toks, dupN)),
        fam("tok", toks))).as("fg"))
    val counts = tagged.groupBy(col("doc_id"), col("fg.fam"), col("fg.gram"))
      .agg(count(lit(1)).as("cnt"), max(col("n_chars")).as("n_chars"),
        max(col("n_tokens")).as("n_tokens"))
    // min over struct(-cnt, gram) = highest count, then smallest gram —
    // the in-agg argmax, no second window shuffle
    val perDoc = counts.groupBy(col("doc_id")).agg(
      max(col("n_chars")).as("n_chars"),
      max(col("n_tokens")).as("n_tokens"),
      min(when(col("fam") === "top",
        struct((-col("cnt")).as("ncnt"), col("gram").as("g")))).as("best"),
      sum(when(col("fam") === "dup" && col("cnt") > 1, col("cnt"))
        .otherwise(0L)).as("dup_positions"),
      sum(when(col("fam") === "dup", col("cnt")).otherwise(0L)).as("n_grams"),
      sum(when(col("fam") === "tok" && col("cnt") > 1, col("cnt"))
        .otherwise(0L)).as("dup_tok_positions"))
    perDoc
      .select(col("doc_id"), col("n_tokens"),
        col("best").getField("g").as("top_gram"),
        (-col("best").getField("ncnt")).as("top_cnt"),
        when(col("best").isNotNull,
          (-col("best").getField("ncnt")).cast("double") *
            length(col("best").getField("g")).cast("double") /
            col("n_chars").cast("double")).otherwise(lit(0.0))
          .as("top_char_frac"),
        when(col("n_grams") > 0, col("dup_positions").cast("double") /
          col("n_grams").cast("double")).otherwise(lit(0.0))
          .as("dup_gram_frac"),
        (col("dup_tok_positions").cast("double") /
          col("n_tokens").cast("double")).as("dup_token_frac"))
      .orderBy(col("doc_id"))
  }

  /** Stopword-lexicon language ID: score per language = marker-token
    * ratio; argmax with declaration-order tie-break; all-zero → "und".
    */
  def langId(docs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val toks = tokensCol(col("text"))
    val scored = docs.select(
      (col("doc_id") +: keep.map(col)) ++ langMarkers.map { case (lang, words) =>
        tokenRatio(toks, words).as(s"score_$lang")
      }: _*)
    val scores = langMarkers.map { case (lang, _) => col(s"score_$lang") }
    val allZero = scores.map(_ === 0.0).reduce(_ && _)
    // each language wins if its (rounded) score >= all later languages'
    val pred = langMarkers.zipWithIndex.init.foldLeft(when(allZero, "und")) {
      case (acc, ((lang, _), i)) =>
        val beatsRest = scores.drop(i + 1).map(col(s"score_$lang") >= _)
          .reduce(_ && _)
        acc.when(beatsRest, lang)
    }.otherwise(langMarkers.last._1)
    scored.withColumn("lang_pred", pred)
  }

  /** Confusion matrix of the [[langId]] heuristic against the labeled
    * `lang` column — the evaluation harness for the language family,
    * same posture as `lsh_recall_audit` for the dedup family: measure
    * the heuristic's error structure instead of asserting it. Each
    * (true, predicted) cell carries its count and its share of the true
    * language's documents; the diagonal is per-language recall. At
    * 100 TB the labeled slice is a sample and this exact shape runs on
    * it unchanged — one map pass plus a |langs|²-sized agg.
    */
  def langIdConfusion(docs: DataFrame): DataFrame = {
    val cm = langId(docs, keep = Seq("lang"))
      .groupBy(col("lang").as("lang_true"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
    val tot = cm.groupBy(col("lang_true")).agg(sum(col("n")).as("n_true"))
    cm.join(tot, Seq("lang_true"))
      .select(col("lang_true"), col("lang_pred"), col("n"),
        (round(col("n").cast("double") / col("n_true").cast("double")
          * lit(1.0e6), 0) / lit(1.0e6)).as("share"),
        (col("lang_true") === col("lang_pred")).as("correct"))
      .orderBy(col("lang_true"), col("lang_pred"))
  }

  /** Corpus-wide top-k token bigrams with document frequency — the
    * n-gram statistics pass of a corpus-analysis pipeline (vocabulary /
    * boilerplate discovery). One explode + one aggregation; top-k plans
    * as TakeOrderedAndProject.
    */
  def topBigrams(docs: DataFrame, k: Int = 50): DataFrame = {
    // codegen'd byte-slice shingling (ShingleStrings; the HOF reference
    // form is shinglesCol — asserted equal in TextDedupSpec)
    val bigrams = docs.select(
      col("doc_id"),
      explode(org.apache.spark.sql.graft.ShingleStrings.column(col("text"), 2))
        .as("bigram"))
    bigrams
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("bigram"))
      .limit(k)
  }

  /** TF-IDF, top-k terms per document. tf = term count / doc length;
    * idf = ln(N / df) over DISTINCT doc occurrences; score rounded to 6
    * decimals (cross-engine boundary) BEFORE ranking so order ties are
    * resolved identically everywhere (then by term).
    *
    * Scale shape: two aggregations (term-doc counts, df) + a df join the
    * optimizer sizes itself — no forced broadcast (the term-DF table is
    * the vocabulary, which can exceed the broadcast limit on a real
    * corpus; AQE broadcasts it when it actually fits). The corpus size N
    * rides the plan as a 1-row aggregate cross-joined in (a 1-row
    * broadcast), NOT a separate `docs.count()` action — one job total,
    * nothing collected to the driver.
    */
  def tfIdf(docs: DataFrame, k: Int = 3): DataFrame = {
    val corpusN = docs.agg(count(lit(1)).as("corpus_n"))
    // term-doc counts feed BOTH the score join and the doc-frequency
    // aggregation; the duplicated shuffle is collapsed by ReuseExchange
    // (a localCheckpoint here would force stage execution at plan
    // construction under AQE — asserted against in PlanSpec)
    val termDoc = docs.select(
        col("doc_id"),
        size(tokensCol(col("text"))).as("doc_len"),
        explode(tokensCol(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("doc_len"), col("term"))
      .agg(count(lit(1)).as("tf_raw"))
    val df = termDoc.groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq")) // termDoc is distinct per (doc, term)
    val scored = termDoc.join(df, Seq("term")).crossJoin(corpusN)
      .select(col("doc_id"), col("term"),
        round(
          (col("tf_raw").cast("double") / col("doc_len").cast("double")) *
            log(col("corpus_n").cast("double") / col("doc_freq").cast("double")), 6)
          .as("tfidf"))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rank") <= k)
  }

  /** Okapi BM25 top-k retrieval (Robertson & Zaragoza 2009; Lucene's
    * non-negative idf form) for a fixed query-term set — the lexical
    * retrieval primitive a curation pipeline uses to pull
    * benchmark-adjacent or topic-adjacent documents out of a corpus
    * (decontamination triage, targeted sampling). Complements
    * [[tfIdf]] (per-doc term importance) with per-QUERY document
    * ranking: BM25 saturates term frequency (k1) and normalizes by
    * document length (b), which raw tf·idf does not.
    *
    * Scale shape: the token explode is filtered to the query terms
    * BEFORE the tf aggregation, so the shuffled term-frequency table
    * carries only |Q| terms' postings (data-scale only in matching
    * docs, not the corpus); corpus stats (N, total length) ride as a
    * 1-row in-plan aggregate cross-joined in — one pass over the
    * corpus, nothing collected to the driver; the final top-k is
    * TakeOrderedAndProject (per-partition k then one k·P merge), never
    * a global sort.
    *
    * Determinism: each term's contribution is rounded to 6 decimals
    * and scaled to an exact long BEFORE the per-doc sum (the [[lmScore]]
    * convention — order-independent aggregation); the exact sum divides
    * by 1e6 once at the output boundary, never re-rounded.
    */
  def bm25TopK(docs: DataFrame,
               queryTerms: Seq[String] = Seq("spark", "window", "agg"),
               k: Int = 20, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = tokensCol(col("text"))
    val corpus = docs.agg(count(lit(1)).as("n"),
      sum(size(toks).cast("long")).as("tot_len"))
    val tf = docs.select(col("doc_id"), size(toks).as("dl"),
        explode(toks).as("t"))
      .filter(col("t").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("t"))
      .agg(count(lit(1)).as("tf"))
    bm25Score(tf, corpus, k, k1, b)
  }

  /** BM25 with pseudo-relevance feedback (the RM3 idea, integer-exact):
    * run the seed query, treat its top `fbDocs` documents as relevant,
    * harvest the `fbTerms` best expansion terms from them, and re-rank
    * the corpus with the expanded query. Expansion candidates must be
    * corpus-rare (`doc_freq ≤ N/10` — the stopword gate) and rank by
    * the ALL-INTEGER key (feedback count desc, corpus doc-freq asc,
    * term) rather than a floating tf·idf product: two near-equal
    * double weights could order differently across engines' `ln`
    * libms, and the expansion CHOICE discretely changes every
    * downstream score — exactly the amplification a deterministic
    * engine cannot tolerate.
    *
    * Scale shape: the seed pass is [[bm25TopK]] (query-term-filtered
    * postings); the harvest explodes ONLY the fbDocs feedback docs
    * (semi join on the top-k ids, broadcast); the corpus df table is
    * one vocabulary-scale agg (the [[lmScore]] cost class); the final
    * pass filters postings by a broadcast ≤(|Q|+fbTerms)-row term
    * table before the shuffle — both passes stay proportional to
    * query-term postings, never the corpus.
    */
  def bm25Prf(docs: DataFrame,
              queryTerms: Seq[String] = Seq("spark", "window", "agg"),
              fbDocs: Int = 10, fbTerms: Int = 5, k: Int = 20,
              k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = tokensCol(col("text"))
    val fbIds = bm25TopK(docs, queryTerms, fbDocs, k1, b)
      .select(col("doc_id"))
    val corpusN = docs.agg(count(lit(1)).as("nn"))
    val dfTable = docs.select(col("doc_id"), explode(toks).as("t"))
      .distinct()
      .groupBy(col("t")).agg(count(lit(1)).as("doc_freq"))
    val expansion = docs.join(broadcast(fbIds), Seq("doc_id"), "left_semi")
      .select(explode(toks).as("t"))
      .filter(!col("t").isin(queryTerms: _*))
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
      .join(dfTable, Seq("t"))
      .crossJoin(broadcast(corpusN))
      .filter(col("doc_freq") * 10 <= col("nn"))
      .orderBy(col("cnt").desc, col("doc_freq"), col("t"))
      .limit(fbTerms)
      .select(col("t"))
    val allTerms = expansion.unionByName(
      docs.sparkSession.createDataset(queryTerms)(
        org.apache.spark.sql.Encoders.STRING).toDF("t")).distinct()
    val corpus = docs.agg(count(lit(1)).as("n"),
      sum(size(toks).cast("long")).as("tot_len"))
    val tf = docs.select(col("doc_id"), size(toks).as("dl"),
        explode(toks).as("t"))
      .join(broadcast(allTerms), Seq("t"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("t"))
      .agg(count(lit(1)).as("tf"))
    bm25Score(tf, corpus, k, k1, b)
  }

  /** The shared BM25 scoring tail: `tf` is one row per (doc_id, dl, t,
    * tf) posting restricted to the query terms; `corpus` is the 1-row
    * (n, tot_len) aggregate. Identical expression tree whether the
    * postings come from a live token explode ([[bm25TopK]]) or from the
    * persisted index ([[bm25QueryIndex]]) — which is what makes the
    * incremental path bitwise-equal to the full recompute (asserted in
    * TextDedupSpec).
    */
  private def bm25Score(tf: DataFrame, corpus: DataFrame, k: Int,
                        k1: Double, b: Double): DataFrame =
    bm25ScoreBy(tf, corpus, Seq("doc_id"), k1, b)
      .select(col("doc_id"), col("n_query_terms"),
        (col("s6").cast("double") / lit(1e6)).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)

  /** The key-generic BM25 scoring core: scoring unit = one `keyCols`
    * tuple (whole documents for [[bm25TopK]]/[[bm25QueryIndex]],
    * (doc, chunk) passages for [[bm25Passages]]); emits exact scaled-
    * long partial sums (`s6`) so downstream aggregation stays
    * order-independent at any parallelism.
    */
  private def bm25ScoreBy(tf: DataFrame, corpus: DataFrame,
                          keyCols: Seq[String], k1: Double,
                          b: Double): DataFrame = {
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("doc_freq"))
    val idf = log((col("n").cast("double") - col("doc_freq").cast("double")
      + lit(0.5d)) / (col("doc_freq").cast("double") + lit(0.5d)) + lit(1.0d))
    val avgdl = col("tot_len").cast("double") / col("n").cast("double")
    val tfd = col("tf").cast("double")
    val scored = tf.join(dfreq, Seq("t")).crossJoin(corpus)
      .select(keyCols.map(col) :+
        (round(idf * (tfd * lit(k1 + 1.0d)) /
          (tfd + lit(k1) * (lit(1.0d - b) + lit(b) *
            col("dl").cast("double") / avgdl)) * lit(1e6), 0)
          .cast("long").as("s6")): _*)
    scored.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_query_terms"), sum(col("s6")).as("s6"))
  }

  /** Passage-level BM25 with MaxP document scoring (Dai & Callan 2019's
    * "maximum passage" convention): documents split into overlapping
    * token chunks (the [[chunkDocs]] geometry), each chunk scored as an
    * independent retrieval unit — tf, length norm, and "document"
    * frequency all at chunk granularity — and a document ranks by its
    * BEST chunk. Long documents stop burying a relevant passage under
    * their length norm, and the emitted `best_chunk` says WHERE the hit
    * is — the passage-retrieval shape a RAG pipeline serves.
    *
    * Scale shape: the chunk explode multiplies token rows by the
    * overlap factor C/s (~1.3 at the defaults) BEFORE the query-term
    * filter cuts the stream to |Q| terms, so the shuffled volume stays
    * proportional to query-term postings, not the corpus; MaxP is one
    * in-agg argmax (min over struct(-s6, chunk_idx) — no window pass),
    * and the final top-k plans as TakeOrderedAndProject.
    */
  def bm25Passages(docs: DataFrame,
                   queryTerms: Seq[String] = Seq("spark", "window", "agg"),
                   k: Int = 20, chunkTokens: Int = 128, stride: Int = 96,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    def chunks(df: DataFrame) = passageChunkStream(df, chunkTokens, stride)
    val corpus = chunks(docs).agg(count(lit(1)).as("n"),
      sum(size(col("ctoks")).cast("long")).as("tot_len"))
    val tf = chunks(docs)
      .select(col("doc_id"), col("chunk_idx"), size(col("ctoks")).as("dl"),
        explode(col("ctoks")).as("t"))
      .filter(col("t").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("chunk_idx"), col("dl"), col("t"))
      .agg(count(lit(1)).as("tf"))
    maxPTail(bm25ScoreBy(tf, corpus, Seq("doc_id", "chunk_idx"), k1, b), k)
  }

  /** The overlapping-chunk stream shared by the live and index-served
    * passage forms: `(doc_id, chunk_idx, ctoks)` with `chunkTokens`-
    * token windows at `stride` (the [[chunkDocs]] geometry). Every
    * position belongs to ≥1 chunk; start positions never exceed the
    * doc length, so every chunk holds ≥1 token.
    */
  private def passageChunkStream(df: DataFrame, chunkTokens: Int,
                                 stride: Int): DataFrame =
    df.select(col("doc_id"), tokensCol(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(sequence(lit(0),
          floor((size(col("toks")) - 1) / lit(stride)).cast("int")))
          .as("chunk_idx"),
        col("toks"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("toks"), col("chunk_idx") * lit(stride) + lit(1),
          lit(chunkTokens)).as("ctoks"))

  /** The shared MaxP document-scoring tail: per-chunk exact scaled-long
    * scores fold to each document's best chunk in ONE in-agg argmax —
    * the codegen'd ArgExtremum (primitive buffers → HashAggregate; a
    * 3-field struct min would fall back to SortAggregate + two full
    * sorts). chunk_idx and the term count pack into one atomic value
    * (nqt ≤ |queryTerms| ≪ 1000, so the packing is exact and ties on
    * the score still resolve to the smaller chunk_idx — ArgExtremum
    * ties take the smaller value).
    */
  private def maxPTail(scored: DataFrame, k: Int): DataFrame =
    scored
      .select(col("doc_id"), (-col("s6")).as("ns6"),
        (col("chunk_idx").cast("long") * lit(1000L) +
          col("n_query_terms")).as("packed"))
      .groupBy(col("doc_id"))
      .agg(min(col("ns6")).as("ns6"),
        org.apache.spark.sql.graft.ArgExtremum
          .argMin(col("packed"), col("ns6")).as("packed"))
      .select(col("doc_id"),
        floor(col("packed") / lit(1000L)).cast("int").as("best_chunk"),
        (col("packed") % lit(1000L)).as("n_query_terms"),
        ((-col("ns6")).cast("double") / lit(1e6)).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)

  /** The persisted CHUNK-level BM25 index — [[bm25Index]] at passage
    * granularity: one row per (doc, chunk, term) posting with the
    * chunk's length. Everything passage retrieval needs at query time
    * derives from it (chunk count and total length by a per-chunk
    * roll-up — every chunk holds ≥1 token so every chunk has postings;
    * chunk-frequency by counting a term's rows), so the corpus is
    * chunked and tokenized exactly ONCE, at index build — the fix for
    * the live form's double chunk scan, and the passage analogue of
    * the documents-level postings index.
    */
  def bm25PassageIndex(docs: DataFrame, chunkTokens: Int = 128,
                       stride: Int = 96): DataFrame =
    passageChunkStream(docs, chunkTokens, stride)
      .select(col("doc_id"), col("chunk_idx"), size(col("ctoks")).as("dl"),
        explode(col("ctoks")).as("t"))
      .groupBy(col("doc_id"), col("chunk_idx"), col("dl"), col("t"))
      .agg(count(lit(1)).as("tf"))

  /** Daily refresh of the passage index — the [[refreshBm25Index]]
    * contract at chunk granularity: history chunks are never re-built,
    * re-appending an already-ingested batch is a no-op.
    */
  def refreshBm25PassageIndex(histIndex: DataFrame, deltaDocs: DataFrame,
                              chunkTokens: Int = 128,
                              stride: Int = 96): DataFrame =
    histIndex.select(col("doc_id"), col("chunk_idx"), col("dl"), col("t"),
        col("tf"))
      .unionByName(bm25PassageIndex(deltaDocs.join(
        histIndex.select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti"), chunkTokens, stride))

  /** Passage top-k with MaxP straight off the persisted chunk index —
    * no text scan, no chunking at query time: corpus stats roll up
    * from the index, scoring is the same [[bm25ScoreBy]] ∘ [[maxPTail]]
    * chain as [[bm25Passages]], so index-then-query equals
    * chunk-then-score exactly (spec-asserted).
    */
  def bm25QueryPassageIndex(index: DataFrame,
                            queryTerms: Seq[String] =
                              Seq("spark", "window", "agg"),
                            k: Int = 20, k1: Double = 1.2,
                            b: Double = 0.75): DataFrame = {
    val perChunk = index.groupBy(col("doc_id"), col("chunk_idx"))
      .agg(max(col("dl")).as("dl"))
    val corpus = perChunk.agg(count(lit(1)).as("n"),
      sum(col("dl").cast("long")).as("tot_len"))
    val tf = index.filter(col("t").isin(queryTerms: _*))
      .select(col("doc_id"), col("chunk_idx"), col("dl"), col("t"),
        col("tf"))
    maxPTail(bm25ScoreBy(tf, corpus, Seq("doc_id", "chunk_idx"), k1, b), k)
  }

  /** The persisted BM25 inverted index: one row per (term, document)
    * posting with its term frequency and the document's length — the
    * Lucene postings+norms shape as a table. Everything BM25 needs at
    * query time derives from it (doc_freq by counting a term's
    * postings; corpus N and total length from the per-doc lengths), so
    * retrieval never re-tokenizes the corpus. At 100 TB the index is
    * O(total tokens) rows but each row is ~30 bytes vs the text's full
    * bytes, written once, bucketed by `t` so a query's term filter
    * prunes straight to its postings.
    */
  def bm25Index(docs: DataFrame): DataFrame = {
    val toks = tokensCol(col("text"))
    docs.select(col("doc_id"), size(toks).as("dl"), explode(toks).as("t"))
      .groupBy(col("doc_id"), col("dl"), col("t"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Daily index refresh — the retrieval analogue of
    * [[appendCdcChunkIndex]]: history postings plus the postings of
    * batch docs NOT already indexed. The doc_id anti join (projected to
    * bare ids before the shuffle) makes re-appending the same batch a
    * no-op, so reruns are safe; history text is never re-tokenized —
    * the one property that makes BM25 over a growing corpus affordable
    * (asserted in TextDedupSpec).
    */
  def refreshBm25Index(histIndex: DataFrame, deltaDocs: DataFrame): DataFrame =
    histIndex.select(col("doc_id"), col("dl"), col("t"), col("tf"))
      .unionByName(bm25Index(deltaDocs.join(
        histIndex.select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")))

  /** BM25 top-k straight off the persisted index ([[bm25Index]] /
    * [[refreshBm25Index]]) — no corpus scan at query time. Corpus stats
    * come from the index itself (one per-doc length roll-up); scoring is
    * the same [[bm25Score]] tail as [[bm25TopK]], so
    * index-then-query equals scan-then-score exactly.
    */
  def bm25QueryIndex(index: DataFrame,
                     queryTerms: Seq[String] = Seq("spark", "window", "agg"),
                     k: Int = 20, k1: Double = 1.2,
                     b: Double = 0.75): DataFrame = {
    val perDoc = index.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
    val corpus = perDoc.agg(count(lit(1)).as("n"),
      sum(col("dl").cast("long")).as("tot_len"))
    val tf = index.filter(col("t").isin(queryTerms: _*))
      .select(col("doc_id"), col("dl"), col("t"), col("tf"))
    bm25Score(tf, corpus, k, k1, b)
  }

  /** Query-by-document BM25: each query document's own distinct token
    * set is its query, and every OTHER document is scored by the
    * standard Okapi formula — the "more like this" primitive behind
    * decontamination triage and topic-targeted sampling, and the
    * lexical leg of [[hybridSearch]].
    *
    * Scale shape: the query docs' union term set is tiny (|Q|·|vocab
    * per doc|) and rides as a BROADCAST filter on the token explode, so
    * the shuffled postings carry only terms some query contains — the
    * [[bm25TopK]] property generalized to a query SET. Document
    * frequency is computed once per term from those postings (exact:
    * the term filter keeps every posting of a kept term), never per
    * query, and the per-(query, doc) fan-out joins the scored postings
    * against the broadcast query-term table — corpus rows are scored
    * once per query term that hits them, not once per query.
    *
    * Determinism: the [[bm25ScoreBy]] convention — 6-decimal scaled-long
    * term contributions summed exactly, one divide at the boundary.
    */
  def bm25QueryByDoc(docs: DataFrame, nQueries: Int = 10,
                     k: Int = 20, k1: Double = 1.2,
                     b: Double = 0.75): DataFrame = {
    val toks = tokensCol(col("text"))
    val corpus = docs.agg(count(lit(1)).as("n"),
      sum(size(toks).cast("long")).as("tot_len"))
    val qterms = docs.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(toks)).as("t"))
    val termSet = qterms.select(col("t")).distinct()
    val tf = docs.select(col("doc_id"), size(toks).as("dl"),
        explode(toks).as("t"))
      .join(broadcast(termSet), Seq("t"))
      .groupBy(col("doc_id"), col("dl"), col("t"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("doc_freq"))
    val idf = log((col("n").cast("double") - col("doc_freq").cast("double")
      + lit(0.5d)) / (col("doc_freq").cast("double") + lit(0.5d)) + lit(1.0d))
    val avgdl = col("tot_len").cast("double") / col("n").cast("double")
    val tfd = col("tf").cast("double")
    val scored = tf.join(dfreq, Seq("t")).crossJoin(corpus)
      .select(col("t"), col("doc_id"),
        round(idf * (tfd * lit(k1 + 1.0d)) /
          (tfd + lit(k1) * (lit(1.0d - b) + lit(b) *
            col("dl").cast("double") / avgdl)) * lit(1e6), 0)
          .cast("long").as("s6"))
    scored.join(broadcast(qterms), Seq("t"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_query_terms"), sum(col("s6")).as("s6"))
      .withColumn("lex_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("s6").desc, col("doc_id"))))
      .filter(col("lex_rank") <= k)
      .select(col("query_id"), col("doc_id"),
        (col("s6").cast("double") / lit(1e6)).as("bm25"), col("lex_rank"))
  }

  /** T5-style span corruption plan (Raffel et al. 2020 §3.1.4 — the
    * denoising-pretraining preprocessing step): deterministic mask
    * spans over each doc's token stream, emitted as (doc, sentinel,
    * start, len, span text) rows a packing job consumes. BLOCKED
    * variant so the plan is embarrassingly parallel: the stream splits
    * into `blockTok`-token blocks, a salted hash decides per block
    * whether it carries a span (1/2), the span length (3–5) and its
    * offset — spans never cross block boundaries, so there is no
    * sequential overlap-resolution dependency (the trick that lets the
    * corruption plan be a map-only Spark job at corpus scale; expected
    * mask rate = 4/(2·16) = 12.5%). All decisions are exact integer
    * hash arithmetic — zero floats anywhere.
    */
  def spanCorruption(docs: DataFrame, blockTok: Int = 16): DataFrame = {
    val toks = tokensCol(col("text"))
    val base = docs.select(col("doc_id"), toks.as("toks"),
        size(toks).as("len"))
      .select(col("doc_id"), col("toks"), col("len"),
        explode(sequence(lit(0),
          expr(s"(len - 1) div $blockTok"))).as("b"))
    val h = graft.functions.TextFunctions.hash60(
      concat(lit("sc_"), col("doc_id"), lit("_"), col("b")))
    val len0 = (expr("h div 2") % 3 + 3).cast("int")
    val off = (expr("h div 8") % (lit(blockTok) - col("len0") + 1))
      .cast("int")
    base.withColumn("h", h)
      .filter(col("h") % 2 === 0)
      .withColumn("len0", len0)
      .withColumn("start_tok",
        (col("b") * blockTok + off + 1).cast("int"))
      .filter(col("start_tok") <= col("len"))
      .withColumn("span_len",
        least(col("len0"), col("len") - col("start_tok") + 1).cast("int"))
      .withColumn("sentinel_id", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("start_tok"))))
      .select(col("doc_id"), col("sentinel_id"), col("start_tok"),
        col("span_len"),
        array_join(slice(col("toks"), col("start_tok"), col("span_len")),
          " ").as("span_text"))
      .orderBy(col("doc_id"), col("sentinel_id"))
  }

  /** The denoising PAIRS built from [[spanCorruption]]'s plan — the
    * actual (input, target) rows a T5-style pretraining job consumes:
    * input = the doc with each mask span replaced by its sentinel
    * token, target = the sentinel-prefixed masked spans in order.
    * Pure string/integer assembly over the span plan (one ordered
    * fold per doc) — map-only after the plan join.
    */
  def spanCorruptionPack(docs: DataFrame, blockTok: Int = 16): DataFrame = {
    val spans = spanCorruption(docs, blockTok)
    val toks = tokensCol(col("text"))
    val spanPos = spans.select(col("doc_id"), col("sentinel_id"),
        col("start_tok"),
        explode(sequence(col("start_tok"),
          col("start_tok") + col("span_len") - 1)).as("pos"))
      .withColumn("is_start", col("pos") === col("start_tok"))
    val tk = docs
      .select(col("doc_id"), posexplode(toks).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tok"))
      .join(spanPos.select(col("doc_id"), col("pos"), col("sentinel_id"),
        col("is_start")), Seq("doc_id", "pos"), "left")
      .withColumn("piece",
        when(col("sentinel_id").isNull, col("tok"))
          .when(col("is_start"),
            concat(lit("<extra_id_"), col("sentinel_id"), lit(">"))))
    val input = tk.groupBy(col("doc_id"))
      .agg(array_join(expr(
        "transform(filter(array_sort(collect_list(" +
          "struct(pos, piece))), x -> x.piece IS NOT NULL), x -> x.piece)"),
        " ").as("input_text"))
    val target = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        array_join(expr(
          "transform(array_sort(collect_list(struct(sentinel_id, " +
            "concat('<extra_id_', sentinel_id, '> ', span_text)))), " +
            "x -> x.col2)"),
          " ").as("target_text"))
    input.join(target, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).cast("int").as("n_spans"),
        col("input_text"),
        coalesce(col("target_text"), lit("")).as("target_text"))
      .orderBy(col("doc_id"))
  }

  /** ColBERT-style late-interaction rerank (Khattab & Zaharia 2020 —
    * MaxSim): score(q, d) = Σ over q's token-group vectors of the MAX
    * cosine against any of d's token-group vectors. Deployment shape is
    * retrieve-then-rerank: the BM25 leg ([[bm25QueryByDoc]], the
    * persisted postings index at scale) supplies `legK` candidates per
    * query and ONLY those pairs pay the late-interaction cost — never
    * all pairs.
    *
    * Token-group vectors here are deterministic text-derived
    * multi-vectors (a real deployment stores per-token transformer
    * embeddings in the index; this container has no model, so the
    * Spark-side plumbing — multi-vector index, bounded chunk-pair
    * MaxSim, rerank join — is the real artifact): each `chunkTok`-token
    * chunk gets a `buckets`-dim hashed unigram count vector (exact
    * integers), the same stand-in discipline as the multimodal decode
    * stubs.
    *
    * Determinism: counts/dots are exact longs; each chunk-pair cosine
    * is pinned ONCE at 1e-6 units (round(v·1e6, 0)); max and sum then
    * run on integers, ties break by doc_id. Scale shape: the chunk
    * vector table is map-side (one groupBy keyed (doc, chunk, bucket));
    * the MaxSim join touches candidates × chunk-pairs only, with the
    * tiny candidate and query sides broadcast.
    */
  /** The persisted multi-vector index rows behind [[maxSimRerank]]:
    * one (doc_id, chunk, bucket) → count row per non-empty bucket,
    * PLUS the chunk's L2 norm precomputed on every row — a real
    * multi-vector index stores per-chunk norms alongside the vectors
    * so serving never re-aggregates them. The norm is per (doc, chunk)
    * only (a key-partitioned window at build time), so retire = the
    * same one anti join ([[Dedup.retireRows]]) and refresh = the same
    * per-doc idempotent append as every other index family — a doc's
    * norms never depend on other docs.
    */
  def maxSimChunkVectors(docs: DataFrame, chunkTok: Int = 24,
                         buckets: Int = 16): DataFrame = {
    val toks = tokensCol(col("text"))
    docs.select(col("doc_id"), posexplode(toks).as(Seq("p", "t")))
      .select(col("doc_id"), expr(s"p div $chunkTok").cast("int").as("chunk"),
        pmod(graft.functions.TextFunctions.hash60(
          concat(lit("ms_"), col("t"))), lit(buckets.toLong)).cast("int")
          .as("b"))
      .groupBy(col("doc_id"), col("chunk"), col("b"))
      .agg(count(lit(1)).as("c"))
      .withColumn("nrm", sqrt(sum(col("c") * col("c")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"), col("chunk"))).cast("double")))
  }

  /** Candidates whose chunks share NO hash bucket with any query chunk
    * are omitted from the reranked output (the dot/cos chain inner-
    * joins on bucket), so a query's result can carry fewer than `k`
    * rows — bucket-disjoint means MaxSim 0 under this vector family,
    * and a zero-scoring candidate is not served. The oracle mirrors
    * the same inner joins.
    */
  def maxSimRerank(docs: DataFrame, nQueries: Int = 10, legK: Int = 20,
                   k: Int = 10, chunkTok: Int = 24, buckets: Int = 16,
                   index: Option[DataFrame] = None): DataFrame = {
    val ct = index.getOrElse(maxSimChunkVectors(docs, chunkTok, buckets))
    val cands = bm25QueryByDoc(docs, nQueries, legK)
      .select(col("query_id"), col("doc_id"), col("lex_rank"))
    val qids = cands.select(col("query_id")).distinct()
    val qct = ct.join(broadcast(qids.withColumnRenamed("query_id",
        "doc_id")), Seq("doc_id"))
      .select(col("doc_id").as("query_id"), col("chunk").as("qchunk"),
        col("b"), col("c").as("qc"), col("nrm").as("qnrm"))
    // norms ride the index rows (constant within each chunk-pair
    // group), so no norm re-aggregation and no norm joins at serve time
    val dots = broadcast(cands)
      .join(broadcast(qct), Seq("query_id"))
      .join(ct.select(col("doc_id"), col("chunk").as("cchunk"),
        col("b"), col("c").as("cc"), col("nrm").as("cnrm")),
        Seq("doc_id", "b"))
      .groupBy(col("query_id"), col("doc_id"), col("lex_rank"),
        col("qchunk"), col("cchunk"))
      .agg(sum(col("qc") * col("cc")).as("dot"),
        max(col("qnrm")).as("qnrm"), max(col("cnrm")).as("cnrm"))
    val cos = dots
      .select(col("query_id"), col("doc_id"), col("lex_rank"),
        col("qchunk"), col("cchunk"),
        round(col("dot").cast("double") / (col("qnrm") * col("cnrm"))
          * lit(1.0e6), 0).cast("long").as("cos6u"))
    cos.groupBy(col("query_id"), col("doc_id"), col("lex_rank"),
        col("qchunk"))
      .agg(max(col("cos6u")).as("mxu"))
      .groupBy(col("query_id"), col("doc_id"), col("lex_rank"))
      .agg(sum(col("mxu")).as("s6u"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("s6u").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("lex_rank"),
        (col("s6u").cast("double") / lit(1000000.0)).as("maxsim"),
        col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** MaxSim vs BM25 agreement eval — [[Similarity.retrievalEval]]'s
    * harness applied to the late-interaction reranker: truth = the
    * BM25 top-k with graded relevance (k+1−rank), system =
    * [[maxSimRerank]]'s top-k, scored by nDCG and reciprocal rank per
    * query. Low nDCG = the reranker genuinely reorders lexical
    * candidates (what it is FOR); the row quantifies it per query
    * instead of asserting it.
    */
  def maxSimEval(docs: DataFrame, nQueries: Int = 10,
                 k: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d1412 = DecimalType(14, 12)
    val discArr = array(
      Similarity.dcgDiscounts(k).map(d => lit(d).cast(d1412)): _*)
    val recipArr = array(
      Similarity.recipRanks(k).map(d => lit(d).cast(d1412)): _*)
    val truth = bm25QueryByDoc(docs, nQueries, k)
      .select(col("query_id"), col("doc_id"),
        (lit(k + 1) - col("lex_rank")).cast(DecimalType(4, 0)).as("rel"),
        col("lex_rank"))
    val idcg = truth
      .select(col("query_id"),
        (col("rel") * element_at(discArr, col("lex_rank"))).as("t"))
      .groupBy(col("query_id"))
      .agg(sum(col("t")).as("idcg"), count(lit(1)).as("n_truth"))
    val sys = maxSimRerank(docs, nQueries, legK = 20, k = k)
      .select(col("query_id"), col("doc_id"), col("rank").as("sys_rank"))
    val hits = sys.join(
      truth.select(col("query_id"), col("doc_id"), col("rel")),
      Seq("query_id", "doc_id"))
    val dcg = hits
      .select(col("query_id"), col("sys_rank"),
        (col("rel") * element_at(discArr, col("sys_rank"))).as("t"))
      .groupBy(col("query_id"))
      .agg(sum(col("t")).as("dcg"), count(lit(1)).as("n_hits"),
        min(col("sys_rank")).as("first_hit_rank"))
    idcg.join(dcg, Seq("query_id"), "left")
      .select(col("query_id"), col("n_truth"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("first_hit_rank"),
        (round(coalesce(col("dcg"), lit(0)).cast("double") /
          col("idcg").cast("double") * lit(1.0e6), 0) / lit(1.0e6))
          .as("ndcg_vs_bm25"),
        coalesce(element_at(recipArr, col("first_hit_rank"))
          .cast("double"), lit(0.0)).as("rr"))
      .orderBy(col("query_id"))
  }

  /** Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
    * Buettcher 2009 — the standard lexical+dense fusion): for each
    * query document, the BM25 query-by-document leg ([[bm25QueryByDoc]])
    * and the exact dense leg ([[Similarity.annBruteForce]] over the
    * parallel embeddings table, vec_id ≡ doc_id) each contribute
    * 1/(K + rank) for their top-`legK`, and candidates rank by the sum.
    * RRF needs no score calibration between legs — only ranks — which
    * is what makes it robust when one leg's scores are on a different
    * scale (BM25 sums vs cosines).
    *
    * Scale shape: both legs broadcast the query side and keep their
    * per-query top-k as window-limited shuffles; the fusion itself
    * joins two ≤ nQueries·legK-row tables — negligible at any corpus
    * size. Determinism: ranks are exact ints, the two reciprocals are
    * IEEE doubles summed in a fixed 2-term expression, rounded to 6;
    * ties (same rrf from mirrored single-leg ranks) break by doc_id.
    */
  def hybridSearch(docs: DataFrame, embeddings: DataFrame,
                   nQueries: Int = 10, legK: Int = 20, k: Int = 10,
                   rrfK: Int = 60): DataFrame = {
    val lex = bm25QueryByDoc(docs, nQueries, legK)
      .select(col("query_id"), col("doc_id"), col("lex_rank"))
    val sem = Similarity.annBruteForce(embeddings, nQueries, legK)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("ann_rank"))
    lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"), col("lex_rank"),
        col("ann_rank"),
        (round(
          (coalesce(lit(1.0d) / (lit(rrfK.toDouble) + col("lex_rank").cast("double")), lit(0.0d)) +
            coalesce(lit(1.0d) / (lit(rrfK.toDouble) + col("ann_rank").cast("double")), lit(0.0d)))
          * lit(1.0e6), 0) / lit(1.0e6)).as("rrf"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Zipf-law fit per language: OLS slope of log10(frequency) on
    * log10(rank) over the token frequency table. Natural language sits
    * near slope −1; a corpus slice that doesn't (template spam,
    * generated gibberish, truncated boilerplate) distorts the head or
    * tail of the curve — the distributional sanity check beside
    * [[langId]]'s per-document signal and `dq_benford`'s numeric one.
    *
    * Determinism: frequencies and ranks are exact (count + row_number
    * with a total tie-break), log10 runs on identical integer inputs
    * and is pinned ONCE per term at 1e-6 units (round(v·1e6, 0), the
    * lm_score form — never round(v, k) of a libm double), the OLS
    * moments are exact integer sums (1e-6² = 1e-12-unit products),
    * and the slope/intercept are truncating integer divisions emitted
    * as micro-unit doubles — no decimal output columns, no double
    * arithmetic anywhere after the pin.
    * Scale shape: one vocabulary agg, one rank window per language,
    * one language-sized OLS agg; moment magnitudes stay under 38
    * digits through vocabularies of 1e8 types.
    */
  def zipfFit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec0 = DecimalType(38, 0)
    val freq = docs
      .select(col("lang"), explode(tokensCol(col("text"))).as("t"))
      .groupBy(col("lang"), col("t")).agg(count(lit(1)).as("f"))
    val ranked = freq.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
        .orderBy(col("f").desc, col("t"))))
    val x6 = round(log10(col("rank").cast("double")) *
      lit(1000000.0), 0).cast("long")
    val y6 = round(log10(col("f").cast("double")) *
      lit(1000000.0), 0).cast("long")
    ranked.select(col("lang"), col("f"), x6.as("x6"), y6.as("y6"))
      .groupBy(col("lang")).agg(
        count(lit(1)).as("n_types"), sum(col("f")).as("n_tokens"),
        sum(col("x6").cast(dec0)).as("sx6"),
        sum(col("y6").cast(dec0)).as("sy6"),
        sum((col("x6") * col("y6")).cast(dec0)).as("sxy12"),
        sum((col("x6") * col("x6")).cast(dec0)).as("sxx12"))
      .selectExpr("lang", "n_types", "n_tokens",
        "CAST(n_types AS DECIMAL(38,0)) * sxy12 - sx6 * sy6 AS num12",
        "CAST(n_types AS DECIMAL(38,0)) * sxx12 - sx6 * sx6 AS den12",
        "sx6", "sy6")
      .selectExpr("lang", "n_types", "n_tokens",
        "CASE WHEN den12 > 0 THEN (num12 * 1000000) div den12 END" +
          " AS slope_mu", "sx6", "sy6")
      .selectExpr("lang", "n_types", "n_tokens", "slope_mu",
        "CASE WHEN slope_mu IS NOT NULL THEN" +
          " (sy6 * 1000000 - slope_mu * sx6) div (n_types * 1000000)" +
          " END AS icept_mu")
      .selectExpr("lang", "n_types", "n_tokens",
        "CAST(slope_mu AS DOUBLE) / 1000000.0 AS zipf_slope",
        "CAST(icept_mu AS DOUBLE) / 1000000.0 AS zipf_intercept")
      .orderBy(col("lang"))
  }

  /** Heaps'-law vocabulary-growth fit V(n) = K·n^β — [[zipfFit]]'s
    * companion on the OTHER axis: Zipf checks the frequency curve of a
    * finished corpus, Heaps checks how the vocabulary GROWS as the
    * corpus accretes (β ≈ 0.4–0.6 for natural text; β near 0 means the
    * corpus has stopped contributing new types — the
    * diminishing-returns signal for further crawling; β near 1 means
    * type-explosion, usually boilerplate ids or encoding junk). One
    * growth point per document in doc_id order: cumulative tokens vs
    * cumulative distinct types, then the same exact-decimal log-log
    * OLS as the Zipf fit.
    *
    * The cumulative-type curve needs no rescan: a type's contribution
    * is its FIRST document (min doc_id per token — one
    * vocabulary-sized agg). The point table is doc-count-sized — DATA
    * scale at 100 TB — so the cumulatives run as the `ks_drift` /
    * `layout_zorder` bucketed parallel prefix: 256 equal-width doc_id
    * slices (exact integer `div` of the broadcast id bounds — monotone,
    * so (bucket, doc_id)-order ≡ doc_id-order), per-bucket totals fold
    * to a ≤257-row prefix table whose exclusive running sums broadcast
    * back as offsets, and the fact-scale windows are PARTITIONED by
    * bucket. Integer sums associate, so offset + within-bucket running
    * sum ≡ the global running sum, bit-identical to the single-sort
    * form. (At 100 TB you also thin to log-spaced sample points.)
    */
  def heapsFit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec0 = DecimalType(38, 0)
    val perDoc = docs.select(col("doc_id"),
      size(tokensCol(col("text"))).cast("long").as("n_tok"))
    val newTypes = docs
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("t"))
      .groupBy(col("t")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("new_types"))
    val joined = perDoc.join(newTypes, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("new_types"), lit(0L)).as("nt"))
    val bounds = joined.agg(
      min(col("doc_id")).as("dmin"), max(col("doc_id")).as("dmax"))
    val b = joined.crossJoin(broadcast(bounds))
      .withColumn("hb",
        expr("((doc_id - dmin) * 256) div (dmax - dmin + 1)"))
    val wPre = org.apache.spark.sql.expressions.Window
      .orderBy(col("hb"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val prefix = b.groupBy(col("hb"))
      .agg(sum(col("n_tok")).as("bc_tok"), sum(col("nt")).as("bc_nt"))
      .select(col("hb"),
        coalesce(sum(col("bc_tok")).over(wPre), lit(0L)).as("off_tok"),
        coalesce(sum(col("bc_nt")).over(wPre), lit(0L)).as("off_nt"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hb")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val pts = b.join(broadcast(prefix), Seq("hb"))
      .withColumn("cum_tokens", col("off_tok") + sum(col("n_tok")).over(wIn))
      .withColumn("cum_types", col("off_nt") + sum(col("nt")).over(wIn))
      .filter(col("cum_tokens") > 0 && col("cum_types") > 0)
    val x = log10(col("cum_tokens").cast("double"))
    val y = log10(col("cum_types").cast("double"))
    // each OLS term pinned to the 1e-12 grid as an INTEGER
    // (round(v*1e12, 0) — never round(v, 12) of a libm double, the
    // version-fragile form), summed exactly as DECIMAL(38,0), and
    // converted back to the SAME double values once at the boundary.
    val g = pts.agg(
      count(lit(1)).as("n_points"),
      max(col("cum_tokens")).as("n_tokens"),
      max(col("cum_types")).as("n_types"),
      sum(round(x * lit(1.0e12), 0).cast(dec0)).as("sx"),
      sum(round(y * lit(1.0e12), 0).cast(dec0)).as("sy"),
      sum(round(x * y * lit(1.0e12), 0).cast(dec0)).as("sxy"),
      sum(round(x * x * lit(1.0e12), 0).cast(dec0)).as("sxx"))
    val n = col("n_points").cast("double")
    def d(c: String) = col(c).cast("double") / lit(1.0e12)
    val den = n * d("sxx") - d("sx") * d("sx")
    g.select(col("n_points"), col("n_tokens"), col("n_types"),
      when(den > 0, round((n * d("sxy") - d("sx") * d("sy")) / den
        * lit(1.0e6), 0) / lit(1.0e6)).as("heaps_beta"),
      when(den > 0, round((d("sy") - (n * d("sxy") - d("sx") * d("sy"))
        / den * d("sx")) / n * lit(1.0e6), 0) / lit(1.0e6))
        .as("heaps_log10k"))
  }

  /** CCNet-style language-model quality scoring (Wenzek et al. 2020):
    * train a unigram LM on a reference slice of the corpus (`lang =
    * trainLang` here; CCNet trains KenLM on Wikipedia) and score EVERY
    * document by its average token log-probability under that model,
    * with Laplace smoothing so out-of-vocabulary tokens are finite.
    * Low avg_logprob = far from the reference distribution — the
    * perplexity-filter signal used to bucket web crawl into
    * head/middle/tail quality tiers.
    *
    * Scale shape: one aggregation builds the vocabulary (term counts
    * over the training slice), the corpus joins it on term with NO
    * broadcast hint (the vocabulary is data-scale; AQE broadcasts it
    * only when it actually fits), and the model size (total tokens T,
    * vocab size V) rides the plan as a 1-row aggregate cross-joined in
    * — one job, nothing collected to the driver.
    *
    * Determinism: each token's log-prob is rounded to 6 decimals and
    * scaled to an exact integer BEFORE the per-doc sum, so the
    * aggregation is order-independent (a double sum would depend on
    * partial-sum order); the average divides the exact sum once at the
    * output boundary.
    */
  def lmScore(docs: DataFrame, trainLang: String = "en"): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(tokensCol(col("text"))).as("t"))
    val train = toks.filter(col("lang") === trainLang)
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    lmDocRollup(lmTokenScores(toks.select(col("doc_id"), col("t")), train))
  }

  /** Per-token Laplace log-scores of a (carrier…, t) token stream
    * against a (t, c) vocabulary — the shared scoring stream behind
    * [[lmScore]] (ad-hoc train slice), [[lmScoreIndexed]] (persisted
    * postings index), and [[lmDrift]] (slice-level aggregation).
    * Carrier columns (doc_id, slice, …) pass through untouched; `t`
    * is consumed. Determinism: the log-prob is rounded to 6 decimals
    * and scaled to an exact long PER TOKEN, so every downstream sum is
    * order-independent regardless of how the caller aggregates.
    */
  private def lmTokenScores(toks: DataFrame, train: DataFrame): DataFrame = {
    val model = train.agg(
      sum(col("c")).cast("double").as("tt"),
      count(lit(1)).cast("double").as("vv"))
    val carriers = toks.columns.filterNot(_ == "t").map(col).toSeq
    toks.join(train.select(col("t"), col("c")), Seq("t"), "left_outer")
      .crossJoin(model)
      .select(carriers :+
        (coalesce(col("c"), lit(0L)) === 0L).cast("int").as("oov") :+
        round(log((coalesce(col("c"), lit(0L)).cast("double") + lit(1.0d)) /
          (col("tt") + col("vv") + lit(1.0d))) * lit(1e6), 0)
          .cast("long").as("lp6"): _*)
  }

  /** Per-doc roll-up of [[lmTokenScores]].
    * NO final round: s6 and n are exact integers, so the quotient is
    * the same IEEE double in every engine — rounding it would
    * reintroduce the half-micro boundary (s6/n CAN land exactly on
    * k + 0.5e-6, where Spark's and DuckDB's round() disagree).
    */
  private def lmDocRollup(scored: DataFrame): DataFrame =
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("lp6")).as("s6"),
        sum(col("oov")).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"),
        (col("s6").cast("double") / lit(1e6) /
          col("n_tokens").cast("double")).as("avg_logprob"),
        (col("n_oov").cast("double") /
          col("n_tokens").cast("double")).as("oov_rate"))
      .orderBy(col("doc_id"))

  /** DoReMi-style mixture reweighting (Xie et al. 2023, the
    * exponentiated-gradient tilt reduced to its one-shot form): each
    * SOURCE's sampling weight is its token share exponentially tilted
    * by its EXCESS loss under the reference LM — w_s ∝ share_s ·
    * exp(η·(L_s − min_t L_t)), where L_s is the source's mean token
    * negative log-probability ([[lmTokenScores]]' pinned integers, so
    * L is one exact division). Hard-for-the-reference-model domains
    * get upweighted, the DoReMi direction (the full algorithm
    * re-trains a proxy model per round; with a FIXED reference model
    * the multiplicative loop collapses to this closed form — one
    * honest tilt, not a cosmetically unrolled loop).
    *
    * Determinism: per-token log-probs pinned at 1e-6 (shared stream),
    * the tilt exp() pinned at 1e-9 (the logit-σ discipline — the one
    * libm call), per-source numerators pinned at 1e-12 integers so
    * the normalizer is an exact BIGINT sum, one final division.
    * Scale: one corpus scan (the token-score stream), everything
    * after is |sources|-row arithmetic with 1-row broadcast folds.
    */
  private def r6c(c: Column): Column =
    round(c * lit(1.0e6), 0) / lit(1.0e6)

  def mixtureReweight(docs: DataFrame, trainLang: String = "en",
                      eta: Double = 1.0): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"), col("lang"),
      explode(tokensCol(col("text"))).as("t"))
    val train = toks.filter(col("lang") === trainLang)
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val per = lmTokenScores(toks.select(col("source"), col("t")), train)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp6")).as("s6"))
      .withColumn("loss",
        -(col("s6").cast("double") / lit(1.0e6))
          / col("n_tokens").cast("double"))
    val nDocs = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val tot = per.agg(sum(col("n_tokens")).as("tot_tokens"))
    val minLoss = per.agg(min(col("loss")).as("min_loss"))
    val share =
      col("n_tokens").cast("double") / col("tot_tokens").cast("double")
    val excess = col("loss") - col("min_loss")
    val exp9 = round(exp(lit(eta) * excess) * lit(1.0e9), 0).cast("long")
    val pre = per.join(nDocs, "source")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(minLoss))
      .withColumn("share", share)
      .withColumn("excess", excess)
      .withColumn("exp9", exp9)
      .withColumn("num12", round(col("share")
        * (col("exp9").cast("double") / lit(1.0e9)) * lit(1.0e12), 0)
        .cast("long"))
    val z = pre.agg(sum(col("num12")).as("z12"))
    pre.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        r6c(col("share")).as("token_share"),
        r6c(col("loss")).as("loss"),
        r6c(col("excess")).as("excess_loss"),
        r6c(col("num12").cast("double") / col("z12").cast("double"))
          .as("weight"))
      .orderBy(col("source"))
  }

  /** [[lmScore]] served off the persisted postings index instead of an
    * ad-hoc corpus scan — the LM family joining the incremental-index
    * club: the SAME `(doc_id, dl, t, tf)` postings table that serves
    * BM25 retrieval ([[bm25Index]] / [[refreshBm25Index]] /
    * [[graft.operators.Dedup.retireRows]]) doubles as the unigram LM's
    * count store, so one persisted index carries retrieval AND quality
    * scoring, and every lifecycle move the index already supports
    * (idempotent daily append, takedown retirement) propagates to LM
    * scores for free. The vocabulary is one roll-up of the index
    * (`Σ tf` per term — identical to counting the train slice's tokens
    * directly, spec-asserted); model stats ride the plan as a 1-row
    * cross join; scored docs tokenize map-only and join the vocabulary
    * with no broadcast hint (vocabulary is data-scale; AQE decides).
    */
  def lmScoreIndexed(index: DataFrame, docs: DataFrame): DataFrame = {
    val train = index.groupBy(col("t")).agg(sum(col("tf")).as("c"))
    lmDocRollup(lmTokenScores(
      docs.select(col("doc_id"), explode(tokensCol(col("text"))).as("t")),
      train))
  }

  /** Perplexity-drift audit between the history corpus and a delta
    * batch, both scored under the FROZEN history LM (the postings
    * index): one row per slice with exact-integer score sums. A delta
    * whose `avg_logprob` sits well below history's own self-score (or
    * whose `oov_rate` jumps) is distribution shift arriving in the
    * ingest — the retrain trigger for the LM quality gate, exactly the
    * posture [[graft.operators.Similarity.ivfDriftAudit]] takes for
    * the ANN index. Slice means divide exact long sums once at the
    * boundary (order-independent, cross-engine bit-identical).
    */
  def lmDrift(index: DataFrame, histDocs: DataFrame,
              deltaDocs: DataFrame): DataFrame = {
    val train = index.groupBy(col("t")).agg(sum(col("tf")).as("c"))
    def toks(d: DataFrame, tag: String) =
      d.select(lit(tag).as("slice"), col("doc_id"),
        explode(tokensCol(col("text"))).as("t"))
    val scored = lmTokenScores(
      toks(histDocs, "history").unionByName(toks(deltaDocs, "delta")), train)
    scored.groupBy(col("slice"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(col("lp6")).as("s6"),
        sum(col("oov")).as("n_oov"))
      .select(col("slice"), col("n_docs"), col("n_tokens"),
        (col("s6").cast("double") / lit(1e6) /
          col("n_tokens").cast("double")).as("avg_logprob"),
        (col("n_oov").cast("double") /
          col("n_tokens").cast("double")).as("oov_rate"))
      .orderBy(col("slice"))
  }

  /** Context-length chunking: split each document into overlapping
    * token windows (size `chunkTokens`, stride `stride`) — the step
    * between cleaning and [[packSequences]] when documents exceed the
    * model's context. Chunks never cross documents; the trailing chunk
    * keeps whatever remains (shorter, never dropped — chunk starts are
    * `1, 1+stride, …` while ≤ n_tokens, so every token is covered).
    * Map-only: one `sequence`+`transform` per row, zero shuffle; emits
    * the chunk md5 + token count (the audit columns) rather than
    * re-materializing text. The token count is ARITHMETIC
    * (`least(chunkTokens, n − start + 1)` — the slice length by
    * construction), not a re-split of the joined chunk string, so it
    * cannot drift if the tokenizer ever stops being a lossless
    * join/split round-trip.
    */
  def chunkDocs(docs: DataFrame, chunkTokens: Int = 128,
                stride: Int = 96): DataFrame = {
    val toks = tokensCol(col("text"))
    docs
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), size(toks), lit(stride)),
          i => struct(
            least(lit(chunkTokens), size(toks) - i + lit(1))
              .as("n_chunk_tokens"),
            md5(concat_ws(" ", slice(toks, i, lit(chunkTokens))))
              .as("chunk_md5"))))
          .as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx"),
        col("c.n_chunk_tokens").as("n_chunk_tokens"),
        col("c.chunk_md5").as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Content-defined chunking (the Rabin/gear-hash CDC idea of LBFS /
    * FastCDC, at token granularity): a token is a CUT POINT when its
    * salted hash60 ≡ 0 (mod `divisor`), and a chunk runs from one cut
    * point (exclusive) to the next (inclusive) — so chunk boundaries
    * are decided by CONTENT, not position. Unlike [[chunkDocs]]'s
    * fixed-stride windows, inserting or deleting a token resynchronizes
    * after at most one chunk: every chunk not containing the edit keeps
    * its md5, which is what makes CDC the insertion-robust dedup
    * chunker (expected chunk length = `divisor` tokens).
    *
    * Entirely map-only — boundary test, chunk starts, and per-chunk
    * md5 happen in ONE compiled pass over the row's raw UTF-8 bytes
    * (the codegen'd [[org.apache.spark.sql.graft.CdcChunks]]
    * expression; no token explode, no window, zero shuffle); at 100 TB
    * this fuses into the parquet scan like the rest of the chunk
    * family. Null text emits nothing (posexplode of a null array).
    */
  /** The unordered chunk stream behind [[cdcChunks]] /
    * [[cdcDupChunks]] — kept separate so the dup aggregation never
    * sits on top of a canonical sort.
    */
  private def cdcChunkStream(docs: DataFrame, divisor: Int): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(org.apache.spark.sql.graft.CdcChunks
          .column(col("text"), divisor)).as(Seq("idx0", "c")))
      .select(col("doc_id"), (col("idx0") + 1).as("chunk_idx"),
        col("c.start_i").as("start_i"),
        col("c.n_chunk_tokens").as("n_chunk_tokens"),
        col("c.chunk_md5").as("chunk_md5"))

  def cdcChunks(docs: DataFrame, divisor: Int = 16): DataFrame =
    cdcChunkStream(docs, divisor)
      // hash-exchange before the canonical sort: under AQE the chunker
      // map stage materializes ONCE and the sort's range-bounds sampling
      // reads the shuffled rows instead of re-running the chunker (a
      // global sort samples its child twice otherwise). The extra
      // exchange moves the same narrow chunk rows the sort itself
      // shuffles, and gives the sort full parallelism even off a
      // single input split.
      .repartition(col("doc_id"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Dedup audit over [[cdcChunks]]: every chunk content that occurs
    * more than once corpus-wide — n_copies, distinct docs touched, and
    * the representative (minimum) location. Because the chunker is
    * content-defined, a shared passage shows up here even when its
    * surrounding context differs in every copy — the cross-document
    * boilerplate detector fixed-stride chunking structurally misses.
    * One hash-groupBy over the map-only chunk stream (map-side
    * combine), same shape as exact dedup.
    */
  def cdcDupChunks(docs: DataFrame, divisor: Int = 16): DataFrame =
    cdcChunkStream(docs, divisor)
      .groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("n_chunk_tokens")).as("n_chunk_tokens"))
      .filter(col("n_copies") > 1)
      .orderBy(col("chunk_md5"))

  /** The persisted-index side of INCREMENTAL CDC dedup: the distinct
    * chunk md5s of a corpus — membership is all the delta check needs,
    * so the index is one 32-char digest per distinct passage (far
    * smaller than the text), appended per batch without ever
    * re-chunking history. The CDC analogue of [[spanShingleIndex]].
    */
  def cdcChunkIndex(docs: DataFrame, divisor: Int = 16): DataFrame =
    cdcChunkStream(docs, divisor).select(col("chunk_md5")).distinct()

  /** Incremental CDC passage dedup — the daily-pipeline form of
    * [[cdcDupChunks]]: every chunk of a NEW batch whose content already
    * exists in the historical corpus, consulting only the persisted
    * chunk index ([[cdcChunkIndex]]), never history text. Because the
    * chunker is content-defined, a boilerplate passage is caught even
    * when the delta doc wraps it in brand-new context (boundaries
    * resynchronize after at most one chunk — asserted in
    * IncrementalDedupSpec). Delta-internal duplication is deliberately
    * out of scope (run [[cdcDupChunks]] within the delta for that);
    * this is the against-history check, exactly parallel to
    * [[incrementalSpans]].
    *
    * Scale shape: one scan of the delta (the map-only codegen'd
    * chunker), one scan of the index; the semi join shuffles delta
    * chunk rows and index digests by `chunk_md5`. History size affects
    * only the join build — never a re-chunk.
    */
  def incrementalCdcDups(histIndex: DataFrame, deltaDocs: DataFrame,
                         divisor: Int = 16): DataFrame =
    cdcChunkStream(deltaDocs, divisor)
      .join(histIndex.select(col("chunk_md5")), Seq("chunk_md5"), "left_semi")
      .select(col("doc_id"), col("chunk_idx"), col("start_i"),
        col("n_chunk_tokens"), col("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Close the daily loop for the CDC family (the [[appendSpanIndex]]
    * analogue): the chunk index after ingesting a batch — history
    * digests plus the batch's chunk digests, distinct. Idempotence
    * follows: re-checking the same batch against the updated index
    * flags every chunk of every doc (each now matches its own digest),
    * so reruns are safe — asserted in IncrementalDedupSpec. At scale
    * the distinct co-partitions with the existing index layout
    * (hash-bucketed on `chunk_md5`).
    */
  def appendCdcChunkIndex(histIndex: DataFrame, ingested: DataFrame,
                          divisor: Int = 16): DataFrame =
    histIndex.select(col("chunk_md5"))
      .unionByName(cdcChunkIndex(ingested, divisor))
      .distinct()

  /** Stupid-backoff bigram LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation"): the bigram upgrade of
    * [[lmScore]]. Each adjacent token pair scores
    * `s(t2|t1) = c(t1 t2) / c(t1)` when the training slice saw the
    * bigram, else `α · p_laplace(t2)` with α = 0.4 — no normalization
    * of the backoff (that is what makes it "stupid" and exactly what
    * web-scale LM filters ship, because it needs only two count
    * tables). Emits per-doc mean bigram log-score and the backoff rate
    * (share of pairs the bigram table missed — high = unlike the
    * reference corpus).
    *
    * Scale shape: two count aggregations over the training slice
    * (bigrams, unigrams), each joined to the corpus pair stream on its
    * own key with no broadcast hints (both tables are vocabulary-scale;
    * AQE decides), totals ride as a 1-row cross join. Per-pair
    * log-scores round+scale to exact longs before the per-doc sum —
    * order-independent at any parallelism, like every score in this
    * file.
    */
  def lmScoreBigram(docs: DataFrame, trainLang: String = "en",
                    alpha: Double = 0.4): DataFrame = {
    // guard: sequence(2, n) with n < 2 builds a DESCENDING sequence
    // (same trap as shinglesCol) — 1-token docs carry no bigram and are
    // excluded in both engines (oracle: WHERE len(toks) >= 2)
    val pairs = docs
      .filter(size(tokensCol(col("text"))) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(expr(
          """transform(sequence(2, size(split(text, ' '))),
            |  i -> struct(split(text, ' ')[i - 2] AS t1,
            |              split(text, ' ')[i - 1] AS t2))""".stripMargin))
          .as("p"))
      .select(col("doc_id"), col("lang"),
        col("p.t1").as("t1"), col("p.t2").as("t2"))
    val train = pairs.filter(col("lang") === trainLang)
    val bi = train.groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("cb"))
    // unigram counts over the SAME pair stream's prefix position plus
    // the final token of each doc = plain token counts; recount from
    // tokens to keep the model identical to lmScore's unigram table
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(tokensCol(col("text"))).as("t"))
    val uni = toks.filter(col("lang") === trainLang)
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val model = uni.agg(
      sum(col("c")).cast("double").as("tt"),
      count(lit(1)).cast("double").as("vv"))
    val scored = pairs
      .join(bi, Seq("t1", "t2"), "left_outer")
      .join(uni.select(col("t").as("t1"), col("c").as("c1")), Seq("t1"), "left_outer")
      .join(uni.select(col("t").as("t2"), col("c").as("c2")), Seq("t2"), "left_outer")
      .crossJoin(model)
      .select(col("doc_id"),
        (coalesce(col("cb"), lit(0L)) === 0L).cast("int").as("backoff"),
        round(log(
          when(coalesce(col("cb"), lit(0L)) > 0L,
            col("cb").cast("double") / col("c1").cast("double"))
            .otherwise(lit(alpha) *
              (coalesce(col("c2"), lit(0L)).cast("double") + lit(1.0d)) /
              (col("tt") + col("vv") + lit(1.0d)))) * lit(1e6), 0)
          .cast("long").as("lp6"))
    // NO final round (see lmScore): exact-integer quotients are already
    // cross-engine bit-identical; rounding them hits the half-micro
    // boundary — observed live on this very query (s6/n = −3.4871915
    // exactly, Spark → …191, DuckDB → …192)
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp6")).as("s6"),
        sum(col("backoff")).as("n_backoff"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("s6").cast("double") / lit(1e6) /
          col("n_bigrams").cast("double")).as("avg_logscore"),
        (col("n_backoff").cast("double") /
          col("n_bigrams").cast("double")).as("backoff_rate"))
      .orderBy(col("doc_id"))
  }

  /** Split audit: assign every doc to train/val/test by the SAME salted
    * hash as [[decontaminate]]'s test split (buckets 0-9 = test, 10-19 =
    * val, rest = train — membership is content-stable and consistent
    * with the decontamination pass), then report per-(split, language)
    * counts and within-split shares — the distribution-parity check run
    * before shipping an eval split (a skewed language mix across splits
    * invalidates comparisons). One aggregation; shares are exact-integer
    * quotients (bit-identical cross-engine, no rounding).
    */
  def splitAudit(docs: DataFrame): DataFrame = {
    val bucket = pmod(hash60(concat(lit("split_"), col("doc_id"))), lit(100))
    val split = when(bucket < 10, "test")
      .when(bucket < 20, "val").otherwise("train")
    docs.select(split.as("split"), col("lang"))
      .groupBy(col("split"), col("lang")).agg(count(lit(1)).as("n"))
      .withColumn("share",
        col("n").cast("double") / sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("split")))
          .cast("double"))
      .orderBy(col("split"), col("lang"))
  }

  /** Chunk-level (passage) dedup: group [[chunkDocs]] windows by md5
    * and report every chunk that appears more than once — repeated
    * PASSAGES across (or within) documents, the granularity document-
    * level dedup misses (two long docs sharing one boilerplate section
    * are not near-dups, but the section still trains twice). One
    * hash-key aggregation over the map-only chunk stream.
    */
  def chunkDupes(docs: DataFrame, chunkTokens: Int = 128,
                 stride: Int = 96): DataFrame =
    chunkDocs(docs, chunkTokens, stride)
      .groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("rep_doc"))
      .filter(col("n_chunks") > 1)
      .orderBy(col("chunk_md5"))

  /** Exact-substring duplicated-span inventory (the Lee et al. 2021
    * "Deduplicating Training Data Makes Language Models Better"
    * exact-substring variant): find every maximal region of every
    * document that is covered by a `k`-token window occurring more than
    * once anywhere in the corpus — duplication at ANY offset, the case
    * both document-level near-dup and fixed-stride passage dedup
    * ([[chunkDupes]]) miss. The suffix-array formulation of the paper
    * is replaced by the shuffle-native reduction: positional `k`-token
    * shingles → per-shingle occurrence count → merge overlapping
    * duplicated windows into maximal spans.
    *
    * Output: one row per (doc, maximal span) — `span_start`/`span_end`
    * (1-based token indices, inclusive), `span_tokens`, and `n_windows`
    * (how many duplicated windows merged into it).
    *
    * Plan shape (the scale story): the scan fuses with the shingle
    * build (one `transform` array per doc, map-only); ONE exchange of
    * position-level rows hashed by shingle partitions the corpus for
    * the occurrence-count window (sort-based, spillable — no unbounded
    * agg buffer on a flooded shingle, unlike a `collect_list` posting
    * list); the surviving duplicated positions (corpus-dedup-rate ×
    * positions, typically a few %) re-hash by `doc_id` for the island
    * window, and the span group-by reuses that partitioning
    * (`HashPartitioning(doc_id)` satisfies the `(doc_id, island)`
    * clustering — no third exchange, plan-asserted). The shingle key is
    * the 60-bit long hash, not the md5 hex string — 8 bytes instead of
    * 32 on every shuffled position row, and the position shuffle IS the
    * cost of this operator at scale. `maxOcc` excludes
    * ubiquitous boilerplate shingles (df beyond any real span's
    * multiplicity) so a header shared by millions of docs caps the
    * duplicated-position blow-up, mirroring [[Dedup]]'s stop-shingle
    * cap.
    *
    * Islands merge windows that overlap OR touch (`gap ≤ k`), so a
    * span is a maximal duplicated-coverage region — exactly the bytes
    * a scrubbing pass would cut.
    */
  def duplicatedSpans(docs: DataFrame, k: Int = 8,
                      maxOcc: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = count(lit(1)).over(Window.partitionBy(col("h")))
    mergeSpans(spanWindows(docs, k).withColumn("cnt", cnt)
      .filter(col("cnt") > 1 && col("cnt") <= maxOcc), k)
  }

  /** Positional `k`-token shingle windows: one row per (doc, start
    * position) with the 60-bit hash of the window — the shared front
    * end of the exact-substring span family. Map-only; docs shorter
    * than `k` produce no windows.
    */
  private[graft] def spanWindows(docs: DataFrame, k: Int): DataFrame = {
    val toks = tokensCol(col("text"))
    docs.select(col("doc_id"),
      explode(when(size(toks) >= k,
        transform(sequence(lit(1), size(toks) - lit(k - 1)),
          i => struct(i.as("i"),
            hash60(concat_ws(" ", slice(toks, i, lit(k)))).as("h"))))
        .otherwise(array().cast("array<struct<i:int,h:bigint>>")))
        .as("w"))
      .select(col("doc_id"), col("w.i").as("i"), col("w.h").as("h"))
  }

  /** Shared back end of the span family: merge flagged window positions
    * (any rows with `doc_id`, `i`) into maximal spans — windows within
    * gap ≤ `k` merge (they overlap or touch), beyond `k` break.
    */
  private[graft] def mergeSpans(flagged: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val brk = when(col("i") > lag(col("i"), 1).over(byDoc) + lit(k), 1)
      .otherwise(0)
    flagged
      .withColumn("island", sum(brk).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("i")).cast("long").as("span_start"),
        (max(col("i")) + lit(k - 1)).cast("long").as("span_end"),
        (max(col("i")) + lit(k) - min(col("i"))).cast("long")
          .as("span_tokens"),
        count(lit(1)).as("n_windows"))
      .drop("island")
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** The persisted-index side of INCREMENTAL span dedup: the distinct
    * 60-bit window hashes of a corpus — membership is all the delta
    * check needs, so the index is at most one long per corpus token
    * (8 bytes, far smaller than positions or text) and, like the
    * minhash signature table of [[graft.operators.Dedup
    * .incrementalNearDups]], is appended per batch without ever
    * re-reading history text.
    */
  def spanShingleIndex(docs: DataFrame, k: Int = 8): DataFrame =
    spanWindows(docs, k).select(col("h")).distinct()

  /** The PROVENANCED span index `(h, doc_id)` — what a pipeline that
    * must honor takedowns persists instead of the membership-only
    * [[spanShingleIndex]]: retirement deletes a doc's rows
    * ([[graft.operators.Dedup.retireRows]]) and a hash stays a member
    * exactly while ≥1 surviving doc still contains it — equal to
    * rebuilding the membership index on the surviving corpus
    * (spec-asserted), with history text never re-read. ~2× the
    * membership index's bytes; the price of deletability.
    */
  def spanShingleIndexProv(docs: DataFrame, k: Int = 8): DataFrame =
    spanWindows(docs, k).select(col("h"), col("doc_id")).distinct()

  /** Membership view of a (possibly retired) provenanced span index —
    * feed to [[incrementalSpans]] / [[noveltySpanScores]]. */
  def spanIndexMembership(prov: DataFrame): DataFrame =
    prov.select(col("h")).distinct()

  /** The provenanced CDC chunk index `(chunk_md5, doc_id)` — the
    * deletable form of [[cdcChunkIndex]], same contract as
    * [[spanShingleIndexProv]]: a digest survives retirement while some
    * surviving doc still produces it.
    */
  def cdcChunkIndexProv(docs: DataFrame, divisor: Int = 16): DataFrame =
    cdcChunkStream(docs, divisor)
      .select(col("chunk_md5"), col("doc_id")).distinct()

  /** Membership view of a (possibly retired) provenanced CDC index —
    * feed to [[incrementalCdcDups]]. */
  def cdcIndexMembership(prov: DataFrame): DataFrame =
    prov.select(col("chunk_md5")).distinct()

  /** Incremental exact-substring dedup — the daily-pipeline form of
    * [[duplicatedSpans]]: flag every maximal span of a NEW batch that
    * already exists in the historical corpus, consulting only the
    * persisted hash index ([[spanShingleIndex]]), never history text.
    * Delta-internal duplication is deliberately out of scope (run the
    * batch operator within the delta for that); this is the
    * against-history check, exactly parallel to
    * [[graft.operators.Dedup.incrementalNearDups]].
    *
    * Scale shape: one scan of the delta, one scan of the index; the
    * semi join shuffles delta positions and index hashes by `h` (the
    * index side is 8-byte longs); surviving positions re-hash by
    * doc_id for the island merge. History size affects only the join
    * build — never a re-tokenization.
    */
  def incrementalSpans(histIndex: DataFrame, deltaDocs: DataFrame,
                       k: Int = 8): DataFrame =
    mergeSpans(spanWindows(deltaDocs, k)
      .join(histIndex.select(col("h")), Seq("h"), "left_semi"), k)

  /** Close the daily loop for the span family (the
    * [[graft.operators.Dedup.appendSignatures]] analogue): the index
    * after ingesting a batch — history hashes plus the batch's window
    * hashes, distinct. Idempotence follows: re-checking the same batch
    * against the updated index flags every window of every doc (each
    * now matches its own hashes), so reruns are safe — asserted in
    * IncrementalDedupSpec. The append is union+distinct on 8-byte
    * longs; at scale the distinct co-partitions with the existing
    * index layout (hash-bucketed on `h`).
    */
  def appendSpanIndex(histIndex: DataFrame, ingested: DataFrame,
                      k: Int = 8): DataFrame =
    histIndex.select(col("h"))
      .unionByName(spanShingleIndex(ingested, k))
      .distinct()

  /** Per-document NOVELTY against the historical span index: the
    * fraction of a delta doc's `k`-token windows whose hash is NOT in
    * [[spanShingleIndex]] — the ranking signal a data-selection loop
    * uses to prioritize genuinely new content for ingestion (novelty ≈
    * 0 → the doc is already in the corpus verbatim or near-verbatim;
    * [[incrementalSpans]] tells you WHERE the overlap sits, this tells
    * you HOW MUCH, for every doc in one number). Docs shorter than `k`
    * tokens carry no windows and are excluded (no denominator).
    *
    * Scale shape: identical to [[incrementalSpans]] — one scan of the
    * delta, one of the index — but with a left join + flag instead of
    * a semi join so unmatched windows count; the per-doc agg is a
    * map-side-combine count pair, and novelty is ONE exact long/long
    * quotient at the output boundary (never rounded — the
    * [[lmScore]]-convention exact-quotient rule).
    */
  def noveltySpanScores(histIndex: DataFrame, deltaDocs: DataFrame,
                        k: Int = 8): DataFrame =
    spanWindows(deltaDocs, k)
      .join(histIndex.select(col("h"), lit(1).as("seen")),
        Seq("h"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("seen"), lit(0)).cast("long")).as("n_seen"))
      .select(col("doc_id"), col("n_windows"), col("n_seen"),
        ((col("n_windows") - col("n_seen")).cast("double") /
          col("n_windows").cast("double")).as("novelty"))
      .orderBy(col("doc_id"))

  /** Corpus-wide duplicated-token coverage audit over
    * [[duplicatedSpans]]: for EVERY document, how many of its tokens
    * sit inside a duplicated span (`dup_tokens`, exact — maximal spans
    * never overlap, so the sum double-counts nothing) and the coverage
    * ratio — the number Lee et al. report per corpus and the gate a
    * scrub-or-drop decision keys on (ratio ≈ 1 → drop the doc, mid →
    * scrub the spans, 0 → keep). Left join from the doc table keeps
    * zero-coverage docs in the audit; one exact long division per row
    * at the output boundary.
    */
  def spanStats(docs: DataFrame, k: Int = 8,
                maxOcc: Int = 10000): DataFrame = {
    val spans = duplicatedSpans(docs, k, maxOcc)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_tokens")).as("dup_tokens"))
    docs.select(col("doc_id"),
      size(tokensCol(col("text"))).cast("long").as("n_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double")
          / col("n_tokens").cast("double")).as("dup_ratio"))
      .orderBy(col("doc_id"))
  }

  /** The action step over [[duplicatedSpans]]: cut every duplicated
    * span out of every document — Lee et al.'s ExactSubstr cutter,
    * which removes ALL occurrences of a duplicated substring (the
    * conservative policy; keep-one-copy at document granularity is
    * [[graft.operators.Dedup.keepRepresentatives]]'s job). Emits audit
    * columns in the [[scrubDenylist]] convention — token counts before
    * / kept / cut and the md5 of the scrubbed text — rather than
    * re-materializing the corpus; zero-coverage docs pass through with
    * `n_cut = 0` and a doc that is ONE duplicated span scrubs to the
    * empty string.
    *
    * Scale shape: the span inventory's two position-level exchanges,
    * then the per-doc span list (a handful of (start, end) pairs)
    * groups by doc and joins back to the doc table on doc_id; the cut
    * itself is one map-side higher-order filter per row — no token
    * explode, no re-shuffle of text.
    */
  def spanScrub(docs: DataFrame, k: Int = 8,
                maxOcc: Int = 10000): DataFrame = {
    val spans = duplicatedSpans(docs, k, maxOcc)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("spans"))
    val toks = tokensCol(col("text"))
    val indexed = transform(toks, (t, i) =>
      struct(t.as("t"), (i + lit(1)).cast("long").as("i")))
    val kept = filter(indexed, s =>
      !exists(coalesce(col("spans"),
          array().cast("array<struct<span_start:bigint,span_end:bigint>>")),
        sp => s("i") >= sp("span_start") && s("i") <= sp("span_end")))
    docs.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(kept).cast("long").as("n_kept"),
        (size(toks) - size(kept)).cast("long").as("n_cut"),
        md5(concat_ws(" ", transform(kept, s => s("t"))))
          .as("scrubbed_md5"))
      .orderBy(col("doc_id"))
  }

  /** Chunk→document near-dup bridge: turn passage-level duplication
    * ([[chunkDupes]]) into DOCUMENT-level dedup groups. Docs sharing a
    * duplicated chunk become edges; [[Dedup.clusters]]'s pointer-jumping
    * connected components resolve transitive sharing (A shares a chunk
    * with B, B another with C → one cluster) into a representative per
    * document — the removal set is then `doc_id ≠ cluster_rep`, exactly
    * like [[Dedup.keepRepresentatives]]. Catches the case document-level
    * dedup misses: long docs assembled from the same passages without
    * being global near-dups.
    *
    * Scale shape: the chunk stream is map-only, the posting-list
    * aggregation shuffles (chunk_md5, doc_id) pairs once, and hot
    * chunks (boilerplate passages shared by thousands of docs) degrade
    * to star pairs at `maxShared` (O(size), keeps the flood one
    * component — same rationale as [[Dedup.MaxBucketSize]]). CC rounds
    * are O(log diameter).
    */
  def chunkClusters(docs: DataFrame, chunkTokens: Int = 128,
                    stride: Int = 96,
                    maxShared: Int = Dedup.MaxBucketSize): DataFrame = {
    val edges = chunkDocs(docs, chunkTokens, stride)
      .groupBy(col("chunk_md5"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(org.apache.spark.sql.graft.SortedPairs
        .column(col("ds"), maxShared).as(Seq("d1", "d2")))
      .distinct()
    Dedup.clusters(edges).orderBy(col("doc_id"))
  }

  /** Quality-score distribution drift: the per-snapshot monitoring
    * query of a curation pipeline — compare the per-source quality
    * histogram between two content-stable salted halves of the corpus.
    * On one snapshot the halves are exchangeable, so any per-decile
    * share gap is sampling noise: the baseline band. Run against
    * yesterday's snapshot as the other half, the same query turns a
    * silent scorer/extractor regression into a visible per-source,
    * per-decile share shift.
    *
    * Deciles are FIXED-WIDTH score buckets (`floor(score·10)`, top
    * bucket closed), not rank-based — rank deciles are drift-blind by
    * construction (always 10%). Shares are exact-integer quotients per
    * (source, half); identical doubles cross-engine, and their
    * difference is IEEE-exact. One aggregation + one source-keyed
    * window over ≤ |sources|·10 rows.
    */
  def qualityDrift(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    val sp = pmod(hash60(concat(lit("drift_"), col("doc_id"))), lit(2))
    val dec = least(floor(qualityScoreCol * lit(10.0d)).cast("int"), lit(9))
    docs.select(col("source"), sp.as("sp"), dec.as("decile"))
      .groupBy(col("source"), col("decile"))
      .agg(sum(when(col("sp") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("sp") === 1, 1L).otherwise(0L)).as("n_b"))
      .select(col("source"), col("decile"), col("n_a"), col("n_b"),
        when(sum(col("n_a")).over(w) > 0,
          col("n_a").cast("double") / sum(col("n_a")).over(w).cast("double"))
          .as("share_a"),
        when(sum(col("n_b")).over(w) > 0,
          col("n_b").cast("double") / sum(col("n_b")).over(w).cast("double"))
          .as("share_b"))
      .withColumn("abs_drift", abs(col("share_a") - col("share_b")))
      .orderBy(col("source"), col("decile"))
  }

  /** Deterministic fractional sampling: keep the docs whose 60-bit
    * content-independent id hash lands in the first `pct` of 100
    * buckets. Unlike `df.sample`, this is reproducible across engines,
    * runs, and partitionings (the standard way to cut a stable dev
    * slice of a 100 TB corpus), and it composes with incremental
    * ingestion — a doc's membership never changes.
    */
  def hashSample(docs: DataFrame, pct: Int = 10): DataFrame =
    docs.filter(
      pmod(hash60(concat(lit("sample_"), col("doc_id"))), lit(100)) < pct)

  /** Per-source top-decile quality cut: keep each source's best 10% by
    * quality score — the RELATIVE gate that complements
    * [[qualityFilter]]'s absolute threshold (an absolute cut starves
    * low-scoring sources entirely; a per-source decile keeps every
    * feed's best). Rank-based via ntile (integer bucketing over a
    * total order — no percentile interpolation, so there is no
    * floating threshold to drift cross-engine); one window shuffle
    * keyed by source.
    */
  def qualityTopDecile(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), col("source"),
      qualityScoreCol.as("quality_score"))
    .withColumn("dec", ntile(10).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
        .orderBy(col("quality_score"), col("doc_id"))))
    .filter(col("dec") === 10)
    .select(col("source"), col("doc_id"), col("quality_score"))
    .orderBy(col("source"), col("doc_id"))

  /** Quality gate: the filter step of the corpus pipeline — keep docs
    * whose [[stats]] quality score clears the threshold. Returns doc_id
    * + the score so the cut is auditable.
    */
  def qualityFilter(docs: DataFrame, minScore: Double = 0.35): DataFrame =
    stats(docs)
      .select(col("doc_id"), col("quality_score"))
      .filter(col("quality_score") >= minScore)

  /** Corpus balancing: cap each predicted language at `maxPerLang`
    * documents, keeping the highest-quality ones (ties by doc_id). The
    * data-mixing step before training — per-group top-k via one window
    * over (language), which plans as WindowGroupLimit (rank cut before
    * the shuffle's sort materializes the whole group).
    */
  def balanceByLanguage(docs: DataFrame, maxPerLang: Int = 50): DataFrame =
    langId(docs.withColumn("quality_score", qualityScoreCol),
        keep = Seq("quality_score"))
      .select(col("doc_id"), col("lang_pred"), col("quality_score"))
      .withColumn("lang_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang_pred"))
          .orderBy(col("quality_score").desc, col("doc_id"))))
      .filter(col("lang_rank") <= maxPerLang)

  /** Repetition signals per document — the Gopher-style (Rae et al.
    * 2021, "Scaling Language Models") duplicate-text heuristics used to
    * drop low-quality repetitive docs from LLM training corpora:
    *  - top_token_frac: occurrences of the most frequent token / tokens
    *  - top_bigram_frac: occurrences of the most frequent bigram / bigrams
    *  - dup_trigram_frac: 1 − distinct trigrams / total trigrams
    * All array higher-order expressions — map-only, zero shuffle,
    * O(tokens × distinct-tokens) per doc (docs here are ≤ ~100 tokens;
    * a real corpus would bound it the same way it bounds doc length).
    * Short-doc guards: a 1-token doc has no bigrams (Spark's
    * `sequence(a, b)` DESCENDS when b < a, so the guard is explicit).
    */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val toks = tokensCol(col("text"))
    def ngrams(n: Int): Column =
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j =>
            element_at(toks, i + j + 1)): _*)))
        .otherwise(array())
    def topFrac(grams: Column): Column = {
      val counts = transform(array_distinct(grams),
        g => size(filter(grams, x => x === g)))
      when(size(grams) > 0,
        round(array_max(counts).cast("double")
          / size(grams).cast("double") * lit(1.0e6), 0) / lit(1.0e6))
        .otherwise(lit(0.0))
    }
    val tri = ngrams(3)
    docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      topFrac(toks).as("top_token_frac"),
      topFrac(ngrams(2)).as("top_bigram_frac"),
      when(size(tri) > 0,
        round((lit(1.0) - size(array_distinct(tri)).cast("double")
          / size(tri).cast("double")) * lit(1.0e6), 0) / lit(1.0e6))
        .otherwise(lit(0.0))
        .as("dup_trigram_frac"))
  }

  /** Train/test decontamination: flag TRAINING docs sharing ≥ 1 content
    * n-gram with any TEST doc (the leakage check run before training —
    * e.g. Brown et al. 2020 §4 deduplicate eval sets from the corpus by
    * n-gram overlap). The n-gram is LONG (`ngram` = 8 tokens, in the
    * spirit of GPT-3's 13-gram check) because contamination means a
    * shared PASSAGE — short shingles measure vocabulary overlap and
    * would flag everything in a narrow domain. The split is a
    * deterministic doc_id hash (test = `testPct`% of docs), so
    * membership is stable across runs/engines. One shuffle of the
    * shingle index; per-shingle postings are split into test/train
    * member lists whose cross product is the collision set — stop
    * shingles (df > maxDf) are dropped exactly like the Jaccard index,
    * so one boilerplate shingle can't flag the corpus.
    */
  def decontaminate(docs: DataFrame, testPct: Int = 10,
                    maxDf: Int = Dedup.MaxShingleDf,
                    ngram: Int = 8): DataFrame = {
    val isTest =
      pmod(hash60(concat(lit("split_"), col("doc_id"))), lit(100)) < testPct
    val shf = docs.select(col("doc_id"),
        explode(org.apache.spark.sql.graft.ShingleHash60
          .column(col("text"), ngram)).as("shingle"))
      .withColumn("is_test", isTest)
    val posts = shf.groupBy(col("shingle")).agg(
        sort_array(collect_list(when(col("is_test"), col("doc_id"))))
          .as("tds"),
        sort_array(collect_list(when(!col("is_test"), col("doc_id"))))
          .as("rds"))
      .filter(size(col("tds")) > 0 && size(col("rds")) > 0 &&
        size(col("tds")) + size(col("rds")) <= maxDf)
    posts
      .select(explode(col("rds")).as("doc_id"), col("tds"))
      .select(col("doc_id"), explode(col("tds")).as("test_doc"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_collisions"),
        countDistinct(col("test_doc")).as("n_test_docs"))
      .orderBy(col("doc_id"))
  }

  /** Balanced per-source sample: keep `perSource` docs per source,
    * chosen by deterministic content-independent hash order (md5 of a
    * salted doc_id) — the "uniform random but reproducible" per-stratum
    * downsample used to flatten source skew in a training mix. One
    * window shuffle; the rank cut plans as WindowGroupLimit so no
    * stratum is ever fully sorted.
    */
  /** Weighted sampling without replacement — Efraimidis–Spirakis
    * [IPL 2006]: per source, keep the `perSource` docs with the largest
    * exponential race keys ln(u)/w (the monotone form of u^(1/w)),
    * where u is a seeded-hash uniform and w the document's weight.
    * Heavier docs win proportionally more often, every doc keeps a
    * nonzero chance, and the top-k is computed per partition then
    * merged (WindowGroupLimit) — the ONE-PASS mergeable weighted
    * sampler a mixture pipeline runs at corpus scale, vs
    * [[balancedSample]]'s uniform hash rank. Keys are rounded to 12
    * decimals (doc_id tiebreak) so cross-engine libm ulp differences
    * cannot reorder the race; the weight here is ln(1+n_chars) — favor
    * long documents — but any positive per-doc score slots in.
    */
  def weightedSample(docs: DataFrame, perSource: Int = 10,
      salt: String = "ws_"): DataFrame = {
    val u = (graft.functions.TextFunctions.hash60(
      concat(lit(salt), col("doc_id"))).cast("double") + 0.5) /
      graft.operators.Sketches.HashRange
    val w = log(lit(1.0) + col("n_chars").cast("double"))
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("samp_key",
        round(log(u) / w * lit(1.0e12), 0) / lit(1.0e12))
      .withColumn("samp_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("samp_key").desc, col("doc_id"))))
      .filter(col("samp_rank") <= perSource)
      .select(col("source"), col("samp_rank"), col("doc_id"),
        col("n_chars"), col("samp_key"))
      .orderBy(col("source"), col("samp_rank"))
  }

  /** Per-epoch deterministic global shuffle audit: each epoch orders
    * the corpus by a salted hash (the reproducible shuffle a trainer
    * needs for resumable runs — position is a pure function of
    * (epoch, doc)), and the audit measures SAME-SOURCE ADJACENCY per
    * epoch against the source-sorted worst case: a correct shuffle
    * breaks source runs, so adjacency should sit near the
    * sum-of-squares expectation instead of ~1. All counts exact; the
    * two rates pin as safe micro divisions.
    *
    * Scale shape: a `Window.partitionBy(epoch)` rank would hash the
    * whole corpus onto ONE reducer per epoch (epochs is tiny) — the
    * classic global-rank scale-killer. Instead: range-partition on
    * (epoch, hash, doc_id), sort within partitions, and assign global
    * positions with `zipWithIndex` (per-partition sizes + offsets — one
    * extra count job, every partition corpus/N-sized). Adjacency is
    * then a self-join on the unique position key (hash-partitioned,
    * no single-task stage anywhere). Epoch boundaries are excluded by
    * the same-epoch filter; positions never leave the plan, so range
    * boundary sampling cannot affect the output — only the total order
    * does, and that is fully tie-broken.
    */
  def epochShuffleAudit(docs: DataFrame, epochs: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val base = docs.select(col("doc_id"), col("source"))
    val byEpoch = (0 until epochs).map { e =>
      base.withColumn("epoch", lit(e))
        .withColumn("hkey", graft.functions.TextFunctions.hash60(
          concat(lit(s"ep${e}_"), col("doc_id"))))
    }.reduce(_.unionByName(_))
    val sorted = byEpoch
      .repartitionByRange(col("epoch"), col("hkey"), col("doc_id"))
      .sortWithinPartitions(col("epoch"), col("hkey"), col("doc_id"))
    val indexed = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      },
      sorted.schema.add("gpos", org.apache.spark.sql.types.LongType,
        nullable = false))
    val nxt = indexed.select((col("gpos") - 1).as("gpos"),
      col("epoch").as("nxt_epoch"), col("source").as("nxt_src"))
    val adj = indexed.join(nxt, Seq("gpos"))
      .filter(col("epoch") === col("nxt_epoch"))
      .groupBy(col("epoch"))
      .agg(sum(when(col("source") === col("nxt_src"), 1L).otherwise(0L))
        .as("n_same_adj"))
    // the corpus row count is ONE scalar (every epoch carries the whole
    // corpus) — a 1-row aggregate fold, the moment-collect discipline
    val nDocs = base.count()
    adj
      .select(col("epoch"), lit(nDocs).as("n_docs"), col("n_same_adj"),
        (round(col("n_same_adj").cast("double")
          / (col("n_docs") - 1).cast("double")
          * lit(1.0e6), 0) / lit(1.0e6)).as("same_adj_rate"))
      .orderBy(col("epoch"))
  }

  def balancedSample(docs: DataFrame, perSource: Int = 10): DataFrame =
    docs.select(col("doc_id"), col("source"))
      .withColumn("samp_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(md5(concat(lit("bs_"), col("doc_id"))), col("doc_id"))))
      .filter(col("samp_rank") <= perSource)
      .orderBy(col("source"), col("samp_rank"))

  /** The composed corpus-curation pipeline — the four stages a
    * training-data pipeline actually ships, chained end to end over one
    * corpus and verified as ONE query:
    *   1. quality gate ([[qualityFilter]]): drop low-quality docs;
    *   2. near-dup removal ([[Dedup.keepRepresentatives]]): cluster
    *      near-dups over the SURVIVING corpus, keep representatives;
    *   3. decontamination ([[decontaminate]]): drop the held-out test
    *      slice and every training doc that shares content shingles
    *      with it;
    *   4. balanced mix ([[balancedSample]]): per-source deterministic
    *      downsample of what remains.
    * Each stage consumes the previous stage's corpus (so e.g. the dedup
    * df-cap and the contamination index see post-filter documents —
    * order matters and is pinned by the oracle). At 100 TB each stage
    * is a materialized table between jobs; this single-query form is
    * the semantic contract.
    */
  /** Shared per-domain aggregate behind [[domainProfile]] and
    * [[curateGated]]'s gate: (source, n_docs, n_tokens, n_exact_dup,
    * n_neardup, q6_sum) — one token scan, one md5-fingerprint df agg
    * (exact-dup participation), the dedup family's own capped
    * near-dup pair build (near-dup participation), and the
    * 1e-6-integer quality sum (exact, order-free). Every join is
    * doc- or fingerprint-keyed; output is domain-cardinality.
    */
  private def domainStats(docs: DataFrame): DataFrame = {
    // perDoc is referenced twice (fingerprint-df agg + the join below);
    // it is narrow (no text) but its lineage is the quality token scan —
    // materialize so the scan runs once (the curate discipline)
    val perDoc = docs.select(col("doc_id"), col("source"),
      size(tokensCol(col("text"))).cast("long").as("n_tok"),
      round(qualityScoreCol * lit(1.0e6), 0).cast("long").as("q6"),
      md5(col("text")).as("fp"))
      .localCheckpoint(false)
    val fpDf = perDoc.groupBy(col("fp")).agg(count(lit(1)).as("fp_df"))
    val ndDocs = Dedup.ngramJaccardPairs(docs)
      .select(explode(array(col("d1"), col("d2"))).as("doc_id"))
      .distinct()
      .withColumn("is_nd", lit(1L))
    perDoc.join(fpDf, Seq("fp"))
      .join(ndDocs, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(when(col("fp_df") > 1, 1L).otherwise(0L)).as("n_exact_dup"),
        sum(coalesce(col("is_nd"), lit(0L))).as("n_neardup"),
        sum(col("q6")).as("q6_sum"))
  }

  /** Per-domain (host-keyed — the fixture's `source` column stands in
    * for the URL host) corpus profile: doc/token shares, exact- and
    * near-duplicate participation rates, and mean quality — the
    * C4/RefinedWeb-style signal table a crawl-scale curation run
    * consults BEFORE document-level decisions (a domain that is 40%
    * near-duplicate is a mirror farm; one whose mean quality sits on
    * the floor is template noise — both are cheaper to gate at the
    * domain level than to re-discover doc by doc).
    *
    * Determinism: counts are exact; the four rates divide exact
    * integers once and pin at 1e-6; mean quality divides the exact
    * per-doc 1e-6-integer sum once (order-free).
    */
  def domainProfile(docs: DataFrame): DataFrame =
    profileFrom(domainStats(docs))

  /** The rate/share projection over a per-domain stats table (source,
    * n_docs, n_tokens, n_exact_dup, n_neardup, q6_sum) — shared by
    * [[domainProfile]] and [[domainProfileIncremental]] so the output
    * contract cannot drift between the full rebuild and the fold. */
  private def profileFrom(base: DataFrame): DataFrame = {
    val tot = base.agg(sum(col("n_docs")).as("t_docs"),
      sum(col("n_tokens")).as("t_toks"))
    def r6(c: Column): Column = round(c * lit(1.0e6), 0) / lit(1.0e6)
    base.crossJoin(broadcast(tot)).select(
      col("source"), col("n_docs"),
      r6(col("n_docs").cast("double") / col("t_docs").cast("double"))
        .as("doc_share"),
      col("n_tokens"),
      r6(col("n_tokens").cast("double") / col("t_toks").cast("double"))
        .as("token_share"),
      col("n_exact_dup"),
      r6(col("n_exact_dup").cast("double") / col("n_docs").cast("double"))
        .as("exact_dup_rate"),
      col("n_neardup"),
      r6(col("n_neardup").cast("double") / col("n_docs").cast("double"))
        .as("neardup_rate"),
      r6(col("q6_sum").cast("double") / (col("n_docs").cast("double")
        * lit(1.0e6))).as("mean_quality"))
      .orderBy(col("source"))
  }

  /** The purely ADDITIVE per-domain slice of [[domainStats]] — (source,
    * n_docs, n_tokens, q6_sum) — the persisted table a nightly
    * [[domainProfileIncremental]] fold adds a delta's counts into.
    * Everything here is a sum of per-document values, so folding is
    * exact by construction. One token scan per batch, domain-
    * cardinality output. */
  def domainAdditiveStats(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        size(tokensCol(col("text"))).cast("long").as("n_tok"),
        round(qualityScoreCol * lit(1.0e6), 0).cast("long").as("q6"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(col("q6")).as("q6_sum"))

  /** The exact-dup PROVENANCE index — (fp, source, n): per-domain doc
    * counts keyed by content fingerprint. Exact-dup participation is
    * NOT domain-additive (a delta doc can turn a historical unique doc
    * into a duplicate), so the persisted state must keep fingerprint
    * granularity: n_exact_dup(domain) = Σ over fp with CORPUS-total
    * df > 1 of n(fp, domain) — pure arithmetic over the index, never a
    * text re-hash. Counts are additive per (fp, source), so folding a
    * delta is a sum. */
  def fpDomainIndex(docs: DataFrame): DataFrame =
    docs.select(md5(col("text")).as("fp"), col("source"))
      .groupBy(col("fp"), col("source")).agg(count(lit(1)).as("n"))

  /** The near-dup PARTICIPANT set (doc_id) — every doc appearing in ≥1
    * [[Dedup.ngramJaccardPairs]] pair; what last run persisted so the
    * incremental fold only has to ADD the delta's blast radius. */
  def ndParticipants(docs: DataFrame): DataFrame =
    Dedup.ngramJaccardPairs(docs)
      .select(explode(array(col("d1"), col("d2"))).as("doc_id"))
      .distinct()

  /** [[domainProfile]]'s nightly-delta twin — the lifecycle leg the
    * domain-curation family was missing: the persisted per-domain
    * stats absorb the delta WITHOUT rescanning history text.
    *
    *  - `histStats` ([[domainAdditiveStats]]), `histFpIdx`
    *    ([[fpDomainIndex]]): additive folds — delta counts sum in.
    *  - Exact-dup participation re-derives from the FOLDED fingerprint
    *    index (fingerprint-granular because a delta doc can flip a
    *    historical doc's dup status) — index arithmetic, no text.
    *  - Near-dup participation: history participants
    *    ([[ndParticipants]], persisted) UNION the endpoints of the
    *    delta-touching pairs from
    *    [[Dedup.incrementalPairsFromPostings]] over the persisted
    *    posting index — only the delta is shingled; the blast radius
    *    (history docs a delta doc newly pairs with) is attributed to
    *    its domain via the (doc_id, source) metadata table. Exact
    *    full-rebuild parity whenever the df cap is inactive (the test
    *    SFs); under an active cap history-history pairs are immutable
    *    (the [[Dedup.incrementalClusters]] contract).
    *
    * The delta text is scanned twice (per-doc stats + shingles) — it
    * is the small side by contract; a pipeline that cares lands the
    * per-doc scan once (the splitE2E posting-index discipline).
    * Oracle = [[domainProfile]] over the full corpus, verbatim.
    */
  def domainProfileIncremental(histStats: DataFrame, histFpIdx: DataFrame,
                               histPostings: DataFrame,
                               histParticipants: DataFrame,
                               histDocSources: DataFrame,
                               deltaDocs: DataFrame): DataFrame = {
    val deltaPerDoc = deltaDocs.select(col("doc_id"), col("source"),
      size(tokensCol(col("text"))).cast("long").as("n_tok"),
      round(qualityScoreCol * lit(1.0e6), 0).cast("long").as("q6"),
      md5(col("text")).as("fp"))
    val stats = histStats.unionByName(
        deltaPerDoc.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
            sum(col("q6")).as("q6_sum")))
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("q6_sum")).as("q6_sum"))
    val fpIdx = histFpIdx.unionByName(
        deltaPerDoc.groupBy(col("fp"), col("source"))
          .agg(count(lit(1)).as("n")))
      .groupBy(col("fp"), col("source")).agg(sum(col("n")).as("n"))
    val fpTot = fpIdx.groupBy(col("fp")).agg(sum(col("n")).as("tot"))
    val exactDup = fpIdx.join(fpTot, Seq("fp")).filter(col("tot") > 1)
      .groupBy(col("source")).agg(sum(col("n")).as("n_exact_dup"))
    val participants = histParticipants.select(col("doc_id"))
      .unionByName(
        Dedup.incrementalPairsFromPostings(histPostings,
            Dedup.shingled(deltaDocs), deltaDocs.select(col("doc_id")))
          .select(explode(array(col("d1"), col("d2"))).as("doc_id")))
      .distinct()
    val srcMap = histDocSources.select(col("doc_id"), col("source"))
      .unionByName(deltaDocs.select(col("doc_id"), col("source")))
    val nd = participants.join(srcMap, Seq("doc_id"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_neardup"))
    profileFrom(stats
      .join(exactDup, Seq("source"), "left")
      .join(nd, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        coalesce(col("n_exact_dup"), lit(0L)).as("n_exact_dup"),
        coalesce(col("n_neardup"), lit(0L)).as("n_neardup"),
        col("q6_sum")))
  }

  /** [[curate]] behind a DOMAIN gate — the deny/allow stage a
    * crawl-scale pipeline runs first (C4's blocklist, RefinedWeb's
    * URL filtering): a domain is admitted when its mean quality and
    * near-dup participation clear thresholds AND it is not on the
    * explicit denylist; the 4-stage document cascade then runs over
    * the admitted domains only. Thresholds compare exact integers
    * (q6_sum ≥ minQ6·n_docs; n_neardup·100 ≤ maxNearDupPct·n_docs) so
    * the gate is bit-portable. The gate is computed on the RAW corpus
    * (the profile a crawler sees), not post-filter.
    */
  def curateGated(docs: DataFrame, minQ6: Long = 330000L,
                  maxNearDupPct: Int = 16,
                  denyDomains: Seq[String] = Nil,
                  minScore: Double = 0.35, threshold: Double = 0.5,
                  testPct: Int = 10, perSource: Int = 10): DataFrame = {
    val allowed0 = domainStats(docs)
      .filter(col("q6_sum") >= lit(minQ6) * col("n_docs") &&
        col("n_neardup") * lit(100L)
          <= lit(maxNearDupPct.toLong) * col("n_docs"))
      .select(col("source"))
    val allowed =
      if (denyDomains.isEmpty) allowed0
      else allowed0.filter(!col("source").isInCollection(denyDomains))
    // the admitted-domain table is domain-cardinality (tiny) but its
    // lineage is the full gate build (token scan + pair chain) — and
    // the curate cascade references the gated corpus at every stage.
    // Materialize the VERDICT, not the corpus, so the gate is paid
    // once (the split_leak_audit build-once lesson).
    curate(docs.join(allowed.localCheckpoint(false), Seq("source"),
        "left_semi"),
      minScore, threshold, testPct, perSource)
  }

  def curate(docs: DataFrame, minScore: Double = 0.35,
             threshold: Double = 0.5, testPct: Int = 10,
             perSource: Int = 10): DataFrame = {
    // Materialize each stage's VERDICT (bare doc_id sets — the narrow
    // tables, never the corpus): every later stage references the
    // previous stage's corpus, and without the checkpoint each
    // reference re-expands the full upstream chain in one physical
    // plan (the quality token scan ran 3×, the survivor join subtree
    // 2× — measured; curateGated paid it all twice more through the
    // gate). Same discipline as curateGated's admitted-domain table.
    val qIds = qualityFilter(docs, minScore).select(col("doc_id"))
      .localCheckpoint(false)
    val d1 = docs.join(qIds, Seq("doc_id"), "left_semi")
    val d2Ids = Dedup.keepRepresentatives(d1, threshold)
      .select(col("doc_id")).localCheckpoint(false)
    // d2Ids already passed the quality gate — re-deriving d2 from the
    // raw corpus keeps each reuse a scan + one semi join, no re-scoring
    val d2 = docs.join(d2Ids, Seq("doc_id"), "left_semi")
    val flagged = decontaminate(d2, testPct).select(col("doc_id"))
      .localCheckpoint(false)
    val isTest =
      pmod(hash60(concat(lit("split_"), col("doc_id"))), lit(100)) < testPct
    val d3 = d2.filter(!isTest).join(flagged, Seq("doc_id"), "left_anti")
    balancedSample(d3, perSource)
  }

  /** Per-document curation LEDGER — the observability complement of
    * [[curate]]: one row per INPUT document recording every stage's
    * verdict and the first stage that dropped it. This is what a real
    * pipeline owes its auditors (takedown requests, licensing reviews,
    * "why is doc X (not) in the training set?") and what `curate` alone
    * cannot answer, since it only emits the survivors.
    *
    * Stage verdicts are evaluated on exactly the corpus each stage saw
    * in the cascade (near-dup clustering over quality survivors, the
    * contamination index over dedup survivors — same order as
    * [[curate]], pinned by the oracle), so verdicts for stages a doc
    * never reached are NULL, not recomputed counterfactuals. The
    * shipped set (status = 'shipped') is exactly `curate`'s output.
    *
    * Scale shape: every verdict table is keyed by doc_id, so the
    * assembly is a chain of equi joins on one key — the first exchange
    * hash-partitions on doc_id and every later join reuses it. The
    * stage internals inherit their own operators' pinned shapes.
    */
  def curationLedger(docs: DataFrame, minScore: Double = 0.35,
                     threshold: Double = 0.5, testPct: Int = 10,
                     perSource: Int = 10): DataFrame = {
    // the same verdict-materialization discipline as [[curate]]: scored
    // (one quality token scan), keptIds (the near-dup pair chain) and
    // flagged (the contamination shingle pass) are each referenced
    // twice — once to advance the cascade, once in the final ledger
    // assembly — and without the checkpoints each reference re-runs
    // the whole upstream chain inside one plan
    val scored = stats(docs).select(col("doc_id"), col("quality_score"))
      .localCheckpoint(false)
    val d1 = docs.join(
      scored.filter(col("quality_score") >= minScore).select(col("doc_id")),
      Seq("doc_id"))
    val keptIds = Dedup.keepRepresentatives(d1, threshold)
      .select(col("doc_id")).localCheckpoint(false)
    val d2 = docs.join(keptIds, Seq("doc_id"), "left_semi")
    val flagged = decontaminate(d2, testPct).select(col("doc_id"))
      .localCheckpoint(false)
    val isTest =
      pmod(hash60(concat(lit("split_"), col("doc_id"))), lit(100)) < testPct
    val d3 = d2.filter(!isTest).join(flagged, Seq("doc_id"), "left_anti")
    // rank over ALL of d3 (no cut) so capped docs carry their rank too
    val ranks = d3.select(col("doc_id"), col("source"))
      .withColumn("samp_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(md5(concat(lit("bs_"), col("doc_id"))), col("doc_id")))
        .cast("int"))
      .select(col("doc_id"), col("samp_rank"))
    docs.select(col("doc_id"), col("source"))
      .join(scored, Seq("doc_id"))
      .join(keptIds.withColumn("kept", lit(true)), Seq("doc_id"), "left")
      .join(flagged.withColumn("contam", lit(true)), Seq("doc_id"), "left")
      .join(ranks, Seq("doc_id"), "left")
      .withColumn("quality_pass", col("quality_score") >= minScore)
      .withColumn("is_test", isTest)
      .select(
        col("doc_id"), col("source"), col("quality_score"),
        col("quality_pass"),
        when(col("quality_pass"), col("kept").isNull).as("near_dup"),
        col("is_test"),
        when(col("quality_pass") && col("kept").isNotNull && !col("is_test"),
          col("contam").isNotNull).as("contaminated"),
        col("samp_rank"),
        when(!col("quality_pass"), "quality")
          .when(col("kept").isNull, "near_dup")
          .when(col("is_test"), "test_split")
          .when(col("contam").isNotNull, "contaminated")
          .when(col("samp_rank") > perSource, "source_cap")
          .otherwise("shipped").as("status"))
      .orderBy(col("doc_id"))
  }

  /** BPE merge learning (Sennrich et al. 2016): learn `numMerges`
    * byte-pair merges from the corpus. The corpus-scale work is ONE
    * aggregation — the word-frequency table; every merge iteration then
    * runs on that vocabulary table (distinct word types, orders of
    * magnitude smaller than the corpus), exactly how production BPE
    * trainers scale. Pair counts are a distributed aggregation; only
    * the 1-row argmax lands on the driver each round (the same
    * bounded-driver-loop shape as the k-means trainer in Similarity).
    *
    * Determinism: ties on pair frequency break lexicographically on the
    * pair string; merge application is left-to-right non-overlapping
    * (space-delimited string `replace`, which both engines implement
    * identically), so the learned merge table is engine-exact — the
    * oracle unrolls the same k stages in SQL.
    *
    * Returns (stage, pair, merged, freq) — the ordered merge table a
    * tokenizer ships.
    */
  /** Unigram-LM tokenizer piece inventory (Kudo 2018, the
    * SentencePiece model family — the third real-world subword
    * algorithm beside greedy-vocab and BPE): candidate pieces are all
    * substrings of length 1..`maxPieceLen` counted over token
    * OCCURRENCES (multiplicity), the kept inventory is the top-`vocabK`
    * by count plus every single character (coverage guarantee, the
    * SentencePiece byte-fallback analogue), and each piece carries
    * -ln(count/total) pinned ONCE at 1e-9 integer units (the λ
    * convention — never round(v, k) of a libm double). Frequency-seeded
    * probabilities, the standard inventory initialization; EM pruning
    * rounds would shrink it without changing the serving shape.
    *
    * Scale shape: one explode + hash agg keyed piece (map-side
    * combinable), a 1-row total, then the top-`vocabK` via
    * `orderBy().limit(vocabK)` — which plans as TakeOrderedAndProject
    * (per-partition partial top-K, vocabK-bounded merge; the same
    * distributed shape as `bars_last_k`) — unioned with the single
    * chars and deduplicated over a model-sized set. The distinct
    * candidate-substring table is unbounded (byte-level/CJK corpora),
    * so no stage may sort or rank it on a single partition: an
    * unpartitioned rank window here was the round-12 scale defect
    * (`Exchange SinglePartition → Sort → Window` over every distinct
    * substring; PlanSpec pins its absence).
    */
  def unigramPieces(docs: DataFrame, maxPieceLen: Int = 4,
                    vocabK: Int = 48): DataFrame =
    unigramPiecesFromWf(wordFreq(docs), maxPieceLen, vocabK)

  /** [[unigramPieces]] off a precomputed word-frequency table — the
    * word-TYPE form of the candidate-substring count: substrings are
    * generated once per DISTINCT word and weighted by its occurrence
    * frequency (sum(f) ≡ the per-occurrence count exactly, including
    * within-word multiplicity), so the explode touches word types
    * (Heaps' law), not token occurrences. Compositions that already
    * hold a wf checkpoint ([[unigramPruneLineage]], [[unigramEmGain]],
    * [[unigramLmEm]]) thread it through so the corpus is tokenized
    * once per query.
    */
  private def unigramPiecesFromWf(wf: DataFrame, maxPieceLen: Int,
                                  vocabK: Int): DataFrame = {
    val cnt = wf.select(col("f"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)), s ->
           | transform(sequence(1, least($maxPieceLen, length(w) - s + 1)),
           |   l -> substring(w, s, l))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("f")).as("n_occ"))
      .localCheckpoint(false)
    val tot = cnt.agg(sum(col("n_occ")).as("tot"))
    // kept set = top-vocabK over ALL pieces ∪ every single char — the
    // same set the old rank-filter selected, now without a global sort:
    // singles inside the top-K appear in both legs with identical
    // counts, so the max() dedup is value-preserving
    val top = cnt.orderBy(col("n_occ").desc, col("piece")).limit(vocabK)
    val singles = cnt.filter(length(col("piece")) === 1)
    val kept = top.unionByName(singles)
      .groupBy(col("piece")).agg(max(col("n_occ")).as("n_occ"))
    kept.crossJoin(broadcast(tot))
      .select(col("piece"), col("n_occ"),
        round(-log(col("n_occ").cast("double") / col("tot").cast("double"))
          * lit(1.0e9), 0).cast("long").as("cost_n"))
      .orderBy(col("piece"))
  }

  /** The learned piece inventory collected to the driver as the
    * serving model — VOCABULARY-sized by construction (top-`vocabK`
    * plus single chars; the learner caps it), so this is the bpe_learn
    * model-pull discipline, never a corpus-scale collect. The word
    * table the model segments is NOT vocabulary-bounded (Heaps' law)
    * and never leaves the cluster — see [[unigramSegment]].
    */
  private def unigramModel(docs: DataFrame, maxPieceLen: Int,
                           vocabK: Int): Seq[(String, Long)] =
    modelOf(unigramPieces(docs, maxPieceLen, vocabK))

  /** Model pull over an already-built (piece, cost_n) inventory frame —
    * the hoist point for compositions that need several models off ONE
    * learn scan ([[unigramEmGain]], [[unigramPrune]]): the scan behind
    * `pieces` runs once, each stage's pull is vocabulary-sized.
    */
  private def modelOf(pieces: DataFrame): Seq[(String, Long)] =
    pieces.collect().toSeq
      .map(r => r.getAs[String]("piece") -> r.getAs[Long]("cost_n"))

  /** Word-type frequency table (w, f) — the corpus-scale input every
    * unigram EM/audit pass segments; compositions compute it once and
    * thread it through (it is word-type-sized, Heaps' law: never
    * collected, shared via a lazy localCheckpoint by callers that reuse
    * it across stages).
    */
  private def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))

  /** Viterbi segmentation under the [[unigramPieces]] model: per
    * DISTINCT word, the min-cost split into inventory pieces
    * (single-char coverage guarantees a path), ties broken toward the
    * LONGER piece via the packed integer key cost·8 + (maxLen − L) —
    * all-integer DP, so engine and oracle agree exactly. The tiny
    * model broadcasts as a plan reference object and the DP runs
    * DISTRIBUTED inside the scan (the codegen'd
    * [[org.apache.spark.sql.graft.UnigramSegment]] expression, the
    * VocabTokenize pattern) — word types grow with the corpus, so no
    * word-table collect/broadcast may appear in this plan (PlanSpec
    * pins it). SentencePiece's own deployment shape: tiny model,
    * distributed apply.
    */
  def unigramSegment(docs: DataFrame, maxPieceLen: Int = 4,
                     vocabK: Int = 48): DataFrame = {
    // one word-frequency pass: its keys ARE the distinct-word table,
    // and the learn scan reads the same checkpoint (word-TYPE counts)
    val wf = wordFreq(docs).localCheckpoint(false)
    val model = modelOf(unigramPiecesFromWf(wf, maxPieceLen, vocabK))
    wf.select(col("w"))
      .withColumn("sg", org.apache.spark.sql.graft.UnigramViterbi
        .segmentColumn(col("w"), model, maxPieceLen))
      .select(col("w"), col("sg.seg").as("seg"),
        col("sg.n_pieces").as("n_pieces"), col("sg.cost_n").as("cost_n"))
      .orderBy(col("w"))
  }

  /** Corpus-scale application of the unigram model: ONE map-only
    * compiled pass — per document, the
    * [[org.apache.spark.sql.graft.UnigramBudget]] expression folds the
    * same Viterbi DP over every whitespace token against the broadcast
    * piece model, emitting (n_tokens, n_pieces) with no segmentation
    * strings, no word-type join, no shuffle at all (the final orderBy
    * is presentation). Identical values to segment-then-join because
    * the DP is a pure function of the word. Documents with zero
    * non-empty tokens are dropped (the explode-join semantics this
    * replaces).
    */
  def unigramFertility(docs: DataFrame, maxPieceLen: Int = 4,
                       vocabK: Int = 48): DataFrame = {
    val model = unigramModel(docs, maxPieceLen, vocabK)
    docs.select(col("doc_id"), org.apache.spark.sql.graft.UnigramViterbi
        .budgetColumn(col("text"), model, maxPieceLen).as("b"))
      .filter(col("b.n_tokens") > 0)
      .select(col("doc_id"),
        col("b.n_tokens").cast("long").as("n_tokens"),
        col("b.n_pieces").as("n_pieces"))
      .withColumn("fertility",
        round(col("n_pieces").cast("double")
          / col("n_tokens").cast("double")
          * lit(1.0e6), 0) / lit(1.0e6))
      .orderBy(col("doc_id"))
  }

  /** One hard-EM re-estimation round over the [[unigramPieces]] model
    * (Kudo 2018 §3.2, the SentencePiece trainer loop, Viterbi-hardened
    * for determinism): segment every distinct word under model₀ (the
    * same compiled distributed DP as [[unigramSegment]]), recount
    * pieces from the segmentations weighted by word occurrence
    * frequency, and re-pin -ln(count/total) at 1e-9 integer units —
    * model₁ is the USED-piece inventory with EM-updated costs. Unused
    * candidates drop out (the EM prune); every piece of every Viterbi
    * path survives, so coverage is preserved by construction and the
    * corpus Viterbi cost is non-increasing under the step (Gibbs; the
    * spec asserts it). Iteration count is fixed at one — the
    * unrolled-CTE oracle convention for iterative algorithms.
    *
    * Scale shape: word-frequency agg (map-side combinable) + the
    * map-only DP over distinct words + one piece-keyed agg + a 1-row
    * total — the same linear shapes as learn + segment; nothing new
    * shuffles.
    */
  def unigramLmEm(docs: DataFrame, maxPieceLen: Int = 4,
                  vocabK: Int = 48): DataFrame = {
    // one word-frequency pass feeds both the seed learn and the EM round
    val wf = wordFreq(docs).localCheckpoint(false)
    unigramLmEmFrom(wf, modelOf(unigramPiecesFromWf(wf, maxPieceLen, vocabK)),
      maxPieceLen)
  }

  /** [[unigramLmEm]] against a precomputed word-frequency table and
    * model₀ — the hoisted form compositions call so the learn scan and
    * the word-frequency pass each run ONCE per query, not once per
    * stage (the round-12 `unigram_em_gain` paid the candidate-substring
    * scan three times through the convenience wrappers).
    */
  private def unigramLmEmFrom(wf: DataFrame, model0: Seq[(String, Long)],
                              maxPieceLen: Int): DataFrame = {
    val used = wf
      .withColumn("sg", org.apache.spark.sql.graft.UnigramViterbi
        .segmentColumn(col("w"), model0, maxPieceLen))
      .select(col("f"), explode(split(col("sg.seg"), " ")).as("piece"))
    val c1 = used.groupBy(col("piece")).agg(sum(col("f")).as("n_occ"))
    val tot = c1.agg(sum(col("n_occ")).as("tot"))
    c1.crossJoin(broadcast(tot))
      .select(col("piece"), col("n_occ"),
        round(-log(col("n_occ").cast("double") / col("tot").cast("double"))
          * lit(1.0e9), 0).cast("long").as("cost_n"))
      .orderBy(col("piece"))
  }

  /** EM gain audit: what did the [[unigramLmEm]] round buy? One row per
    * model stage (0 = frequency-seeded inventory, 1 = after the hard-EM
    * re-estimation) with the inventory size and the CORPUS-level
    * segmentation quality under that model — total Viterbi cost and
    * subword budget over all token occurrences (distinct words
    * segmented once, weighted by frequency), fertility micro-pinned.
    * The EM monotonicity (corpus_cost_n non-increasing, here visible
    * in the data) is what a tokenizer-training pipeline checks before
    * accepting a new model; the inventory shrink is the EM prune.
    * Both models are vocabulary-sized collects (the model-pull
    * discipline); the corpus-scale work is the two compiled DP passes
    * over the word-frequency table.
    */
  def unigramEmGain(docs: DataFrame, maxPieceLen: Int = 4,
                    vocabK: Int = 48): DataFrame = {
    // hoisted: ONE word-frequency pass feeds the learn scan (word-TYPE
    // substring counts off the wf checkpoint) and every stage; each
    // model pull is vocabulary-sized
    val wf = wordFreq(docs).localCheckpoint(false)
    val m0 = modelOf(unigramPiecesFromWf(wf, maxPieceLen, vocabK))
    val m1 = modelOf(unigramLmEmFrom(wf, m0, maxPieceLen))
    unigramStageStats(wf, maxPieceLen, Seq(m0, m1))
  }

  /** Per-stage corpus segmentation stats under a model lineage — one
    * row per model: inventory size, token/subword budgets, total
    * Viterbi cost, fertility micro-pinned ([[unigramEmGain]] and
    * [[unigramPruneCurve]] share this audit shape).
    */
  private def unigramStageStats(wf: DataFrame, maxPieceLen: Int,
                                models: Seq[Seq[(String, Long)]])
      : DataFrame = {
    def stage(i: Int, m: Seq[(String, Long)]): DataFrame =
      wf.withColumn("sg", org.apache.spark.sql.graft.UnigramViterbi
          .segmentColumn(col("w"), m, maxPieceLen))
        .agg(sum(col("f")).as("n_tokens"),
          sum(col("f") * col("sg.n_pieces").cast("long")).as("n_subwords"),
          sum(col("f") * col("sg.cost_n")).as("corpus_cost_n"))
        .select(lit(i).as("stage"), lit(m.size).as("inventory"),
          col("n_tokens"), col("n_subwords"), col("corpus_cost_n"),
          (round(col("n_subwords").cast("double")
            / col("n_tokens").cast("double")
            * lit(1.0e6), 0) / lit(1.0e6)).as("fertility"))
    models.zipWithIndex.map { case (m, i) => stage(i, m) }
      .reduce(_ unionByName _).orderBy(col("stage"))
  }

  /** One EM+prune round (Kudo 2018 §3.2 trainer loop, the step
    * [[unigramLmEm]] stops before): segment the word-frequency table
    * under `model` (compiled distributed DP), recount pieces
    * freq-weighted, then PRUNE to the top-`cap` by recount — keeping
    * every single char of the charset unconditionally (the coverage
    * guarantee; an unused single gets the Laplace floor count 1 so its
    * cost stays finite), costs re-pinned at 1e-9 over the kept
    * inventory. The kept set is built join-free: top-cap via
    * `orderBy().limit(cap)` (TakeOrderedAndProject — never a global
    * rank window over the unbounded recount table) unioned with the
    * recount's own singles slice and the charset floor literal, deduped
    * by max(n_occ) over a model-sized set (the floor 1 never beats a
    * real count, so the dedup is value-preserving). `charset` MUST be
    * the SEED model's singles (every corpus char by construction) —
    * flooring from the previous stage's model loses chars the pure-EM
    * round already dropped as unused, and one pruned multi-char piece
    * later strands a word with no path (caught live: 'join' under a
    * kp2-floored lineage).
    */
  private def unigramPruneStage(wf: DataFrame, model: Seq[(String, Long)],
                                charset: Seq[String], cap: Int,
                                maxPieceLen: Int): DataFrame = {
    val rec = wf
      .withColumn("sg", org.apache.spark.sql.graft.UnigramViterbi
        .segmentColumn(col("w"), model, maxPieceLen))
      .select(col("f"), explode(split(col("sg.seg"), " ")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("f")).as("n_occ"))
      .localCheckpoint(false)
    val top = rec.orderBy(col("n_occ").desc, col("piece")).limit(cap)
    val recSingles = rec.filter(length(col("piece")) === 1)
    val charsetFloor = wf.sparkSession.createDataFrame(
        charset.map(p => (p, 1L)))
      .toDF("piece", "n_occ")
    val kept = top.unionByName(recSingles).unionByName(charsetFloor)
      .groupBy(col("piece")).agg(max(col("n_occ")).as("n_occ"))
    val tot = kept.agg(sum(col("n_occ")).as("tot"))
    kept.crossJoin(broadcast(tot))
      .select(col("piece"), col("n_occ"),
        round(-log(col("n_occ").cast("double") / col("tot").cast("double"))
          * lit(1.0e9), 0).cast("long").as("cost_n"))
      .orderBy(col("piece"))
  }

  /** Linear prune schedule: cap for prune round `j` of `rounds`,
    * stepping from `vocabK` to exactly `target` (integer arithmetic —
    * fixed and engine-independent, the unrolled-oracle convention).
    */
  private def pruneCaps(vocabK: Int, target: Int, rounds: Int): Seq[Int] =
    (1 to rounds).map(j => vocabK - ((vocabK - target) * j) / rounds)

  /** The model lineage behind [[unigramPrune]]/[[unigramPruneCurve]]:
    * m₀ = frequency-seeded inventory, m₁ = one pure hard-EM round
    * (exactly `unigram_lm_em`'s model), then `rounds` EM+prune rounds
    * with caps stepping linearly down to `target`. ONE learn scan and
    * ONE word-frequency pass feed the whole chain (the wf checkpoint);
    * each stage's model pull is vocabulary-sized (bpe_learn's
    * bounded-driver-loop discipline — `rounds` is a small fixed
    * constant, never data-dependent).
    */
  private def unigramPruneLineage(docs: DataFrame, maxPieceLen: Int,
                                  vocabK: Int, target: Int, rounds: Int)
      : (DataFrame, Seq[Seq[(String, Long)]], Seq[DataFrame]) = {
    val wf = wordFreq(docs).localCheckpoint(false)
    val m0 = modelOf(unigramPiecesFromWf(wf, maxPieceLen, vocabK))
    val charset = m0.collect { case (p, _) if p.length == 1 => p }
    val em1 = unigramLmEmFrom(wf, m0, maxPieceLen)
    var models = Seq(m0, modelOf(em1))
    var frames = Seq(em1)
    pruneCaps(vocabK, target, rounds).foreach { cap =>
      val st = unigramPruneStage(wf, models.last, charset, cap, maxPieceLen)
      frames :+= st
      models :+= modelOf(st)
    }
    (wf, models, frames)
  }

  /** Staged EM+prune to a target inventory (the loop Kudo's trainer
    * runs until the vocabulary reaches its configured size —
    * [[unigramLmEm]] is one iteration of its EM half): k fixed
    * EM+prune rounds after the pure-EM accept round, caps stepping
    * linearly to `target`. Returns the FINAL model (piece, n_occ,
    * cost_n) — the serving artifact a tokenizer ships. Iteration
    * count and schedule are fixed, per the unrolled-CTE oracle
    * convention for iterative algorithms.
    */
  def unigramPrune(docs: DataFrame, maxPieceLen: Int = 4,
                   vocabK: Int = 48, target: Int = 24,
                   rounds: Int = 2): DataFrame =
    unigramPruneLineage(docs, maxPieceLen, vocabK, target, rounds)._3.last

  /** Per-stage audit curve over the full prune lineage — the
    * [[unigramEmGain]] accept audit EXTENDED through the prune rounds:
    * stage 0 = seed, stage 1 = pure hard-EM, stages 2..k+1 = EM+prune
    * at the shrinking caps. The curve makes the trade visible in data:
    * the EM step is corpus-cost-non-increasing (Gibbs; spec-asserted),
    * the prune steps buy inventory shrink at a measured cost/fertility
    * price, and n_tokens constant across stages IS the coverage
    * guarantee (every word stays segmentable under every stage's
    * model).
    */
  def unigramPruneCurve(docs: DataFrame, maxPieceLen: Int = 4,
                        vocabK: Int = 48, target: Int = 24,
                        rounds: Int = 2): DataFrame = {
    val (wf, models, _) =
      unigramPruneLineage(docs, maxPieceLen, vocabK, target, rounds)
    unigramStageStats(wf, maxPieceLen, models)
  }

  def bpeLearn(docs: DataFrame, numMerges: Int = 8): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    bpeTrain(docs, numMerges)._1
      .toDF("stage", "pair", "merged", "freq")
      .orderBy(col("stage"))
  }

  /** Subword budgets under the LEARNED tokenizer: train `numMerges` BPE
    * merges ([[bpeLearn]]), segment the word-TYPE table with them, then
    * join the corpus token stream to the segmented vocabulary — per doc,
    * whitespace-token count, subword-piece count, and fertility
    * (pieces/token, the tokenizer-quality metric). The join's build
    * side is the vocabulary (broadcast-scale at any corpus size), so
    * the corpus pass is map-only — the learned-tokenizer complement of
    * `token_budget_stats`' fixed-vocab walk.
    */
  def bpeSegment(docs: DataFrame, numMerges: Int = 8): DataFrame = {
    val seg = bpeTrain(docs, numMerges)._2
      .select(col("w"), size(col("syms")).as("n_pieces"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(seg), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("n_pieces")).as("n_pieces"))
      .select(col("doc_id"), col("n_tokens"), col("n_pieces"),
        (round(col("n_pieces").cast("double")
          / col("n_tokens").cast("double")
          * lit(1.0e6), 0) / lit(1.0e6)).as("fertility"))
      .orderBy(col("doc_id"))
  }

  /** WordPiece merge learning (Schuster & Nakajima 2012; the BERT
    * tokenizer's trainer) — the FOURTH subword algorithm beside
    * greedy-vocab, BPE and unigram-LM, and the likelihood-scored
    * complement of BPE's frequency-scored merges: each stage merges
    * the adjacent symbol pair maximizing score = freq(ab) /
    * (count(a)·count(b)) — the pair whose fusion most raises the
    * corpus likelihood under a unigram symbol model, which prefers
    * RARE-but-correlated pairs where BPE takes the most frequent.
    * Symbols carry the ## continuation convention (word-initial bare,
    * continuations ##-prefixed; a merge strips the right side's ##).
    *
    * Scale/determinism discipline = [[bpeTrain]]'s: a FIXED small
    * stage count (never data-dependent), per-stage work = two
    * map-side-combinable aggregations over the word-TYPE table plus a
    * 1-row argmax collect, the merge applied as the same codegen'd
    * left-to-right `aggregate()` walk. The score denominator
    * multiplies counts as DOUBLES (exact up to 2^53 tokens — at
    * larger corpora the long product would overflow where the double
    * stays exact-enough and cross-engine identical: one IEEE multiply
    * + one divide). Ties break on the pair string. Returns
    * (stage, pair, merged, freq, score12) with the score pinned at
    * 1e-12 integer units.
    */
  def wordpieceLearn(docs: DataFrame, numMerges: Int = 8): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    wordpieceTrain(docs, numMerges)._1
      .toDF("stage", "pair", "merged", "freq", "score12")
      .orderBy(col("stage"))
  }

  /** Per-doc subword budgets under the learned WordPiece merges — the
    * [[bpeSegment]] twin at the ## convention: segment the word-TYPE
    * table with the trained merges, broadcast-join the corpus token
    * stream, emit (n_tokens, n_pieces, fertility) per document.
    */
  def wordpieceSegment(docs: DataFrame, numMerges: Int = 8): DataFrame = {
    val seg = wordpieceTrain(docs, numMerges)._2
      .select(col("w"), size(col("syms")).as("n_pieces"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(seg), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("n_pieces")).as("n_pieces"))
      .select(col("doc_id"), col("n_tokens"), col("n_pieces"),
        (round(col("n_pieces").cast("double")
          / col("n_tokens").cast("double")
          * lit(1.0e6), 0) / lit(1.0e6)).as("fertility"))
      .orderBy(col("doc_id"))
  }

  /** Corpus training-budget roll-up under the learned WordPiece
    * tokenizer — the budget serving row the other three tokenizers
    * expose (the `token_budget_stats` discipline): per document, the
    * whitespace word count (EMPTY split tokens included — the
    * corpus-wide convention, unlike [[wordpieceSegment]]'s non-empty
    * token count), the WordPiece piece count, the exact fertility
    * quotient, and the number of `packTokens`-sized training
    * sequences the document bills (ceil in exact integer `div`
    * arithmetic) — the unit a pretraining budget is quoted in. The
    * segmented vocabulary is broadcast (vocab-scale at any corpus
    * size); the corpus pass is map-only + one per-doc agg.
    */
  def wordpieceBudgetStats(docs: DataFrame, numMerges: Int = 8,
                           packTokens: Int = 512): DataFrame = {
    val seg = wordpieceTrain(docs, numMerges)._2
      .select(col("w"), size(col("syms")).as("n_pieces"))
    val perDoc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(seg), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_pieces")).as("n_subtokens"))
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).as("n_words"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_subtokens"), lit(0L)).as("n_subtokens"))
      .withColumn("fertility",
        col("n_subtokens").cast("double") / col("n_words").cast("double"))
      .withColumn("n_seq",
        expr(s"(n_subtokens + ${packTokens - 1}) div $packTokens"))
      .orderBy(col("doc_id"))
  }

  /** Shared WordPiece training loop: ordered merge table + the final
    * segmented vocabulary (w, syms, freq). Structure mirrors
    * [[bpeTrain]]; the differences are the ## initialization, the
    * likelihood score, and the ##-stripping merge.
    */
  private def wordpieceTrain(docs: DataFrame, numMerges: Int)
      : (Seq[(Int, String, String, Long, Long)], DataFrame) = {
    var vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"),
        expr("transform(sequence(1, length(w)), i -> " +
          "IF(i = 1, substring(w, i, 1), " +
          "concat('##', substring(w, i, 1))))").as("syms"),
        col("freq"))
      .localCheckpoint(false)
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    var exhausted = false
    for (i <- 1 to numMerges if !exhausted) {
      val symCounts = vocab
        .select(col("freq"), explode(col("syms")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("freq")).as("c"))
      val pairCounts = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), j -> concat(syms[j], ' ', syms[j + 1]))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("f"))
        .select(col("pair"), col("f"),
          split(col("pair"), " ", 2).getItem(0).as("pa"),
          split(col("pair"), " ", 2).getItem(1).as("pb"))
      val best = pairCounts
        .join(symCounts.select(col("sym").as("pa"), col("c").as("ca")), "pa")
        .join(symCounts.select(col("sym").as("pb"), col("c").as("cb")), "pb")
        .select(col("pair"), col("pa"), col("pb"), col("f"),
          (col("f").cast("double") /
            (col("ca").cast("double") * col("cb").cast("double")))
            .as("score"))
        .orderBy(col("score").desc, col("pair"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val row = best(0)
        val (pair, pa, pb) =
          (row.getString(0), row.getString(1), row.getString(2))
        val merged = pa + pb.stripPrefix("##")
        merges += ((i, pair, merged, row.getLong(3),
          math.round(row.getDouble(4) * 1e12)))
        vocab = vocab.select(col("w"),
            aggregate(col("syms"), array().cast("array<string>"),
              (acc, x) => when(
                  size(acc) > 0 &&
                    element_at(acc, -1) === lit(pa) && x === lit(pb),
                  concat(slice(acc, lit(1), size(acc) - 1),
                    array(lit(merged))))
                .otherwise(concat(acc, array(x))))
              .as("syms"),
            col("freq"))
          .localCheckpoint(false)
      }
    }
    (merges.toSeq, vocab)
  }

  /** Shared BPE training loop: returns the ordered merge table and the
    * final segmented vocabulary (w, syms, freq).
    */
  private def bpeTrain(docs: DataFrame, numMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms"), col("freq"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (i <- 1 to numMerges if !exhausted) {
      val best = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), j -> concat(syms[j], ' ', syms[j + 1]))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("pair"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val Array(pa, pb) = pair.split(" ", 2)
        val merged = pa + pb
        merges += ((i, pair, merged, best(0).getLong(1)))
        // greedy left-to-right symbol walk: merge (pa, pb) wherever the
        // PREVIOUS surviving symbol is pa — exactly Sennrich's
        // non-overlapping single-pass application (a merged symbol can
        // never be re-consumed in the same pass: pa+pb == pa is
        // impossible for non-empty pb)
        vocab = vocab.select(col("w"),
            aggregate(col("syms"), array().cast("array<string>"),
              (acc, x) => when(
                  size(acc) > 0 &&
                    element_at(acc, -1) === lit(pa) && x === lit(pb),
                  concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
                .otherwise(concat(acc, array(x))))
              .as("syms"),
            col("freq"))
          .localCheckpoint(false)
      }
    }
    (merges.toSeq, vocab)
  }

  /** Curation funnel: the ledger reduced to per-stage drop counts in
    * cascade order — the one-screen health dashboard of the pipeline
    * run (and the sanity check that stage counts sum to the corpus).
    */
  def curationFunnel(docs: DataFrame, minScore: Double = 0.35,
                     threshold: Double = 0.5, testPct: Int = 10,
                     perSource: Int = 10): DataFrame =
    curationLedger(docs, minScore, threshold, testPct, perSource)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"))
      .select(
        when(col("status") === "quality", 0)
          .when(col("status") === "near_dup", 1)
          .when(col("status") === "test_split", 2)
          .when(col("status") === "contaminated", 3)
          .when(col("status") === "source_cap", 4)
          .otherwise(5).as("stage_order"),
        col("status"), col("n_docs"))
      .orderBy(col("stage_order"))

  /** Ship manifest: per training shard, the counts and an
    * order-independent content fingerprint (bit_xor of a per-doc
    * 60-bit hash over doc_id + content md5). Two shipped datasets are
    * byte-equivalent iff their manifests match — the reproducibility
    * contract a training run records next to its config. The xor
    * aggregation is commutative/associative, so the fingerprint is
    * stable under any partitioning or row order at any scale.
    */
  def shipManifest(docs: DataFrame, nShards: Int = 64): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    docs.select(
        pmod(hash60(concat(lit("shard_"), col("doc_id"))), lit(nShards))
          .as("shard"),
        col("doc_id"), col("n_chars"),
        hash60(concat(col("doc_id").cast("string"), lit(":"),
          md5(col("text")))).as("h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        expr("bit_xor(h)").as("fingerprint"))
      .orderBy(col("shard"))
  }

  /** Three fingerprints per document:
    *  - fp_exact: md5 of the raw text (byte-exact dup detection)
    *  - fp_bag: md5 of the sorted token multiset (order-insensitive)
    *  - fp_roll: polynomial rolling hash over token hashes, modular so it
    *    never overflows a signed 64-bit long on any engine
    */
  def fingerprints(docs: DataFrame): DataFrame = docs.select(
    col("doc_id"),
    md5(col("text")).as("fp_exact"),
    md5(concat_ws(" ", array_sort(tokensCol(col("text"))))).as("fp_bag"),
    expr(
      """aggregate(
        |  transform(split(text, ' '),
        |    t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint) % 1000000),
        |  0L, (acc, h) -> (acc * 131 + h) % 1000000000000)""".stripMargin)
      .as("fp_roll"))

  /** Denylist scrub: redact every whole-word occurrence of the listed
    * terms/phrases and count the hits — the dictionary-based removal
    * step of a privacy/contamination pass (PII name lists,
    * known-leaked strings, eval-set markers). Word-boundary-anchored
    * (substrings inside longer tokens survive), leftmost-LONGEST
    * non-overlapping — bit-equal to
    * `regexp_replace(text, "\\b(t1|…|tn)\\b", "[REDACTED]")` with the
    * alternation ordered longest-first (the DuckDB oracle keeps that
    * regex form at oracle-sized lists; RegexSpec proves the
    * equivalence on adversarial fixtures).
    *
    * Matching runs in the [[org.apache.spark.sql.graft.DenylistScrub]]
    * trie expression, NOT an alternation regex: a production denylist
    * is 10⁴–10⁵ phrases, where the regex is O(text·patterns) per doc
    * and unusable (measured — SCALING.md) while the broadcast-trie
    * walk is pattern-count-independent. Map-only, codegen'd; the md5
    * of the scrubbed text lets the oracle verify the REPLACEMENT
    * byte-for-byte without shipping full redacted bodies around.
    */
  def scrubDenylist(docs: DataFrame,
                    terms: Seq[String] = Seq("customer", "vector"))
      : DataFrame = {
    val s = org.apache.spark.sql.graft.DenylistScrub
      .column(col("text"), terms)
    docs.select(
      col("doc_id"),
      s.getField("n_hits").as("n_hits"),
      md5(s.getField("scrubbed")).as("scrub_md5"))
  }

  /** PII scrub: redact the three machine-recognizable identifier shapes
    * every corpus release pipeline strips — email addresses, IPv4
    * addresses, and long digit runs (phone/account numbers) — and count
    * each per document. Patterns are deliberately lookaround-free so the
    * SAME regex means the same thing in Java (Spark) and RE2 (DuckDB,
    * and the scale-out engines this would port to); application order
    * matters and is fixed (emails first — they contain dots and digits;
    * then IPv4 — digits and dots; then bare digit runs) so each later
    * pattern sees the earlier redactions' placeholders, never their
    * raw text. Emits counts + the md5 of the scrubbed text (verifiable
    * without shipping the text twice, like [[scrubDenylist]]).
    * Map-only, zero shuffle, codegen-fused with the scan.
    */
  def scrubPii(docs: DataFrame): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val longNum = "[0-9]{7,}"
    val noEmail = regexp_replace(col("text"), email, "<EMAIL>")
    val noIp = regexp_replace(noEmail, ipv4, "<IP>")
    val clean = regexp_replace(noIp, longNum, "<NUM>")
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(email)).as("n_emails"),
      regexp_count(noEmail, lit(ipv4)).as("n_ipv4"),
      regexp_count(noIp, lit(longNum)).as("n_long_nums"),
      md5(clean).as("clean_md5"),
      (clean =!= col("text")).as("changed"))
  }

  /** Deterministic shard assignment: every doc lands in one of
    * `nShards` output shards by salted content-independent hash —
    * the write-partitioning step before a training run (shard =
    * `partitionBy` directory; readers stream shards independently).
    * Reports per-shard document count and byte mass so shard balance
    * is auditable. One aggregation shuffle of (shard, count, bytes)
    * partials; the assignment itself is map-only and stable across
    * runs, engines and cluster sizes (md5-derived, not JVM hashCode).
    */
  def docShards(docs: DataFrame, nShards: Int = 64): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    docs.select(
        pmod(hash60(concat(lit("shard_"), col("doc_id"))), lit(nShards))
          .as("shard"),
        col("n_chars"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("shard"))
  }

  /** Mixture sampling: per-source Bernoulli keep rates — the data-mixing
    * step that reweights domains toward target proportions (e.g. keep
    * all of a high-value source, 10% of a crawl). Membership is a
    * deterministic salted doc_id hash compared against the source's
    * rate, so it is content-stable (incremental ingestion never
    * resamples old docs), engine-independent, and exact at any
    * parallelism — unlike `df.sample`, whose output depends on
    * partitioning. The rate table rides the plan as a broadcast map
    * literal; unlisted sources get `defaultRate`. Map-only scan +
    * per-source count audit.
    */
  def mixtureSample(docs: DataFrame,
                    rates: Map[String, Double] =
                      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
                    defaultRate: Double = 0.1): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      s"keep rates must be in [0,1], got: $rates default=$defaultRate")
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col("source") === s, lit(r)).otherwise(acc)
    }
    docs
      .filter(pmod(hash60(concat(lit("mix_"), col("doc_id"))), lit(10000))
        < (rateCol * 10000).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("source"))
  }

  /** Temperature-scaled dataset mixing — the α-sampling of multilingual
    * and multi-source LM training (XLM-R's α=0.3; modern data recipes):
    * per-source keep probability ∝ n_s^(α−1) with α = 0.5, normalized so
    * the expected output is `targetFrac` of the corpus — small sources
    * are up-weighted, dominant sources down-weighted. Unlike
    * [[mixtureSample]]'s fixed rate table, the rates are COMPUTED
    * IN-PLAN from the source sizes: one source-cardinality aggregate,
    * one 1-row normalizer cross-joined in, then the same content-stable
    * salted-hash Bernoulli per doc. α=0.5 keeps the power a `sqrt`
    * (IEEE-exact, cross-engine); the normalizer Σ√n_s accumulates as
    * scaled exact longs (a raw double sum is partial-sum-order
    * dependent) and every remaining op is IEEE-deterministic, so both
    * engines branch on bit-identical keep rates.
    */
  def mixtureTemperature(docs: DataFrame,
                         targetFrac: Double = 0.5): DataFrame = {
    val sizes = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    // Σ√n_s accumulates as 6-decimal-scaled exact longs — a raw double
    // sum would be partial-sum-order dependent (√ of an integer is
    // irrational, so the scaled rounding never sits on a tie boundary)
    val norm = sizes.agg(
      sum(col("n_s")).cast("double").as("nn"),
      (sum(round(sqrt(col("n_s").cast("double")) * lit(1e6), 0)
        .cast("long")).cast("double") / lit(1e6)).as("sq"))
    // keep_s = min(1, targetFrac · N · p_s / n_s), p_s = √n_s / Σ√n_t
    // — raw double, NOT rounded: every input is an exact integer and
    // sqrt/· / are IEEE-exact-rounded, so the rate is bit-identical
    // across engines; a 6-decimal round could land on the half-micro
    // boundary where engine round()s disagree
    val rates = sizes.crossJoin(norm)
      .select(col("source"), col("n_s"),
        least(lit(1.0d),
          lit(targetFrac) * col("nn") *
            (sqrt(col("n_s").cast("double")) / col("sq")) /
            col("n_s").cast("double")).as("keep_rate"))
    // source universe is catalog-bounded (dozens of feeds at 100 TB, not
    // data-scale) — broadcast back to the facts
    val kept = docs.join(broadcast(rates), Seq("source"))
      .filter(pmod(hash60(concat(lit("mixt_"), col("doc_id"))), lit(1000000))
        .cast("double") / lit(1000000.0d) < col("keep_rate"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("source"), "left_outer")
      .select(col("source"), col("n_s").as("n_total"), col("keep_rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("source"))
  }

  /** Corpus vocabulary coverage: the top-k tokens by frequency with
    * their cumulative share of all token occurrences — the "how many
    * vocabulary entries cover 95% of the corpus" curve that sizes
    * tokenizer vocabularies and stopword lists.
    *
    * Scale shape: one vocabulary aggregation (its shuffle is reused by
    * the 1-row total via ReuseExchange), a top-k cut that plans as
    * TakeOrderedAndProject, and a cumulative window over ONLY the k
    * surviving rows — the single-partition window is bounded by the
    * parameter, never by the data.
    */
  def vocabCoverage(docs: DataFrame, k: Int = 50): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("t"))
    val counts = docs
      .select(explode(tokensCol(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).cast("double").as("total"))
    counts.orderBy(col("cnt").desc, col("t")).limit(k)
      .crossJoin(total)
      .select(
        row_number().over(w).as("rank"),
        col("t"), col("cnt"),
        // exact-integer quotient, NOT rounded (half-micro boundary —
        // see lmScore)
        (sum(col("cnt")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow))
          .cast("double") / col("total")).as("cum_frac"))
      .orderBy(col("rank"))
  }

  /** Sequence packing: greedily pack documents (in deterministic
    * doc_id order) into fixed-capacity token windows — the step that
    * turns a ragged document corpus into fixed-length training
    * sequences. A doc starts a new pack when its START offset crosses
    * a capacity boundary (docs are not split). Packing runs WITHIN a
    * hash shard (`partitionBy(shard)` window), exactly like a real
    * pipeline packs per output shard so no global order/sort exists at
    * 100 TB — the window shuffle is on the shard key, and each shard's
    * cumulative sum is independent. Returns per-(shard, pack) doc and
    * token counts.
    */
  def packSequences(docs: DataFrame, packTokens: Int = 512,
                    nShards: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.select(
        pmod(hash60(concat(lit("shard_"), col("doc_id"))), lit(nShards))
          .as("shard"),
        col("doc_id"),
        size(tokensCol(col("text"))).cast("long").as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .withColumn("pack_id",
        ((col("cum_tok") - col("n_tok")) / packTokens).cast("long"))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy(col("shard"), col("pack_id"))
  }

  /** [[packSequences]] billed in SUBWORD tokens — the packing geometry
    * training actually sees: per-doc piece counts come from the
    * compiled [[org.apache.spark.sql.graft.TokenBudget]] walk instead
    * of the whitespace count, so fertile words cost what they cost.
    * Same per-shard cumulative-sum shape (no global order at 100 TB).
    */
  def packSequencesSubword(docs: DataFrame, packTokens: Int = 512,
                           nShards: Int = 8,
                           vocab: Seq[String] =
                             org.apache.spark.sql.graft.VocabTokenize
                               .DefaultVocab): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.select(
        pmod(hash60(concat(lit("shard_"), col("doc_id"))), lit(nShards))
          .as("shard"),
        col("doc_id"),
        org.apache.spark.sql.graft.VocabTokenize
          .budgetColumn(col("text"), vocab)
          .getField("n_subtokens").cast("long").as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .withColumn("pack_id",
        ((col("cum_tok") - col("n_tok")) / packTokens).cast("long"))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy(col("shard"), col("pack_id"))
  }

  /** Deterministic EPOCH-ORDER shuffle — the last hop before training
    * ingestion: a seeded, content-stable permutation of the corpus.
    * Each document's position derives only from `(epoch, doc_id)`
    * (salted-hash order key, ranked within its salted shard), so the
    * order is engine-independent and RESUMABLE — recomputing after a
    * failure, on different partitioning, or on a different cluster
    * reproduces byte-identical sample order (spec-asserted across
    * repartitionings), unlike `rand()`-based shuffles whose order
    * depends on partition layout. A new epoch re-salts the key: a
    * fresh permutation with zero state carried.
    *
    * Scale shape: map-only key derivation + ONE rank window
    * partitioned by shard — shards sort independently (no global
    * sort), and `nShards` spreads the window across the cluster
    * exactly like [[packSequences]]' per-shard cumulative sums.
    */
  def epochOrder(docs: DataFrame, epoch: Int = 0,
                 nShards: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("okey"), col("doc_id"))
    docs.select(
        pmod(hash60(concat(lit("shard_"), col("doc_id"))), lit(nShards))
          .as("shard"),
        col("doc_id"),
        hash60(concat(lit(s"epoch${epoch}_"), col("doc_id"))).as("okey"))
      .withColumn("epoch_pos", row_number().over(w))
      .select(col("shard"), col("epoch_pos"), col("doc_id"))
      .orderBy(col("shard"), col("epoch_pos"))
  }

  /** Corpus piece-frequency table under vocab-constrained greedy
    * subword tokenization (the compiled
    * [[org.apache.spark.sql.graft.VocabTokenize]] walk): how often each
    * vocabulary piece — and each out-of-vocabulary fallback character —
    * occurs across the corpus. The table a tokenizer owner reads to
    * see which merges earn their slot and what the fallback mass looks
    * like. Map-only scan + one count shuffle keyed by the piece (the
    * piece universe is vocab + observed characters — tiny), so the
    * aggregation is effectively map-side.
    */
  def tokenizeVocab(docs: DataFrame,
                    vocab: Seq[String] =
                      org.apache.spark.sql.graft.VocabTokenize.DefaultVocab)
      : DataFrame =
    docs.select(explode(
        org.apache.spark.sql.graft.VocabTokenize.column(col("text"), vocab))
        .as("p"))
      .groupBy(col("p.piece").as("piece"), col("p.is_oov").as("is_oov"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("piece"))

  /** Per-document SUBWORD token budget: whitespace-word count, subword
    * piece count, out-of-vocabulary piece count, plus `fertility`
    * (pieces per word — how much this vocab inflates the corpus) and
    * `oov_rate` (exact integer quotients, the [[lmScore]] determinism
    * convention). This is the number training actually bills by —
    * whitespace counts under-measure fertile words. One compiled
    * map-only pass ([[org.apache.spark.sql.graft.TokenBudget]] — no
    * piece array is ever materialized); the only exchange is the
    * output sort.
    */
  def tokenBudgetStats(docs: DataFrame,
                       vocab: Seq[String] =
                         org.apache.spark.sql.graft.VocabTokenize.DefaultVocab)
      : DataFrame =
    docs.select(col("doc_id"),
        org.apache.spark.sql.graft.VocabTokenize
          .budgetColumn(col("text"), vocab).as("b"))
      .select(col("doc_id"),
        col("b.n_words").as("n_words"),
        col("b.n_subtokens").as("n_subtokens"),
        col("b.n_oov").as("n_oov"),
        (col("b.n_subtokens").cast("double") /
          col("b.n_words").cast("double")).as("fertility"),
        when(col("b.n_subtokens") > 0,
          col("b.n_oov").cast("double") /
            col("b.n_subtokens").cast("double")).otherwise(lit(0.0))
          .as("oov_rate"))
      .orderBy(col("doc_id"))

  /** Corpus datasheet — the "datasheets for datasets" card a shipped
    * corpus carries [Gebru et al. 2021]: volume, composition, length
    * distribution, and exact-duplication rate as one long-format table
    * (section, metric, value). Every number is a composition of
    * already-established shapes: one corpus agg for the volume block,
    * two group-bys for the language/source mixes, discrete percentiles
    * for lengths — so the card's cost is one scan plus vocabulary-sized
    * aggregation, and the whole thing stays oracle-exact.
    */
  def corpusCard(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.tokensCol
    val vol = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(length(col("text"))).as("total_chars"),
      sum(size(tokensCol(col("text")))).as("total_tokens"),
      countDistinct(md5(col("text"))).as("distinct_texts"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY length(text))")
        .as("p50_chars"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY length(text))")
        .as("p90_chars"))
    val volRows = vol.select(expr(
      """stack(6,
        |  'volume', 'n_docs', CAST(n_docs AS DOUBLE),
        |  'volume', 'total_chars', CAST(total_chars AS DOUBLE),
        |  'volume', 'total_tokens', CAST(total_tokens AS DOUBLE),
        |  'dedup', 'exact_dup_docs', CAST(n_docs - distinct_texts AS DOUBLE),
        |  'length', 'p50_chars', CAST(p50_chars AS DOUBLE),
        |  'length', 'p90_chars', CAST(p90_chars AS DOUBLE))"""
        .stripMargin).as(Seq("section", "metric", "value")))
    val langRows = docs.groupBy(col("lang").as("metric"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(lit("language_mix").as("section"), col("metric"), col("value"))
    val sourceRows = docs.groupBy(col("source").as("metric"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(lit("source_mix").as("section"), col("metric"), col("value"))
    volRows.unionByName(langRows).unionByName(sourceRows)
      .orderBy(col("section"), col("metric"))
  }

  /** Classical readability scores per document — Flesch reading ease
    * and Flesch–Kincaid grade, the curriculum-binning signal a
    * difficulty-staged training mix keys on (and a quality gate's
    * cheap prose-vs-listicle discriminator). Heuristic counters, all
    * engine-independent integer counts:
    * words = the corpus token convention ([[tokensCol]]), sentences =
    * `[.!?]+` runs (floored at 1 so headline-only docs stay finite),
    * syllables = vowel-group runs `[aeiouyAEIOUY]+` — the standard
    * dictionary-free approximation. The scores are fixed-coefficient
    * double arithmetic over exact integers (identical association
    * order in the oracle), so no rounding is needed anywhere.
    * Entirely map-only: three regex counters fused into the scan.
    */
  def readability(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"),
      size(tokensCol(col("text"))).cast("long").as("n_words"),
      greatest(lit(1L),
        regexp_count(col("text"), lit("[.!?]+")).cast("long"))
        .as("n_sentences"),
      regexp_count(col("text"), lit("[aeiouyAEIOUY]+")).cast("long")
        .as("n_syllables"))
      .where(col("n_words") > 0)
    val wps = col("n_words").cast("double") /
      col("n_sentences").cast("double")
    val spw = col("n_syllables").cast("double") /
      col("n_words").cast("double")
    base.select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        (lit(206.835) - lit(1.015) * wps - lit(84.6) * spw)
          .as("flesch_ease"),
        (lit(0.39) * wps + lit(11.8) * spw - lit(15.59)).as("fk_grade"))
      .orderBy(col("doc_id"))
  }

  /** PMI-ranked collocations: adjacent token pairs scored by pointwise
    * mutual information ln(N·c(ab) / (c(a)·c(b))) — the classic
    * corpus-linguistics upgrade of [[topBigrams]]: raw bigram counts
    * surface stopword pairs; PMI surfaces pairs that co-occur far more
    * than their parts predict (named entities, fixed phrases — the
    * units a tokenizer owner considers for vocabulary merges, which is
    * why this sits beside [[bpeLearn]]). `minCount` floors the bigram
    * count so PMI's low-frequency bias can't rank hapax pairs first.
    *
    * Determinism: all counts are exact integers; the single ln sees
    * bit-identical operands and its result is 6-decimal rounded BEFORE
    * the ordering, so a one-ulp libm difference cannot reorder the
    * top-k (ties break on the pair). Map-only pair generation (an
    * in-row zip_with, no positional explode join), two
    * vocabulary-scale aggs, TakeOrderedAndProject.
    */
  def tokenPmi(docs: DataFrame, minCount: Int = 5, k: Int = 50): DataFrame = {
    val toks = tokensCol(col("text"))
    val pairCol = filter(
      zip_with(toks,
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => struct(a.as("a"), b.as("b"))),
      p => p.getField("b").isNotNull)
    val pairs = docs.select(explode(pairCol).as("p"))
      .groupBy(col("p.a").as("t1"), col("p.b").as("t2"))
      .agg(count(lit(1)).as("n_pair"))
    val uni = docs.select(explode(toks).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("n"))
    pairs.filter(col("n_pair") >= minCount)
      .join(uni.select(col("t").as("t1"), col("c").as("c1")), Seq("t1"))
      .join(uni.select(col("t").as("t2"), col("c").as("c2")), Seq("t2"))
      .crossJoin(broadcast(total))
      .select(col("t1"), col("t2"), col("n_pair"),
        (round(log((col("n_pair").cast("double") * col("n").cast("double")) /
          (col("c1").cast("double") * col("c2").cast("double")))
          * lit(1.0e6), 0) / lit(1.0e6)).as("pmi"))
      .orderBy(col("pmi").desc, col("t1"), col("t2"))
      .limit(k)
  }

  /** Gini concentration of token mass per language — the inequality
    * audit behind corpus-balance decisions: a language whose token
    * mass concentrates in a few giant documents is fragile (one
    * takedown moves the mixture; dedup caps bite harder), even when
    * its DOC count looks healthy in [[splitAudit]]/`corpus_balance`.
    * G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending token counts
    * (ties broken by doc_id — total order, engine-stable).
    *
    * Scale shape: one map-only token count, one rank window
    * partitioned by language (parallelism = |langs|, the same
    * few-partition caveat as the per-symbol families — slice by
    * (lang, shard) with per-shard Σ folding if a single language
    * dominates), one hash agg. All sums are exact integers; the two
    * G terms divide once at the boundary in a pinned order.
    */
  def corpusGini(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n_tok"), col("doc_id"))
    docs.select(col("lang"), col("doc_id"),
        size(tokensCol(col("text"))).cast("long").as("n_tok"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(col("i") * col("n_tok")).as("swx"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        (lit(2.0) * col("swx").cast("double") /
          (col("n_docs") * col("n_tokens")).cast("double") -
          (col("n_docs") + 1).cast("double") / col("n_docs").cast("double"))
          .as("gini"))
      .orderBy(col("lang"))
  }

  /** Curriculum-staged epoch order: [[epochOrder]]'s content-stable
    * shuffle, stratified by difficulty band first — easy documents
    * stream before hard ones, with full deterministic shuffling INSIDE
    * each band (curriculum learning's data-side half). Bands come from
    * FIXED Flesch–Kincaid grade thresholds (< 8 easy, 8–12 medium,
    * else hard — the standard grade-band cut), not data-dependent
    * quantiles: fixed cuts keep band membership content-stable across
    * corpus versions (a doc cannot change band because OTHER docs
    * arrived), which the resumability contract requires.
    *
    * Scale shape: the readability pass is map-only; position ranks are
    * windows partitioned by (band, shard) — 3·nShards independent
    * sorts, no global sort, same posture as [[epochOrder]].
    */
  def curriculumOrder(docs: DataFrame, epoch: Int = 0,
                      nShards: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("shard"))
      .orderBy(col("okey"), col("doc_id"))
    readability(docs)
      .select(
        when(col("fk_grade") < 8.0, 0)
          .when(col("fk_grade") < 12.0, 1).otherwise(2).as("band"),
        pmod(hash60(concat(lit("shard_"), col("doc_id"))), lit(nShards))
          .as("shard"),
        col("doc_id"),
        hash60(concat(lit(s"epoch${epoch}_"), col("doc_id"))).as("okey"))
      .withColumn("band_pos", row_number().over(w))
      .select(col("band"), col("shard"), col("band_pos"), col("doc_id"))
      .orderBy(col("band"), col("shard"), col("band_pos"))
  }

  /** Association rules (market-basket mining) over per-document
    * DISTINCT token itemsets — the frequent-pattern family beside the
    * co-occurrence families: [[tokenPmi]] ranks ADJACENT pairs, this
    * ranks ANY-position within-document co-occurrence with
    * support / confidence / lift, the A-implies-B shape (tag
    * propagation, topic co-mention, query suggestion) that none of the
    * existing operators answer.
    *
    * Itemsets are bounded BEFORE pair generation — the dedup family's
    * cap discipline applied to pattern mining: tokens shorter than
    * `minLen` drop (stopword-ish), a document-frequency gate removes
    * both rare noise (df < minSupport can never reach pair support —
    * the Apriori downward-closure prune) and ubiquitous terms
    * (df > dfCapFrac·N would generate quadratic pairs that rank last
    * on lift anyway), and each doc keeps only its `itemsPerDoc` RAREST
    * eligible items (ties by token — total order), so one document
    * contributes at most C(K,2) pairs regardless of length. Pairs are
    * generated IN-ROW from the sorted per-doc item array (no
    * positional self-join); single-item supports are counted on the
    * SAME capped itemsets, so confidence is internally consistent.
    *
    * Scale shape: one vocabulary-sized df aggregation, one doc-keyed
    * rank window whose exchange the following groupBy reuses (same
    * key), one pair-keyed aggregation over ≤ C(K,2) rows/doc, two
    * vocabulary-sized support joins, a 1-row corpus-size cross join,
    * and a TakeOrderedAndProject top-k. Confidence and lift divide
    * exact integers once at the boundary (round 6); the top-k orders
    * by INTEGER support with token tie-breaks, so no libm ulp can
    * reorder it.
    */
  /** Budget-constrained corpus selection: per source, admit the
    * highest-quality documents until `budgetPctTokens` percent of the
    * source's token mass is spent — the greedy quality-per-token
    * knapsack that turns a quality SCORE into a quality BUDGET.
    * `quality_filter` asks "is this doc above an absolute bar";
    * this asks the operational question "given we can only afford 30%
    * of the tokens, which docs make the cut" — and emits the
    * admission bar each source actually paid (a high bar = the source
    * had quality to spare; a bar near zero = the budget admitted
    * junk, grow the threshold instead).
    *
    * One quality/token map pass, one source-keyed rank window (the
    * cumulative token spend and the source total ride the same
    * partition), one source-sized aggregation. Budgets are integer
    * (pct·total) DIV 100; the admission test is a pure integer
    * prefix comparison, so selection is deterministic at any
    * parallelism (quality ties break by doc_id).
    */
  def budgetSelect(docs: DataFrame,
                   budgetPctTokens: Int = 30): DataFrame = {
    val bySource = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
    val wRank = bySource.orderBy(col("quality_score").desc, col("doc_id"))
    docs.select(col("doc_id"), col("source"),
        size(tokensCol(col("text"))).cast("long").as("n_tok"),
        qualityScoreCol.as("quality_score"))
      .withColumn("cum_tok", sum(col("n_tok")).over(wRank.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("tot_tok", sum(col("n_tok")).over(bySource))
      .withColumn("budget_tokens",
        expr(s"($budgetPctTokens * tot_tok) div 100"))
      .withColumn("selected", col("cum_tok") <= col("budget_tokens"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        max(col("tot_tok")).as("total_tokens"),
        max(col("budget_tokens")).as("budget_tokens"),
        sum(when(col("selected"), 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("selected"), col("n_tok")).otherwise(0L))
          .as("tokens_selected"),
        min(when(col("selected"), col("quality_score")))
          .as("quality_bar"),
        (round(sum(when(col("selected"), col("n_tok")).otherwise(0L))
          .cast("double") / max(col("budget_tokens")).cast("double")
          * lit(1.0e6), 0) / lit(1.0e6)).as("utilization"))
      .orderBy(col("source"))
  }

  /** Stratified train/val/test split with EXACT per-stratum quotas —
    * the assignment operator behind `split_audit`'s parity check:
    * within every (lang, source) stratum, docs rank by a content-
    * stable salted hash and the first ⌈train%·n⌉ go to train, the
    * next ⌈(train+val)%·n⌉ boundary to val, the rest to test. Unlike
    * the pure hash-bucket split (whose proportions only hold in
    * expectation — a small stratum can land 100% in train), quotas
    * are exact by construction in every stratum; the trade-off,
    * documented here because it matters operationally: quota
    * BOUNDARIES move when the corpus grows (rank is relative), so
    * freeze the assignment table per release rather than recomputing
    * (the hash split is the stable-under-growth alternative; this is
    * the exact-proportion one).
    *
    * Quota arithmetic is integer-exact: ⌈p·n/100⌉ = (p·n+99) DIV 100
    * in both engines. One stratum-keyed rank window (the count rides
    * the same partition), map-only after.
    */
  def stratifiedSplit(docs: DataFrame, trainPct: Int = 80,
                      valPct: Int = 10): DataFrame = {
    val byStratum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("source"))
    val w = byStratum.orderBy(col("okey"), col("doc_id"))
    val valBound = trainPct + valPct
    docs.select(col("doc_id"), col("lang"), col("source"),
        hash60(concat(lit("split_"), col("doc_id"))).as("okey"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(byStratum))
      .select(col("doc_id"), col("lang"), col("source"),
        col("rk").as("rank_in_stratum"),
        when(col("rk") <= expr(s"($trainPct * n + 99) div 100"), "train")
          .when(col("rk") <= expr(s"($valBound * n + 99) div 100"), "val")
          .otherwise("test").as("split"))
      .orderBy(col("lang"), col("source"), col("rank_in_stratum"))
  }

  /** RAKE keyphrase extraction [Rose et al. 2010] — PHRASE-level
    * salience where [[tokenPmi]] ranks pairs and [[tfidfTopTerms]]
    * ranks single terms: candidate phrases are maximal runs of
    * non-stopword tokens (split at the fixed function-word list, runs
    * longer than `maxPhraseLen` dropped as noise), scored by
    * Σ deg(w)/freq(w) over the phrase's words — degree rewards words
    * that co-occur inside longer phrases, so multi-word technical
    * phrases outrank their own constituents.
    *
    * Determinism: word ratios are EXACT integer micro-units
    * (deg·10¹² DIV freq — both engines' integral division truncates
    * identically), phrase scores are plain long sums of those units,
    * and the top-k orders by (score_micro, phrase) — no doubles
    * anywhere.
    *
    * Scale shape: one doc-keyed position window (the run id is a
    * cumulative stopword count), one (doc, run) aggregation, a
    * vocabulary-sized word-stats aggregation joined back to the
    * DISTINCT phrase texts (each text scored once, not per
    * occurrence), TakeOrderedAndProject top-k. Everything after the
    * two linear passes is vocabulary-sized.
    */
  def rakeKeyphrases(docs: DataFrame, maxPhraseLen: Int = 4,
                     k: Int = 50): DataFrame = {
    import graft.functions.TextFunctions.stopwords
    val toks = docs
      .select(col("doc_id"), posexplode(tokensCol(col("text")))
        .as(Seq("pos", "tok")))
      .withColumn("is_stop", col("tok").isin(stopwords: _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = toks
      .withColumn("seg",
        sum(when(col("is_stop"), 1L).otherwise(0L)).over(w))
      .filter(!col("is_stop") && length(col("tok")) > 0)
    val phrases = runs.groupBy(col("doc_id"), col("seg"))
      .agg(array_sort(collect_list(struct(col("pos"), col("tok"))))
        .as("pts"))
      .select(expr("transform(pts, p -> p.tok)").as("words"))
      .filter(size(col("words")) <= maxPhraseLen)
      .withColumn("phrase", concat_ws(" ", col("words")))
      .withColumn("n_words", size(col("words")))
    val wordStats = phrases
      .select(col("n_words"), explode(col("words")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"),
        sum(col("n_words").cast("long")).as("deg"))
      .withColumn("ratio_micro",
        expr("(deg * 1000000000000) div freq"))
    val occurrences = phrases.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"),
        first(col("words")).as("words"), first(col("n_words")).as("n_words"))
    occurrences
      .select(col("phrase"), col("n_occurrences"), col("n_words"),
        explode(col("words")).as("word"))
      .join(wordStats.select(col("word"), col("ratio_micro")), Seq("word"))
      .groupBy(col("phrase"))
      .agg(first(col("n_occurrences")).as("n_occurrences"),
        first(col("n_words")).as("n_words"),
        sum(col("ratio_micro")).as("score_micro"))
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        col("score_micro"))
      .orderBy(col("score_micro").desc, col("phrase"))
      .limit(k)
  }

  def assocRules(docs: DataFrame, minSupport: Int = 5,
                 dfCapFrac: Double = 0.3, minLen: Int = 4,
                 itemsPerDoc: Int = 12, k: Int = 100): DataFrame = {
    val items = docs
      .select(col("doc_id"),
        explode(array_distinct(tokensCol(col("text")))).as("item"))
      .filter(length(col("item")) >= minLen)
    val dfreq = items.groupBy(col("item")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val eligible = items.join(dfreq, Seq("item"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >= minSupport &&
        col("df") <= col("n_docs") * dfCapFrac)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("item"))
    val capped = eligible.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= itemsPerDoc)
      .select(col("doc_id"), col("item"))
    val singles = capped.groupBy(col("item"))
      .agg(count(lit(1)).as("supp"))
    val pairs = capped.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("item"))).as("items"))
      .select(explode(expr(
        "flatten(transform(items, (x, i) -> " +
          "transform(slice(items, i + 2, size(items)), " +
          "y -> named_struct('a', x, 'b', y))))")).as("p"))
      .groupBy(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .agg(count(lit(1)).as("supp_ab"))
      .filter(col("supp_ab") >= minSupport)
    pairs
      .join(singles.select(col("item").as("item_a"),
        col("supp").as("supp_a")), Seq("item_a"))
      .join(singles.select(col("item").as("item_b"),
        col("supp").as("supp_b")), Seq("item_b"))
      .crossJoin(broadcast(nDocs))
      .select(col("item_a"), col("item_b"), col("supp_ab"),
        col("supp_a"), col("supp_b"),
        (round(col("supp_ab").cast("double") / col("supp_a")
          * lit(1.0e6), 0) / lit(1.0e6)).as("conf_a_b"),
        (round(col("supp_ab").cast("double") / col("supp_b")
          * lit(1.0e6), 0) / lit(1.0e6)).as("conf_b_a"),
        (round(col("supp_ab").cast("double") * col("n_docs") /
          (col("supp_a").cast("double") * col("supp_b"))
          * lit(1.0e6), 0) / lit(1.0e6)).as("lift"))
      .orderBy(col("supp_ab").desc, col("item_a"), col("item_b"))
      .limit(k)
  }

  /** CCNet-style perplexity bucketing [Wenzek et al. 2020]: per
    * language, docs split into head/middle/tail TERCILES of the LM
    * score ([[lmScore]]'s avg log-prob under the train-slice unigram
    * model) — the standard quality-mixing table: pretraining recipes
    * oversample the head, keep some middle for coverage, and cap the
    * tail. Emits each bucket's doc/token mass and its score cut so
    * the mixing decision is auditable.
    *
    * Determinism: avg_logprob is an exact-integer quotient (identical
    * IEEE double everywhere — see [[lmScore]]), ntile is rank-based
    * with a doc_id tie-break, and token shares are integer basis
    * points — no new float boundary anywhere.
    *
    * Scale shape: the lmScore pipeline (one vocabulary agg + one
    * token join), then one lang-keyed rank window over DOC-level rows
    * and a grid-sized bucket agg.
    */
  def ccnetBuckets(docs: DataFrame, trainLang: String = "en"): DataFrame = {
    val byLang = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
    val bucketed = lmScore(docs, trainLang)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("bucket_no", ntile(3).over(
        byLang.orderBy(col("avg_logprob").desc, col("doc_id"))))
    bucketed.groupBy(col("lang"), col("bucket_no"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("avg_logprob")).as("cut_logprob"))
      .withColumn("lang_tokens", sum(col("n_tokens")).over(byLang))
      .select(col("lang"), col("bucket_no"),
        when(col("bucket_no") === 1, "head")
          .when(col("bucket_no") === 2, "middle")
          .otherwise("tail").as("bucket"),
        col("n_docs"), col("n_tokens"),
        expr("(n_tokens * 10000) div lang_tokens").as("token_share_bp"),
        col("cut_logprob"))
      .orderBy(col("lang"), col("bucket_no"))
  }

  /** Spearman rank correlation between the two quality signals —
    * heuristic [[qualityScoreCol]] vs the LM [[lmScore]] avg log-prob
    * — per language: the calibration audit for the whole quality
    * family. ρ near 1 means the cheap heuristic can gate instead of
    * the LM pass; near 0 means the two filters select DIFFERENT
    * corpora and stacking them compounds bias (the
    * quality-filter-disagreement finding of the curation literature).
    *
    * ρ = 1 − 6·Σd²/(n(n²−1)) over row_number ranks with doc_id
    * tie-breaks — EXACT integers up to the single output division
    * (Σd² rides along as the exact evidence column).
    *
    * Scale shape: the lmScore chain, then two rank windows on the
    * same lang partition key (one exchange) and a |langs|-row agg.
    */
  def qualityRankCorr(docs: DataFrame, trainLang: String = "en")
      : DataFrame = {
    val byLang = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
    val ranked = docs
      .select(col("doc_id"), col("lang"),
        qualityScoreCol.as("quality_score"))
      .join(lmScore(docs, trainLang)
        .select(col("doc_id"), col("avg_logprob")), Seq("doc_id"))
      .withColumn("rq", row_number().over(
        byLang.orderBy(col("quality_score").desc, col("doc_id"))))
      .withColumn("rl", row_number().over(
        byLang.orderBy(col("avg_logprob").desc, col("doc_id"))))
    ranked
      .select(col("lang"),
        (col("rq") - col("rl")).cast("long").as("d"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("d") * col("d")).as("sum_d2"))
      .select(col("lang"), col("n_docs"), col("sum_d2"),
        when(col("n_docs") > 1, round((lit(1.0) -
          lit(6.0) * col("sum_d2").cast("double") /
            (col("n_docs").cast("double") * col("n_docs").cast("double")
              * col("n_docs").cast("double")
              - col("n_docs").cast("double"))) * lit(1.0e6), 0) / lit(1.0e6))
          .as("spearman_rho"))
      .orderBy(col("lang"))
  }

  /** Boilerplate template audit [the header/footer half of CCNet's
    * paragraph dedup]: per source, the most repeated `nTok`-token doc
    * PREFIXES and SUFFIXES — where crawl boilerplate (nav bars, cookie
    * banners, footers) concentrates — with their doc-frequency in
    * basis points. rate_bp near 10000 means the source is templated
    * and the snippet should be scrubbed before training; rates near
    * 10000/n_docs mean no template exists. Pure integer/string
    * arithmetic end to end.
    *
    * Scale shape: map-only candidate extraction (two fixed slices per
    * doc — never the full token stream), one (source, kind, snippet)
    * hash agg, a WindowGroupLimit top-k per (source, kind), and a
    * |sources|-row broadcast for the rates.
    */
  def boilerplateAudit(docs: DataFrame, nTok: Int = 5,
                       topK: Int = 3): DataFrame = {
    val toks = tokensCol(col("text"))
    val short = concat_ws(" ", toks)
    val base = docs.select(col("doc_id"), col("source"),
      when(size(toks) >= nTok,
        concat_ws(" ", slice(toks, 1, nTok))).otherwise(short)
        .as("header"),
      when(size(toks) >= nTok,
        concat_ws(" ", slice(toks, -nTok, nTok))).otherwise(short)
        .as("footer"))
    val cand = base
      .select(col("source"), lit("header").as("kind"),
        col("header").as("snippet"))
      .unionByName(base.select(col("source"), lit("footer").as("kind"),
        col("footer").as("snippet")))
    val nDocs = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val byKind = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("kind"))
      .orderBy(col("cnt").desc, col("snippet"))
    cand.groupBy(col("source"), col("kind"), col("snippet"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(byKind))
      .filter(col("rank") <= topK)
      .join(broadcast(nDocs), Seq("source"))
      .select(col("source"), col("kind"), col("rank"), col("snippet"),
        col("cnt"), col("n_docs"),
        expr("(cnt * 10000) div n_docs").as("rate_bp"))
      .orderBy(col("source"), col("kind"), col("rank"))
  }

  /** DSIR data selection [Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"]: rank raw-pool docs
    * by how much their hashed n-gram profile looks like a curated
    * target slice. Features are unigrams + bigrams WITH multiplicity
    * hashed into `buckets` buckets; per-bucket log-likelihood ratios
    * λ_b = ln((ct_b+1)(Tr+B) / ((cr_b+1)(Tt+B))) (Laplace-smoothed)
    * come from one bucket-grid aggregation, and each doc's importance
    * logweight is the EXACT decimal sum Σ n_b·λ_b — λ is the one libm
    * value, pinned to the coarse 9-grid per bucket (the logit_fit
    * recipe), so the per-doc sum is order-independent.
    *
    * Scale shape: one gram explode → (doc, bucket) counts (map-side
    * combinable), a B-row λ grid broadcast back, one doc-keyed sum,
    * TakeOrderedAndProject for the top-k. The λ-grid arithmetic keeps
    * integer products exact in doubles while (ct+1)·(Tr+B) < 2^53 —
    * beyond ~10^15 features, build the B-row grid driver-side in
    * BigDecimal (constant-size work) instead.
    */
  def dsirSelect(docs: DataFrame, targetSources: Seq[String],
                 buckets: Int = 64, k: Int = 50): DataFrame = {
    val toks = tokensCol(col("text"))
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "),
          element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    val feats = docs
      .select(col("doc_id"), col("source"),
        explode(concat(toks, bigrams)).as("gram"))
      .select(col("doc_id"), col("source"),
        pmod(hash60(concat(lit("dsir_"), col("gram"))), lit(buckets))
          .cast("int").as("b"))
    val isTgt = col("source").isInCollection(targetSources)
    val grid = feats.groupBy(col("b")).agg(
      sum(when(isTgt, 1L).otherwise(0L)).as("ct"),
      sum(when(isTgt, 0L).otherwise(1L)).as("cr"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)) // B-row grid: the global window is free
    // λ pinned once per bucket at 1e-9 units (round(ln·1e9, 0), the
    // lm_score form); a doc's log-weight is the exact integer
    // Σ n·λ9, ordered as an integer and emitted as a nano double —
    // no DECIMAL columns, no round(double, k>0) anywhere.
    val lam = grid
      .withColumn("tt", sum(col("ct")).over(all))
      .withColumn("tr", sum(col("cr")).over(all))
      .select(col("b"), round(log(
          ((col("ct") + 1) * (col("tr") + buckets)) /
            ((col("cr") + 1) * (col("tt") + buckets))) *
          lit(1000000000.0), 0).cast("long").as("lam9"))
    val rawCounts = feats.filter(!isTgt)
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("n"))
    val weights = rawCounts.join(broadcast(lam), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("long").as("n_feats"),
        sum(col("n") * col("lam9")).as("s9"))
    weights
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .orderBy(col("s9").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("source"), col("n_feats"),
        (col("s9").cast("double") / lit(1000000000.0)).as("logw"))
  }

  /** TextRank extractive summarization [Mihalcea & Tarau 2004] over
    * fixed 10-token pseudo-sentence chunks (the corpus has no
    * punctuation; real sentences would swap in at the chunker):
    * within each document, chunks are graph nodes, edge weight =
    * shared distinct-token count, and a weighted PageRank (6 fixed
    * iterations, the [[graft.operators.Similarity.knnPagerank]]
    * decimal discipline — per-edge contributions rounded to 12
    * decimals and summed EXACTLY, teleport/damping as separate
    * literals) ranks the chunks; the top 3 per doc are the summary.
    *
    * Isolated chunks (no token shared with any sibling) stay in the
    * ranking at teleport mass — the contribution join is left-outer,
    * unlike the near-dup graph where every node has an edge.
    *
    * Scale shape: all joins are keyed by doc_id (+ token or chunk) —
    * per-document graphs never cross documents, so the pairwise step
    * is bounded by chunks-per-doc (doc length / 10), not corpus size;
    * the iteration joins reuse one checkpointed edge list. The final
    * top-3 is a WindowGroupLimit.
    */
  def textrankChunks(docs: DataFrame, chunkTokens: Int = 10,
                     iterations: Int = 6, topK: Int = 3,
                     damping: Double = 0.85,
                     teleport: Double = 0.15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(28, 12)
    // the safe product-pin (round(v*1e12, 0) pico-units): round(v, 12)
    // itself disagrees across engines on full-expansion half
    // boundaries — hit live here at 3 rows / 1400 chunks / 6 rounds
    def pin12(c: Column) =
      (round(c * lit(1e12), 0).cast("long") *
        lit(new java.math.BigDecimal("0.000000000001"))).cast(dec)
    val ct = docs
      .select(col("doc_id"), posexplode(tokensCol(col("text")))
        .as(Seq("pos", "t")))
      .select(col("doc_id"),
        expr(s"pos div $chunkTokens").cast("int").as("chunk_no"),
        col("t"))
      .distinct()
      .localCheckpoint(false)
    val chunksDf = ct.select(col("doc_id"), col("chunk_no")).distinct()
    val nDoc = chunksDf.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"))
    val pr = ct.select(col("doc_id"), col("chunk_no").as("ca"), col("t"))
      .join(ct.select(col("doc_id"), col("chunk_no").as("cb"), col("t")),
        Seq("doc_id", "t"))
      .filter(col("ca") < col("cb"))
      .groupBy(col("doc_id"), col("ca"), col("cb"))
      .agg(count(lit(1)).as("w"))
    val edges = pr
      .select(col("doc_id"), col("ca").as("src"), col("cb").as("dst"),
        col("w"))
      .unionByName(pr.select(col("doc_id"), col("cb").as("src"),
        col("ca").as("dst"), col("w")))
      .localCheckpoint(false)
    val wdeg = edges.groupBy(col("doc_id"), col("src"))
      .agg(sum(col("w")).as("wdeg"))

    var r = chunksDf.join(nDoc, Seq("doc_id"))
      .select(col("doc_id"), col("chunk_no"),
        pin12(lit(1.0) / col("n").cast("double")).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(r.withColumnRenamed("chunk_no", "src"), Seq("doc_id", "src"))
        .join(wdeg, Seq("doc_id", "src"))
        .select(col("doc_id"), col("dst").as("chunk_no"),
          pin12(col("r").cast("double") * col("w").cast("double") /
            col("wdeg").cast("double")).as("c"))
        .groupBy(col("doc_id"), col("chunk_no"))
        .agg(sum(col("c")).as("sc"))
      r = chunksDf
        .join(contrib, Seq("doc_id", "chunk_no"), "left_outer")
        .join(nDoc, Seq("doc_id"))
        .select(col("doc_id"), col("chunk_no"),
          pin12(lit(teleport) / col("n").cast("double") +
            lit(damping) *
              coalesce(col("sc"), lit(BigDecimal(0)).cast(dec))
                .cast("double")).as("r"))
        // cut the lineage per round: without this, iteration k
        // re-executes rounds 1..k−1 (measured 21.9× shuffle for 10×
        // docs once the per-round joins outgrow broadcast)
        .localCheckpoint(false)
    }
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("r").desc, col("chunk_no"))
    r.withColumn("rank", row_number().over(byDoc))
      .filter(col("rank") <= topK)
      .join(nDoc, Seq("doc_id"))
      .select(col("doc_id"), col("rank"), col("chunk_no"),
        col("r").cast("double").as("score"), col("n").as("n_chunks"))
      .orderBy(col("doc_id"), col("rank"))
  }
}
