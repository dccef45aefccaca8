package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-processing Column primitives for the training-data pipeline
  * operators (tokenization, cross-engine hashing, shingling, stopword /
  * language-marker sets).
  *
  * Every primitive is a native Catalyst expression (string builtins +
  * higher-order array functions) — no UDFs — so plans stay optimizable and
  * distributed. The hash is md5-derived rather than Spark's murmur3 so the
  * DuckDB oracle can reproduce it bit-for-bit (`hash()` differs per engine;
  * md5 is standardized).
  */
object TextFunctions {

  /** Documents are space-separated token streams (FIXTURES.md). */
  def tokensCol(text: Column): Column = split(text, " ")

  /** 60-bit positive hash from the md5 hex digest: cross-engine exact
    * (DuckDB: `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`). 60 bits keeps
    * every derived value (shifts, sums) inside a signed 64-bit long.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Mersenne-prime modulus for the universal-hash family (2^31 − 1):
    * keeps every product under 2^62 so the arithmetic is exact in a
    * signed 64-bit long on any engine.
    */
  val HashP = 2147483647L

  /** MinHash hash family member i via universal hashing over ONE md5 per
    * shingle: h_i(x) = (a_i·(base mod p) + b_i) mod p with fixed odd
    * multipliers. One digest + k cheap integer ops instead of k digests —
    * ~4× cheaper signatures with the same collision behavior; still
    * bit-reproducible in ANSI SQL.
    */
  def hash60Seeded(seed: Int, c: Column): Column =
    seededFromHash(seed, hash60(c))

  /** Same family applied to an already-computed base hash60. */
  def seededFromHash(seed: Int, h: Column): Column = {
    val a = 2L * seed + 1
    val b = 7919L * (seed + 1)
    ((h % HashP) * a + b) % HashP
  }

  /** [[seededFromHash]] with the seed as a COLUMN (k exploded seeds in
    * one plan, e.g. the Bloom positions) — identical arithmetic.
    */
  def seededFromHashCol(seed: Column, h: Column): Column = {
    val a = lit(2L) * seed + 1
    val b = lit(7919L) * (seed + 1)
    ((h % HashP) * a + b) % HashP
  }

  /** Distinct token 3-gram shingles of a token array (MinHash/Jaccard
    * input). `slice` is 1-based. Docs shorter than n tokens contribute
    * their whole token stream as ONE shingle (standard practice — and
    * load-bearing: `sequence(1, size-n+1)` with size<n builds a
    * DECREASING sequence whose start=0 makes slice throw).
    */
  def shinglesCol(tokens: Column, n: Int = 3): Column =
    when(size(tokens) >= n,
      array_distinct(transform(
        sequence(lit(1), size(tokens) - lit(n - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(n))))))
      .otherwise(array(concat_ws(" ", tokens)))

  /** English function words used for quality scoring (subset present in
    * the synthetic corpus vocabulary).
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Tiny per-language marker lexicons for the n-gram/stopword language-ID
    * heuristic. Order = tie-break priority (first listed wins ties).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"))

  /** Fraction of tokens contained in `words`, rounded to 6 decimals
    * (cross-engine determinism boundary).
    */
  def tokenRatio(tokens: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    // round(e*1e6, 0)/1e6, never round(e, 6): both engines then round
    // the SAME IEEE double (SCALING.md trap #10)
    round(
      size(filter(tokens, t => array_contains(set, t))).cast("double")
        / size(tokens).cast("double") * lit(1.0e6), 0) / lit(1.0e6)
  }
}
