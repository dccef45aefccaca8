package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's full repetition
  * profile — the Gopher repetition signals (Rae et al. 2021, Table A1)
  * — in ONE compiled pass over the raw UTF-8 bytes:
  *
  *   - `top_gram` / `top_cnt`: the most frequent `topN`-gram (ties →
  *     lexicographically smallest by unsigned byte order, matching both
  *     Spark's and DuckDB's binary string collation) — NULL when the
  *     doc has fewer than `topN` tokens;
  *   - `dup_positions` / `n_grams`: how many `dupN`-gram positions hold
  *     a gram occurring more than once, and the total positions;
  *   - `dup_tok_positions`: token positions holding a repeated token.
  *
  * Semantics exactly mirror the exploded reference form
  * (`graft.operators.TextAnalysis.repetitionProfileExploded`,
  * parity-asserted in TextDedupSpec; DuckDB oracle unchanged): tokens
  * split on EVERY space (empty tokens kept), n-grams joined with single
  * spaces — which makes each gram a contiguous byte span of the
  * document, so counting needs no string building at all.
  *
  * Why native, and why in-row: the distributed form explodes three
  * position streams and shuffles (doc, fam, gram) — linear, but it pays
  * ~20 bytes of shuffle per token and its map side is an interpreted
  * HOF. This expression counts spans in an open-addressed map keyed by
  * the actual bytes (probe hash never leaves the row, so no cross-engine
  * hash semantics and no collision risk — slots verify byte equality),
  * O(tokens) time and O(distinct grams) transient memory per document,
  * then the operator is a zero-shuffle scan. A pathological 1M-token
  * document costs ~3M probe/compare steps and ~50 MB transient in one
  * task — cheaper than shuffling its 3M tagged gram rows.
  */
case class RepetitionProfile(child: Expression, topN: Int, dupN: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = RepetitionProfile.outType

  override def prettyName: String = "repetition_profile"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionProfile.compute(input.asInstanceOf[UTF8String], topN, dupN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.RepetitionProfile.compute($c, $topN, $dupN)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionProfile =
    copy(child = newChild)
}

object RepetitionProfile {

  val outType: DataType = StructType(Seq(
    StructField("top_gram", StringType, nullable = true),
    StructField("top_cnt", LongType, nullable = true),
    StructField("dup_positions", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("dup_tok_positions", LongType, nullable = false)))

  /** Open-addressed counter over byte spans of one document. Capacity is
    * a power of two ≥ 2× the span count, so load factor ≤ 0.5 and linear
    * probing stays O(1) amortized; keys compare by actual bytes.
    */
  private final class SpanMap(nSpans: Int, bytes: Array[Byte]) {
    private val cap = {
      var c = 4
      while (c < nSpans * 2) c <<= 1
      c
    }
    private val mask = cap - 1
    val off = new Array[Int](cap)
    val len = new Array[Int](cap)
    val cnt = new Array[Int](cap) // 0 = empty slot

    private def hash(from: Int, l: Int): Int = {
      var h = 0x811c9dc5
      var i = from
      val until = from + l
      while (i < until) { h = (h ^ bytes(i)) * 0x01000193; i += 1 }
      h
    }

    private def eq(a: Int, aLen: Int, b: Int, bLen: Int): Boolean = {
      if (aLen != bLen) return false
      var i = 0
      while (i < aLen) {
        if (bytes(a + i) != bytes(b + i)) return false
        i += 1
      }
      true
    }

    def add(from: Int, l: Int): Unit = {
      var slot = hash(from, l) & mask
      while (cnt(slot) != 0 && !eq(off(slot), len(slot), from, l))
        slot = (slot + 1) & mask
      if (cnt(slot) == 0) { off(slot) = from; len(slot) = l }
      cnt(slot) += 1
    }

    def capacity: Int = cap
  }

  /** Unsigned lexicographic byte-span compare (== UTF8String binary
    * order == DuckDB's default collation for the ASCII test corpus).
    */
  private def lexLess(bytes: Array[Byte], a: Int, aLen: Int,
                      b: Int, bLen: Int): Boolean = {
    val n = math.min(aLen, bLen)
    var i = 0
    while (i < n) {
      val x = bytes(a + i) & 0xff
      val y = bytes(b + i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    aLen < bLen
  }

  def compute(text: UTF8String, topN: Int, dupN: Int): GenericInternalRow = {
    val bytes = text.getBytes
    // token t (0-based) spans starts(t) until starts(t+1)-1 (separator);
    // sentinel starts(nTok) = length+1
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = bytes.length + 1

    def famMap(n: Int): SpanMap = {
      val g = nTok - n + 1
      val m = new SpanMap(g, bytes)
      var s = 0
      while (s < g) {
        m.add(starts(s), starts(s + n) - 1 - starts(s))
        s += 1
      }
      m
    }

    // top family: argmax count, tie → lexicographically smallest gram
    var topGram: UTF8String = null
    var topCnt = 0L
    if (nTok >= topN) {
      val m = famMap(topN)
      var bestOff = -1
      var bestLen = -1
      var best = 0
      var slot = 0
      while (slot < m.capacity) {
        val c = m.cnt(slot)
        if (c > best || (c == best && c > 0 &&
            lexLess(bytes, m.off(slot), m.len(slot), bestOff, bestLen))) {
          best = c; bestOff = m.off(slot); bestLen = m.len(slot)
        }
        slot += 1
      }
      topGram = UTF8String.fromBytes(bytes, bestOff, bestLen)
      topCnt = best.toLong
    }

    // dup family: positions whose gram repeats, of all positions
    var dupPos = 0L
    var nGrams = 0L
    if (nTok >= dupN) {
      nGrams = (nTok - dupN + 1).toLong
      val m = famMap(dupN)
      var slot = 0
      while (slot < m.capacity) {
        if (m.cnt(slot) > 1) dupPos += m.cnt(slot)
        slot += 1
      }
    }

    // token family: positions holding a repeated token (1-grams always
    // exist — splitting even an empty text yields one empty token)
    var dupTok = 0L
    val mt = famMap(1)
    var slot = 0
    while (slot < mt.capacity) {
      if (mt.cnt(slot) > 1) dupTok += mt.cnt(slot)
      slot += 1
    }

    new GenericInternalRow(Array[Any](
      topGram,
      if (topGram == null) null else java.lang.Long.valueOf(topCnt),
      dupPos, nGrams, dupTok))
  }

  /** Column lift (ExpressionUtils is private[sql]). */
  def column(text: Column, topN: Int = 2, dupN: Int = 3): Column =
    ExpressionUtils.column(
      RepetitionProfile(ExpressionUtils.expression(text), topN, dupN))
}
