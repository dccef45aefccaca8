package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for VOCAB-CONSTRAINED subword
  * tokenization — greedy longest-match against a fixed vocabulary with
  * single-character fallback (the WordPiece/BPE-inference convention,
  * deterministic and engine-independent so a DuckDB recursive CTE can
  * mirror it exactly):
  *
  *  - words are the document's whitespace tokens (split on EVERY single
  *    space, empty tokens kept — the corpus-wide convention; empty
  *    words contribute zero pieces);
  *  - within a word, scan left to right: at each position emit the
  *    LONGEST vocabulary entry matching there (the match of a given
  *    length is a fixed substring, so longest-match is unambiguous —
  *    no tie-break needed), else emit the single character as an
  *    out-of-vocabulary piece and advance one CHARACTER (the whole
  *    UTF-8 sequence — never a byte shear). A 1-char vocab entry
  *    always beats fallback, so OOV pieces are never vocab members.
  *
  * Why a pipeline cares: every token-budget number upstream of training
  * (chunk sizes, packing, vocab coverage) is really a SUBWORD count —
  * whitespace counts under-bill fertile words. `fertility` (subword
  * pieces per word) and `oov_rate` are the standard signals for "this
  * corpus tokenizes badly under this vocab".
  *
  * Why native: greedy matching is a per-character interpreted-lambda
  * trap in HOF form (no whole-stage codegen, an expression tree per
  * probe). Here one compiled pass walks the UTF-8 bytes with the vocab
  * held as a per-plan byte-array table (first-byte indexed), emitting
  * pieces as byte slices — the [[CdcChunks]] pattern. Correct on any
  * well-formed UTF-8 with an ASCII vocab (matches can only start at
  * ASCII bytes; multi-byte characters are opaque whole-character
  * fallbacks), equal to the oracle's per-character walk.
  *
  * [[VocabTokenize]] returns the piece stream
  * (`array<struct<piece, is_oov>>`); [[TokenBudget]] folds the same
  * walk into per-doc counts `(n_words, n_subtokens, n_oov)` without
  * materializing pieces — use it when only the budget is needed, so
  * the operator stays a map-only scan with no per-element lambdas.
  */
case class VocabTokenize(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = VocabTokenize.outType

  override def prettyName: String = "vocab_tokenize"

  @transient private lazy val table = VocabTokenize.prep(vocab)

  override protected def nullSafeEval(input: Any): Any =
    VocabTokenize.pieces(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabTable", table,
      classOf[VocabTokenize.VocabTable].getName)
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.VocabTokenize.pieces($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabTokenize =
    copy(child = newChild)
}

/** Per-doc subword budget over the same greedy walk as
  * [[VocabTokenize]]: `(n_words, n_subtokens, n_oov)` in one compiled
  * pass, no piece materialization.
  */
case class TokenBudget(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = VocabTokenize.budgetType

  override def prettyName: String = "token_budget"

  @transient private lazy val table = VocabTokenize.prep(vocab)

  override protected def nullSafeEval(input: Any): Any =
    VocabTokenize.budget(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabTable", table,
      classOf[VocabTokenize.VocabTable].getName)
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.VocabTokenize.budget($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenBudget =
    copy(child = newChild)
}

object VocabTokenize {

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("is_oov", BooleanType, nullable = false))),
    containsNull = false)

  val budgetType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_subtokens", IntegerType, nullable = false),
    StructField("n_oov", IntegerType, nullable = false)))

  /** The library's default subword vocabulary: full frequent words,
    * BPE-ish merges, and a few single characters. Deliberately NOT
    * covering every letter, so out-of-vocabulary fallback pieces occur
    * and `oov_rate` is a live signal. Mirrored as a sorted list
    * literal in the DuckDB oracles (longest entry first — the greedy
    * order).
    */
  val DefaultVocab: Seq[String] = Seq(
    "stream", "window", "filter", "table", "value", "query", "order",
    "scan", "sort", "data", "part", "row", "key", "agg", "the", "all",
    "er", "ow", "ue", "an", "ta", "ba", "ch", "gr", "jo", "in", "sm",
    "a", "e", "s", "t")

  /** Vocab entries as byte arrays bucketed by first byte, each bucket
    * sorted longest-first — greedy lookup probes only entries that can
    * start at the position. Built once per plan (referenced from the
    * generated code), ~1 KB.
    */
  final class VocabTable(entries: Seq[String]) extends Serializable {
    val buckets: Array[Array[Array[Byte]]] = {
      val bs = Array.fill(256)(List.empty[Array[Byte]])
      entries.map(_.getBytes("UTF-8")).sortBy(_.length).foreach { b =>
        val i = b(0) & 0xff
        bs(i) = b :: bs(i) // prepend ascending => list ends longest-first
      }
      bs.map(_.toArray)
    }
  }

  private[graft] def prep(vocab: Seq[String]): VocabTable = new VocabTable(vocab)

  /** Longest vocab match at `pos` within the word ending at `we`;
    * returns the match length or 0.
    */
  private def matchLen(bytes: Array[Byte], pos: Int, we: Int,
                       table: VocabTable): Int = {
    val bucket = table.buckets(bytes(pos) & 0xff)
    var i = 0
    while (i < bucket.length) {
      val v = bucket(i)
      if (pos + v.length <= we) {
        var k = 1 // byte 0 matched by bucket choice
        while (k < v.length && bytes(pos + k) == v(k)) k += 1
        if (k == v.length) return v.length
      }
      i += 1
    }
    0
  }

  /** Fallback width at `pos`: the whole UTF-8 character (one CHAR, not
    * one byte — a byte-wide fallback would shear multi-byte characters
    * into invalid pieces; the char-wide one matches the oracle's
    * per-character `substr`). Clamped to the word end so malformed
    * input degrades to byte pieces instead of overrunning.
    */
  private def fallbackLen(bytes: Array[Byte], pos: Int, we: Int): Int =
    math.max(1, math.min(
      UTF8String.numBytesForFirstByte(bytes(pos)), we - pos))

  def pieces(text: UTF8String, table: VocabTable): ArrayData = {
    val bytes = text.getBytes
    val out = new java.util.ArrayList[Any](bytes.length / 2 + 4)
    var ws = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        var pos = ws
        while (pos < i) {
          val len = matchLen(bytes, pos, i, table)
          val take = if (len > 0) len else fallbackLen(bytes, pos, i)
          out.add(new GenericInternalRow(Array[Any](
            UTF8String.fromBytes(bytes, pos, take), len == 0)))
          pos += take
        }
        ws = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def budget(text: UTF8String, table: VocabTable): GenericInternalRow = {
    val bytes = text.getBytes
    var nWords = 1
    var nSub = 0
    var nOov = 0
    var ws = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i < bytes.length) nWords += 1
        var pos = ws
        while (pos < i) {
          val len = matchLen(bytes, pos, i, table)
          nSub += 1
          if (len == 0) { nOov += 1; pos += fallbackLen(bytes, pos, i) }
          else pos += len
        }
        ws = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nWords, nSub, nOov))
  }

  def column(text: Column, vocab: Seq[String] = DefaultVocab): Column =
    ExpressionUtils.column(
      VocabTokenize(ExpressionUtils.expression(text), vocab))

  def budgetColumn(text: Column, vocab: Seq[String] = DefaultVocab): Column =
    ExpressionUtils.column(
      TokenBudget(ExpressionUtils.expression(text), vocab))
}
