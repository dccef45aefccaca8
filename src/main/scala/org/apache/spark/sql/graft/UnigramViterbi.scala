package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for UNIGRAM-LM (SentencePiece-family,
  * Kudo 2018) Viterbi segmentation — the distributed APPLY side of the
  * tokenizer: the piece model is vocabulary-sized (broadcast once per
  * plan as a reference object, the [[VocabTokenize]] pattern) while the
  * word table it segments grows with the corpus (Heaps' law), so the DP
  * must run inside the scan, never on the driver.
  *
  * Semantics (all-integer, engine-exact — a DuckDB unrolled-CTE DP can
  * mirror it value-for-value):
  *
  *  - `best(i)` = the min-cost split of the word's first `i` characters
  *    into inventory pieces of length 1..maxPieceLen; piece cost is the
  *    model's -ln(p) pinned at 1e-9 integer units;
  *  - ties break toward the LONGER final piece via the packed key
  *    `cost * 8 + (maxPieceLen - L)` (maxPieceLen < 8 by construction);
  *  - a word with no path fails LOUDLY (single-char coverage in the
  *    learned inventory guarantees a path for the training corpus; a
  *    silent null here would mean the inventory lost coverage).
  *
  * The DP walks Java chars (UTF-16 code units) — identical to the
  * oracle's character-based `substr` for the ASCII corpora this model
  * family is learned on, and identical to the previous driver-side
  * implementation it replaces.
  *
  * [[UnigramSegment]] returns `struct<seg, n_pieces, cost_n>` for one
  * WORD (serve it over the distinct-word table). [[UnigramBudget]]
  * folds the same DP over a whole DOCUMENT's whitespace tokens into
  * `struct<n_tokens, n_pieces>` without materializing segmentations —
  * the corpus-scale fertility pass is then one map-only compiled scan
  * with zero joins and zero word-table state.
  */
case class UnigramSegment(child: Expression, pieces: Seq[(String, Long)],
                          maxPieceLen: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = UnigramViterbi.segType

  override def prettyName: String = "unigram_segment"

  @transient private lazy val model = UnigramViterbi.prep(pieces, maxPieceLen)

  override protected def nullSafeEval(input: Any): Any =
    UnigramViterbi.segment(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pieceModel", model,
      classOf[UnigramViterbi.PieceModel].getName)
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.UnigramViterbi.segment($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

/** Per-document fold of the [[UnigramSegment]] DP: split on every
  * single space (empty tokens skipped — the corpus token convention),
  * run the DP per word, return `(n_tokens, n_pieces)` with no
  * segmentation strings built — the map-only serving shape.
  */
case class UnigramBudget(child: Expression, pieces: Seq[(String, Long)],
                         maxPieceLen: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = UnigramViterbi.budgetType

  override def prettyName: String = "unigram_budget"

  @transient private lazy val model = UnigramViterbi.prep(pieces, maxPieceLen)

  override protected def nullSafeEval(input: Any): Any =
    UnigramViterbi.budget(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pieceModel", model,
      classOf[UnigramViterbi.PieceModel].getName)
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.UnigramViterbi.budget($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramBudget =
    copy(child = newChild)
}

object UnigramViterbi {

  val segType: DataType = StructType(Seq(
    StructField("seg", StringType, nullable = false),
    StructField("n_pieces", IntegerType, nullable = false),
    StructField("cost_n", LongType, nullable = false)))

  val budgetType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_pieces", LongType, nullable = false)))

  /** The piece inventory as a hash table, built once per plan and
    * referenced from generated code. Vocabulary-sized by construction
    * (the learner caps it), so the reference object is tiny no matter
    * the corpus.
    */
  final class PieceModel(entries: Seq[(String, Long)], val maxLen: Int)
      extends Serializable {
    val costs = new java.util.HashMap[String, java.lang.Long](
      entries.size * 2)
    entries.foreach { case (p, c) => costs.put(p, c) }
  }

  private[graft] def prep(pieces: Seq[(String, Long)], maxLen: Int): PieceModel =
    new PieceModel(pieces, maxLen)

  /** The DP core: fills `bestLen(i)` = the length of the piece chosen
    * to END at character i (0 = unreachable) and `bestCost(i)`, under
    * the packed tie-break key `cost * 8 + (maxLen - L)`. Returns the
    * word as a String. Loud failure on an unreachable end (no silent
    * null — inventory coverage is a model invariant).
    */
  private def run(w: String, m: PieceModel,
                  bestLen: Array[Int], bestCost: Array[Long]): Unit = {
    val n = w.length
    bestLen(0) = 0
    bestCost(0) = 0L
    var i = 1
    while (i <= n) {
      var bk = Long.MaxValue
      var bc = 0L
      var bl = 0
      val lMax = math.min(m.maxLen, i)
      var l = 1
      while (l <= lMax) {
        if (i - l == 0 || bestLen(i - l) > 0) {
          val pc = m.costs.get(w.substring(i - l, i))
          if (pc != null) {
            val c = bestCost(i - l) + pc.longValue()
            val k = c * 8 + (m.maxLen - l)
            if (k < bk) { bk = k; bc = c; bl = l }
          }
        }
        l += 1
      }
      bestLen(i) = bl
      bestCost(i) = bc
      i += 1
    }
    if (n > 0 && bestLen(n) == 0)
      throw new IllegalStateException(
        s"no unigram segmentation for '$w' — inventory lost single-char coverage")
  }

  def segment(word: UTF8String, m: PieceModel): GenericInternalRow = {
    val w = word.toString
    val n = w.length
    val bestLen = new Array[Int](n + 1)
    val bestCost = new Array[Long](n + 1)
    run(w, m, bestLen, bestCost)
    // walk back: piece boundaries right-to-left, then emit left-to-right
    var nPieces = 0
    var i = n
    while (i > 0) { nPieces += 1; i -= bestLen(i) }
    val starts = new Array[Int](nPieces)
    i = n
    var j = nPieces
    while (i > 0) { j -= 1; starts(j) = i - bestLen(i); i -= bestLen(i) }
    val sb = new java.lang.StringBuilder(n + nPieces)
    j = 0
    while (j < nPieces) {
      if (j > 0) sb.append(' ')
      val e = if (j + 1 < nPieces) starts(j + 1) else n
      sb.append(w, starts(j), e)
      j += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), nPieces, bestCost(n)))
  }

  def budget(text: UTF8String, m: PieceModel): GenericInternalRow = {
    val s = text.toString
    var nTok = 0
    var nPieces = 0L
    // reusable DP arrays sized to the longest word seen so far
    var bestLen = new Array[Int](17)
    var bestCost = new Array[Long](17)
    var ws = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > ws) { // non-empty token
          nTok += 1
          val w = s.substring(ws, i)
          if (w.length + 1 > bestLen.length) {
            bestLen = new Array[Int](w.length + 1)
            bestCost = new Array[Long](w.length + 1)
          }
          run(w, m, bestLen, bestCost)
          var p = w.length
          while (p > 0) { nPieces += 1L; p -= bestLen(p) }
        }
        ws = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTok, nPieces))
  }

  def segmentColumn(word: Column, pieces: Seq[(String, Long)],
                    maxPieceLen: Int): Column =
    ExpressionUtils.column(
      UnigramSegment(ExpressionUtils.expression(word), pieces, maxPieceLen))

  def budgetColumn(text: Column, pieces: Seq[(String, Long)],
                   maxPieceLen: Int): Column =
    ExpressionUtils.column(
      UnigramBudget(ExpressionUtils.expression(text), pieces, maxPieceLen))
}
