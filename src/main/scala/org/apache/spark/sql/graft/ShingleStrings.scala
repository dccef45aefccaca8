package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct token-n-gram shingles of a document as STRINGS (the
  * [[ShingleHash60]] sibling for consumers that need the shingle text
  * itself, e.g. corpus bigram statistics). Same byte-span insight: each
  * n-gram joined with single spaces is exactly a contiguous slice of
  * the original UTF-8 bytes, so shingles are zero-copy
  * `UTF8String.fromBytes` slices — no token arrays, no concatenation,
  * no interpreted lambdas. Semantics identical to the HOF form
  * (`shinglesCol`): empty tokens kept, docs shorter than n tokens emit
  * their whole text as one shingle, first-occurrence distinct order.
  * Asserted equal in TextDedupSpec.
  */
case class ShingleStrings(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingle_strings"

  override protected def nullSafeEval(input: Any): Any =
    ShingleStrings.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.ShingleStrings.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

object ShingleStrings {

  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    if (nTok < n) {
      return new GenericArrayData(
        Array[Any](UTF8String.fromBytes(bytes)))
    }
    val starts = new Array[Int](nTok + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = bytes.length + 1
    val out = new Array[Any](nTok - n + 1)
    val seen = new java.util.HashSet[UTF8String](out.length * 2)
    var m = 0
    var s = 0
    while (s <= nTok - n) {
      val from = starts(s)
      val until = starts(s + n) - 1 // last byte of token s+n-1 (excl sep)
      val sh = UTF8String.fromBytes(bytes, from, until - from)
      if (seen.add(sh)) { out(m) = sh; m += 1 }
      s += 1
    }
    new GenericArrayData(if (m == out.length) out else out.take(m))
  }

  /** Column lift (ExpressionUtils is private[sql]). */
  def column(text: Column, n: Int): Column =
    ExpressionUtils.column(ShingleStrings(ExpressionUtils.expression(text), n))
}
