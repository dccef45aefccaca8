package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the distinct hash60'd token-n-gram
  * shingles of a document — the inverted-index build shared by the whole
  * dedup suite (see graft.functions.TextFunctions.{tokensCol,
  * shinglesCol, hash60} for the composable reference form).
  *
  * The HOF form (`transform(sequence(...), i -> concat_ws(' ',
  * slice(toks, i, n)))` + `array_distinct` + a hash60 per element) is
  * interpreted and allocates a token array, per-shingle strings, and
  * lambda frames; it dominated every shingle-consuming query. This
  * expression works directly on the raw UTF-8 bytes: because tokens come
  * from splitting on EVERY single space, the n-gram joined with single
  * spaces is exactly the contiguous byte span from token i's first byte
  * to token i+n−1's last byte — so each shingle is md5'd as a byte slice
  * with no concatenation or String at all. Semantics preserved exactly:
  *  - trailing/leading/double spaces produce empty tokens, kept;
  *  - docs with fewer than n tokens emit their whole text as ONE shingle;
  *  - hash60 = first 60 bits of md5 (== conv(substring(md5, 1, 15), 16, 10));
  *  - distinct keeps first-occurrence order (array_distinct semantics).
  *
  * Equality with the HOF form is asserted in TextDedupSpec; the DuckDB
  * oracles are unchanged.
  */
case class ShingleHash60(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hash60"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash60.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.ShingleHash60.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 =
    copy(child = newChild)
}

object ShingleHash60 {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def hash60(md: MessageDigest, bytes: Array[Byte], from: Int,
                     len: Int): Long = {
    md.reset()
    md.update(bytes, from, len)
    val d = md.digest()
    // first 60 bits of the digest == parsing its first 15 hex chars
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val md = digests.get()
    // token start offsets (token i spans starts(i) until starts(i+1)-1)
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    if (nTok < n) {
      // whole text as one shingle
      return new GenericArrayData(
        Array(hash60(md, bytes, 0, bytes.length)))
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
    val out = new Array[Long](nTok - n + 1)
    val seen = new java.util.HashSet[java.lang.Long](out.length * 2)
    var m = 0
    var s = 0
    while (s <= nTok - n) {
      val from = starts(s)
      val until = starts(s + n) - 1 // last byte of token s+n-1 (excl sep)
      val h = hash60(md, bytes, from, until - from)
      if (seen.add(h)) { out(m) = h; m += 1 }
      s += 1
    }
    new GenericArrayData(if (m == out.length) out else out.take(m))
  }

  /** Column lift (ExpressionUtils is private[sql]). */
  def column(text: Column, n: Int = 3): Column =
    ExpressionUtils.column(ShingleHash60(ExpressionUtils.expression(text), n))
}
