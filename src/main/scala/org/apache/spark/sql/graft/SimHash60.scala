package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 60-bit SimHash of a
  * space-tokenized text (see graft.operators.Dedup.simhash for the
  * algorithm and the composable reference form).
  *
  * The higher-order-function form — per token a 60-element `transform`
  * plus a 60-element `zip_with` — is interpreted and allocates two boxed
  * arrays per token: ~120 boxed ops/token, measured at ~2.8 s for the
  * sf0.1 corpus on 4 cores. This expression is one tight primitive loop
  * over the raw UTF-8 bytes (tokens are byte slices split on 0x20 —
  * space can never occur inside a UTF-8 multibyte sequence — hashed
  * directly, no String materialization), with EXACTLY the reference
  * semantics:
  *  - tokens = split(text, ' ') with trailing empties kept (Spark's
  *    `split(str, regex)` uses limit -1)
  *  - per token h = first 60 bits of md5 (== the 15-hex-digit parse in
  *    conv(substring(md5(t), 1, 15), 16, 10))
  *  - bit j votes +1 if (h >> j) & 1 else -1; positive tally sets bit j
  *
  * Equality with the HOF form is asserted in TextDedupSpec (incl.
  * multi-space / trailing-space / empty-token edge cases), and the
  * DuckDB oracle is unchanged.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val md = digests.get()
    val counts = new Array[Int](60)
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        // first 60 bits of the digest == parsing its first 15 hex chars
        var v = 0L
        var k = 0
        while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
        v = (v << 4) | ((d(7) & 0xf0L) >>> 4)
        var j = 0
        while (j < 60) {
          if (((v >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (counts(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  /** Column lift (ExpressionUtils is private[sql]). */
  def column(text: Column): Column =
    ExpressionUtils.column(SimHash60(ExpressionUtils.expression(text)))
}
