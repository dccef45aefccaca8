package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for content-defined chunking (the
  * Rabin/gear-hash CDC idea of LBFS / FastCDC at token granularity) —
  * one compiled pass over the document's raw UTF-8 bytes producing
  * `array<struct<start_i, n_chunk_tokens, chunk_md5>>`.
  *
  * Semantics are exactly `graft.operators.TextAnalysis.cdcChunkStream`'s
  * original higher-order-function form (parity-asserted in
  * TextDedupSpec; the DuckDB oracles are unchanged):
  *  - tokens come from splitting on EVERY single space (empty tokens
  *    from doubled/leading/trailing spaces kept);
  *  - token position `i` (1-based) starts a chunk when `i == 1` or the
  *    PREVIOUS token is a cut point: `hash60("cdc_" + token) mod
  *    divisor == 0`, hash60 = first 60 bits of md5 (==
  *    `conv(substring(md5, 1, 15), 16, 10)`);
  *  - a chunk runs from one start to just before the next (the last to
  *    end-of-doc); `chunk_md5` = md5 hex of the chunk's tokens joined
  *    by single spaces — which, because tokenization splits on every
  *    single space, is exactly the contiguous byte span from the first
  *    token's first byte to the last token's last byte (no per-chunk
  *    string building).
  *
  * Why native: the HOF form (`filter(sequence(1, n), i ->
  * pmod(hash60(concat(...element_at(toks, i-1))), d) == 0)` + a
  * `transform` doing md5-of-slice per chunk) never enters whole-stage
  * codegen and interprets an expression tree per TOKEN — it was the
  * slowest map stage on the bench board (`cdc_chunks` 3.6 s steady at
  * sf0.1 on a single input split). This expression does one
  * ThreadLocal-MessageDigest digest per token plus one per chunk over
  * byte slices, fully inside codegen.
  */
case class CdcChunks(child: Expression, divisor: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = CdcChunks.outType

  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.CdcChunks.compute($c, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("start_i", IntegerType, nullable = false),
    StructField("n_chunk_tokens", IntegerType, nullable = false),
    StructField("chunk_md5", StringType, nullable = false))),
    containsNull = false)

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val cdcSalt = "cdc_".getBytes("UTF-8")

  private val hexChars = "0123456789abcdef".toCharArray

  /** First 60 bits of md5("cdc_" + token-bytes) — matches
    * TextFunctions.hash60 over the salted token.
    */
  private def saltedHash60(md: MessageDigest, bytes: Array[Byte],
                           from: Int, len: Int): Long = {
    md.reset()
    md.update(cdcSalt)
    md.update(bytes, from, len)
    val d = md.digest()
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  private def md5Hex(md: MessageDigest, bytes: Array[Byte], from: Int,
                     len: Int): UTF8String = {
    md.reset()
    md.update(bytes, from, len)
    val d = md.digest()
    val out = new Array[Byte](32)
    var k = 0
    while (k < 16) {
      out(2 * k) = hexChars((d(k) & 0xf0) >>> 4).toByte
      out(2 * k + 1) = hexChars(d(k) & 0x0f).toByte
      k += 1
    }
    UTF8String.fromBytes(out)
  }

  def compute(text: UTF8String, divisor: Int): ArrayData = {
    val bytes = text.getBytes
    val md = digests.get()
    // token byte offsets: token t (0-based) spans offs(t) until
    // offs(t+1)-1 (its separator); sentinel offs(nTok) = length+1
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    val offs = new Array[Int](nTok + 1)
    offs(0) = 0
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { offs(t) = i + 1; t += 1 }
      i += 1
    }
    offs(nTok) = bytes.length + 1
    // chunk starts (1-based token positions): 1, plus every position
    // directly after a cut-point token
    val starts = new Array[Int](nTok)
    starts(0) = 1
    var m = 1
    t = 0
    while (t <= nTok - 2) {
      val len = offs(t + 1) - 1 - offs(t)
      if (saltedHash60(md, bytes, offs(t), len) % divisor == 0) {
        starts(m) = t + 2
        m += 1
      }
      t += 1
    }
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      val s = starts(j)
      val len = (if (j + 1 < m) starts(j + 1) else nTok + 1) - s
      val from = offs(s - 1)
      val until = offs(s - 1 + len) - 1
      rows(j) = new GenericInternalRow(Array[Any](
        s, len, md5Hex(md, bytes, from, until - from)))
      j += 1
    }
    new GenericArrayData(rows)
  }

  /** Column lift (ExpressionUtils is private[sql]). */
  def column(text: Column, divisor: Int = 16): Column =
    ExpressionUtils.column(CdcChunks(ExpressionUtils.expression(text), divisor))
}
