package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-pattern denylist scrub — the production-pattern-count
  * form of `TextAnalysis.scrubDenylist`'s word-boundary redaction
  * (PII name lists, known-leaked strings, eval-set markers at the
  * 10⁴–10⁵ phrases a real denylist carries).
  *
  * Semantics (the contract a single regex can mirror exactly):
  * scan left to right; at each word-boundary start position redact the
  * LONGEST denylist entry that matches there and ends at a word
  * boundary, replace it with `[REDACTED]`, and continue after the
  * match (non-overlapping). Word boundaries are the ASCII `\b` both
  * Java regex and RE2 implement: a transition to/from `[A-Za-z0-9_]`
  * (multi-byte UTF-8 sequences are non-word on both engines). This is
  * bit-equal to `regexp_replace(text, "\\b(t1|…|tn)\\b", "[REDACTED]")`
  * with the alternation ordered LONGEST-FIRST (ordered-alternation
  * backtracking then picks the longest boundary-valid branch; for
  * word-only terms at most one branch can be boundary-valid per start,
  * so any order agrees) — spec-asserted against the regex form on
  * adversarial prefix/phrase/boundary fixtures.
  *
  * Entries are PHRASES: `\w+` tokens joined by single spaces ("social
  * security number"), matched byte-exactly.
  *
  * Why native: the alternation regex is O(text · patterns) — the NFA
  * tries every alternative per position — and degrades super-linearly
  * in practice past ~10³ terms (compile cost is itself quadratic-ish;
  * measured unusable at 10⁴ — see SCALING.md). This walk is
  * O(text + starts·depth) INDEPENDENT of pattern count: the terms live
  * in a byte trie (CSR arrays, built once per plan, broadcast by
  * reference like [[VocabTokenize]]'s vocab table), a first-byte
  * bitmap skips the positions no term can start at, and the trie walk
  * from a surviving start is bounded by the longest term, not the
  * list size. One compiled map-only pass, no shuffle, whole-stage
  * codegen via the static `scrub` call.
  *
  * Output: `struct<n_hits int, scrubbed string>` — the caller md5s
  * `scrubbed` so replacement is verifiable byte-for-byte without
  * shipping redacted bodies (the scrubDenylist convention).
  */
case class DenylistScrub(child: Expression, terms: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = DenylistScrub.outType

  override def prettyName: String = "denylist_scrub"

  @transient private lazy val trie = DenylistScrub.prep(terms)

  override protected def nullSafeEval(input: Any): Any =
    DenylistScrub.scrub(input.asInstanceOf[UTF8String], trie)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("denyTrie", trie,
      classOf[DenylistScrub.DenyTrie].getName)
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.DenylistScrub.scrub($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): DenylistScrub =
    copy(child = newChild)
}

object DenylistScrub {

  val outType: DataType = StructType(Seq(
    StructField("n_hits", IntegerType, nullable = false),
    StructField("scrubbed", StringType, nullable = false)))

  private val Redacted = "[REDACTED]".getBytes("UTF-8")

  /** The term trie in CSR form: per-node sorted child byte lists
    * (binary-searched — a 256-wide next array would cost gigabytes at
    * 10⁵ phrases) plus a terminal flag, and a 256-bit first-byte
    * bitmap so non-starting positions cost one load. Built once per
    * plan; ~(total term bytes) nodes.
    */
  final class DenyTrie(terms: Seq[String]) extends Serializable {
    // growable build graph: per node a sorted map byte -> child
    private val kids =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.TreeMap.empty[Byte, Int])
    private val term = scala.collection.mutable.ArrayBuffer(false)
    terms.foreach { t =>
      var n = 0
      t.getBytes("UTF-8").foreach { b =>
        n = kids(n).getOrElseUpdate(b, {
          kids += scala.collection.mutable.TreeMap.empty[Byte, Int]
          term += false
          kids.length - 1
        })
      }
      term(n) = true
    }
    // CSR flatten
    val childStart: Array[Int] = {
      val cs = new Array[Int](kids.length + 1)
      var i = 0
      while (i < kids.length) {
        cs(i + 1) = cs(i) + kids(i).size
        i += 1
      }
      cs
    }
    val childByte: Array[Byte] = new Array[Byte](childStart(kids.length))
    val childNext: Array[Int] = new Array[Int](childStart(kids.length))
    locally {
      var i = 0
      while (i < kids.length) {
        var j = childStart(i)
        kids(i).foreach { case (b, c) =>
          childByte(j) = b; childNext(j) = c; j += 1
        }
        i += 1
      }
    }
    val terminal: Array[Boolean] = term.toArray
    val firstByte: Array[Boolean] = {
      val f = new Array[Boolean](256)
      var j = childStart(0)
      while (j < childStart(1)) { f(childByte(j) & 0xff) = true; j += 1 }
      f
    }
    kids.clear() // drop the build graph; only the CSR arrays serialize

    /** Child of `node` on byte `b`, or -1 — binary search over the
      * node's sorted child bytes. */
    def step(node: Int, b: Byte): Int = {
      var lo = childStart(node)
      var hi = childStart(node + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = childByte(mid)
        if (c == b) return childNext(mid)
        else if (c < b) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }
  }

  private[graft] def validate(terms: Seq[String]): Unit =
    require(terms.nonEmpty &&
        terms.forall(_.matches("\\w+( \\w+)*")),
      "denylist terms must be non-empty \\w+ phrases " +
        "(single-space separated)")

  private[graft] def prep(terms: Seq[String]): DenyTrie = {
    validate(terms)
    new DenyTrie(terms)
  }

  private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  /** Longest boundary-valid term match starting at `s`, or 0. */
  private def matchLen(bytes: Array[Byte], s: Int, trie: DenyTrie): Int = {
    var node = 0
    var longest = 0
    var i = s
    while (i < bytes.length) {
      node = trie.step(node, bytes(i))
      if (node < 0) return longest
      i += 1
      if (trie.terminal(node) &&
          (i == bytes.length || !isWord(bytes(i)))) longest = i - s
    }
    longest
  }

  def scrub(text: UTF8String, trie: DenyTrie): GenericInternalRow = {
    val bytes = text.getBytes
    var out: java.io.ByteArrayOutputStream = null // allocated on first hit
    var copied = 0 // bytes [0, copied) already in `out` (when out != null)
    var nHits = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      // a match can only start at a word boundary on a starting byte
      if (trie.firstByte(b & 0xff) &&
          (i == 0 || !isWord(bytes(i - 1)))) {
        val len = matchLen(bytes, i, trie)
        if (len > 0) {
          if (out == null) out = new java.io.ByteArrayOutputStream(
            bytes.length + Redacted.length)
          out.write(bytes, copied, i - copied)
          out.write(Redacted, 0, Redacted.length)
          copied = i + len
          nHits += 1
          i += len
        } else i += 1
      } else i += 1
    }
    val scrubbed =
      if (out == null) text // zero hits: no copy at all
      else {
        out.write(bytes, copied, bytes.length - copied)
        UTF8String.fromBytes(out.toByteArray)
      }
    new GenericInternalRow(Array[Any](nHits, scrubbed))
  }

  def column(text: Column, terms: Seq[String]): Column = {
    validate(terms) // fail at plan time, not first executor eval
    ExpressionUtils.column(
      DenylistScrub(ExpressionUtils.expression(text), terms))
  }
}
