package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, LongType, StructField, StructType}

/** Generator producing every ordered pair (d1 < d2 positionally) of a
  * SORTED long array — the posting-list pair expansion at the heart of
  * every bucketed dedup candidate generator (`lshCandidates`,
  * `ngramJaccardPairs`, `hammingNearDupPairs`, `editDistancePairs`,
  * `cosineNearDupLsh`).
  *
  * The composable form — `explode(flatten(transform(ds, (x, i) ->
  * transform(slice(ds, i + 2, size(ds)), y -> struct(x, y)))))` —
  * materializes all C(|ds|, 2) structs as nested ArrayData (through
  * interpreted lambdas) BEFORE the explode even starts. This generator
  * yields the pairs lazily straight out of the array: no intermediate
  * collection, no lambda frames, O(1) working memory per bucket — which
  * is exactly what you want when a capped bucket still holds 64 ids and
  * one task streams thousands of buckets.
  *
  * `starCap` (0 = off) bounds the O(|ds|²) blowup of degenerate buckets:
  * an array LONGER than the cap emits only the |ds|-1 STAR pairs
  * (ds(0), ds(j)) — every member paired with the bucket minimum — instead
  * of all pairs. A bucket that hot is a flood of (near-)identical members
  * (e.g. thousands of byte-identical boilerplate docs whose 4 LSH bands
  * all collide), and the star keeps the whole flood one connected
  * component for clustering while generating O(n) instead of O(n²) rows.
  * Dropping the bucket outright — the previous behavior — silently
  * DISCONNECTED exactly the duplicate clusters most in need of dedup,
  * because identical docs have identical signatures: there is no "other,
  * selective band" left to catch them.
  *
  * Semantics identical to the HOF form on a sorted input (pairs in
  * (i, j>i) position order) when the cap is off or unexceeded; asserted
  * equal in TextDedupSpec and by the unchanged oracles of every consumer.
  */
case class SortedPairs(child: Expression, starCap: Int = 0)
    extends UnaryExpression with Generator with CodegenFallback
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def elementSchema: StructType = StructType(Seq(
    StructField("d1", LongType, nullable = false),
    StructField("d2", LongType, nullable = false)))

  override def prettyName: String = "sorted_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Iterator.empty
    val ds = arr.asInstanceOf[ArrayData].toLongArray()
    val n = ds.length
    if (n < 2) return Iterator.empty
    if (starCap > 0 && n > starCap) {
      // degenerate hot bucket: star pairs against the minimum element
      new Iterator[InternalRow] {
        private var j = 1
        override def hasNext: Boolean = j < n
        override def next(): InternalRow = {
          val row = new GenericInternalRow(Array[Any](ds(0), ds(j)))
          j += 1
          row
        }
      }
    } else {
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = i < n - 1
        override def next(): InternalRow = {
          val row = new GenericInternalRow(Array[Any](ds(i), ds(j)))
          j += 1
          if (j == n) { i += 1; j = i + 1 }
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)
}

object SortedPairs {
  /** Column lift (ExpressionUtils is private[sql]). */
  def column(ds: Column): Column =
    ExpressionUtils.column(SortedPairs(ExpressionUtils.expression(ds)))

  /** Column lift with a hot-bucket star cap (see class doc). */
  def column(ds: Column, starCap: Int): Column =
    ExpressionUtils.column(
      SortedPairs(ExpressionUtils.expression(ds), starCap))
}
