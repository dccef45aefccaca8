package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — the canonical time-series operator
  * Spark lacks natively: for every left row, attach the latest right row
  * with rightTs <= leftTs within the same key.
  *
  * Implementation is the scale-correct union trick, NOT a range join:
  * tag both sides, union, then one window pass per key ordered by time
  * carrying the last seen right-side payload forward
  * (`last(col, ignoreNulls = true)` over an unbounded-preceding rows
  * frame). Cost = ONE shuffle of left+right on the key — versus a
  * theta/range join's per-key quadratic blowup. Running-last window
  * state is O(1) per row; skew only from genuinely hot keys.
  *
  * Tie semantics (rightTs == leftTs): the right row stamped exactly
  * leftTs IS visible to that left row (<=) — right rows sort before
  * left rows at equal timestamps via the side tag. With
  * `strict = true` the tag order flips and equal-timestamp right rows
  * become INVISIBLE (<) — the point-in-time-correctness knob: a
  * feature stamped at the prediction timestamp is information from the
  * present, and joining it is label leakage. Training-set assembly
  * (`features_pit`) uses strict; stream-stitch backfill uses <=.
  */
object AsOf {

  /** Returns every left row plus `asof_<c>` for each payload column `c`
    * of the right frame (null when no right row precedes the left row).
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           payload: Seq[String], strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val common = (leftCols :+ "__ts" :+ "__side") ++ payload.map("asof_" + _)

    val l = payload.foldLeft(
        left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))) {
      (df, c) =>
        df.withColumn(s"asof_$c", lit(null).cast(right.schema(c).dataType))
    }

    val rBase = right.select(
      col(key) +: col(rightTs).as("__ts") +:
        payload.map(c => col(c).as(s"asof_$c")): _*)
      .withColumn("__side", lit(if (strict) 2 else 0))
    val r = leftCols.filterNot(_ == key).foldLeft(rBase) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val unioned = l.select(common.map(col): _*)
      .unionByName(r.select(common.map(col): _*))

    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select((leftCols ++ payload.map("asof_" + _)).map(col): _*)
  }
}
