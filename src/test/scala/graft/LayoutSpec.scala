package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout audit: Morton-value correctness and the skipping
  * ordering the layout exists to produce.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def morton(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue equals the reference bit-interleave on exhaustive 6-bit input") {
    val rows = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.zValue(col("a"), col("b"), 6).as("z"))
      .collect()
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == morton(a, b, 6), s"($a,$b)")
    }
  }

  test("ntileDistributed == single-partition ntile on every edge shape") {
    // the distributed cut must be BIT-identical to the window ntile it
    // replaces: fewer rows than tiles, uneven remainders, skewed and
    // degenerate (constant) bucket keys, empty bucket ranges
    val cases = Seq(
      (5, 64, 1),    // N < n: first N tiles get one row each
      (1000, 64, 100), // even-ish buckets, remainder 40
      (257, 7, 50),  // prime N, coarse buckets
      (100, 3, 1000000) // constant bucket (all rows in one bucket)
    )
    for ((nRows, nTiles, bucketWidth) <- cases) {
      val df = spark.range(nRows.toLong)
        .select(col("id"), (col("id") * 37 % 1000).as("k"))
      val got = Layout.ntileDistributed(
          df, (col("k") / bucketWidth).cast("long"), nTiles, col("k"),
          col("id"))
        .select(col("id"), col("file_id").cast("int").as("file_id"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = df
        .withColumn("file_id", ntile(nTiles).over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("k"), col("id"))))
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(got == want, s"N=$nRows n=$nTiles width=$bucketWidth")
    }
  }

  test("aligned power-of-2 squares are contiguous z-ranges") {
    // the property that makes rectangles cheap: an aligned 2^k x 2^k
    // square of bucket space maps to ONE contiguous morton interval
    for (k <- Seq(1, 2, 3); a0 <- Seq(0L, 8L); b0 <- Seq(0L, 8L)) {
      val side = 1L << k
      val zs = for (a <- a0 until a0 + side; b <- b0 until b0 + side)
        yield morton(a, b, 8)
      assert(zs.max - zs.min == side * side - 1, s"k=$k a0=$a0 b0=$b0")
    }
  }

  test("skipping audit: zorder < single-dim sort < ingest order on mixed probes") {
    val rep = SparkEntry.queries("layout_zorder")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("layout") ->
        ((r.getAs[Long]("files_hit"), r.getAs[Long]("rows_scanned")))).toMap
    assert(rep.keySet == Set("time", "user", "zorder"))
    assert(rep("zorder")._1 < rep("user")._1,
      s"zorder ${rep("zorder")} !< user ${rep("user")}")
    assert(rep("user")._1 < rep("time")._1,
      s"user ${rep("user")} !< time ${rep("time")}")
    // every layout scans the same total corpus
    val totals = SparkEntry.queries("layout_zorder")(spark, "/root/testdata/sf0.001")
      .select("rows_total").distinct().collect()
    assert(totals.length == 1)
  }
}
