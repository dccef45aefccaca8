package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal binary-column plumbing: schema, slicing, typed
  * mapPartitions batch shape.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.mediaFromDocuments(
    Seq((0L, "a" * 300), (1L, "b" * 600), (2L, "c" * 1000))
      .toDF("doc_id", "text"))

  test("media schema: binary content + typed metadata struct") {
    val m = media
    assert(m.schema("content").dataType.typeName == "binary")
    val meta = m.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("width", "height", "sample_rate", "format"))
  }

  test("frame sampling slices fixed-size byte windows of videos only") {
    // doc_id 2 is the only kind='video' (doc_id % 3 == 2); 1000 bytes
    // => 4 frames, sampled every 4th => frame 0 only
    val f = Multimodal.frameSample(media).collect()
    assert(f.map(_.getAs[Long]("media_id")).distinct.toSeq == Seq(2L))
    assert(f.length == 1)
    assert(f.head.getAs[Int]("frame_idx") == 0)
    assert(f.head.getAs[Int]("frame_bytes") == 256)
  }

  test("decode stub computes per-row mean intensity through mapPartitions") {
    val d = Multimodal.decodeStub(spark, media).orderBy("media_id").collect()
    assert(d.length == 3)
    assert(d(0).getAs[Double]("mean_intensity") == 'a'.toInt.toDouble)
    assert(d(1).getAs[Double]("mean_intensity") == 'b'.toInt.toDouble)
    // metadata rode along
    assert(d(0).getAs[Int]("width") == 32)
    assert(d(1).getAs[Int]("width") == 48)
  }

  test("byte histogram counts every byte exactly once") {
    val h = Multimodal.byteHistogram(spark, media)
    val totals = h.groupBy("media_id").agg(sum("cnt").as("n"))
      .orderBy("media_id").collect()
    assert(totals.map(_.getAs[Long]("n")).toSeq == Seq(300L, 600L, 1000L))
    // 'a' = 97 => bin 24
    val binsFor0 = h.filter(col("media_id") === 0L).collect()
    assert(binsFor0.length == 1)
    assert(binsFor0.head.getAs[Int]("bin") == 24)
  }

  test("resize stub quarters the payload and halves dimensions") {
    val r = Multimodal.resizeStub(media).orderBy("media_id").collect()
    assert(r(0).getAs[Int]("resized_bytes") == 75)  // ceil(300/4)
    assert(r(2).getAs[Int]("resized_bytes") == 250)
    assert(r(0).getAs[Int]("width") == 16)
  }

  test("perceptual-hash near-dup finds exactly the close-hamming payload pairs") {
    val b0 = Array.tabulate[Byte](1024)(i => ((i * 37) % 251).toByte)
    val b1 = b0.clone() // byte-identical copy => hamming 0, must pair
    val b2 = b0.clone(); b2(5) = (b2(5) + 1).toByte // near copy
    val b3 = Array.tabulate[Byte](1024)(i => ((i * 91 + 7) % 251).toByte)
    val payloads = Seq(b0, b1, b2, b3)
    val mediaDf = payloads.zipWithIndex
      .map { case (b, i) => (i.toLong, b) }.toDF("media_id", "content")
    val got = Multimodal.nearDupPairs(spark, mediaDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // self-consistent expectation from the scalar phash
    val want = for {
      i <- 0 until 4; j <- i + 1 until 4
      h = java.lang.Long.bitCount(
        Multimodal.phash64(payloads(i)) ^ Multimodal.phash64(payloads(j)))
      if h <= 3
    } yield (i.toLong, j.toLong, h)
    assert(got.sorted == want.sorted)
    assert(got.contains((0L, 1L, 0))) // the identical pair is guaranteed
  }

  test("incremental media near-dup: persisted index only, parity with full recompute") {
    val b0 = Array.tabulate[Byte](1024)(i => ((i * 37) % 251).toByte)
    val b1 = b0.clone() // identical to history 0 => hamming 0
    val bFar = Array.tabulate[Byte](512)(i => ((i * 13 + 3) % 249).toByte)
    val hist = Seq(0L -> b0,
      1L -> Array.tabulate[Byte](1024)(i => ((i * 91 + 7) % 251).toByte))
      .toDF("media_id", "content")
    val delta = Seq(10L -> b1, 11L -> bFar).toDF("media_id", "content")

    // the "nightly" write: phash index persisted once; history payloads
    // are never a plan input afterwards (index + delta = 2 scan leaves)
    val base = java.nio.file.Files.createTempDirectory("graft_minc").toString
    Multimodal.phash(spark, hist)
      .write.mode("overwrite").parquet(s"$base/phash.parquet")
    val idx = spark.read.parquet(s"$base/phash.parquet")
    val out = Multimodal.incrementalNearDups(spark, idx, delta)
    val leaves = out.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.length == 2, s"expected 2 scan leaves, got:\n$leaves")

    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((0L, 10L, 0)), s"got $got")

    // parity: the full recompute over history ∪ delta, restricted to
    // cross pairs, finds exactly the same matches (caps inactive)
    val full = Multimodal.nearDupPairs(spark, hist.unionByName(delta))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter { case (a, b, _) => (a < 10L) != (b < 10L) }.toSeq
    assert(got.toSet == full.toSet)
  }
}
