package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Margin-based bitext mining — the ratio margin must reject hub
  * targets that raw cosine would pick.
  */
class BitextSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim fixture: three orthogonal en sources; an es HUB moderately
  // similar to ALL of them (cos .577 each); an es target t aligned
  // with s0 only (cos .55 — LESS than the hub's raw cosine) with faint
  // (.1) similarity to the others so its neighborhood mean is low.
  private val docs = Seq(
    (0L, "en"), (1L, "en"), (2L, "en"), (10L, "es"), (11L, "es"))
    .toDF("doc_id", "lang")
    .withColumn("text", lit("x")).withColumn("source", lit("s"))
  private val r3 = 1.0f / math.sqrt(3.0).toFloat
  private val w = math.sqrt(1.0 - 0.55 * 0.55 - 0.02).toFloat
  private val embeddings = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0f, 1f, 0f, 0f)),
    (2L, Array(0f, 0f, 1f, 0f)),
    (10L, Array(r3, r3, r3, 0f)),
    (11L, Array(0.55f, 0.1f, 0.1f, w)))
    .toDF("vec_id", "embedding").withColumn("label", lit(0))

  test("ratio margin rejects the hub target raw cosine would pick") {
    val mined = Similarity.bitextMine(docs, embeddings, dims = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // raw cosine for s0 prefers the hub (.5774 > .55) — the margin
    // must prefer t (its neighborhood mean is low where the hub's is
    // as high as every one of its cosines)
    assert(mined.contains(0L), s"s0 mined nothing: $mined")
    val (tgt, cos, margin) = mined(0L)
    assert(tgt == 11L, s"s0 mined the hub, not the true pair: $mined")
    assert(cos == 0.55 && margin > 1.0)
  }

  test("serving off the retired band index equals recompute on survivors") {
    // retire the hub: the anti-joined index must give the same mined
    // pairs as a full recompute over the surviving corpus — including
    // re-normalized neighborhood means
    val ret = Seq(Tuple1(10L)).toDF("doc_id")
    val retiredIdx = graft.operators.Dedup.retireRows(
      Similarity.bitextBands(docs, embeddings, dims = 4), ret,
      idCol = "vec_id")
    val served = Similarity.bitextMine(docs, embeddings, dims = 4,
      bandIndex = Some(retiredIdx)).collect().toSeq
    val recomputed = Similarity.bitextMine(
      docs.filter(col("doc_id") =!= 10L),
      embeddings.filter(col("vec_id") =!= 10L), dims = 4)
      .collect().toSeq
    assert(served == recomputed)
    assert(served.forall(_.getLong(1) != 10L))
  }

  test("mining is deterministic and margin-thresholded") {
    val a = Similarity.bitextMine(docs, embeddings, dims = 4).collect().toSeq
    val b = Similarity.bitextMine(docs, embeddings, dims = 4).collect().toSeq
    assert(a == b)
    assert(a.forall(_.getDouble(3) > 1.0))
    // raising the threshold can only shrink the mined set
    val strict = Similarity.bitextMine(docs, embeddings, dims = 4,
      marginThreshold = 1.2).collect().toSeq
    assert(strict.toSet.subsetOf(a.toSet))
  }
}
