package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.Schemas.Bar
import graft.operators.{Analytics, Similarity, Skew}

/** Scale-path variants must be row-identical to their reference shapes. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("enrichSliced equals enrich on dense multi-day series") {
    // 3 days × 2 symbols of contiguous minute bars (gaps < 1h context)
    val bars = for {
      sym <- Seq("A", "B")
      day <- 0 until 3
      minute <- 0 until 1440 by 7 // every 7 minutes, still dense
    } yield {
      val start = Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        day * 86400000L + minute * 60000L
      val px = 100.0 + (minute % 50) + (if (sym == "A") 0 else 7)
      Bar(sym, new Timestamp(start), new Timestamp(start + 60000), px,
        px + 1, px - 1, px + 0.5, 1.0 + minute % 5, px, 1L,
        new Date(start))
    }
    val df = bars.toDF
    val cols = Seq("symbol", "bar_start", "prev_close", "ret", "logret",
      "ret_mu", "ret_sd", "z_ret", "vol_mu", "vol_sd", "z_vol",
      "next_open", "gap_pct", "is_return_anom", "is_volume_anom")
    val a = Analytics.enrich(df)
      .select(cols.map(col): _*).orderBy("symbol", "bar_start")
      .collect().toSeq
    val b = Analytics.enrichSliced(df)
      .select(cols.map(col): _*).orderBy("symbol", "bar_start")
      .collect().toSeq
    assert(a.size == bars.size)
    assert(a == b)
  }

  test("PQ-ADC approximates exact L2 top-k with usable recall") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val pq = Similarity.annPqAdc(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // exact L2 top-10 per query over the widened vectors
    val n = Similarity.normed(emb).select("vec_id", "v")
    val q = n.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val exact = broadcast(q).crossJoin(n)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        expr("aggregate(zip_with(qv, v, (x, y) -> (x-y)*(x-y)), 0D, (a, e) -> a + e)")
          .as("d2"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("d2"), col("vec_id"))))
      .filter(col("rk") <= 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(pq.keySet == exact.keySet && pq.keySet.size == 10)
    val recalls = exact.map { case (qid, ex) =>
      (pq(qid) & ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    // 4 subspaces × 16 codes on 64-dim synthetic data: a coarse
    // quantizer (production PQ uses 256 codes/subspace); the bar is that
    // ADC ordering is genuinely correlated with the true distances —
    // random top-10 sets would give recall ≈ 10/499 ≈ 0.02
    assert(mean >= 0.2, s"mean recall@10 = $mean")
  }

  test("saltedJoin is row-identical to the plain join") {
    // skewed fact: 90% of rows on one key
    val fact = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, 1000L + i)))
      .toDF("k", "id")
    val dim = (1L to 10L).map(k => (k, s"name_$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).orderBy("id")
      .collect().toSeq
    val salted = Skew.saltedJoin(fact, dim, "k", "id").orderBy("id")
      .select(plain.headOption.map(_ => fact.join(dim, Seq("k")).columns)
        .getOrElse(Array("k")).map(col).toSeq: _*)
      .collect().toSeq
    assert(salted == plain)
  }
}
