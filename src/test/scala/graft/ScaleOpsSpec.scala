package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.Schemas.Bar
import graft.operators.{Analytics, Skew}

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
