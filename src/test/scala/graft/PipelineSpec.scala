package graft

import org.apache.spark.sql.functions._

import graft.operators.{Gold, Trades}
import graft.streaming.Pipeline

/** Whole-pipeline streaming parity: the three real file-stream hops
  * (AvailableNow) must produce gold bars identical to the batch plan
  * over ms-truncated trades (the wire serializes ms epochs — see
  * Pipeline's scaladoc; the sf0.01 DuckDB oracle makes the same check
  * cross-engine via the pipeline_gold_e2e CORRECTNESS entry).
  */
class PipelineSpec extends SparkSpec {

  test("e2e streamed gold equals ms-truncated batch bars at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val cols = Seq("symbol", "bar_start", "bar_end", "open", "high", "low",
      "close", "volume", "vwap", "trades", "bar_date")
    val got = Pipeline.goldE2E(spark, dir).collect().toSeq
    val msTrades = Trades.fromEvents(Tables.events(spark, dir))
      .withColumn("event_time", timestamp_millis(unix_millis(col("event_time"))))
    val want = Gold.bars(msTrades)
      .select(cols.map(col): _*)
      .orderBy(col("symbol"), col("bar_start"))
      .collect().toSeq
    assert(want.nonEmpty)
    assert(got == want)
  }
}
