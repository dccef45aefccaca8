package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.Schemas.Trade
import graft.operators.Sessions

/** Gap-based sessionization: batch window shape vs streaming
  * flatMapGroupsWithState state machine.
  */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def trade(sym: String, t: String, size: Double = 1.0) =
    Trade("kraken", sym, 100.0, size, "buy", "market", ts(t))

  private val trades = Seq(
    trade("A", "2024-01-01 10:00:00", 1.0),
    trade("A", "2024-01-01 10:10:00", 2.0),  // same session (gap 10m)
    trade("A", "2024-01-01 11:00:00", 3.0),  // new session (gap 50m > 30m)
    trade("B", "2024-01-01 10:05:00", 4.0))

  test("batch: gap > 30min starts a new session; aggregates exact") {
    val s = Sessions.stats(trades.toDS.toDF)
      .orderBy("symbol", "session_id").collect()
    assert(s.length == 3)
    assert(s(0).getAs[Long]("session_id") == 0L)
    assert(s(0).getAs[Long]("n_trades") == 2L)
    assert(s(0).getAs[Double]("volume") == 3.0)
    assert(s(1).getAs[Long]("session_id") == 1L)
    assert(s(1).getAs[Long]("n_trades") == 1L)
    assert(s(2).getAs[String]("symbol") == "B")
  }

  test("native session_window variant is row-identical to the window shape") {
    // synthetic boundary cases: exactly-30min gap (same session under the
    // floor-second > rule), 30min+1s gap (new session), sub-second jitter
    val edge = trades ++ Seq(
      trade("C", "2024-01-01 10:00:00", 1.0),
      trade("C", "2024-01-01 10:30:00", 1.0),  // gap exactly 1800s: merges
      trade("C", "2024-01-01 11:00:01", 1.0),  // gap 1801s: splits
      trade("D", "2024-01-01 10:00:00", 1.0))
    val cols = Seq("symbol", "session_id", "session_start", "session_end",
      "n_trades", "volume")
    val a = Sessions.stats(edge.toDS.toDF)
      .select(cols.map(col): _*).orderBy("symbol", "session_id")
      .collect().toSeq
    val b = Sessions.statsNative(edge.toDS.toDF)
      .select(cols.map(col): _*).orderBy("symbol", "session_id")
      .collect().toSeq
    assert(a == b)
    // and on the real data (µs timestamps, all symbols)
    val real = operators.Trades.fromEvents(
      Tables.events(spark, "/root/testdata/sf0.001"))
    val ra = Sessions.stats(real).select(cols.map(col): _*)
      .orderBy("symbol", "session_id").collect().toSeq
    val rb = Sessions.statsNative(real).select(cols.map(col): _*)
      .orderBy("symbol", "session_id").collect().toSeq
    assert(ra.nonEmpty && ra == rb)
  }

  test("streaming native session_window emits the batch sessions") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Trade]
    val q = graft.streaming.Streams.sessionWindowStream(in.toDF)
      .writeStream.format("memory").queryName("sessions_native_stream")
      .outputMode("append").start()
    try {
      in.addData(trades: _*)
      // sentinel far in the future drags the watermark past every session
      in.addData(trade("ZZ", "2024-01-02 10:00:00", 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions_native_stream")
        .filter(col("symbol") =!= "ZZ")
        .select("symbol", "session_start", "session_end", "n_trades", "volume")
        .orderBy("symbol", "session_start").collect().toSeq
      val want = operators.Sessions.stats(trades.toDS.toDF)
        .select(col("symbol"), col("session_start"), col("session_end"),
          col("n_trades"), col("volume"))
        .orderBy("symbol", "session_start").collect().toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("streaming: sessions emit on gap closure with identical aggregates") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Trade]
    val q = Sessions.streamingStats(spark, in.toDF)
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    try {
      in.addData(trades.take(2): _*)
      q.processAllAvailable()
      // session still open
      assert(spark.table("sessions_stream").count() == 0)
      in.addData(trades(2)) // 50-minute gap closes session 0
      q.processAllAvailable()
      val closed = spark.table("sessions_stream").collect()
      assert(closed.length == 1)
      assert(closed.head.getAs[Long]("n_trades") == 2L)
      assert(closed.head.getAs[Double]("volume") == 3.0)
      assert(closed.head.getAs[java.sql.Timestamp]("session_end") ==
        ts("2024-01-01 10:10:00"))
    } finally q.stop()
  }

  test("transformWithState sessionization emits the same sessions") {
    implicit val ctx = spark.sqlContext
    // transformWithState needs a multi-column-family store => RocksDB
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Trade]
    val q = Sessions.streamingStatsTws(spark, in.toDF)
      .writeStream.format("memory").queryName("sessions_tws")
      .outputMode("append").start()
    try {
      in.addData(trades: _*)
      // far-future sentinel advances the watermark past every timer
      in.addData(trade("ZZ", "2024-01-02 10:00:00", 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions_tws")
        .filter(col("symbol") =!= "ZZ")
        .select("symbol", "session_start", "session_end", "n_trades", "volume")
        .orderBy("symbol", "session_start").collect().toSeq
      val want = Sessions.stats(trades.toDS.toDF)
        .select(col("symbol"), col("session_start"), col("session_end"),
          col("n_trades"), col("volume"))
        .orderBy("symbol", "session_start").collect().toSeq
      assert(got == want)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
