package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch interval (range) join — the batch twin of the stream-stream
  * interval join in graft.streaming.Streams.matchOppositeSides: match
  * each buy with the sells of the same symbol within `withinMinutes`
  * AFTER it.
  *
  * Scale shape — banded range join: a naive symbol-equi join with a
  * time-range residual does per-symbol quadratic work (a hot symbol's
  * whole history lands in one task). Instead both sides are bucketed to
  * `withinMinutes`-wide time bands; a buy can only match sells in its
  * own or the next band, so buys replicate ×2 onto (symbol, band) keys
  * and the join becomes a plain equi-join whose per-key work is bounded
  * by trades-per-symbol-per-band — independent of history length. Each
  * (buy, sell) pair meets exactly once (a sell has one band). This is
  * the standard range-bucketing decomposition; the residual range
  * predicate keeps exactness at full µs precision.
  */
object IntervalJoin {

  /** The matched (buy, sell) pairs themselves — row-identical to what
    * the streaming interval join emits (tested in StreamingSpec).
    */
  def pairs(trades: DataFrame, withinMinutes: Int = 1): DataFrame = {
    val bandSec = withinMinutes * 60L
    val buys = trades.filter(col("side") === "buy")
      .select(col("symbol"), col("event_id"),
        col("event_time").as("buy_time"), col("price").as("buy_price"))
      .withColumn("k", explode(array(lit(0L), lit(1L))))
      .withColumn("band",
        expr(s"unix_timestamp(buy_time) div $bandSec") + col("k"))
      .drop("k")
    val sells = trades.filter(col("side") === "sell")
      .select(col("symbol"), col("event_time").as("sell_time"),
        col("price").as("sell_price"))
      .withColumn("band", expr(s"unix_timestamp(sell_time) div $bandSec"))
    buys.join(sells, Seq("symbol", "band"))
      .filter(col("sell_time") >= col("buy_time") &&
        col("sell_time") <= col("buy_time") + expr(s"INTERVAL $withinMinutes MINUTE"))
  }

  def buySellMatches(trades: DataFrame, withinMinutes: Int = 1): DataFrame =
    pairs(trades, withinMinutes)
      .groupBy(col("symbol"), col("event_id"), col("buy_time"),
        col("buy_price"))
      .agg(
        count(lit(1)).as("n_sells"),
        min(col("sell_price")).as("min_sell_price"),
        max(col("sell_price")).as("max_sell_price"))
      .orderBy(col("symbol"), col("event_id"))
}
