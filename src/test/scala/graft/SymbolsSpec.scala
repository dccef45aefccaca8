package graft

import org.apache.spark.sql.functions._

import graft.functions.Symbols

/** Symbol splitting/normalization (reference common/symbols.py). */
class SymbolsSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    // (input, base, quote, normalized)
    ("XBT/USDT", "XBT", "USDT", "BTC_USDT"), // kraken slash + alias
    ("ETH-USD", "ETH", "USD", "ETH_USD"),    // coinbase dash
    ("SOLUSDT", "SOL", "USDT", "SOL_USDT"),  // binance suffix, USDT before USD
    ("XDGEUR", "XDG", "EUR", "DOGE_EUR"),    // suffix + alias
    ("BTCUSDC", "BTC", "USDC", "BTC_USDC"),  // USDC before USD
    ("WEIRD", "WEIRD", "", "WEIRD_"))        // no style matches

  test("plain-Scala splitPair/normalizeSymbol") {
    cases.foreach { case (in, b, q, n) =>
      assert(Symbols.splitPair(in) == (b, q), in)
      assert(Symbols.normalizeSymbol(in) == n, in)
    }
  }

  test("Column twins agree with the Scala versions") {
    val df = cases.map(_._1).toDF("sym").select(
      col("sym"),
      Symbols.baseCol(col("sym")).as("b"),
      Symbols.quoteCol(col("sym")).as("q"),
      Symbols.normalizeCol(col("sym")).as("n"))
    df.collect().foreach { r =>
      val (_, b, q, n) = cases.find(_._1 == r.getAs[String]("sym")).get
      assert(r.getAs[String]("b") == b, r)
      assert(r.getAs[String]("q") == q, r)
      assert(r.getAs[String]("n") == n, r)
    }
  }
}
