package graft

import org.apache.spark.sql.functions._

import graft.operators.Silver

/** Silver parse/type/dedup semantics (reference bronze_to_silver_trades.py). */
class SilverSpec extends SparkSpec {
  import spark.implicits._

  private val wire =
    """{"exchange":"kraken","symbol":"XBT/USDT","price":65000.1,"size":0.005,
      |"side":"buy","order_type":"market","ts_event":1718000000123,
      |"ts_ingest":1718000000456}""".stripMargin.replace("\n", "")

  private def bronzeRow(offset: Long, raw: String) =
    ("crypto.trades", 0, offset, ts("2024-06-10 06:13:20"), "XBT/USDT", raw)

  private def bronzeDf(rows: (String, Int, Long, java.sql.Timestamp, String, String)*) =
    rows.toSeq.toDF("topic", "partition", "offset", "ts_kafka", "key", "value_raw")

  test("wire JSON parses to typed columns; ms-epoch keeps sub-second precision") {
    val s = Silver.projectToSilver(bronzeDf(bronzeRow(1, wire))).collect().head
    assert(s.getAs[String]("exchange") == "kraken")
    assert(s.getAs[String]("symbol") == "XBT/USDT")
    assert(s.getAs[Double]("price") == 65000.1)
    assert(s.getAs[Double]("size") == 0.005)
    assert(s.getAs[String]("side") == "buy")
    assert(s.getAs[String]("order_type") == "market")
    // 1718000000123 ms = 2024-06-10 06:13:20.123 UTC, exact to the ms
    assert(s.getAs[java.sql.Timestamp]("event_time").getTime == 1718000000123L)
    assert(s.getAs[java.sql.Timestamp]("ingest_time").getTime == 1718000000456L)
    assert(s.getAs[java.sql.Date]("event_date").toString == "2024-06-10")
  }

  test("malformed JSON yields null parsed columns, not errors (PERMISSIVE)") {
    val s = Silver.projectToSilver(bronzeDf(bronzeRow(2, "{not json!"))).collect().head
    assert(s.getAs[String]("exchange") == null)
    assert(s.getAs[Any]("price") == null)
    assert(s.getAs[Any]("event_time") == null)
    assert(s.getAs[Any]("event_date") == null)
    // passthrough columns survive
    assert(s.getAs[String]("value_raw") == "{not json!")
    assert(s.getAs[Long]("offset") == 2L)
  }

  test("dedup keeps one row per (symbol, event_time, price, size, side)") {
    val df = Silver.projectToSilver(bronzeDf(
      bronzeRow(1, wire), bronzeRow(2, wire), // same trade, different offset
      bronzeRow(3, wire.replace("65000.1", "65000.2")))) // different price
    assert(df.count() == 3)
    assert(Silver.dedup(df).count() == 2)
  }

  test("dedup is idempotent") {
    val df = Silver.projectToSilver(bronzeDf(bronzeRow(1, wire), bronzeRow(2, wire)))
    val once = Silver.dedup(df)
    assert(once.count() == Silver.dedup(once).count())
  }

  test("silver schema matches the declared contract") {
    val df = Silver.projectToSilver(bronzeDf(bronzeRow(1, wire)))
    assert(df.schema.fieldNames.toSeq == Schemas.silver.fieldNames.toSeq)
  }

  test("reject audit classifies each row by FIRST defect, zero buckets included") {
    def payload(sym: String, price: String, size: String,
                tsEvent: String) =
      s"""{"exchange":"kraken","symbol":$sym,"price":$price,"size":$size,
         |"side":"buy","order_type":"market","ts_event":$tsEvent,
         |"ts_ingest":1718000000456}""".stripMargin.replace("\n", "")
    val rows = bronzeDf(
      bronzeRow(1, wire),                                        // ok
      bronzeRow(2, "{definitely not json"),                      // malformed
      bronzeRow(3, payload("null", "1.0", "1.0", "1718000000123")), // no symbol
      bronzeRow(4, payload("\"X\"", "1.0", "1.0", "null")),      // no ts
      bronzeRow(5, payload("\"X\"", "-3.0", "1.0", "1718000000123")), // bad price
      bronzeRow(6, payload("\"X\"", "1.0", "0.0", "1718000000123")),  // bad size
      // null symbol AND bad price -> counts ONLY as missing_symbol
      bronzeRow(7, payload("null", "-1.0", "1.0", "1718000000123")))
    val audit = Silver.rejectAudit(rows).collect()
    assert(audit.map(_.getAs[String]("reason")).toSeq ==
      Silver.RejectReasons)
    val byReason = audit.map(r =>
      r.getAs[String]("reason") -> r.getAs[Long]("n")).toMap
    assert(byReason == Map("malformed_json" -> 1L, "missing_symbol" -> 2L,
      "missing_event_time" -> 1L, "bad_price" -> 1L, "bad_size" -> 1L,
      "ok" -> 1L))
  }
}
