package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Bronze, Silver}
import graft.streaming.{FileTradeSource, Streams}

/** FileTradeSource: wire-JSON-lines directory → Kafka-shaped frame →
  * bronze → silver, in both batch and streaming modes (SURVEY §7.4).
  */
class TradeSourceSpec extends SparkSpec {

  private val lines = Seq(
    """{"exchange":"kraken","symbol":"XBT/USDT","price":65000.1,"size":0.005,"side":"buy","order_type":"market","ts_event":1718000000123,"ts_ingest":1718000000456}""",
    """{"exchange":"kraken","symbol":"ETH/USDT","price":3500.5,"size":1.25,"side":"sell","order_type":"limit","ts_event":1718000060500,"ts_ingest":1718000060900}""")

  private def writeWireDir(): String = {
    val dir = Files.createTempDirectory("graft_wire")
    Files.write(Paths.get(dir.toString, "part-0.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("batch: wire JSON → kafka shape → bronze → silver round-trips fields") {
    val src = new FileTradeSource(writeWireDir())
    val silver = Silver.projectToSilver(Bronze.fromKafkaLike(src.batch(spark)))
      .orderBy("symbol").collect()
    assert(silver.length == 2)
    val eth = silver.head
    assert(eth.getAs[String]("symbol") == "ETH/USDT")
    assert(eth.getAs[Double]("price") == 3500.5)
    assert(eth.getAs[java.sql.Timestamp]("event_time").getTime == 1718000060500L)
    assert(eth.getAs[String]("key") == "ETH/USDT") // producer keys by symbol
  }

  test("streaming: the same source drives the bronze hop end-to-end") {
    val src = new FileTradeSource(writeWireDir())
    val bronzeDir = Files.createTempDirectory("graft_bronze_src").toString
    val q = Streams.kafkaLikeToBronze(src.stream(spark), bronzeDir,
      Files.createTempDirectory("graft_ck_src").toString,
      trigger = Trigger.AvailableNow())
    q.awaitTermination()
    val bronze = spark.read.parquet(bronzeDir)
    assert(bronze.count() == 2)
    assert(bronze.schema.fieldNames.toSet == Schemas.bronze.fieldNames.toSet)
    // raw payload preserved verbatim enough to re-parse
    val reparsed = Silver.projectToSilver(bronze)
      .where(col("symbol") === "XBT/USDT").collect()
    assert(reparsed.head.getAs[Double]("size") == 0.005)
  }
}
