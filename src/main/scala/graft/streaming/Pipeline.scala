package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{Schemas, Tables}
import graft.operators.Bronze

/** End-to-end streaming parity: the full three-hop pipeline (wire →
  * bronze → silver → gold) run through the REAL file-stream queries
  * (AvailableNow), then the gold sink read back as a batch table. The
  * `pipeline_gold_e2e` CORRECTNESS entry compares this against the
  * DuckDB bars oracle — converting the per-hop streaming tests into one
  * oracle-backed whole-pipeline guarantee (reference
  * scripts/collect_data.sh runs the same three jobs back to back).
  *
  * Two deliberate semantics:
  *  - The wire serializes event time as ms epochs
  *    (kraken_trades_ws.py:101), so everything downstream of the wire is
  *    ms-truncated; the oracle truncates the same way (silver_parse
  *    semantics), NOT the µs batch-trades shape.
  *  - Append-mode bars emit only when the watermark passes bar_end, and
  *    the watermark never advances past the last real event — so the gen
  *    step plants one SENTINEL wire row 10 minutes after the last trade.
  *    It drags the watermark past every real bar_end (flushing them to
  *    the sink) while its own in-progress bar stays in state; the batch
  *    read filters the sentinel symbol defensively.
  */
object Pipeline {

  val SentinelSymbol = "ZZ_WM_FLUSH"

  /** Staging trees awaiting JVM-exit cleanup. The returned frame reads
    * the gold sink lazily, so each invocation's dirs must outlive the
    * call — but ONE shared shutdown hook reclaims all of them (a hook
    * per invocation would accumulate hook registrations across repeated
    * runs in one process, e.g. graft.Time or test reruns).
    */
  private val stagingDirs =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())
  locally {
    sys.addShutdownHook {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(); ()
      }
      stagingDirs.forEach(p => rm(p.toFile))
    }
    ()
  }

  def goldE2E(spark: SparkSession, dir: String): DataFrame = {
    val basePath = Files.createTempDirectory("graft_e2e_")
    val base = basePath.toString
    stagingDirs.add(basePath)
    val landing = s"$base/landing"
    val bronzeDir = s"$base/bronze"
    val silverDir = s"$base/silver"
    val goldDir = s"$base/gold"

    // gen: wire-format landing files + the watermark-flush sentinel
    val events = Tables.events(spark, dir)
    val wire = Bronze.kafkaWireFromEvents(events)
    val maxTs = events.agg(max(col("ts"))).head.getTimestamp(0)
    val flushTs = new java.sql.Timestamp(maxTs.getTime + 10 * 60 * 1000)
    val sentinel = spark.range(1).select(
      lit("crypto.trades").as("topic"),
      lit(0).cast("int").as("partition"),
      lit(-1L).as("offset"),
      lit(flushTs).as("timestamp"),
      lit(0).as("timestampType"),
      lit(SentinelSymbol).cast("binary").as("key"),
      to_json(struct(
        lit("kraken").as("exchange"), lit(SentinelSymbol).as("symbol"),
        lit(1.0).as("price"), lit(1.0).as("size"),
        lit("buy").as("side"), lit("limit").as("order_type"),
        lit(flushTs.getTime).as("ts_event"),
        lit(flushTs.getTime).as("ts_ingest"))).cast("binary").as("value"))
    wire.unionByName(sentinel).write.mode("overwrite").parquet(landing)

    // the three hops, each drained to completion (AvailableNow)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[pipeline] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val an = Trigger.AvailableNow()
    // Fewer shuffle/state partitions for the streaming hops: each
    // stateful operator keeps one state store per shuffle partition,
    // and every micro-batch commits every store — at this volume the
    // 32-store fixed cost (dirs, delta files, commits) dominates the
    // actual row work. 8 stores cut that fixed cost ~4× with identical
    // results (dedup/agg are partition-count independent). On a real
    // cluster this knob is sized to state volume, not CPU count.
    val origShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      timed("hop1 wire->bronze")(Streams.kafkaLikeToBronze(
        spark.readStream.schema(Schemas.kafka).parquet(landing),
        bronzeDir, s"$base/ck1", trigger = an).awaitTermination())
      timed("hop2 bronze->silver")(Streams.bronzeToSilver(spark, bronzeDir,
        silverDir, s"$base/ck2", trigger = an).awaitTermination())
      // date-only gold partitioning: the harness has 1356 symbols, far past
      // the point where per-symbol dirs make sense (see silverToGold's
      // partitionCols note); parity is about bar CONTENT, and the
      // (bar_date, symbol) layout incl. `/`-escaping is round-trip tested
      // in StreamingSpec at small scale.
      timed("hop3 silver->gold")(Streams.silverToGold(spark, silverDir,
        goldDir, s"$base/ck3", trigger = an,
        partitionCols = Seq("bar_date")).awaitTermination())
    } finally spark.conf.set("spark.sql.shuffle.partitions", origShuffle)

    spark.read.parquet(goldDir)
      .filter(col("symbol") =!= SentinelSymbol)
      .select(col("symbol"), col("bar_start"), col("bar_end"), col("open"),
        col("high"), col("low"), col("close"), col("volume"), col("vwap"),
        col("trades"), col("bar_date"))
      .orderBy(col("symbol"), col("bar_start"))
  }
}
