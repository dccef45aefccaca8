package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: steady-state re-baseline of the full registry for
  * BASELINE.md — NOT the driver bench contract (that stays
  * [[Bench]]). Method: one untimed full warm pass over the
  * name-sorted suite (JIT, code cache, page cache), then a timed
  * min-of-2 pass — which removes the suite-position cold artifacts
  * that manufactured phantom regressions in rounds 9/10
  * (q16_supplier_count 1.59 s benched vs 0.24 s steady;
  * payload_key_audit 6.80 vs 0.74). The e2e pipelines run real
  * streaming sinks and are warmed/timed ONCE (IO-bound).
  * Usage: runMain graft.Rebase [sfDir] [outFile]
  */
object Rebase {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/rebase.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // registry-sized generated-class cache (the round-8 lesson:
      // the 100-entry default thrashes past ~100 distinct plans)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val oneShot = Set("pipeline_gold_e2e", "pipeline_corpus_e2e",
      "pipeline_restate_e2e", "pipeline_join_e2e", "pipeline_retire_e2e",
      "pipeline_er_e2e", "pipeline_split_e2e",
      "sketch_stream_e2e", "bars_live_e2e")
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    // pass 1: warm (e2e timed here, once — their warm pass IS the run);
    // a FAILED query records no time — a failure duration written as a
    // steady-state number would silently pollute BASELINE.md
    val e2eTimes = qs.flatMap { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[rebase] warm $name FAILED: $e"); false }
      if (oneShot(name) && ok) Some(name -> (System.nanoTime() - t0) / 1e9)
      else None
    }.toMap
    // pass 2: timed, min of 2; failures excluded for the same reason
    // (and must not abort the remaining suite)
    val timed = qs.flatMap { case (name, fn) =>
      if (oneShot(name)) e2eTimes.get(name).map(name -> _)
      else {
        val ts = (1 to 2).flatMap { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count()
            Some((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            System.err.println(s"[rebase] timed $name FAILED: $e"); None }
        }
        if (ts.isEmpty) None else Some(name -> ts.min)
      }
    }
    val json = timed.map { case (k, v) => s""""$k": $v""" }
      .mkString("{", ", ", "}")
    Files.write(Paths.get(out), (json + "\n").getBytes(StandardCharsets.UTF_8))
    val nFailed = qs.size - timed.size
    println(s"[rebase] ${timed.size} queries -> $out " +
      f"(sum ${timed.map(_._2).sum}%.1f s" +
      (if (nFailed > 0) s", $nFailed FAILED/excluded)" else ")"))
    spark.stop()
  }
}
