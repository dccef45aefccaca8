package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the denylist-scrub pattern-count scaling evidence
  * (usage: `runMain graft.ScrubKnob <sfDir> [nTerms...]`) — times the
  * [[org.apache.spark.sql.graft.DenylistScrub]] broadcast-trie walk
  * against the equivalent longest-first alternation regex at growing
  * term counts over the documents table. This is the measurement
  * behind SCALING.md's claim that the alternation regex is unusable at
  * production pattern counts (10⁴–10⁵ phrases) while the trie is
  * pattern-count-independent: the regex side stops being run once a
  * round exceeds [[RegexBudgetSec]], and prints `skipped` after that.
  *
  * Terms are deterministic two-token phrases from the corpus
  * vocabulary crossed with itself and with synthetic fillers, so a
  * realistic fraction actually hits the text (the trie's match walk is
  * exercised, not just its first-byte skip).
  */
object ScrubKnob {

  val RegexBudgetSec = 120.0

  /** First `n` of the deterministic phrase list: corpus-vocab ×
    * (corpus-vocab ++ synthetic) pairs — 128 × 128 = 16384 available. */
  def terms(n: Int): Seq[String] = {
    val corpus = Seq("the", "fast", "key", "order", "sort", "table",
      "scan", "merge", "part", "window", "small", "hash", "join",
      "batch", "stream", "spark", "dup", "group", "query", "row",
      "data", "slow", "filter", "customer", "line", "value", "agg",
      "column", "big", "vector", "a", "smooth")
    val firsts = (corpus ++ (0 until 512).map(i => s"t$i")).take(512)
    val seconds = (corpus ++ (0 until 512).map(i => s"u$i")).take(512)
    (for (f <- firsts; s <- seconds) yield s"$f $s").take(n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val counts = if (args.length > 1) args.toSeq.tail.map(_.toInt)
                 else Seq(64, 256, 1024, 4096, 16384)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    docs.count() // warm
    var regexAlive = true
    counts.foreach { n =>
      val ts = terms(n)
      val trieSec = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.TextAnalysis.scrubDenylist(docs, ts)
          .agg(sum(col("n_hits"))).head()
        (System.nanoTime() - t0) / 1e9
      }.min
      val hits = graft.operators.TextAnalysis.scrubDenylist(docs, ts)
        .agg(sum(col("n_hits"))).head().getLong(0)
      val regexSec: String = if (regexAlive) {
        val pattern = ts.sortBy(t => (-t.length, t))
          .mkString("\\b(", "|", ")\\b")
        val t0 = System.nanoTime()
        docs.select(regexp_count(col("text"), lit(pattern)).as("h"),
            md5(regexp_replace(col("text"), pattern, "[REDACTED]")))
          .agg(sum(col("h"))).head()
        val s = (System.nanoTime() - t0) / 1e9
        if (s > RegexBudgetSec) regexAlive = false
        f"$s%.2f"
      } else "skipped(prev>budget)"
      println(f"[scrub] n_terms=$n%-6d n_hits=$hits%-8d " +
        f"trie_sec=$trieSec%.2f regex_sec=$regexSec")
    }
    spark.stop()
  }
}
