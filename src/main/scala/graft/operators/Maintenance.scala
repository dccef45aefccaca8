package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lakehouse table maintenance.
  *
  * Streaming sinks produce one file per partition per micro-batch — at a
  * 5-second trigger that is ~17k files/day/partition-column-value, which
  * destroys scan planning (listing) and read throughput long before
  * 100 TB. Compaction rewrites a partition subtree into few large files.
  */
object Maintenance {

  /** Rewrite `dir` (optionally only some partition values) into
    * ~`targetRecordsPerFile`-row files, preserving the partition scheme.
    * Writes to `outDir` then the caller swaps directories (atomic rename
    * on HDFS/object-store manifest commit) — never compact in place.
    */
  def compact(spark: SparkSession, dir: String, outDir: String,
              partitionCols: Seq[String],
              targetRecordsPerFile: Long = 1000000L): Unit = {
    val df = spark.read.parquet(dir)
    val writer = df
      .repartition(partitionCols.map(col): _*) // one task per partition tree
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecordsPerFile.toString)
      .option("compression", "snappy")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(outDir)
  }

  /** Bucketed table layout: write `df` hash-clustered (and per-file
    * sorted) on `bucketCol` into `nBuckets` buckets. Two fact tables
    * bucketed on their join key with the same bucket count join with
    * ZERO shuffle exchange — the files ARE the shuffle output,
    * materialized once at write time and reused by every subsequent
    * join/aggregation on that key (the cluster-scale answer for a
    * repeated orders⋈lineitem-shape join; SortMergeJoin reads the
    * per-bucket sorted files directly). On a real cluster `nBuckets`
    * sizes to data / ~1 GB; the sortBy makes each bucket file
    * merge-ready so the join skips its sort too.
    */
  def bucketize(df: DataFrame, table: String, bucketCol: String,
                nBuckets: Int = 8, sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a stale warehouse directory left by a PREVIOUS session is not in
    // this session's catalog, so mode("overwrite") alone would fail the
    // write with locationAlreadyExists — remove the orphan explicitly
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }

  /** Data-skipping layout (Z-order lite): range-partition the table on
    * `skipCols` and sort rows within each file on the same key, so every
    * file covers a DISJOINT key range and parquet row-group min/max
    * statistics prune point/range queries to one file instead of all of
    * them. This is the single-dimension case of what Delta/Iceberg call
    * OPTIMIZE ZORDER; for the gold table the right key is (symbol) —
    * date is already the directory partition. `nFiles` sizes the output
    * (data / 128 MB on a real table). Cost: ONE range-exchange (sampled
    * bounds) + in-task sort.
    */
  def sortForSkipping(spark: SparkSession, dir: String, outDir: String,
                      skipCols: Seq[String], nFiles: Int = 8): Unit = {
    val df = spark.read.parquet(dir)
    df.repartitionByRange(nFiles, skipCols.map(col): _*)
      .sortWithinPartitions(skipCols.map(col): _*)
      .write.mode("overwrite")
      .option("compression", "snappy")
      .parquet(outDir)
  }
}
