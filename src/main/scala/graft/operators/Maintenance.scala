package graft.operators

import org.apache.spark.sql.SparkSession
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
}
