package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ArgExtremum

/** Index time-travel: a batch-versioned MEMBERSHIP LEDGER beside the
  * append-only payload indices.
  *
  * The retire family (Dedup.retireRows and friends) is copy-on-write:
  * a takedown rewrites the index minus the retired rows. That is the
  * right end state, but a real pipeline also needs the merge-on-read
  * half: takedowns land as O(delta) TOMBSTONE appends — no index
  * rewrite on the takedown path — and every reader reconstructs the
  * index "as of batch B" by folding the ledger. Compaction then folds
  * accumulated tombstones into the payload on its own schedule.
  * (This is the Delta/Iceberg delete-vector posture, re-expressed as
  * plain parquet + a deterministic fold, engine-independent.)
  *
  * Ledger rows are (doc_id, batch_id, op) with op ∈ {add, del}.
  * Within a batch a del outranks an add (a doc added and retired in
  * the same batch is out); across batches the LATEST op wins, so a
  * re-add after a takedown re-activates the doc.
  *
  * Scale shape: the fold is one hash aggregation keyed doc_id (state =
  * 16 bytes/doc); as-of reads add one semi join on doc_id against the
  * payload, which inherits the payload's partitioning. The audit's
  * explode is bounded by the batch horizon, not the corpus.
  */
object Lifecycle {

  /** Ledger rows for an add / retire batch. */
  def addBatch(ids: DataFrame, batchId: Int): DataFrame =
    ids.select(col(ids.columns.head).as("doc_id"),
      lit(batchId).as("batch_id"), lit("add").as("op"))

  def delBatch(ids: DataFrame, batchId: Int): DataFrame =
    ids.select(col(ids.columns.head).as("doc_id"),
      lit(batchId).as("batch_id"), lit("del").as("op"))

  /** Ordering key under which "latest op wins, del outranks add within
    * a batch" is a plain argmax.
    */
  private def opKey: Column =
    col("batch_id").cast("long") * 2 +
      when(col("op") === "del", 1L).otherwise(0L)

  private def isDel: Column = when(col("op") === "del", 1L).otherwise(0L)

  /** doc_ids whose latest ledger op at `asOfBatch` is an add. */
  def activeAsOf(ledger: DataFrame, asOfBatch: Int): DataFrame =
    ledger.filter(col("batch_id") <= asOfBatch)
      .groupBy(col("doc_id"))
      .agg(ArgExtremum.argMax(isDel, opKey).as("last_del"))
      .filter(col("last_del") === 0)
      .select(col("doc_id"))

  /** Any doc-provenanced payload index reconstructed as of a batch:
    * semi join against the active membership — the payload itself is
    * append-only and never rewritten on the takedown path.
    */
  def indexAsOf(payload: DataFrame, ledger: DataFrame, asOfBatch: Int,
                idCol: String = "doc_id"): DataFrame =
    payload.join(
      activeAsOf(ledger, asOfBatch).withColumnRenamed("doc_id", idCol),
      Seq(idCol), "left_semi")

  /** Active-membership time series over batches 0..maxBatch — the
    * growth-and-takedown curve an operator watches. Each ledger row
    * explodes into the batches it is visible at (factor ≤ horizon),
    * then the same argmax fold runs per (batch, doc).
    */
  def membershipAudit(ledger: DataFrame, maxBatch: Int): DataFrame =
    ledger.select(col("doc_id"), isDel.as("is_del"), opKey.as("k"),
        explode(sequence(col("batch_id").cast("long"),
          lit(maxBatch.toLong))).as("b"))
      .groupBy(col("b"), col("doc_id"))
      .agg(ArgExtremum.argMax(col("is_del"), col("k")).as("last_del"))
      .filter(col("last_del") === 0)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("b"))

  /** Compaction: fold tombstones into the payload physically and shrink
    * the ledger to one add per surviving doc (keeping its original add
    * batch for provenance). For any B ≥ compaction batch the compacted
    * pair answers asOf exactly like the uncompacted one (spec-pinned).
    */
  def compact(payload: DataFrame, ledger: DataFrame, asOfBatch: Int,
              idCol: String = "doc_id"): (DataFrame, DataFrame) = {
    val active = activeAsOf(ledger, asOfBatch)
    val newPayload = payload.join(
      active.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_semi")
    val newLedger = ledger.filter(col("op") === "add")
      .join(active, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(min(col("batch_id")).as("batch_id"))
      .select(col("doc_id"), col("batch_id"), lit("add").as("op"))
    (newPayload, newLedger)
  }

  /** Content-level diff of two corpus snapshots — the "what changed
    * between yesterday's drop and today's" primitive behind release
    * notes, incremental reprocessing scopes, and takedown audits. Both
    * sides are the persisted per-doc FINGERPRINT tables
    * ([[graft.operators.Dedup.fingerprints]], ~48 bytes/doc), never
    * the text: at corpus scale the diff is one full-outer hash join of
    * two slim index tables. Emits one row per differing doc —
    * `added` (v2 only), `removed` (v1 only), `changed` (both, content
    * hash differs); identical rows are filtered before the sort, so
    * output is O(churn), not O(corpus).
    */
  def snapshotDiff(v1Fps: DataFrame, v2Fps: DataFrame): DataFrame =
    v1Fps.select(col("doc_id"), col("fp").as("fp_v1"))
      .join(v2Fps.select(col("doc_id"), col("fp").as("fp_v2")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("fp_v1"), col("fp_v2"),
        when(col("fp_v1").isNull, "added")
          .when(col("fp_v2").isNull, "removed")
          .when(col("fp_v1") =!= col("fp_v2"), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")
      .orderBy(col("doc_id"))
}
