package graft

import graft.Tables
import graft.operators.{Dedup, Lifecycle}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tombstone-ledger time travel: latest-op-wins semantics, del>add
  * within a batch, re-adds, compaction equivalence, and parity with
  * the copy-on-write retire path.
  */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def ledger(rows: (Long, Int, String)*): DataFrame =
    rows.toDF("doc_id", "batch_id", "op")

  private def active(l: DataFrame, b: Int): Set[Long] =
    Lifecycle.activeAsOf(l, b).collect().map(_.getLong(0)).toSet

  test("latest op wins; del outranks add within a batch; re-add reactivates") {
    val l = ledger(
      (1L, 0, "add"),                    // plain add
      (2L, 0, "add"), (2L, 2, "del"),    // retired at 2
      (3L, 1, "add"), (3L, 1, "del"),    // same-batch add+del → out
      (4L, 0, "add"), (4L, 1, "del"), (4L, 3, "add"), // re-added at 3
      (5L, 2, "add"))
    assert(active(l, 0) == Set(1L, 2L, 4L))
    assert(active(l, 1) == Set(1L, 2L))          // 3 same-batch-del, 4 del@1
    assert(active(l, 2) == Set(1L, 5L))          // 2 retired
    assert(active(l, 3) == Set(1L, 4L, 5L))      // 4 re-added
  }

  test("indexAsOf filters payload rows to active membership only") {
    val payload = Seq((1L, "a"), (1L, "b"), (2L, "c"), (9L, "z"))
      .toDF("doc_id", "v")
    val l = ledger((1L, 0, "add"), (2L, 0, "add"), (2L, 1, "del"))
    val got = Lifecycle.indexAsOf(payload, l, 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // doc 2 tombstoned, doc 9 never added → both invisible
    assert(got == Set((1L, "a"), (1L, "b")))
  }

  test("compaction: compacted (payload, ledger) answers asOf like the original for B >= compaction batch") {
    val payload = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "v")
    val l = ledger(
      (1L, 0, "add"),
      (2L, 0, "add"), (2L, 2, "del"),
      (3L, 1, "add"),
      (4L, 0, "add"), (4L, 1, "del"), (4L, 3, "add"))
    val (cp, cl) = Lifecycle.compact(payload, l, asOfBatch = 3)
    for (b <- 3 to 5) {
      val orig = Lifecycle.indexAsOf(payload, l, b)
        .collect().map(_.getLong(0)).toSet
      val comp = Lifecycle.indexAsOf(cp, cl, b)
        .collect().map(_.getLong(0)).toSet
      assert(orig == comp, s"asOf($b) drifted after compaction")
    }
    // tombstoned rows are physically gone from the compacted payload
    assert(cp.filter(col("doc_id") === 2L).count() == 0)
    assert(cl.filter(col("op") === "del").count() == 0)
  }

  test("merge-on-read parity with copy-on-write retire at the horizon") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val sigs = Dedup.minhashSignatures(docs)
    val isRet = pmod(graft.functions.TextFunctions.hash60(
      concat(lit("ret_"), col("doc_id"))), lit(100)) >= 90
    val l = docs.select(col("doc_id"), lit(0).as("batch_id"),
        lit("add").as("op"))
      .unionByName(Lifecycle.delBatch(
        docs.filter(isRet).select(col("doc_id")), 1))
    val mor = Lifecycle.indexAsOf(sigs, l, 1)
      .collect().map(_.getLong(0)).toSet
    val cow = Dedup.retireRows(sigs, docs.filter(isRet).select(col("doc_id")))
      .collect().map(_.getLong(0)).toSet
    assert(mor == cow && mor.nonEmpty)
  }

  test("membership audit counts the growth-and-takedown curve") {
    val l = ledger(
      (1L, 0, "add"), (2L, 1, "add"), (3L, 1, "add"),
      (2L, 2, "del"))
    val got = Lifecycle.membershipAudit(l, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 1L), (1L, 3L), (2L, 2L), (3L, 2L)))
  }

  test("snapshotDiff: added/removed/changed statuses, unchanged " +
      "filtered, O(churn) output") {
    val v1 = Seq((1L, "same text"), (2L, "old text"), (3L, "gone"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, "same text"), (2L, "new text"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val diff = Lifecycle.snapshotDiff(
        Dedup.fingerprints(v1), Dedup.fingerprints(v2))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String]("status"), r.isNullAt(1), r.isNullAt(2))).toMap
    assert(diff.keySet == Set(2L, 3L, 4L)) // doc 1 unchanged -> absent
    assert(diff(2L) == (("changed", false, false)))
    assert(diff(3L) == (("removed", false, true)))
    assert(diff(4L) == (("added", true, false)))
    // diff of a snapshot with itself is empty
    assert(Lifecycle.snapshotDiff(
      Dedup.fingerprints(v1), Dedup.fingerprints(v1)).isEmpty)
  }
}
