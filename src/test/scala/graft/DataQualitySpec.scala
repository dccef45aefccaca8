package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality
import graft.operators.DataQuality.{Inclusion, RowCheck, Uniqueness}

/** Declarative data-quality audit: known-dirty fixtures must yield
  * exact violation counts, and the report must be one row per check.
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  // 6 rows: one null id (completeness), ids 1,1 duplicated (uniqueness
  // surplus 1), one negative amount, one dangling FK (9), one null FK
  // (NOT an inclusion violation).
  private def child = Seq(
    (Option(1L), Option(1L), 10.0),
    (Option(1L), Option(2L), 20.0),
    (Option(2L), Option(9L), -5.0),
    (Option(3L), None, 30.0),
    (None, Option(1L), 40.0),
    (Option(4L), Option(2L), 50.0)
  ).toDF("id", "fk", "amount")

  private def parent = Seq(1L, 2L, 3L).toDF("pk")

  private val checks = Seq(
    RowCheck("child_id_complete", "child", col("id").isNotNull),
    RowCheck("child_amount_positive", "child", col("amount") > 0),
    Uniqueness("child_id_unique", "child", Seq("id")),
    Inclusion("child_fk_in_parent", "child", "fk", "parent", "pk"))

  private def report = DataQuality
    .audit(Map("child" -> child, "parent" -> parent), checks)
    .collect().map(r => r.getAs[String]("check_id") ->
      ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"),
        r.getAs[Boolean]("pass")))).toMap

  test("row checks count null-or-false as violations in one scan") {
    assert(report("child_id_complete") == ((6L, 1L, false)))
    assert(report("child_amount_positive") == ((6L, 1L, false)))
  }

  test("uniqueness counts surplus duplicate rows") {
    // ids: 1,1,2,3,null,4 -> 6 rows, 5 distinct (null is its own group)
    assert(report("child_id_unique") == ((6L, 1L, false)))
  }

  test("inclusion counts dangling non-null FKs only") {
    // 5 non-null FKs, one (9) dangling; the null FK is excluded
    assert(report("child_fk_in_parent") == ((5L, 1L, false)))
  }

  test("a clean table passes every check") {
    val clean = Seq((1L, 1L, 1.0), (2L, 2L, 2.0)).toDF("id", "fk", "amount")
    val rep = DataQuality.audit(Map("child" -> clean, "parent" -> parent), checks)
      .collect()
    assert(rep.length == checks.length)
    assert(rep.forall(_.getAs[Boolean]("pass")))
  }

  test("corpus card: sections complete and internally consistent") {
    val card = SparkEntry.queries("corpus_card")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[String]("section"), r.getAs[String]("metric")) ->
        r.getAs[Double]("value")).toMap
    val nDocs = card(("volume", "n_docs"))
    assert(nDocs > 0)
    // mixes partition the corpus exactly
    assert(card.collect { case (("language_mix", _), v) => v }.sum == nDocs)
    assert(card.collect { case (("source_mix", _), v) => v }.sum == nDocs)
    // length percentiles are ordered; dup count is within range
    assert(card(("length", "p50_chars")) <= card(("length", "p90_chars")))
    val dups = card(("dedup", "exact_dup_docs"))
    assert(dups >= 0 && dups < nDocs)
  }

  test("standard suite runs green on the sf0.001 harness tables") {
    val dir = "/root/testdata/sf0.001"
    val rep = SparkEntry.queries("dq_audit")(spark, dir).collect()
    assert(rep.length == DataQuality.standardChecks.length)
    // report keys are exactly the declared check ids, sorted
    assert(rep.map(_.getAs[String]("check_id")).toSeq ==
      DataQuality.standardChecks.map(_.id).sorted)
    // the harness generator emits clean data EXCEPT lineitem, whose
    // l_linenumber is drawn randomly — (l_orderkey, l_linenumber) is
    // genuinely not a key there, and the audit must say so rather than
    // rubber-stamp. Everything else passes.
    val failing = rep.filterNot(_.getAs[Boolean]("pass"))
      .map(_.getAs[String]("check_id")).toSet
    assert(failing == Set("lineitem_pk_unique"), failing.mkString(", "))
  }
}
