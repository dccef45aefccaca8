package graft

import org.apache.spark.sql.functions._

import graft.operators.EntityResolution

/** Entity resolution on a constructed customer frame: deterministic
  * corruption, blocking coverage, Fellegi–Sunter classification of the
  * known true links, and survivorship.
  */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  // 40 customers across 4 nations / the 5 real segments — enough for
  // blocks to be non-trivial and the u-sample to be non-empty
  private val segs =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val customers = (0 until 40).map { i =>
    (i.toLong, f"Customer#$i%09d", i % 4, 1000.0 + 13.37 * i, segs(i % 5))
  }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  private val a = EntityResolution.sourceA(customers)
  private val b = EntityResolution.sourceB(customers)

  test("corruption is deterministic and keeps ~90% of records") {
    val n1 = b.collect().toSet
    val n2 = EntityResolution.sourceB(customers).collect().toSet
    assert(n1 == n2)
    val kept = b.count()
    assert(kept < 40 && kept >= 30, s"kept $kept of 40")
    // every B id maps back to an existing A id
    val aIds = a.select("rec_id").as[Long].collect().toSet
    val bTwins = b.select((col("rec_id") - EntityResolution.BIdOffset)
      .as[Long]).collect().toSet
    assert(bTwins.subsetOf(aIds))
  }

  test("blocking recovers every twin whose nation survived corruption") {
    val cand = EntityResolution.candidates(a, b)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    // twins whose nation was NOT perturbed share the (nation, segment)
    // key unless the segment was ALSO re-labelled AND the balance
    // crossed a band edge; with both passes, only a double corruption
    // (nation moved) can sever all keys
    val natA = a.select(col("rec_id"), col("nat"))
      .as[(Long, Long)].collect().toMap
    val bRows = b.select(col("rec_id"), col("nat"))
      .as[(Long, Long)].collect()
    val severed = bRows.count { case (bid, nat) =>
      natA(bid - EntityResolution.BIdOffset) != nat
    }
    val truePairsFound = bRows.count { case (bid, _) =>
      cand.contains((bid - EntityResolution.BIdOffset, bid))
    }
    assert(truePairsFound >= bRows.length - severed,
      s"found $truePairsFound of ${bRows.length} (severed: $severed)")
  }

  test("true links classify as match; eval row internals are consistent") {
    val ev = EntityResolution.erEval(a, b).collect()
    val at6 = ev.find(_.getDouble(0) == EntityResolution.ThMatch).get
    val rec = at6.getDouble(5)
    val blockRec = at6.getDouble(7)
    assert(rec >= 0.8, s"recall at ThMatch = $rec")
    assert(blockRec >= rec, "classified recall cannot exceed blocking recall")
    // precision sanity: matches are dominated by true links
    assert(at6.getDouble(4) >= 0.8, s"precision ${at6.getDouble(4)}")
  }

  test("entities: clean-source survivorship and pair provenance") {
    val ents = EntityResolution.entities(a, b)
    val rows = ents.collect()
    assert(rows.nonEmpty)
    // every entity rep is an A-side id (A ids < B ids by construction)
    assert(rows.forall(_.getLong(0) < EntityResolution.BIdOffset))
    // canonical name comes from the lowest id (the A record): it must
    // be an uncorrupted Customer#NNNNNNNNN name
    assert(rows.forall(_.getString(3).matches("Customer#\\d{9}")))
    // 2-member entities spanning both sources dominate
    val both = rows.count(r => r.getLong(2) == 2)
    assert(both >= rows.length / 2, s"$both of ${rows.length} span A+B")
  }
}
