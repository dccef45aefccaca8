package graft

/** SCD Type-2 build + point-in-time lookup semantics. */
class ScdSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Scd

  private def ev(eid: Long, u: Long, t: String, ts: String, k: Int,
                 v: Double = 0.0) =
    (eid, u, t, java.sql.Timestamp.valueOf(ts), v, s"""{"k": $k}""")

  private val cols =
    Seq("event_id", "user_id", "event_type", "ts", "value", "props")

  test("build: consecutive same-tier runs collapse into chained " +
      "[valid_from, valid_to) versions with one open current row " +
      "per user") {
    // user 1: tier 0,0,2,2,0 -> 3 versions; user 2: constant -> 1
    val events = Seq(
      ev(1, 1, "view", "2024-01-01 00:00:00", 5),
      ev(2, 1, "view", "2024-01-02 00:00:00", 10),
      ev(3, 1, "view", "2024-01-03 00:00:00", 60),
      ev(4, 1, "view", "2024-01-04 00:00:00", 70),
      ev(5, 1, "view", "2024-01-05 00:00:00", 1),
      ev(6, 2, "view", "2024-01-01 00:00:00", 99),
      ev(7, 2, "view", "2024-01-09 00:00:00", 80)
    ).toDF(cols: _*)
    val r = Scd.build(events).collect()
    val u1 = r.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getAs[Long]("version_no")).toSeq == Seq(1L, 2L, 3L))
    assert(u1.map(_.getAs[Int]("tier")).toSeq == Seq(0, 2, 0))
    assert(u1.map(_.getAs[Long]("n_obs")).toSeq == Seq(2L, 2L, 1L))
    // intervals chain: each valid_to equals the next valid_from
    u1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[java.sql.Timestamp]("valid_to") ==
        b.getAs[java.sql.Timestamp]("valid_from"))
    }
    assert(u1.count(_.getAs[Boolean]("is_current")) == 1)
    assert(u1.last.getAs[Boolean]("is_current") &&
      u1.last.isNullAt(u1.last.fieldIndex("valid_to")))
    val u2 = r.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2.head.getAs[Long]("n_obs") == 2L)
  }

  test("revenueByTier: a purchase is credited to the tier valid AT " +
      "purchase time, not the user's current tier") {
    val events = Seq(
      ev(1, 1, "view", "2024-01-01 00:00:00", 10),          // tier 0
      ev(2, 1, "purchase", "2024-01-02 00:00:00", 10, 100.0), // tier 0
      ev(3, 1, "view", "2024-01-03 00:00:00", 90),          // tier 3
      ev(4, 1, "purchase", "2024-01-04 00:00:00", 90, 7.5)  // tier 3
    ).toDF(cols: _*)
    val r = Scd.revenueByTier(events).collect()
      .map(x => (x.getAs[Int]("tier"), x.getAs[Long]("n_purchases"),
        x.getAs[Double]("revenue")))
    // a current-state dim would put all 107.5 on tier 3
    assert(r.toSeq == Seq((0, 1L, 100.0), (3, 1L, 7.5)))
  }

  test("build: every fact timestamp is covered by exactly one " +
      "version interval (partition property, random corpus)") {
    val rnd = new scala.util.Random(7)
    val events = (1 to 400).map { i =>
      ev(i.toLong, 1L + rnd.nextInt(5),
        if (rnd.nextInt(4) == 0) "purchase" else "view",
        f"2024-01-${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:00:00",
        rnd.nextInt(100), rnd.nextInt(500) / 100.0)
    }.toDF(cols: _*)
    val dim = Scd.build(events)
    val facts = events.select($"user_id".as("fu"), $"ts".as("fts"))
    val matched = facts.join(dim,
      $"fu" === $"user_id" && $"fts" >= $"valid_from" &&
        ($"valid_to".isNull || $"fts" < $"valid_to"))
    assert(matched.count() == events.count())
    // and n_obs sums back to the observation count
    assert(dim.agg(org.apache.spark.sql.functions.sum($"n_obs"))
      .collect().head.getLong(0) == events.count())
  }
}
