package graft

import graft.operators.Similarity

/** Mode-label propagation: community structure the min-label CC rule
  * cannot express, plus stability and determinism properties.
  */
class CommunitySpec extends SparkSpec {
  import spark.implicits._

  private def communities(pairs: Seq[(Long, Long)], iters: Int = 4) =
    Similarity.labelPropagation(pairs.toDF("id1", "id2"), iters)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap

  test("two triangles joined by a bridge keep distinct labels") {
    // CC would merge everything; the mode vote cannot push a label
    // across the bridge against a triangle's internal majority
    val tri1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val tri2 = Seq((4L, 5L), (5L, 6L), (4L, 6L))
    val m = communities(tri1 ++ tri2 ++ Seq((3L, 4L)))
    assert(m(1L) == m(2L) && m(2L) == m(3L))
    assert(m(4L) == m(5L) && m(5L) == m(6L))
    assert(m(1L) != m(4L), s"bridge merged the triangles: $m")
  }

  test("a disjoint pair converges to the smaller id (no oscillation)") {
    val m = communities(Seq((10L, 20L)))
    assert(m(10L) == 10L && m(20L) == 10L)
    // even vs odd iteration counts agree once converged — the
    // self-loop kills the 2-cycle that pure synchronous LPA has
    assert(communities(Seq((10L, 20L)), 3) == communities(Seq((10L, 20L)), 4))
  }

  test("a clique converges to its minimum id in one round") {
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val m = communities(clique, 1)
    assert(m.values.toSet == Set(1L))
  }

  test("result is independent of input pair orientation") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L))
    val flipped = edges.map { case (a, b) => (b, a) }
    assert(communities(edges) == communities(flipped))
  }

  test("registered query: every community is a connected, sized group") {
    val rep = SparkEntry.queries("knn_communities")(spark, "/root/testdata/sf0.001")
      .collect()
    // sizes are consistent: each community's size equals its member count
    val byComm = rep.groupBy(_.getAs[Long]("community"))
    byComm.foreach { case (_, rows) =>
      assert(rows.forall(_.getAs[Long]("community_size") == rows.length))
    }
  }

  test("kCore: K4 survives the 3-core peel, pendant chain and triangle do not") {
    // K4 on 1-4 (every degree 3), a chain 4-5-6 hanging off it, and a
    // separate triangle 7-8-9 (degrees 2)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (7L, 8L), (7L, 9L), (8L, 9L))
    val r = Similarity.kCore(pairs.toDF("id1", "id2"), k = 3).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2)))).toMap
    assert((1L to 4L).forall(id => r(id) == ((3L, true))))
    assert((5L to 9L).forall(id => r(id) == ((0L, false))))
    // the triangle IS a 2-core: k=2 keeps it (and the K4), sheds 5-6
    val r2 = Similarity.kCore(pairs.toDF("id1", "id2"), k = 2).collect()
      .map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(Seq(1L, 2L, 3L, 4L, 7L, 8L, 9L).forall(r2))
    assert(!r2(5L) && !r2(6L))
    // idempotence at the fixed point: an extra peel round changes nothing
    val r5 = Similarity.kCore(pairs.toDF("id1", "id2"), k = 3, rounds = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.view.mapValues(_._1).toMap == r5)
  }

  test("registered kcore query reaches its fixed point within the default rounds") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = Similarity.cosineNearDupLsh(emb).select("id1", "id2")
      .localCheckpoint(true)
    def run(rounds: Int) = Similarity.kCore(pairs, k = 3, rounds = rounds)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSet
    assert(run(4) == run(5))
  }

  test("linkPredict: the open wedge of a path scores its endpoints, " +
      "closed edges never appear, hub wedges score below rare ones") {
    // path 1-2-3 (open wedge through 2, deg 2) and a star 10-{11..14}
    // (open wedges through the deg-4 hub 10): the path's non-edge
    // (1,3) must outscore every star non-edge (1/ln2 > 1/ln4); the
    // K3 5-6-7 has no open wedge at all
    val pairs = Seq((1L, 2L), (2L, 3L),
      (10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L),
      (5L, 6L), (6L, 7L), (5L, 7L))
    val r = Similarity.linkPredict(pairs.toDF("id1", "id2"), topK = 50)
      .collect()
    val ids = r.map(x => (x.getAs[Long]("id1"), x.getAs[Long]("id2")))
    // no emitted pair is an existing edge
    assert(ids.toSet.intersect(pairs.toSet).isEmpty)
    // (1,3) exists, leads, and carries cn=1 with aa = round(1/ln2, 9)
    assert(ids.head == ((1L, 3L)))
    assert(r.head.getAs[Long]("cn") == 1L)
    // aa_score is a nano-double (n/1e9): recover the integer units
    assert(math.round(r.head.getAs[Double]("aa_score") * 1e9) ==
      1442695041L)
    // all 6 star non-edges follow with the weaker 1/ln4 weight
    assert(ids.toSet.size == 7)
    // the triangle contributes nothing (every wedge closed)
    assert(!ids.exists(p => Set(5L, 6L, 7L)(p._1)))
  }


  test("assortativityOf: a star graph is exactly -1; a regular ring " +
      "has undefined (null) assortativity") {
    import graft.operators.Similarity
    // star: hub 0 to leaves 1..6
    val star = (1L to 6L).map(i => (0L, i)).toDF("id1", "id2")
    val r = Similarity.assortativityOf(star).collect().head
    assert(r.getAs[Long]("n_nodes") == 7L)
    assert(r.getAs[Long]("n_edges") == 6L)
    assert(r.getAs[Double]("assortativity") == -1.0)
    // ring: every degree is 2 -> zero variance -> null r
    val ring = (0L until 6L).map(i => (i, (i + 1) % 6))
      .toDF("id1", "id2")
    val r2 = Similarity.assortativityOf(ring).collect().head
    assert(r2.isNullAt(r2.fieldIndex("assortativity")))
    assert(r2.getAs[Double]("mean_edge_degree") == 2.0)
  }

  test("volumeHhi: a one-symbol day reads HHI = 1; two equal symbols " +
      "read 0.5") {
    import graft.operators.{Analytics, Trades}
    var eid = 0L
    def ev(u: Long, d: Int, px: Double) = {
      eid += 2 // even ids -> constant size 1.0 + (eid%100)/100
      (eid, u, "t",
        java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), px, "{}")
    }
    // day 1: only SYM_1; day 2: SYM_1 and SYM_2 with identical
    // price and (100-aligned) size -> exactly equal dollar volume
    val ev1 = (100L, 1L, "t",
      java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 10.0, "{}")
    val ev2 = (200L, 1L, "t",
      java.sql.Timestamp.valueOf("2024-01-02 12:00:00"), 10.0, "{}")
    val ev3 = (300L, 2L, "t",
      java.sql.Timestamp.valueOf("2024-01-02 12:00:00"), 10.0, "{}")
    val df = Seq(ev1, ev2, ev3)
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
    val r = Analytics.volumeHhi(Trades.fromEvents(df)).collect()
    val d1 = r.head
    assert(d1.getAs[Long]("n_symbols") == 1L)
    assert(d1.getAs[Double]("hhi") == 1.0)
    assert(d1.getAs[Double]("top_share") == 1.0)
    val d2 = r.last
    assert(d2.getAs[Long]("n_symbols") == 2L)
    assert(d2.getAs[Double]("hhi") == 0.5)
    assert(d2.getAs[Double]("top_share") == 0.5)
  }
}
