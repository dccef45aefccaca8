package graft

import org.apache.spark.sql.graft.GraftExtensions

/** SQL registration of the custom Catalyst expressions. */
class SqlFunctionsSpec extends SparkSpec {

  test("vec_dot / arg_min_tb / arg_max_tb are callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1D, 2D, 3D), array(4D, 5D, 6D)) AS d""")
      .collect().head
    assert(r.getAs[Double]("d") == 32.0)

    spark.sql(
      """SELECT * FROM VALUES ('a', 1, 10.0D), ('a', 1, 5.0D), ('a', 2, 7.0D)
        |AS t(k, ord, v)""".stripMargin).createOrReplaceTempView("tb")
    val agg = spark.sql(
      """SELECT k, arg_min_tb(v, ord) AS first_v, arg_max_tb(v, ord) AS last_v
        |FROM tb GROUP BY k""".stripMargin).collect().head
    // tie on ord=1: argmin takes the SMALLER value (struct-min semantics)
    assert(agg.getAs[Double]("first_v") == 5.0)
    assert(agg.getAs[Double]("last_v") == 7.0)

    // vec_l2sq from SQL
    val l2 = spark.sql(
      "SELECT vec_l2sq(array(1D, 2D), array(4D, 6D)) AS d").collect().head
    assert(l2.getAs[Double]("d") == 25.0)

    // simhash60 from SQL equals the operator path
    val sh = spark.sql("SELECT simhash60('the cat sat') AS s").collect().head
    import spark.implicits._
    val ref = graft.operators.Dedup.simhash(
      Seq((0L, "the cat sat")).toDF("doc_id", "text")).collect().head
    assert(sh.getAs[Long]("s") == ref.getAs[Long]("simhash"))
  }

  test("wrong arity raises AnalysisException, not an index error") {
    GraftExtensions.register(spark)
    for (q <- Seq("SELECT simhash60()", "SELECT simhash60('a', 'b')",
                  "SELECT vec_dot(array(1D))")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(q).collect()
      }
      assert(e.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        s"$q -> ${e.getCondition}")
    }
  }

  test("StructExtremumRewrite: min/max(struct) plans as HashAggregate with identical results") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      ("A", ts("2024-01-01 10:00:05"), 10.0),
      ("A", ts("2024-01-01 10:00:20"), 30.0),
      ("A", ts("2024-01-01 10:00:20"), 25.0), // tie on ts: max picks larger price
      ("B", ts("2024-01-01 10:00:01"), 7.0))
      .toDF("sym", "t", "price")
    df.createOrReplaceTempView("rw_trades")
    val q = spark.sql(
      """SELECT sym, min(struct(t, price)).price AS open,
        |       max(struct(t, price)).price AS close
        |FROM rw_trades GROUP BY sym ORDER BY sym""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
    val rows = q.collect()
    assert(rows(0).getAs[Double]("open") == 10.0)
    assert(rows(0).getAs[Double]("close") == 30.0)
    assert(rows(1).getAs[Double]("open") == 7.0)
    assert(rows(1).getAs[Double]("close") == 7.0)
  }

  test("GraftSession builder wires extensions and confs") {
    // session already exists in tests; just validate the builder shape
    val b = GraftSession.builder(master = "local[1]", shufflePartitions = 2)
    assert(b != null)
  }
}
