package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both fact tables bucketed on the join
  * key join WITHOUT any shuffle exchange — the cluster-scale answer for
  * repeated orders⋈lineitem-shape joins (SCALING.md).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    val dir = "/root/testdata/sf0.001"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, dir).write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
      Tables.lineitem(spark, dir).write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")

      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      val n = joined.count()
      assert(n == Tables.lineitem(spark, dir).count()) // FK join: 1 order per line
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected co-located join, got:\n$plan")

      // the same join over plain parquet DOES shuffle both sides
      val plain = Tables.orders(spark, dir)
        .join(Tables.lineitem(spark, dir),
          col("o_orderkey") === col("l_orderkey"))
      plain.count()
      assert(plain.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
