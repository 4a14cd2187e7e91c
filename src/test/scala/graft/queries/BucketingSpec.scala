package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (builder brief: "bucketing for
  * co-located joins"): two tables bucketed on the join key with the same
  * bucket count join with ZERO exchanges — at 100 TB this removes the
  * dominant cost of repeated fact⋈fact joins on a shared key.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without any shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    graft.Tables.orders(spark, dir).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    graft.Tables.customer(spark, dir).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("Bucketed: true"), p)
      // co-located buckets: the join keys are NEVER exchanged (the only
      // exchange in the plan is the final aggregation's, on c_mktsegment)
      assert(!p.contains("Exchange hashpartitioning(o_custkey"), p)
      assert(!p.contains("Exchange hashpartitioning(c_custkey"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
