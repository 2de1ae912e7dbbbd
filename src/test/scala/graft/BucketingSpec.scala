package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffled table layout so co-located joins and
  * aggregations plan with NO exchange — the engine-level answer to
  * "minimize shuffles" for repeated joins on the same key (SURVEY §2.5:
  * a bucketed layout is the persistent form of partition_by_modulo). */
class BucketingSpec extends GraftSpec {

  test("bucketed-bucketed join plans without a shuffle exchange") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    o.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    c.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the shuffle (or its absence) shows
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it returns the same rows as the unbucketed join
      val expected = o.join(c, o("o_custkey") === c("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
