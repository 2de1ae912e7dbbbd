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

  test("toBucketedTable: per-key aggregate plans exchange-free and matches groupBy") {
    import graft.sources.TabularWriter
    spark.sql("DROP TABLE IF EXISTS tb_lineitem")
    try {
      val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
      TabularWriter.toBucketedTable(li, "tb_lineitem", "l_orderkey", buckets = 4)
      val agg = spark.table("tb_lineitem").groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed aggregate should not shuffle:\n$plan")
      val got = agg.orderBy("l_orderkey").collect().map(r => (r.getLong(0), r.getDouble(1)))
      val want = li.groupBy("l_orderkey").agg(sum(col("l_quantity")).as("s"))
        .orderBy("l_orderkey").collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.toSeq === want.toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS tb_lineitem")
  }
}
