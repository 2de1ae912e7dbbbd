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
      // exact integer cents on both sides: the two plans aggregate in
      // different orders, so a raw double sum would only compare equal
      // while the fixture values stay integral
      val cents = sum(round(col("l_quantity") * 100).cast("long")).as("s")
      val agg = spark.table("tb_lineitem").groupBy("l_orderkey").agg(cents)
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed aggregate should not shuffle:\n$plan")
      val got = agg.orderBy("l_orderkey").collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = li.groupBy("l_orderkey").agg(cents)
        .orderBy("l_orderkey").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq === want.toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS tb_lineitem")
  }

  test("toBucketedTable(sorted): per-key aggregate STREAMS — SortAggregate, no Exchange, no Sort") {
    import graft.sources.TabularWriter
    spark.sql("DROP TABLE IF EXISTS ts_lineitem")
    try {
      val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
      TabularWriter.toBucketedTable(li, "ts_lineitem", "l_orderkey", buckets = 4, sorted = true)
      // one file per bucket — the precondition for the scan to report
      // (and Spark to trust) the per-bucket sort order
      val loc = spark.sql("DESCRIBE TABLE EXTENDED ts_lineitem").collect()
        .find(_.getString(0) == "Location").get.getString(1).stripPrefix("file:")
      val files = new java.io.File(loc).listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 4, s"expected one file per bucket, got ${files.map(_.getName).toSeq}")
      val cents = sum(round(col("l_quantity") * 100).cast("long")).as("s")
      val agg = spark.table("ts_lineitem").groupBy("l_orderkey").agg(cents)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("SortAggregate"), s"expected streaming SortAggregate:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed aggregate should not shuffle:\n$plan")
      assert(!plan.contains("+- Sort "), s"scan order should carry the aggregate, no sort:\n$plan")
      val got = agg.orderBy("l_orderkey").collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = li.groupBy("l_orderkey").agg(cents)
        .orderBy("l_orderkey").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq === want.toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS ts_lineitem")
  }
}
