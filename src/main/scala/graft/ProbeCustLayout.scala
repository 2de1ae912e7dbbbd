package graft

import org.apache.spark.sql.functions._

/** Scratch probe (not a gate): does the sorted co-located layout
  * generalize beyond the order key? q13 is the CUSTOMER-key shape —
  * customer LEFT OUTER orders on c_custkey with a join-condition
  * filter, per-customer count, then the count distribution. Both
  * tables staged through TabularWriter.toBucketedTable on the
  * customer key (the LayoutAdvisor would emit exactly this pair from
  * a q13 corpus: both keys join-connected, counts aligned), so the
  * outer join and the per-customer count inherit the bucket
  * distribution — the only exchange left is the tiny count-of-counts.
  *
  * Usage: runMain graft.ProbeCustLayout [dataDir] [buckets] [reps]
  */
object ProbeCustLayout {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val buckets = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val (bcT, boT) = ("probe_ck_customer", "probe_ck_orders")
    if (!spark.catalog.tableExists(bcT)) {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      Seq(bcT, boT).foreach(t =>
        GateFixtures.deleteRecursively(java.nio.file.Paths.get(wh, t)))
      val t0 = System.nanoTime()
      graft.sources.TabularWriter.toBucketedTable(
        Tables.customer(spark, d).select(col("c_custkey")),
        bcT, "c_custkey", buckets)
      graft.sources.TabularWriter.toBucketedTable(
        Tables.orders(spark, d).select(col("o_custkey"), col("o_orderkey"),
          col("o_orderpriority")),
        boT, "o_custkey", buckets)
      println(f"[probe] custkey-bucketed stage (one-time write): ${(System.nanoTime()-t0)/1e9}%.1f s")
    }

    def q13(c: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
      c.join(o, c("c_custkey") === o("o_custkey") &&
          o("o_orderpriority") =!= "1-URGENT", "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      GraftSession.clearSessionState(spark)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        GraftSession.clearSessionState(spark)
        dt
      }
      println(f"[probe] $name: ${ts.map(t => f"$t%.2f").mkString(" ")} (min ${ts.min}%.2f)")
    }

    time("q13_bucketed")(q13(spark.table(bcT), spark.table(boT)))
    time("q13_shipped")(SparkEntry.queries("q13_customer_distribution")(spark, d))
    println("[probe] q13 bucketed plan (expect no exchange below the outer join):")
    q13(spark.table(bcT), spark.table(boT)).explain()
    spark.stop()
  }
}
