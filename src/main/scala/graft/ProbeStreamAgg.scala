package graft

import org.apache.spark.sql.functions._

/** Scratch probe (not a gate): can the per-order rollup STREAM over the
  * bucket sort order instead of hashing 30M groups?
  *
  * Round-8 left the bucketed layout exchange-free but still building a
  * 30M-entry aggregation hash table (PERF.md: 3.8 s at x200 vs DuckDB
  * 1.5–2.4 s). The buckets are written sortBy(l_orderkey), so a
  * SortAggregate over the scan's reported order would hold ONE group's
  * state at a time — the streaming per-shard reduction of the
  * reference's id-partitioned layout (embedding/sharding.py:186-195).
  *
  * Two preconditions, both probed here:
  *  1. the scan only REPORTS its sort order when each bucket is a
  *     single file (multi-file buckets are individually sorted but not
  *     merged at scan time), so the stage pre-repartitions on the key
  *     into exactly `buckets` partitions — the writer-side murmur3
  *     mapping is identical to the bucket spec's, giving one file per
  *     bucket;
  *  2. Spark plans HashAggregate regardless and only rewrites to
  *     SortAggregate under spark.sql.execution.replaceHashWithSortAgg
  *     (off by default), so the A/B toggles that conf.
  *
  * Usage: runMain graft.ProbeStreamAgg [dataDir] [buckets] [reps]
  */
object ProbeStreamAgg {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val buckets = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val lt = "probe_s_lineitem"
    if (!spark.catalog.tableExists(lt)) {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      GateFixtures.deleteRecursively(java.nio.file.Paths.get(wh, lt))
      val t0 = System.nanoTime()
      Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_quantity"))
        .repartition(buckets, col("l_orderkey"))
        .write.mode("overwrite")
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey").saveAsTable(lt)
      println(f"[probe] sorted-bucket stage (one-time write): ${(System.nanoTime()-t0)/1e9}%.1f s")
    }

    def aggOf(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("l_orderkey").as("b_orderkey"))
      .agg(sum(round(col("l_quantity") * 100).cast("long")).as("b_qty_cents"))
      .filter(col("b_qty_cents") > 300L * 100)

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

    time("bucketed_hash_agg")(aggOf(spark.table(lt)))
    // both halves of the streaming plan: the scan only REPORTS its
    // per-bucket sort order under the legacy listing conf, and the
    // planner only swaps the hash pair for a streaming SortAggregate
    // under replaceHashWithSortAgg
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "true")
    println("[probe] stream plan under replaceHashWithSortAgg:")
    aggOf(spark.table(lt)).explain()
    time("bucketed_sort_stream")(aggOf(spark.table(lt)))
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "false")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    spark.stop()
  }
}
