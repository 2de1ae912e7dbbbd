package graft

import org.apache.spark.sql.functions._

/** Scratch probe (not a gate): A/B the three per-order aggregate
  * strategies at x200 — plain two-phase, shuffle-first
  * (Aggregates.byShuffledKey), and the write-time bucketed layout —
  * to put a number on the layout answer to the q18/q21 exchange
  * aggregate (PERF.md round-8). Staging of the bucketed table is
  * untimed: the layout is a durable property of the table, paid once
  * at write time, exactly like the reference's id-partitioned
  * embedding shards (embedding/sharding.py:168-205).
  *
  * Usage: runMain graft.ProbeBucketedAgg [dataDir] [buckets] [reps]
  */
object ProbeBucketedAgg {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val buckets = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val lt = "probe_b_lineitem"
    if (!spark.catalog.tableExists(lt)) {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      GateFixtures.deleteRecursively(java.nio.file.Paths.get(wh, lt))
      val t0 = System.nanoTime()
      Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite").bucketBy(buckets, "l_orderkey").saveAsTable(lt)
      println(f"[probe] bucketed stage (one-time write): ${(System.nanoTime()-t0)/1e9}%.1f s")
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

    val narrow = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_quantity"))
    time("plain_two_phase")(aggOf(narrow))
    time("shuffle_first")(
      graft.operators.Aggregates
        .byShuffledKey(narrow, col("l_orderkey"), col("l_orderkey").as("b_orderkey"))
        .agg(sum(round(col("l_quantity") * 100).cast("long")).as("b_qty_cents"))
        .filter(col("b_qty_cents") > 300L * 100))
    time("bucketed_layout")(aggOf(spark.table(lt)))
    println("[probe] bucketed plan:")
    aggOf(spark.table(lt)).explain()
    spark.stop()
  }
}
