package graft

import org.apache.spark.sql.functions._

/** Scratch probe (not a gate): the q13/q22 "tiny-output broadcast-chain"
  * class (PERF.md round-10 sweep: q13 13.7×, q22 27.8× vs DuckDB — the
  * two worst ratios left standing). Hypothesis: both queries aggregate
  * AFTER moving the wide side through a join, where DuckDB's optimizer
  * pre-reduces; Catalyst does not push aggregates below joins, so the
  * declared plan must do it:
  *
  *  - q13: customer LEFT OUTER orders (condition touches only the
  *    orders side) → per-customer count. Pre-aggregating orders by
  *    o_custkey BEFORE the join is exactly equal (count(o_orderkey)
  *    counts matched rows; absent custkey ≡ NULL-extended ≡ 0) and
  *    moves 30M→3M rows through the exchange with map-side partials.
  *  - q22: NOT EXISTS orders — the anti join probes 30M order rows
  *    where 3M DISTINCT custkeys carry the same semantics; partial
  *    distinct reduces the exchange the same way.
  *
  * Usage: runMain graft.ProbeQ13Agg [dataDir] [reps]
  */
object ProbeQ13Agg {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      GraftSession.clearSessionState(spark)
      val tms = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        GraftSession.clearSessionState(spark)
        dt
      }
      println(f"[probe] $name: ${tms.map(t => f"$t%.2f").mkString(" ")} (min ${tms.min}%.2f)")
    }

    def checksum(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val h = df.select(sum(xxhash64(df.columns.toIndexedSeq.map(col): _*)
        .cast("double")).as("h")).collect()(0)
      println(s"[probe] checksum $name: $h rows=${df.count()}")
    }

    // ---- q13 ----------------------------------------------------------
    val shippedQ13 = Relational.queries("q13_customer_distribution")(spark, d)
    time("q13_shipped")(shippedQ13)
    def q13PreAgg = {
      val c = Tables.customer(spark, d)
      val o = Tables.orders(spark, d)
      val perCust = o.filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      c.join(perCust, c("c_custkey") === perCust("o_custkey"), "left_outer")
        .select(coalesce(col("n"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }
    time("q13_preagg")(q13PreAgg)
    checksum("q13_shipped", shippedQ13)
    checksum("q13_preagg", q13PreAgg)

    // ---- q22 ----------------------------------------------------------
    val shippedQ22 = Relational.queries("q22_global_sales")(spark, d)
    time("q22_shipped")(shippedQ22)
    checksum("q22_shipped", shippedQ22)
  }
}
