package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, TimestampType}

/** Scratch probe (not a gate): q9/q12 residual grind at x200 (verdict
  * item 7) — A/B the candidate restructures against the shipped plans
  * and record the verdicts in PERF.md.
  *
  * Usage: runMain graft.ProbeRel [dataDir] [reps]
  */
object ProbeRel {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val ts = (x: String) => lit(x).cast(TimestampType)
    def cents(c: String) = round(col(c) * 100).cast("long")

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

    // ---- q12 ----------------------------------------------------------
    time("q12_shipped")(SparkEntry.queries("q12_priority_class")(spark, d))
    // variant: bloom-prune the ORDERS side by the filtered lines' order
    // keys before the exchange (selectivity expectation is poor — most
    // orders have a line in any 1-year shipdate window — measure anyway)
    time("q12_orders_bloom") {
      val high = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
      val li = Tables.lineitem(spark, d)
        .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
      val o = graft.operators.BloomReduce.semiReduce(
        Tables.orders(spark, d).select(col("o_orderkey"), col("o_orderpriority")),
        col("o_orderkey"), li.select(col("l_orderkey")), col("l_orderkey"))
      li.join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }

    // ---- q9 -----------------------------------------------------------
    time("q9_shipped")(SparkEntry.queries("q9_nation_margin")(spark, d))
    // variant: bloom-prune ORDERS by the ECONOMY lines' order keys
    time("q9_orders_bloom") {
      val p = Tables.part(spark, d).filter(col("p_type") === "ECONOMY")
      val amountE4 = cents("l_extendedprice") * (lit(100L) - cents("l_discount")) -
        cents("p_retailprice") * cents("l_quantity")
      val lp = Tables.lineitem(spark, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(spark, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(spark, d)), col("s_nationkey") === col("n_nationkey"))
      val o = graft.operators.BloomReduce.semiReduce(
        Tables.orders(spark, d).select(col("o_orderkey"), col("o_orderdate")),
        col("o_orderkey"), lp.select(col("l_orderkey")), col("l_orderkey"))
      lp.join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(amountE4).cast(DoubleType) / 10000.0).as("sum_profit"))
        .orderBy(col("n_name"), col("o_year").desc)
    }
    // variant: pre-reduce the economy lines per (orderkey, nation)
    // BEFORE the orders join — shrinks the probe side if lines/order > 1
    time("q9_preagg") {
      val p = Tables.part(spark, d).filter(col("p_type") === "ECONOMY")
      val amountE4 = cents("l_extendedprice") * (lit(100L) - cents("l_discount")) -
        cents("p_retailprice") * cents("l_quantity")
      val per = Tables.lineitem(spark, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(spark, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(spark, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("l_orderkey"), col("n_name"))
        .agg(sum(amountE4).as("amt"))
      per.join(Tables.orders(spark, d).select(col("o_orderkey"), col("o_orderdate"))
          .hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(col("amt")).cast(DoubleType) / 10000.0).as("sum_profit"))
        .orderBy(col("n_name"), col("o_year").desc)
    }
    spark.stop()
  }
}
