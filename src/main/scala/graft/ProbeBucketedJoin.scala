package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, TimestampType}

/** Scratch probe (not a gate): the co-located-layout answer to the
  * exchange-bound relational class (q9/q12 — ProbeRel showed blooms
  * and pre-aggregation lose; the blocker is the orderkey exchange of
  * BOTH join sides). Stage lineitem AND orders bucketed on the order
  * key at write time, run the same queries over the bucketed tables:
  * the fact join plans with no Exchange (dims broadcast onto the
  * bucketed scan preserve its distribution). PERF.md round-8.
  *
  * Usage: runMain graft.ProbeBucketedJoin [dataDir] [buckets] [reps]
  */
object ProbeBucketedJoin {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val buckets = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val ts = (x: String) => lit(x).cast(TimestampType)
    def cents(c: String) = round(col(c) * 100).cast("long")

    // round-9: staged through the product writer — one SORTED file per
    // bucket, so the scan REPORTS its order (GraftSession's confs):
    // bucketed joins plan without query-time sorts and per-key
    // aggregates stream (SortAggregate) instead of hashing 30M groups
    val (blT, boT) = ("probe_bj_lineitem3", "probe_bj_orders3")
    if (!spark.catalog.tableExists(blT)) {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      Seq(blT, boT).foreach(t =>
        GateFixtures.deleteRecursively(java.nio.file.Paths.get(wh, t)))
      val t0 = System.nanoTime()
      graft.sources.TabularWriter.toBucketedTable(
        Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_linestatus"),
          col("l_shipdate"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"), col("l_quantity"),
          col("l_returnflag")),
        blT, "l_orderkey", buckets)
      graft.sources.TabularWriter.toBucketedTable(
        Tables.orders(spark, d).select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus")),
        boT, "o_orderkey", buckets)
      println(f"[probe] bucketed stage (one-time write): ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    val bl = spark.table(blT)
    val bo = spark.table(boT)

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

    val high = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
    def q12(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
      l.filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))

    def q9(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) = {
      val p = Tables.part(spark, d).filter(col("p_type") === "ECONOMY")
      val amountE4 = cents("l_extendedprice") * (lit(100L) - cents("l_discount")) -
        cents("p_retailprice") * cents("l_quantity")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(spark, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(spark, d)), col("s_nationkey") === col("n_nationkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(amountE4).cast(DoubleType) / 10000.0).as("sum_profit"))
        .orderBy(col("n_name"), col("o_year").desc)
    }

    // q21 over the co-located layout: the per-order aggregate AND the
    // orders join both inherit the bucket distribution - zero fact
    // exchanges end to end
    def q21(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) = {
      val li = l.select(col("l_orderkey"), col("l_suppkey"),
        (col("l_returnflag") === "R").as("r"))
      val lateS = when(col("r"), col("l_suppkey"))
      val per = li.groupBy(col("l_orderkey").as("g_ok"))
        .agg(min(col("l_suppkey")).as("minS"), max(col("l_suppkey")).as("maxS"),
          min(lateS).as("minRS"), max(lateS).as("maxRS"),
          sum(when(col("r"), 1L).otherwise(0L)).as("nR"))
        .filter(col("minS") =!= col("maxS") &&
          col("minRS").isNotNull && col("minRS") === col("maxRS"))
      val n = Tables.nation(spark, d).filter(col("n_name") === "NATION_3")
      val suppN = Tables.supplier(spark, d)
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("sn_suppkey"), col("s_name"))
      val oF = o.filter(col("o_orderstatus") === "F")
      per.join(broadcast(suppN), col("minRS") === col("sn_suppkey"))
        .join(oF, col("g_ok") === col("o_orderkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("nR")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }
    def q18(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) = {
      val big = l.groupBy(col("l_orderkey").as("b_orderkey"))
        .agg(sum(cents("l_quantity")).as("b_qty_cents"))
        .filter(col("b_qty_cents") > 300L * 100)
      big.join(o, col("b_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          (col("b_qty_cents").cast("double") / 100.0).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }
    def q5(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) = {
      val r = Tables.region(spark, d).filter(col("r_name") === "ASIA")
      val asiaNations = Tables.nation(spark, d)
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      val custAsia = Tables.customer(spark, d)
        .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val ordersAsia = o.join(broadcast(custAsia), col("o_custkey") === col("c_custkey"))
      l.join(ordersAsia, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(spark, d)),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg((sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .cast("double") / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc)
    }
    def q3(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) = {
      val c = Tables.customer(spark, d).filter(col("c_mktsegment") === "BUILDING")
      val bldgOrders = o.join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_semi")
      val revPerOrder = l.groupBy(col("l_orderkey"))
        .agg((sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .cast("double") / 10000.0).as("revenue"))
      revPerOrder.join(bldgOrders, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }
    def q10(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
      l.filter(col("l_returnflag") === "R")
        .join(o.filter(col("o_orderdate") >= ts("1996-01-01")
          && col("o_orderdate") < ts("1996-04-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg((sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .cast("double") / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    // q8 over the co-located layout (round-9): the shipped q8's ONE
    // remaining shuffle is promo-lines ⋈ ASIA-orders on the order key;
    // with both facts bucketed the dims still broadcast-decorate and
    // the fact join inherits the bucket distribution — zero exchanges
    def q8(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) = {
      val rKeys = Tables.nation(spark, d)
        .join(broadcast(Tables.region(spark, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"), "left_semi")
        .select(col("n_nationkey"))
      val asiaCust = Tables.customer(spark, d)
        .join(broadcast(rKeys), col("c_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("c_custkey"))
      val asiaOrders = o
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01"))
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderdate"))
      val p = Tables.part(spark, d).filter(col("p_type") === "PROMO")
      val suppN = Tables.supplier(spark, d)
        .join(broadcast(Tables.nation(spark, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), (col("n_name") === "NATION_8").as("is_n8"))
      val revE4 = cents("l_extendedprice") * (lit(100L) - cents("l_discount"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        .join(asiaOrders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(((sum(when(col("is_n8"), revE4).otherwise(lit(0L)))
            .cast(DoubleType) / 10000.0)
          / (sum(revE4).cast(DoubleType) / 10000.0)).as("mkt_share"))
        .orderBy(col("o_year"))
    }

    val only = if (args.length > 3) args(3).split(",").toSet else Set.empty[String]
    def want(n: String) = only.isEmpty || only.exists(n.startsWith)
    if (want("q12")) time("q12_bucketed_join")(q12(bl, bo))
    if (want("q9")) time("q9_bucketed_join")(q9(bl, bo))
    if (want("q21")) {
      time("q21_bucketed")(q21(bl, bo))
      time("q21_shipped")(SparkEntry.queries("q21_waiting_supplier")(spark, d))
    }
    if (want("q18")) {
      time("q18_bucketed")(q18(bl, bo))
      time("q18_shipped")(SparkEntry.queries("q18_large_volume")(spark, d))
    }
    if (want("q5")) {
      time("q5_bucketed")(q5(bl, bo))
      time("q5_shipped")(SparkEntry.queries("q5_local_supplier")(spark, d))
    }
    if (want("q3")) {
      time("q3_bucketed")(q3(bl, bo))
      time("q3_shipped")(SparkEntry.queries("q3_shipping_priority")(spark, d))
    }
    if (want("q10")) {
      time("q10_bucketed")(q10(bl, bo))
      time("q10_shipped")(SparkEntry.queries("q10_returned_items")(spark, d))
    }
    if (want("q8")) {
      time("q8_bucketed")(q8(bl, bo))
      time("q8_shipped")(SparkEntry.queries("q8_market_share")(spark, d))
      println("[probe] q8 bucketed plan (expect no Exchange below the fact join):")
      q8(bl, bo).explain()
    }
    if (want("q12")) {
      println("[probe] q12 bucketed plan (expect no Exchange):")
      q12(bl, bo).explain()
    }
    spark.stop()
  }
}
