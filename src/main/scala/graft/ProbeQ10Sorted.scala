package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, TimestampType}

/** Round-10 probe: q10's residual (PERF.md r9: 3.9× on the co-located
  * layout). q10's orderdate filter keeps ~3.5% of orders (3 months of
  * 7 years) — the flat scan decodes ALL orders to find them. Stage a
  * DATE-sorted orders projection (toRangeSorted on o_orderdate — the
  * adviseSorted shape): files cover disjoint date ranges, the filter
  * prunes ~96% of the orders scan, and the collapsed orders side feeds
  * the join. Also times the shipped q10 in the same session for an
  * honest pair.
  *
  * Usage: runMain graft.ProbeQ10Sorted [dataDir] [reps]
  */
object ProbeQ10Sorted {

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"/root/repo/benchdata/sorted_orders$tag"

    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      val t0 = System.nanoTime()
      graft.sources.TabularWriter.toRangeSorted(
        Tables.orders(spark, d).select(
          col("o_orderdate"), col("o_orderkey"), col("o_custkey")),
        path, Seq("o_orderdate"), numFiles = 32)
      println(f"[q10] staged $path (one-time write, ${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    val so = spark.read.parquet(path)
    val ts = (x: String) => lit(x).cast(TimestampType)
    val cents = (n: String) => round(col(n) * 100).cast("long")
    val revenueSum = (sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
      .cast(DoubleType) / 10000.0)

    def q10sorted: DataFrame =
      Tables.lineitem(spark, d).filter(col("l_returnflag") === "R")
        .join(so
          .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1996-04-01"))
          .hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(revenueSum.as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)

    // values must equal the shipped q10 exactly
    val a = q10sorted.collect().map(_.toString).sorted.toSeq
    val b = SparkEntry.queries("q10_returned_items")(spark, d)
      .collect().map(_.toString).sorted.toSeq
    require(a == b, s"[q10] sorted-layout MISMATCH (${a.size} vs ${b.size} rows)")
    println("[q10] values identical to shipped")

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val frame = df
      frame.select(sum(xxhash64(frame.columns.map(col): _*).cast("double")).as("h"))
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      GraftSession.clearSessionState(spark)
      dt
    }
    time(q10sorted); time(SparkEntry.queries("q10_returned_items")(spark, d)) // warm
    val sortedT = (1 to reps).map(_ => time(q10sorted))
    val shippedT = (1 to reps).map(_ =>
      time(SparkEntry.queries("q10_returned_items")(spark, d)))
    println(f"[q10] sorted-orders: ${sortedT.map(t => f"$t%.2f").mkString(" ")} (min ${sortedT.min}%.2f)")
    println(f"[q10] shipped-flat:  ${shippedT.map(t => f"$t%.2f").mkString(" ")} (min ${shippedT.min}%.2f)")
    println(s"""{"metric":"q10_sorted","queries":{"q10_sorted":${sortedT.min},"q10_flat":${shippedT.min}},"sf":${JsonOut.q(d)}}""")
    spark.stop()
  }
}
