package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, TimestampType}

/** Round-10 probe for the decode-constant class (q1/q6/q14/q15 — PERF.md:
  * 3.3–4.5× vs DuckDB at x200, conf levers exhausted). The remaining
  * lever is the DATA: these queries decode double money columns and pay
  * round(x*100) per row per column. This stages a DERIVED-COLUMN
  * projection of lineitem — integer cents STORED at write time (the
  * q1_cents trick moved into the layout) — range-clustered on
  * l_shipdate so q6/q14/q15's date predicates prune whole files, and
  * re-times the four queries over it with identical arithmetic.
  *
  * Usage: runMain graft.ProbeCentsLayout [dataDir] [reps] [names]
  * Prints BenchBig-shaped JSON (names suffixed _stored).
  */
object ProbeCentsLayout {

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args(2).split(",").toSeq
                else Seq("q1", "q6", "q14", "q15")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"/root/repo/benchdata/cents_li$tag"

    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      val cents = (c: String) => round(col(c) * 100).cast("long")
      val t0 = System.nanoTime()
      graft.sources.TabularWriter.toRangeSorted(
        Tables.lineitem(spark, d).select(
          col("l_shipdate"), col("l_partkey"), col("l_suppkey"),
          col("l_returnflag"), col("l_linestatus"),
          cents("l_quantity").as("l_quantity_cents"),
          cents("l_extendedprice").as("l_extendedprice_cents"),
          cents("l_discount").as("l_discount_cents")),
        path, Seq("l_shipdate"), numFiles = 64)
      println(f"[cents] staged $path (one-time write, ${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    val li = spark.read.parquet(path)
    val ts = (x: String) => lit(x).cast(TimestampType)
    val revE4 = col("l_extendedprice_cents") * (lit(100L) - col("l_discount_cents"))

    // identical arithmetic to the shipped queries, minus the per-row
    // round(x*100): the cents are already longs in the files
    def q1: DataFrame = li
      .filter(col("l_shipdate") <= ts("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(col("l_quantity_cents")).cast(DoubleType) / 100.0).as("sum_qty"),
        (sum(col("l_extendedprice_cents")).cast(DoubleType) / 100.0).as("sum_base_price"),
        (sum(revE4).cast(DoubleType) / 10000.0).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

    def q6: DataFrame = li
      .filter(col("l_discount_cents").between(2L, 4L) && col("l_quantity_cents") < 2000L)
      .agg((sum(col("l_extendedprice_cents") * col("l_discount_cents"))
        .cast(DoubleType) / 10000.0).as("revenue"))

    def q14: DataFrame = {
      val p = Tables.part(spark, d)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(((sum(when(col("p_type") === "PROMO", revE4).otherwise(lit(0L)))
          .cast(DoubleType) / 10000.0) * 100.0
          / (sum(revE4).cast(DoubleType) / 10000.0)).as("promo_share"))
    }

    def q15: DataFrame = {
      val rev = li
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg((sum(revE4).cast(DoubleType) / 10000.0).as("total_revenue"))
      val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
        .join(Tables.supplier(spark, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }

    val qs: Map[String, () => DataFrame] =
      Map("q1" -> (() => q1), "q6" -> (() => q6), "q14" -> (() => q14), "q15" -> (() => q15))
    val shipped = Map(
      "q1" -> "q1_pricing_summary_cents", "q6" -> "q6_forecast_revenue",
      "q14" -> "q14_promo_share", "q15" -> "q15_top_supplier")

    // sanity: stored-cents results equal the shipped queries' results
    names.foreach { n =>
      val a = qs(n)().collect().map(_.toString).sorted.toSeq
      val b = SparkEntry.queries(shipped(n))(spark, d).collect().map(_.toString).sorted.toSeq
      require(a == b, s"[cents] $n MISMATCH vs shipped (${a.size} vs ${b.size} rows)")
      println(s"[cents] $n values identical to shipped")
    }

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val frame = df
      frame.select(sum(xxhash64(frame.columns.map(col): _*).cast("double")).as("h"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def clean(df: => DataFrame): Double = {
      val dt = time(df); GraftSession.clearSessionState(spark); dt
    }
    names.foreach(n => clean(qs(n)())) // warm-up
    val all = names.map(n => n -> (1 to reps).map(_ => clean(qs(n)())))
    all.foreach { case (n, v) =>
      println(f"[cents] ${n}_stored: ${v.map(t => f"$t%.2f").mkString(" ")} (min ${v.min}%.2f)")
    }
    val j = all.map { case (n, v) => JsonOut.q(n + "_stored") + ":" + v.min }
      .mkString("{", ",", "}")
    println(s"""{"metric":"cents_layout","queries":$j,"sf":${JsonOut.q(d)}}""")
    spark.stop()
  }
}
