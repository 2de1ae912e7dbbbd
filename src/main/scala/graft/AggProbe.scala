package graft

/** Throwaway dev probe: A/B the 30M-group per-order aggregate shapes
  * (the named q21/q18 blocker — partial aggregation gets ~no map-side
  * reduction when each order's lines are spread across all files).
  *
  * Usage: runMain graft.AggProbe [dataDir] [reps]
  */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/benchdata/x200"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")

    def time(name: String)(f: => Long): Unit = {
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[aggprobe] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      }
    }

    // warm the page cache
    li.select(count(lit(1))).collect()

    // A: plain two-phase groupBy (partial -> exchange -> final)
    time("A_plain_groupby") {
      li.groupBy("l_orderkey").count().select(count(lit(1))).collect().head.getLong(0)
    }
    // B: shuffle raw rows by key first, then aggregate (partial+final both
    // run post-exchange where keys ARE colocated -> real reduction)
    time("B_repartition_then_agg") {
      li.select("l_orderkey").repartition(col("l_orderkey"))
        .groupBy("l_orderkey").count().select(count(lit(1))).collect().head.getLong(0)
    }
    // C: plain but with partial agg pushed wider via more shuffle partitions
    // (restore the session's ACTUAL prior value so the later probes run
    // under the same configuration as A/B, even if this one throws)
    time("C_plain_64part") {
      val s2 = li.sparkSession
      val prior = s2.conf.get("spark.sql.shuffle.partitions")
      s2.conf.set("spark.sql.shuffle.partitions", "64")
      try li.groupBy("l_orderkey").count().select(count(lit(1))).collect().head.getLong(0)
      finally s2.conf.set("spark.sql.shuffle.partitions", prior)
    }
    // D/E: the real q21-shaped agg (5 aggregates incl. conditional min/max)
    def q21Agg(in: org.apache.spark.sql.DataFrame) = {
      val lateS = when(col("r"), col("l_suppkey"))
      in.groupBy(col("l_orderkey").as("g_ok"))
        .agg(min(col("l_suppkey")).as("minS"), max(col("l_suppkey")).as("maxS"),
          min(lateS).as("minRS"), max(lateS).as("maxRS"),
          sum(when(col("r"), 1L).otherwise(0L)).as("nR"))
        .filter(col("minS") =!= col("maxS") &&
          col("minRS").isNotNull && col("minRS") === col("maxRS"))
    }
    val liQ = li.select(col("l_orderkey"), col("l_suppkey"),
      (col("l_returnflag") === "R").as("r"))
    time("D_q21_shaped_plain") {
      q21Agg(liQ).select(count(lit(1))).collect().head.getLong(0)
    }
    time("E_q21_shaped_repart") {
      q21Agg(liQ.repartition(col("l_orderkey")))
        .select(count(lit(1))).collect().head.getLong(0)
    }
    // F/G: q15 shape — per-supplier revenue (2M groups over 120M rows,
    // ~60 rows/group but spread: local reduction per map task is only ~2x)
    val liS = li.select(col("l_suppkey"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    time("F_q15_shaped_plain") {
      liS.groupBy("l_suppkey").agg(sum("rev")).select(count(lit(1))).collect().head.getLong(0)
    }
    time("G_q15_shaped_repart") {
      liS.repartition(col("l_suppkey"))
        .groupBy("l_suppkey").agg(sum("rev")).select(count(lit(1))).collect().head.getLong(0)
    }
    // H/I: q13 shape — per-customer order count (30M orders, ~3M customers)
    val ord = spark.read.parquet(s"$dir/orders.parquet").select("o_custkey")
    time("H_q13_shaped_plain") {
      ord.groupBy("o_custkey").count().select(count(lit(1))).collect().head.getLong(0)
    }
    time("I_q13_shaped_repart") {
      ord.repartition(col("o_custkey"))
        .groupBy("o_custkey").count().select(count(lit(1))).collect().head.getLong(0)
    }
    spark.stop()
  }
}
