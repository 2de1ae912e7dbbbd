package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, TimestampType}

/** Scratch probe (not a gate): EagerAggregation's reach over the
  * relational suite.
  *
  * 1. q12: the rule fires on its shipped shape but the pre-aggregate
  *    groups orders by o_orderkey — a UNIQUE key, so the pre-agg
  *    reduces nothing and is pure cost (the no-stats blind spot: the
  *    rule cannot see key uniqueness on a raw parquet read). Measure
  *    exactly what the useless fire costs.
  * 2. q10: the rule does NOT fire on its shipped shape (lineitem is
  *    declared LEFT; the grouping keys live on the customer side). An
  *    equivalent declaration with the dims LEFT and lineitem RIGHT
  *    exposes the rewrite — pre-aggregating R-returns by l_orderkey
  *    below the join (line-grained → order-grained exchange). Measure
  *    whether the exposed rewrite beats the shipped plan. q3 needs no
  *    flip: its shipped plan already hand-pre-aggregates per order
  *    (bloom semi-reduce + byShuffledKey — SparkEntry q3 scaladoc).
  *
  * Usage: runMain graft.ProbeEagerRel [dataDir] [reps]
  */
object ProbeEagerRel {
  private val FLAG = "spark.graft.eagerAggregation.enabled"

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def ts(s: String) = lit(s).cast(TimestampType)
    // Relational's exact integer-cents revenue discipline
    def cents(c: String) = round(col(c) * 100).cast("long")
    val revenueSum = sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
      .cast(DoubleType) / 10000.0

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Double = {
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
      tms.min
    }

    def checksum(df: org.apache.spark.sql.DataFrame): String = {
      val h = df.select(sum(xxhash64(df.columns.toIndexedSeq.map(col): _*)
        .cast("double")).as("h")).collect()(0)
      s"$h/${df.count()}"
    }

    def ab(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      spark.conf.set(FLAG, "false")
      val off = time(s"${name}_ruleoff")(df)
      val offSum = checksum(df)
      spark.conf.set(FLAG, "true")
      val on = time(s"${name}_ruleon")(df)
      val onSum = checksum(df)
      require(onSum == offSum, s"$name rewrite changed results: $onSum vs $offSum")
      println(f"[probe] $name: off ${off}%.2f -> on ${on}%.2f (${off / on}%.2fx), checksum ok")
    }

    // the useless fire: pre-agg on a unique key
    ab("q12_shipped")(Relational.queries("q12_priority_class")(spark, d))

    // q10 flipped: (orders ⋈ customer ⋈ nation) LEFT, lineitem RIGHT
    def q10flipped = {
      val o = Tables.orders(spark, d)
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1996-04-01"))
      val oc = o.join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
      val l = Tables.lineitem(spark, d).filter(col("l_returnflag") === "R")
      oc.join(l.hint("shuffle_hash"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(revenueSum.as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }
    spark.conf.set(FLAG, "false")
    val q10shipped = time("q10_shipped_ruleoff")(
      Relational.queries("q10_returned_items")(spark, d))
    val shippedSum = checksum(Relational.queries("q10_returned_items")(spark, d))
    ab("q10_flipped")(q10flipped)
    spark.conf.set(FLAG, "true")
    val flippedSum = checksum(q10flipped)
    println(s"[probe] q10 shipped-vs-flipped checksums: $shippedSum vs $flippedSum " +
      s"(integer-cents revenue => must be identical)")
    println(f"[probe] reference point: q10_shipped ${q10shipped}%.2f")
  }
}
