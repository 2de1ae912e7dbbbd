package graft

import org.apache.spark.sql.functions._

/** Scratch probe (not a gate): the q13/q22 "tiny-output broadcast-chain"
  * class (PERF.md round-10 sweep: q13 13.7×, q22 27.8× vs DuckDB — the
  * two worst ratios left standing). Both queries move the 30M-row orders
  * side through a join exchange only to collapse it right after —
  * [[graft.plans.EagerAggregation]] now rewrites both shapes (partial
  * count below the outer join for q13; distinct below the anti join for
  * q22), so this probe A/Bs the RULE: each query timed with
  * `spark.graft.eagerAggregation.enabled` on vs off, checksums compared
  * so the rewrite's exactness is re-proven at bench scale before the
  * timing is believed.
  *
  * Usage: runMain graft.ProbeQ13Agg [dataDir] [reps]
  */
object ProbeQ13Agg {
  private val FLAG = "spark.graft.eagerAggregation.enabled"

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

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

    ab("q13")(Relational.queries("q13_customer_distribution")(spark, d))
    ab("q22")(Relational.queries("q22_global_sales")(spark, d))
  }
}
