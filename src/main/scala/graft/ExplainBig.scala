package graft

/** Dev tool: dump the ADAPTIVE final (or initial) physical plan of named
  * gate queries against a data dir — the evidence loop for scale-plan
  * work (does the runtime bloom filter fire? which side broadcasts? how
  * many exchanges survive AQE?).
  *
  * Usage: runMain graft.ExplainBig <name,name,...> [dataDir] [--run]
  * With --run the query is EXECUTED (hash-reduced like BenchBig) first,
  * so the printed plan is the final AQE plan with runtime statistics;
  * without it the printout is the initial (pre-execution) plan.
  */
object ExplainBig {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainBig <name,name,...> [dataDir] [--run]")
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/repo/benchdata/x200"
    val run = args.contains("--run")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      // The hash-reduced collect runs on a DERIVED Dataset with its own
      // QueryExecution; `df.queryExecution` is never executed, so with AQE
      // on it would still print the pre-execution plan (isFinalPlan=false).
      // Print the executed derivation's plan — it contains the query plan
      // as its subtree, with runtime statistics filled in.
      val shown = if (run) {
        import org.apache.spark.sql.functions._
        val reduced = df.select(hash(df.columns.map(col): _*).cast("long").as("h")).agg(sum("h"))
        val t0 = System.nanoTime()
        reduced.collect()
        println(f"== $name executed in ${(System.nanoTime() - t0) / 1e9}%.2f s ==")
        reduced
      } else df
      println(s"==== $name ${if (run) "(final AQE plan)" else "(initial plan)"} ====")
      println(shown.queryExecution.executedPlan.toString)
      GraftSession.clearSessionState(spark)
    }
    spark.stop()
  }
}
