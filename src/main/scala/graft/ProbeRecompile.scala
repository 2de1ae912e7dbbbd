package graft

import org.apache.spark.metrics.source.CodegenMetrics
import org.apache.spark.sql.SparkSession

/** Diagnostic for queries whose generated code varies run to run and
  * therefore misses the codegen class cache on EVERY execution
  * (ProbeSuiteJit round 13: seven batch queries recompile 4–20 Janino
  * units at their timed run even with the 8192-entry cache — a
  * long-lived service re-running them pays Janino + cold JIT each
  * time, the exact tax the round-12 cache conf removed for everything
  * else).
  *
  * Runs each named query `reps` times and prints the Janino
  * compilation delta per rep: a steady nonzero tail means the query
  * defeats the cache systematically; a one-off means the first run
  * simply hadn't compiled everything (e.g. AQE-final plans).
  *
  * Usage: runMain graft.ProbeRecompile <name,name,...> [sfDir] [reps]
  */
object ProbeRecompile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProbeRecompile <name,name,...> [sfDir] [reps]")
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 4
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    def janino: Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val deltas = (1 to reps).map { _ =>
        val j0 = janino
        val t0 = System.nanoTime()
        run(fn)
        val dt = (System.nanoTime() - t0) / 1e9
        GraftSession.clearSessionState(spark)
        (janino - j0, dt)
      }
      System.err.println(s"[probe-recompile] $name: " +
        deltas.map { case (j, t) => f"janino=$j%d/${t}%.2fs" }.mkString(" "))
    }
    spark.stop()
  }
}
