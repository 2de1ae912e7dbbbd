package graft

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

import org.apache.spark.metrics.source.CodegenMetrics
import org.apache.spark.sql.SparkSession

/** Diagnostic for the suite-context slowdown of kernel-heavy queries
  * (round 13: graph_pagerank 39 s inside a full 212-query bench vs
  * 3.2–4.1 s isolated, dedup_line_level 31 s vs 1.7 s — same code,
  * same box, minutes apart).
  *
  * Runs the exact Bench loop (same order, same warm-up, same hygiene)
  * and prints, per timed query, the deltas that separate the candidate
  * mechanisms:
  *   - janinoN / janinoMs: Catalyst codegen compilations (Janino) and
  *     their wall time — nonzero during the TIMED pass means the
  *     codegen class cache evicted this query's classes after warm-up
  *     (spark.sql.codegen.cache.maxEntries too small).
  *   - jitMs: JVM JIT total compilation time delta — large values with
  *     janinoN=0 mean the compiled NATIVE code was discarded (code
  *     cache sweeping) and hot loops re-JIT'd from scratch.
  *   - ccUsedMb: JIT code-cache pool occupancy ("CodeHeap" pools) —
  *     sitting at the ~240 MB ReservedCodeCacheSize ceiling while jitMs
  *     keeps rising is the flush-refill signature.
  *
  * Output is stderr-only, one line per query; the stdout JSON contract
  * is untouched (this is a probe main, not the bench).
  */
object ProbeSuiteJit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    val jitBean = ManagementFactory.getCompilationMXBean
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
    def ccUsedMb: Long = pools.map(_.getUsage.getUsed).sum / (1024 * 1024)
    def ccPools: String = pools.map(p =>
      s"${p.getName.replace("CodeHeap '", "").replace("'", "")}=" +
        s"${p.getUsage.getUsed / (1024 * 1024)}/${p.getUsage.getMax / (1024 * 1024)}Mb").mkString(" ")
    def meta: (Long, Long, Long) =
      (CodegenMetrics.METRIC_COMPILATION_TIME.getCount,
        // Codahale histogram has no sum; track count + JIT ms, the two
        // discriminating counters
        jitBean.getTotalCompilationTime,
        ccUsedMb)

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (name, fn) =>
      try run(fn)
      catch { case e: Throwable => System.err.println(s"[probe-jit] warmup $name: ${e.getMessage}") }
      GraftSession.clearSessionState(spark)
    }
    val (jan0, jit0, _) = meta
    System.err.println(s"[probe-jit] after warmup: janino=$jan0 jitMs=$jit0 ccUsedMb=$ccUsedMb pools: $ccPools")

    // JVM-uptime stamps bracket each timed window so -XX:+PrintCompilation
    // output (timestamped in ms since JVM start) can be attributed to the
    // query that was running — "made not entrant" lines inside a window
    // are deoptimizations paid by that query.
    val rt = ManagementFactory.getRuntimeMXBean
    ordered.foreach { case (name, fn) =>
      val (janA, jitA, _) = meta
      val up0 = rt.getUptime
      val t0 = System.nanoTime()
      try run(fn)
      catch { case e: Throwable => System.err.println(s"[probe-jit] $name failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      val up1 = rt.getUptime
      val (janB, jitB, cc) = meta
      System.err.println(f"[probe-jit] $name%-32s ${dt}%8.3f s  janinoN=${janB - janA}%4d  jitMs=${jitB - jitA}%6d  ccUsedMb=$cc%4d  win=$up0%d..$up1%d")
      GraftSession.clearSessionState(spark)
    }
    System.err.println(s"[probe-jit] at end: pools: $ccPools")
    spark.stop()
  }
}
