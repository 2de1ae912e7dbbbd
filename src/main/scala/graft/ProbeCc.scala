package graft

import graft.operators.NearDup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Round-13 probe: connected-components loop variants, A/B'd on the
  * real dedup pair input. Event-log evidence (OPTIMIZATION_r13.md)
  * shows each large-star/small-star round costs ~9 AQE stage jobs of
  * 10–50 ms each with 20–70 ms scheduling gaps between — at bench
  * scale the loop is job-count-bound, not data-bound. Variants:
  *
  *  - `ship`  — the shipped DedupClusters loop (signature = separate
  *              count+hash aggregate job after the checkpoint);
  *  - `fused` — the convergence signature computed INSIDE the round's
  *              materializing action (mapPartitions → collect: the one
  *              job computes the round, caches the checkpoint blocks,
  *              and returns per-partition (n, hash-sum) in the task
  *              results — exactly-once by action semantics, no
  *              accumulator retry hazard);
  *  - `fused_nodist` — fused + large-star's intermediate distinct
  *              removed (small-star's final distinct is the round's
  *              semantic dedup; large-star emits exactly one row per
  *              input edge — filter y > x keeps one direction — so the
  *              intermediate volume is bounded by |E| either way).
  *
  * Usage: runMain graft.ProbeCc [sfDir] [reps]
  */
object ProbeCc {

  private def mix64(u: Long, v: Long): Long = {
    var x = u * 0x9E3779B97F4A7C15L + v
    x ^= x >>> 32; x *= 0xD6E8FEB86659FD93L
    x ^= x >>> 32; x *= 0xD6E8FEB86659FD93L
    x ^= x >>> 32
    x
  }

  private def largeStar(edges: DataFrame, dedup: Boolean): DataFrame = {
    val nbrs = edges.select(col("u").as("x"), col("v").as("y"))
      .union(edges.select(col("v").as("x"), col("u").as("y")))
    val mins = nbrs.groupBy("x")
      .agg(min(col("y")).as("mn"))
      .select(col("x"), least(col("mn"), col("x")).as("m"))
    val out = nbrs.join(mins, "x")
      .where(col("y") > col("x"))
      .select(col("m").as("u"), col("y").as("v"))
      .where(col("u") =!= col("v"))
    if (dedup) out.distinct() else out
  }

  private def smallStar(edges: DataFrame): DataFrame = {
    val nbrs = edges.select(col("v").as("x"), col("u").as("y"))
    val mins = nbrs.groupBy("x").agg(min(col("y")).as("m"))
    nbrs.join(mins, "x")
      .select(col("m").as("u"), col("y").as("v"))
      .union(mins.select(col("m").as("u"), col("x").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** One collect job: computes the (lazily checkpointed) frame, caching
    * its blocks, and returns the convergence signature from the task
    * results. */
  private def fusedSignature(edges: DataFrame): (Long, Long) = {
    val spark = edges.sparkSession
    import spark.implicits._
    val parts = edges.as[(Long, Long)].mapPartitions { it =>
      var n = 0L; var h = 0L
      while (it.hasNext) { val t = it.next(); n += 1L; h += mix64(t._1, t._2) }
      Iterator.single((n, h))
    }.collect()
    (parts.map(_._1).sum, parts.map(_._2).sum)
  }

  private def ccVariant(pairs: DataFrame, a: Column, b: Column,
      dedupLarge: Boolean, maxIter: Int = 50): DataFrame = {
    val canon = pairs
      .select(least(a, b).cast("long").as("u"), greatest(a, b).cast("long").as("v"))
      .localCheckpoint(false)
    val nodes = canon.select(col("u").as("id"))
      .union(canon.select(col("v").as("id")))
      .distinct()
    var edges = canon.where(col("u") =!= col("v")).distinct().localCheckpoint(false)
    var prev = fusedSignature(edges)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      edges = smallStar(largeStar(edges, dedupLarge)).localCheckpoint(false)
      val sig = fusedSignature(edges)
      converged = sig == prev
      prev = sig
      iter += 1
    }
    require(converged, s"ccVariant did not converge in $maxIter rounds")
    nodes
      .join(edges.select(col("v").as("id"), col("u").as("root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("component"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def pairs = NearDup.minHashNearDups(Tables.documents(spark, sfDir),
      col("doc_id"), col("text"), n = 3, k = 16, bands = 4, threshold = 0.5)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def timed(label: String, f: () => DataFrame): Unit = {
      noop(f()); GraftSession.clearSessionState(spark) // warm-up
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        noop(f())
        val dt = (System.nanoTime() - t0) / 1e9
        GraftSession.clearSessionState(spark)
        dt
      }
      println(f"[cc] $label: ${ts.map(t => f"$t%.3f").mkString(" ")} (min ${ts.min}%.3f)")
    }

    // result equivalence first: all variants must agree exactly
    val ship = graft.operators.DedupClusters
      .connectedComponents(pairs, col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    GraftSession.clearSessionState(spark)
    for (dd <- Seq(true, false)) {
      val got = ccVariant(pairs, col("doc_a"), col("doc_b"), dedupLarge = dd)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      require(got == ship, s"variant dedupLarge=$dd diverged from shipped results")
      GraftSession.clearSessionState(spark)
    }
    println(s"[cc] equivalence ok (${ship.size} nodes)")

    timed("ship", () => graft.operators.DedupClusters
      .connectedComponents(pairs, col("doc_a"), col("doc_b")))
    timed("fused", () => ccVariant(pairs, col("doc_a"), col("doc_b"), dedupLarge = true))
    timed("fused_nodist", () => ccVariant(pairs, col("doc_a"), col("doc_b"), dedupLarge = false))
    spark.stop()
  }
}
