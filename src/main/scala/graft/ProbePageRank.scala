package graft

import org.apache.spark.sql.functions._

/** Round-12 probe: decompose graph_pagerank's x200 cost (VERDICT r11
  * item #4 — the one data-sized LLM-suite loss, 1.74×/41 s) into its
  * halves and A/B the iteration-tax remedies:
  *
  *   edges   — the co-occurrence edge build alone (collect_set +
  *             double explode + edge-key distinct), materialized
  *   standing— the shipped shape (edges localCheckpointed once,
  *             unrolled sweeps, frontier checkpoint every 5)
  *   ckpt1   — frontier localCheckpoint after EVERY sweep (verdict's
  *             "persist the rank vector between iterations")
  *   sweeps  — sweeps only, over a pre-materialized edge frame (the
  *             residual the iteration actually costs)
  *
  * Usage: runMain graft.ProbePageRank [dataDir] [reps] [iters]
  * Prints one BenchBig-shaped JSON line (interleaved.py-compatible).
  */
object ProbePageRank {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val reps = if (args.length > 1) args(1).toInt else 1
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.operators.Graph

    def edges = Graph.coOccurrenceEdges(Tables.lineitem(spark, d),
      col("l_orderkey"), col("l_partkey"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // pre-materialized edge frame for the sweeps-only leg (untimed)
    val edgesCk = edges.localCheckpoint(true)

    val legs: Seq[(String, () => Unit)] = Seq(
      "edges" -> (() => noop(edges.localCheckpoint(true)
        .select(count(lit(1))))),
      "standing" -> (() => noop(Graph.pageRankNano(edges, iters)
        .select(col("id").as("part_id"), col("rank").as("rank_nano")))),
      "ckpt1" -> (() => noop(Graph.pageRankNano(edges, iters, checkpointEvery = 1)
        .select(col("id").as("part_id"), col("rank").as("rank_nano")))),
      "sweeps" -> (() => noop(Graph.pageRankNano(edgesCk, iters)
        .select(col("id").as("part_id"), col("rank").as("rank_nano")))))

    def once(f: () => Unit): Double = {
      val t0 = System.nanoTime()
      f()
      val dt = (System.nanoTime() - t0) / 1e9
      GraftSession.clearSessionState(spark)
      dt
    }
    legs.foreach { case (_, f) => once(f) } // warm-up
    val all = legs.map { case (n, f) => n -> (1 to reps).map(_ => once(f)) }
    val qs = all.map { case (k, v) => JsonOut.q(k) + ":" + v.min }.mkString("{", ",", "}")
    println(s"""{"metric":"probe_pagerank","iters":$iters,"queries":$qs,"sf":${JsonOut.q(d)}}""")
    spark.stop()
  }
}
