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

    // each leg times ITSELF (the sweeps leg re-materializes its edge
    // frame untimed per run — clearSessionState between measurements
    // drops checkpoint blocks, so a shared frame cannot survive)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    // edge-build variants (the probe's round-1 finding: the build is
    // 24 of the 32 s — the sweeps cost 1.7 s)
    def pairsRaw = graft.operators.Aggregates
      .byShuffledKey(Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("bk"), col("l_partkey").as("it")), col("bk"))
      .agg(collect_set(col("it")).as("its"))
      .select(explode(col("its")).as("src"), col("its"))
      .select(col("src"), explode(col("its")).as("dst"))
      .filter(col("src") =!= col("dst"))
    // canonical half: dedup (min,max) ordered pairs, mirror after —
    // halves the rows through the distinct's exchange
    def edgesHalf = {
      val half = pairsRaw.filter(col("src") < col("dst"))
        .repartition(col("src"), col("dst")).distinct()
      half.union(half.select(col("dst").as("src"), col("src").as("dst")))
    }
    // partial-dedup: plain distinct (map-side combine shrinks popular
    // pairs before the exchange)
    def edgesPartial = pairsRaw.distinct()
    def edgesHalfPartial = {
      val half = pairsRaw.filter(col("src") < col("dst")).distinct()
      half.union(half.select(col("dst").as("src"), col("src").as("dst")))
    }

    val legs: Seq[(String, () => Double)] = Seq(
      "edges" -> (() => timed(noop(edges.localCheckpoint(true)
        .select(count(lit(1)))))),
      "edges_half" -> (() => timed(noop(edgesHalf.localCheckpoint(true)
        .select(count(lit(1)))))),
      "edges_partial" -> (() => timed(noop(edgesPartial.localCheckpoint(true)
        .select(count(lit(1)))))),
      "edges_half_partial" -> (() => timed(noop(edgesHalfPartial.localCheckpoint(true)
        .select(count(lit(1)))))),
      "standing" -> (() => timed(noop(Graph.pageRankNano(edges, iters)
        .select(col("id").as("part_id"), col("rank").as("rank_nano"))))),
      "ckpt1" -> (() => timed(noop(Graph.pageRankNano(edges, iters, checkpointEvery = 1)
        .select(col("id").as("part_id"), col("rank").as("rank_nano"))))),
      "sweeps" -> (() => {
        val edgesCk = edges.localCheckpoint(true) // untimed rebuild
        timed(noop(Graph.pageRankNano(edgesCk, iters)
          .select(col("id").as("part_id"), col("rank").as("rank_nano"))))
      }))

    def once(f: () => Double): Double = {
      val dt = f()
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
