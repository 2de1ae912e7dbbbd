package graft

import org.apache.spark.sql.functions.{col, sum, xxhash64}

/** Decompose the rollupab regression on the NON-served queries
  * (round-12b: q5/q7/q8 measured ~0.3–0.5 s slower with rollups
  * REGISTERED even though no rollup fires in their plans): is the tax
  * paid at PLANNING time (the rule's serve attempts — peel, parse,
  * catalog lookups — on every Aggregate/Join node of a 7-relation
  * plan) or at EXECUTION time (the plans actually differ)?
  *
  * Interleaves on/off WITHIN one session (registry flipped between
  * iterations, identical routes both sides, same page cache) and times
  * the two phases separately; also diffs the executed-plan strings so
  * a changed plan cannot hide inside "execution".
  *
  * Usage: runMain graft.ProbeRollupCost [bigDir] [names] [reps]
  */
object ProbeRollupCost {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val names = (if (args.length > 1) args(1) else
      "q5_local_supplier,q7_volume_shipping,q8_market_share").split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 4
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val staged = ProbeAdvisorSweep.ensureProjections(spark, d)
    val metas = ProbeAdvisorSweep.ensureDenorm(spark, d)
    val rollups = ProbeAdvisorSweep.ensureRollups(spark, d)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    names.foreach { n =>
      Tables.clearRedirects()
      val routes = ProbeAdvisorSweep.denormAwareRoutes(
        spark, d, n, staged, metas, rollups)
      def once(): (Double, Double, String) = {
        Tables.clearRedirects()
        routes.foreach { case (t, ct) => Tables.redirect(d, t, ct) }
        var df: org.apache.spark.sql.DataFrame = null
        val tPlan = timed {
          df = SparkEntry.queries(n)(spark, d)
          df.queryExecution.executedPlan // force analysis+optimization+planning
        }
        val plan = df.queryExecution.executedPlan.toString
        val tExec = timed {
          df.select(sum(xxhash64(df.columns.map(col): _*).cast("double")).as("h"))
            .write.format("noop").mode("overwrite").save()
        }
        GraftSession.clearSessionState(spark)
        (tPlan, tExec, plan)
      }
      def setOn(on: Boolean): Unit =
        if (on) rollups.foreach(graft.plans.MaterializedAggs.register)
        else rollups.foreach(m =>
          graft.plans.MaterializedAggs.deregister(m.catalogTable))
      // warm both sides once (parse caches, page cache), then interleave
      setOn(true); once(); setOn(false); once()
      val onP = Array.newBuilder[Double]; val onE = Array.newBuilder[Double]
      val offP = Array.newBuilder[Double]; val offE = Array.newBuilder[Double]
      var planOn = ""; var planOff = ""
      (1 to reps).foreach { _ =>
        setOn(true); val a = once(); onP += a._1; onE += a._2; planOn = a._3
        setOn(false); val b = once(); offP += b._1; offE += b._2; planOff = b._3
      }
      setOn(true)
      def mn(b: scala.collection.mutable.Builder[Double, Array[Double]]): Double =
        b.result().min
      val same = planOn == planOff
      println(f"[rollupcost] $n plan on=${mn(onP)}%.3f off=${mn(offP)}%.3f " +
        f"exec on=${mn(onE)}%.3f off=${mn(offE)}%.3f plansIdentical=$same")
      if (!same) {
        println(s"===== $n PLAN WITH ROLLUPS =====\n$planOn")
        println(s"===== $n PLAN WITHOUT =====\n$planOff")
      }
    }
    println("""{"metric":"rollup_cost_done"}""")
    spark.stop()
  }
}
