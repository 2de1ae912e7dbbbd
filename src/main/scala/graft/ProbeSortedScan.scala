package graft

import org.apache.spark.sql.functions._

/** Scratch probe (not a gate): measure the scan-bound relational
  * heavies (q14's promo-share shape; q5/q10's date-windowed joins)
  * over a DATE-SORTED lineitem layout vs the unsorted baseline at
  * x200 — does parquet row-group pruning cut the scanned bytes the
  * way the shipdate filters imply? (PERF.md round-8; staging untimed:
  * sort order is a durable write-time property.)
  *
  * Usage: runMain graft.ProbeSortedScan [srcDir] [reps]
  */
object ProbeSortedScan {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sortedDir = src + "sorted"
    val liPath = sortedDir + "/lineitem.parquet"
    if (!new java.io.File(liPath).exists()) {
      val t0 = System.nanoTime()
      graft.sources.TabularWriter.toRangeSorted(
        Tables.lineitem(spark, src), liPath, Seq("l_shipdate"), numFiles = 64)
      // dims/orders reused from the unsorted dir via symlinks
      Seq("orders", "customer", "supplier", "part", "nation", "region").foreach { t =>
        val ln = java.nio.file.Paths.get(sortedDir, s"$t.parquet")
        if (!java.nio.file.Files.exists(ln, java.nio.file.LinkOption.NOFOLLOW_LINKS))
          java.nio.file.Files.createSymbolicLink(ln,
            java.nio.file.Paths.get(src, s"$t.parquet"))
      }
      println(f"[probe] sorted stage (one-time write): ${(System.nanoTime()-t0)/1e9}%.1f s")
    }

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      GraftSession.clearSessionState(spark)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        GraftSession.clearSessionState(spark)
        dt
      }
      println(f"[probe] $name: ${ts.map(t => f"$t%.2f").mkString(" ")} (min ${ts.min}%.2f)")
    }

    // layouts matched to the ACTUAL lineitem predicates of the adapted
    // suite: q12 filters l_shipdate (1 of ~7 years -> shipdate sort);
    // q6 filters l_discount x l_quantity (-> z-order on both); q14/q5
    // have NO lineitem predicate (full-scan bound - layout can't prune,
    // only decode speed matters; measured as the control)
    val zDir = src + "zorder"
    val zPath = zDir + "/lineitem.parquet"
    if (!new java.io.File(zPath).exists()) {
      graft.sources.TabularWriter.toZOrdered(
        Tables.lineitem(spark, src), zPath, "l_discount", "l_quantity", numFiles = 64)
      Seq("orders", "customer", "supplier", "part", "nation", "region").foreach { t =>
        val ln = java.nio.file.Paths.get(zDir, s"$t.parquet")
        if (!java.nio.file.Files.exists(ln, java.nio.file.LinkOption.NOFOLLOW_LINKS))
          java.nio.file.Files.createSymbolicLink(ln,
            java.nio.file.Paths.get(src, s"$t.parquet"))
      }
    }
    for ((label, dir) <- Seq(("unsorted", src), ("shipdate_sorted", sortedDir)))
      time(s"q12_priority_class/$label")(SparkEntry.queries("q12_priority_class")(spark, dir))
    for ((label, dir) <- Seq(("unsorted", src), ("zorder_disc_qty", zDir)))
      time(s"q6_forecast_revenue/$label")(SparkEntry.queries("q6_forecast_revenue")(spark, dir))
    for ((label, dir) <- Seq(("unsorted", src), ("shipdate_sorted", sortedDir)))
      time(s"q14_promo_share/$label (control, no predicate)")(
        SparkEntry.queries("q14_promo_share")(spark, dir))
    spark.stop()
  }
}
