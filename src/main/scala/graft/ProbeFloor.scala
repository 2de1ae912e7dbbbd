package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-11 probe: the q13/q22 FIXED-COST FLOOR. Both queries sit at
  * 0.84–0.99 s at x200 where DuckDB runs sub-100 ms plans — ~10 AQE
  * stages of scheduling, not data work (the round-10 verdict's
  * hypothesis). Grid over the levers that change stage count/width:
  *
  *  - `parallelismFirst=false` + advisory 64m: AQE coalesces to SIZE
  *    instead of keeping minPartitionNum-wide stages — fewer, fatter
  *    tasks on a machine-local shuffle;
  *  - `initialPartitionNum` low (8): fewer shuffle partitions from the
  *    start, so every post-shuffle stage schedules fewer tasks;
  *  - broadcast threshold raised to 256 MB: q22's NOT-EXISTS build and
  *    q13's outer-join right side fit, collapsing the plan to a single
  *    scan stage + broadcast — the shape a 1000-executor cluster would
  *    NOT want (the build is per-executor memory) but the honest
  *    local-mode floor measurement.
  *
  * Usage: runMain graft.ProbeFloor [dataDir] [reps]
  */
object ProbeFloor {

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val names = Seq("q13_customer_distribution", "q22_global_sales")

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, d)
      df.select(sum(xxhash64(df.columns.map(col): _*).cast("double")).as("h"))
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      GraftSession.clearSessionState(spark)
      dt
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def bench(label: String, confs: Map[String, String]): Unit = {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try names.foreach { n =>
        time(n) // warm-up under these confs
        val v = (1 to reps).map(_ => time(n)).min
        results(s"${n.split("_").head}_$label") = v
        println(f"[floor] $n/$label: $v%.2f s")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    bench("default", Map.empty)
    bench("sizefirst", Map(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m"))
    bench("init8", Map(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "8",
      "spark.sql.shuffle.partitions" -> "8"))
    bench("bigbroadcast", Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "268435456"))

    val qs = results.map { case (k, v) => JsonOut.q(k) + ":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"floor","queries":$qs,"sf":${JsonOut.q(d)}}""")
    spark.stop()
  }
}
