package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-11 probe: DECOMPOSE the scan_full_width residual (re-opened at
  * 2.9× vs DuckDB under the binding protocol). The benchmark shape is
  * `sum(xxhash64(all 16 columns))` over the full-width lineitem scan —
  * three separable costs: parquet DECODE of every column, the per-row
  * 16-column HASH reducer, and SCHEDULING (task count vs cores).
  *
  * Variants timed (all full-width, all noop-sinked):
  *  - `hash_full`   — the benchmark shape verbatim (baseline);
  *  - `decode_only` — per-column max() aggregates: every column decodes
  *    and is compared, nothing is hashed (hash cost = hash_full −
  *    decode_only, modulo the cheaper reducer);
  *  - `hash_concat` — ONE xxhash64 over 16 columns vs DuckDB's
  *    `hash(t)` struct hash: same shape, so this isolates nothing new,
  *    but timed per batch-size/partition confs:
  *  - conf grid: columnarReaderBatchSize ∈ {4096 (default), 16384} ×
  *    maxPartitionBytes ∈ {128m (default), 64m, 32m} — the x200
  *    lineitem is ~3.2 GB, so 128 MB splits schedule only ~26 tasks on
  *    32 cores (one fifth of the machine idle through the whole scan);
  *    smaller splits trade task overhead for full occupancy. At cluster
  *    scale the same knob is executor-count utilisation.
  *
  * Usage: runMain graft.ProbeScanWidth [dataDir] [reps]
  */
object ProbeScanWidth {

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/benchdata/x200")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def li: DataFrame = Tables.lineitem(spark, d)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(build: => DataFrame): Double = {
      val t0 = System.nanoTime()
      noop(build)
      val dt = (System.nanoTime() - t0) / 1e9
      GraftSession.clearSessionState(spark)
      dt
    }

    def hashFull: DataFrame = {
      val df = li
      df.select(sum(xxhash64(df.columns.map(col): _*).cast("double")).as("h"))
    }
    def decodeOnly: DataFrame = {
      val df = li
      df.agg(max(col(df.columns.head)), df.columns.tail.map(c => max(col(c))): _*)
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def bench(name: String)(build: => DataFrame): Unit = {
      time(build) // warm-up
      results(name) = (1 to reps).map(_ => time(build)).min
      println(f"[scanwidth] $name: ${results(name)}%.2f s")
    }

    bench("hash_full")(hashFull)
    bench("decode_only")(decodeOnly)
    // column-count slope: decode+hash cost per column — the difference
    // between k=1 and k=16 is the width cost, the k=1 intercept is
    // scan+schedule+reduce
    for (k <- Seq(1, 4, 8)) bench(s"hash_${k}col") {
      val df = li
      val cols = df.columns.take(k)
      df.select(sum(xxhash64(cols.map(col): _*).cast("double")).as("h"))
    }

    val batch = "spark.sql.parquet.columnarReaderBatchSize"
    val split = "spark.sql.files.maxPartitionBytes"
    val (batch0, split0) = (spark.conf.get(batch), spark.conf.get(split))
    for (b <- Seq("4096", "16384"); s <- Seq("128m", "64m", "32m")) {
      spark.conf.set(batch, b)
      spark.conf.set(split, s)
      try bench(s"hash_b${b}_s$s")(hashFull)
      finally { spark.conf.set(batch, batch0); spark.conf.set(split, split0) }
    }

    val qs = results.map { case (k, v) => JsonOut.q(k) + ":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"scan_width","queries":$qs,"sf":${JsonOut.q(d)}}""")
    spark.stop()
  }
}
