package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-bound narrow pipelines.
  *
  * A scan of a few small files (or one fat row group) yields fewer input
  * partitions than cores, and a narrow pipeline (hashing, shingling,
  * vector math) then runs effectively single-threaded — Spark never
  * re-splits a stage that has no shuffle. `ensure` round-robins rows to
  * `min` partitions only when the plan has fewer, so at real scale
  * (thousands of splits) it is a no-op and costs nothing; on small or
  * badly-laid-out inputs it buys cores× throughput for one cheap
  * exchange of the raw rows.
  */
object Parallelism {
  /** For file-backed frames, `inputFiles` (a file-index listing, no RDD
    * materialization — `df.rdd` would physical-plan the whole query per
    * call) under-counts splits of large files, so it only errs toward
    * repartitioning — acceptable for a parallelism floor. Non-file frames
    * (tests, in-memory relations) fall back to the RDD partition count. */
  def ensure(df: DataFrame, min: Int): DataFrame = {
    val files = df.inputFiles.length
    val parts = if (files > 0) files else df.rdd.getNumPartitions
    if (parts >= min) df else df.repartition(min)
  }

  def ensureDefault(df: DataFrame): DataFrame =
    ensure(df, df.sparkSession.sparkContext.defaultParallelism)
}
