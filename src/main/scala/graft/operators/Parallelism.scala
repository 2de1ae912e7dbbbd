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
  def ensure(df: DataFrame, min: Int): DataFrame =
    if (df.rdd.getNumPartitions >= min) df else df.repartition(min)

  def ensureDefault(df: DataFrame): DataFrame =
    ensure(df, df.sparkSession.sparkContext.defaultParallelism)
}
