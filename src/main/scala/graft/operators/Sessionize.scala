package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the time since
  * the key's previous event exceeds `gapSeconds`. One shuffle on the
  * key; lag + running-sum windows (sort-based, spill-capable) — scales
  * to arbitrarily many keys, degrades only with single-key skew.
  */
object Sessionize {

  /** Per-row session index (0-based) for each key. `ord` must make the
    * per-key order total (e.g. struct(tsSeconds, eventId)). */
  def sessionIndex(key: Column, tsSeconds: Column, ord: Column, gapSeconds: Long): Column = {
    val w = Window.partitionBy(key).orderBy(ord)
    val prev = lag(tsSeconds, 1).over(w)
    val isNew = when(prev.isNull || (tsSeconds - prev) > gapSeconds, 1L).otherwise(0L)
    sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1
  }

  /** Per-key session summary: number of sessions and events. */
  def sessionCounts(df: DataFrame, key: Column, tsSeconds: Column, ord: Column,
      gapSeconds: Long): DataFrame =
    df.withColumn("__sess", sessionIndex(key, tsSeconds, ord, gapSeconds))
      .groupBy(key.as("key"))
      .agg((max(col("__sess")) + 1).as("n_sessions"), count(lit(1)).as("n_events"))
}
