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

  /** Session bounds via the sorted-scan kernel — the batch scale path
    * beside Spark's native `session_window` aggregate (which stays the
    * streaming-unified form). Same plan shape as gaucPerGroupSorted
    * (Metrics.scala): hash-partition by key, ONE in-partition sort by
    * (key, ts), then a streaming pass that closes a session when the
    * key changes or the gap is exceeded — no per-row window structs,
    * no MergingSessions machinery, O(1) state per open session.
    * Gap-INCLUSIVE like session_window: an event exactly `gapSeconds`
    * after the previous one still merges (new session iff diff > gap).
    * Emits (key, session_start, session_end = last + gap, n); null
    * keys/timestamps are dropped, matching session_window's
    * null-filtered aggregate. SessionizeSpec proves it row-identical
    * to the session_window plan; x200: 5.1 → ~2 s (PERF.md round-9).
    *
    * CONTRACT: `key` and `tsSeconds` must be INTEGRAL columns (byte/
    * short/int/long — e.g. a numeric user id and `ts.cast("long")`
    * epoch seconds). The kernel's tuple encoder is (Long, Long); a
    * non-integral key (string ids, decimals) is rejected here with a
    * require rather than silently cast-to-NULL-and-dropped, which
    * would return an EMPTY result instead of failing. String keys:
    * hash or dictionary-encode to long first (the type-generic
    * [[sessionIndex]]/[[sessionCounts]] window forms take any key).
    */
  def sessionBoundsSorted(df: DataFrame, key: Column, tsSeconds: Column,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"sessionBoundsSorted: gap must be positive, got $gapSeconds")
    // resolve the two columns against df to enforce the integral-type
    // contract up front (cast("long") below would turn a string key
    // into NULLs and the null filter would silently drop every row)
    val integral = Set("tinyint", "smallint", "int", "bigint")
    df.select(key.as("k"), tsSeconds.as("t")).schema.fields.foreach { f =>
      require(integral(f.dataType.simpleString),
        s"sessionBoundsSorted: key and tsSeconds must be integral " +
          s"(tinyint/smallint/int/bigint); got ${f.name}: ${f.dataType.simpleString}. " +
          "Hash or dictionary-encode non-numeric keys to long, or use " +
          "the type-generic sessionIndex/sessionCounts window forms.")
    }
    val base = df.select(key.cast("long").as("k"), tsSeconds.cast("long").as("t"))
      .where(col("k").isNotNull && col("t").isNotNull)
    implicit val inEnc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong)
    implicit val outEnc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong)
    base.as[(Long, Long)](inEnc)
      .repartition(col("k")) // a key's sessions live in exactly one partition
      .sortWithinPartitions(col("k"), col("t"))
      .mapPartitions { iter =>
        // incremental emission, one tuple per CLOSED session — never a
        // partition-wide buffer (same discipline as gaucPerGroupSorted)
        new scala.collection.AbstractIterator[(Long, Long, Long, Long)] {
          private val in = iter.buffered
          private var out: (Long, Long, Long, Long) = _
          private var ready = false
          private def advance(): Unit = {
            ready = false
            if (in.hasNext) {
              val (k, t0) = in.next()
              val start = t0; var last = t0; var n = 1L
              var open = true
              while (open && in.hasNext && in.head._1 == k) {
                val t = in.head._2
                if (t - last > gapSeconds) open = false
                else { in.next(); last = t; n += 1 }
              }
              out = (k, start, last + gapSeconds, n)
              ready = true
            }
          }
          advance()
          override def hasNext: Boolean = ready
          override def next(): (Long, Long, Long, Long) = {
            val r = out; advance(); r
          }
        }
      }(outEnc)
      .toDF("key", "session_start", "session_end", "n")
  }
}
