package graft

import org.apache.spark.sql.functions._
import graft.operators.Sessionize

/** Sorted-kernel sessionization: row-identical to Spark's native
  * session_window aggregate (the streaming-unified form), with the
  * gaps-and-islands pass replacing MergingSessions (the batch scale
  * path — PERF.md round-9). */
class SessionizeSpec extends GraftSpec {

  private def viaSessionWindow(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("tss", timestamp_seconds(col("ts").cast("long")))
    .groupBy(col("user_id"), session_window(col("tss"), "30 minutes"))
    .agg(count(lit(1)).as("n"))
    .select(col("user_id"),
      col("session_window.start").cast("long").as("session_start"),
      col("session_window.end").cast("long").as("session_end"), col("n"))

  test("sessionBoundsSorted equals the session_window aggregate on events") {
    val ev = Tables.events(spark, sf)
    val want = viaSessionWindow(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    val got = Sessionize.sessionBoundsSorted(ev, col("user_id"),
        col("ts").cast("long"), gapSeconds = 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(got.toSeq === want.toSeq)
  }

  test("sessionBoundsSorted edges: exact-gap merges, gap+1 splits, nulls dropped") {
    import spark.implicits._
    val rows = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 0L), (1L, 1800L), (1L, 3600L),      // exact-gap chain: ONE session
      (1L, 5401L),                              // 1801 after 3600: new session
      (2L, 100L),                               // single event
      (2L, 100L),                               // duplicate timestamp, same session
      (null, 50L), (3L, null)                   // dropped
    ).toDF("user_id", "tsec")
    val got = Sessionize.sessionBoundsSorted(rows, col("user_id"), col("tsec"), 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(got.toSeq === Seq(
      (1L, 0L, 5400L, 3L), (1L, 5401L, 7201L, 1L), (2L, 100L, 1900L, 2L)))
  }
}
