package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Trailing event-time window aggregates — the point-in-time feature
  * primitive of training pipelines ("user activity in the last hour",
  * "spend in the last day"): for every event, aggregates over the SAME
  * KEY's events in the CLOSED interval `[t − span, t]` (an event
  * exactly `span` old is still in frame — Spark/SQL RANGE-frame
  * semantics, mirrored by the oracle), never touching the future (no
  * label leakage by construction).
  *
  * Built on Spark's RANGE window frame over integer epoch-micros: the
  * frame is value-based, so ties and irregular event spacing are
  * handled exactly (a ROWS frame would need a fixed row count; resampling
  * to fixed intervals would blur event time). Reference analog: the
  * per-row event-time clip of SURVEY §2.8 (`RangeClip`) aggregated
  * instead of collected.
  *
  * Scale: the window partitions by key — one exchange + per-key sort,
  * no global order anywhere. Spark evaluates a trailing RANGE frame
  * with a sliding two-pointer pass per partition (O(rows) state, not
  * O(rows²)); skewed keys are bounded by the span itself (only spans
  * with more events than memory would hurt, at which point the caller
  * pre-aggregates to coarser grains first).
  */
object Rolling {

  /** Per-key trailing count + exact DECIMAL sum over `[t − span, t]`
    * (both bounds inclusive).
    *
    * @param df     event frame
    * @param key    partition key (e.g. user id)
    * @param ts     event-time timestamp column
    * @param value  numeric column to sum (2-dp money/metric semantics —
    *               accumulated as DECIMAL(12,2) for order-free
    *               exactness; magnitude envelope |value| < 10^10, the
    *               DECIMAL(12,2) cap — larger values null out of the
    *               sum under non-ANSI mode, throw under ANSI)
    * @param spanMicros trailing span in microseconds (inclusive bound)
    */
  def trailingSumCount(df: DataFrame, key: Column, ts: Column, value: Column,
      spanMicros: Long): DataFrame = {
    require(spanMicros > 0, s"trailingSumCount: span must be positive, got $spanMicros")
    val w = Window.partitionBy(key).orderBy(unix_micros(ts))
      .rangeBetween(-spanMicros, 0L)
    // both aggregates in one projection: identical window specs collapse
    // to ONE Window operator (one sort pass), where chained withColumns
    // would plan two
    df.select(col("*"),
      count(lit(1)).over(w).as("trailing_cnt"),
      sum(value.cast(DecimalType(12, 2))).over(w).cast(DoubleType).as("trailing_sum"))
  }
}
