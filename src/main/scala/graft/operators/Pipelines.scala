package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference-shaped end-to-end data-prep pipelines.
  *
  * The Taobao tutorial pipeline (reference: docs/tutorial/ranking/taobao/
  * data/prep_2_bahavior.py:50-53 + prep_3_merge.py:41-67 + prep_4_sort.py)
  * is: per-user ts-sorted behavior collect → left-join histories onto
  * impressions with []-fill → per-row timestamp window clip → sort. This
  * is the reference's canonical relational workload and the flagship
  * integration query.
  *
  * Scale: one shuffle to build histories, one join keyed on user (AQE
  * may broadcast the smaller side), clip is a narrow higher-order
  * filter. Hot users inflate a single list — the row-form window
  * ([[RangeClip.recentWindow]]) is the skew-safe alternative.
  */
object Pipelines {

  /** Impressions (filtered by `impressionType`) each carrying the values
    * of the user's events inside [ts - windowSec, ts). */
  def taobaoShaped(events: DataFrame, impressionType: String, windowSec: Long): DataFrame = {
    // explicit casts make the []-fill literal's element type below
    // provably correct for any compatible input schema (only tsec was
    // cast before; an int event_id or float value would have failed the
    // coalesce with a struct-type mismatch)
    val e = events.select(
      col("event_id").cast("long").as("event_id"), col("user_id"),
      col("event_type"), col("value").cast("double").as("value"),
      col("ts").cast("long").as("tsec"))
    // shuffle-first: a collect_list partial pass moves the same bytes
    // without reducing (Aggregates scaladoc); the output keeps its
    // user_id hash partitioning, so the join below reuses the exchange
    val hist = Aggregates.byShuffledKey(e, col("user_id"))
      .agg(sort_array(collect_list(struct(
        col("tsec").as("t"), col("event_id").as("eid"), col("value").as("v")))).as("hist"))
    val clicks = e.filter(col("event_type") === impressionType)
    clicks.join(hist, Seq("user_id"), "left")
      .withColumn("hist", coalesce(col("hist"), array().cast("array<struct<t:bigint,eid:bigint,v:double>>")))
      .withColumn("recent", transform(
        filter(col("hist"), s =>
          s.getField("t") >= col("tsec") - windowSec && s.getField("t") < col("tsec")),
        s => s.getField("v")))
      .select(
        col("event_id"), col("user_id"),
        size(col("recent")).cast("long").as("n_hist"),
        col("recent").as("recent_vals"))
  }
}
