package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-row time-range clipping of history lists — the reference's only
  * window-frame semantics (reference:
  * docs/tutorial/ranking/taobao/data/prep_3_merge.py:52-67: keep list
  * elements with `ts - before <= t < ts + after` relative to each row's
  * own timestamp).
  */
object RangeClip {

  /** Array form — the literal reference op: clip parallel (tsList,
    * valueList) pairs to the window around `ts`. Pure higher-order
    * expressions (codegen'd, no shuffle). */
  def clipLists(ts: Column, tsList: Column, valueList: Column, before: Long, after: Long): Column =
    transform(
      filter(
        arrays_zip(tsList.as("t"), valueList.as("v")),
        s => s.getField("t") >= ts - before && s.getField("t") < ts + after),
      s => s.getField("v"))

  /** Row form — the same semantics when history lives as rows: a range
    * window per key, ordered by epoch seconds. One shuffle on the key;
    * the frame scan is sort-based and spill-capable, so it holds at
    * scale (vs. collecting per-user lists which would OOM on hot keys).
    * Frame is [ts - before, ts) — the reference's half-open window. */
  def recentWindow(key: Column, tsSeconds: Column, before: Long): org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(key).orderBy(tsSeconds).rangeBetween(-before, -1)

  /** Ordered per-key history collect — the reference's groupBy(user) +
    * ts-sorted collect_list (prep_2_bahavior.py:50-53). Spark's
    * collect_list is unordered; determinism comes from the struct sort
    * (SURVEY §7).
    *
    * Shuffle-first (Aggregates.byShuffledKey): collect's "partial" pass
    * can never reduce — it only wraps each map partition's rows in
    * arrays carrying the same bytes to the exchange — so raw rows are
    * shuffled on the key and the single real collect runs where each
    * key is colocated. */
  def collectHistory(df: DataFrame, key: Column, ord: Column, value: Column): DataFrame =
    Aggregates.byShuffledKey(df, key, key.as("key"))
      .agg(transform(sort_array(collect_list(struct(ord.as("o"), value.as("v")))),
        s => s.getField("v")).as("history"))
}
