package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Block deduplication with inverse-index restore.
  *
  * The reference compresses storage by, per block of rows, keeping each
  * key group's *sorted unique* values once plus one inverse-index column
  * mapping original rows to unique entries (np.unique with return_inverse;
  * reference: docs/tutorial/ranking/taobao/data/deduplicate.py:43-100,
  * spec docs/data.md:169-198). At read time the flagged columns are
  * restored by gathering through the inverse index
  * (hybridbackend/tensorflow/data/dataframe.py:301-313,347-364).
  *
  * Spark-first: compress is a groupBy aggregate built from codegen'd
  * collection expressions (sort_array/array_distinct/array_position via
  * `transform`); restore is a higher-order gather + posexplode. No
  * shuffles beyond the single groupBy(block); restore is narrow
  * (per-row expressions + generator), so it scales linearly and keeps
  * whole-stage codegen.
  */
object BlockDedup {

  /** Compress `keyCols` per block. Rows inside a block are ordered by
    * `ord` (the reference relies on file order; an explicit order column
    * keeps the result deterministic under Spark's unordered exchange).
    *
    * Output: one row per block with, per key column k:
    *   - `<k>_uniq` — sorted distinct values (np.unique order)
    *   - `<k>_idx`  — inverse index per original row, ordered by `ord`
    * plus `<ordName>_list`, the ordered `ord` values (needed to restore
    * row identity).
    */
  def compress(df: DataFrame, block: Column, ord: Column, keyCols: Seq[String]): DataFrame = {
    val ordName = "__ord"
    val keyed = df.withColumn(ordName, ord).withColumn("__block", block)
    val aggs: Seq[Column] = keyCols.flatMap { k =>
      // ordered values of k within the block (struct-sort makes
      // collect_list deterministic — SURVEY §7 hard-parts)
      val ordered = transform(
        sort_array(collect_list(struct(col(ordName), col(k)))),
        s => s.getField(k))
      val uniq = array_sort(array_distinct(ordered))
      Seq(
        uniq.as(s"${k}_uniq"),
        transform(ordered, v => array_position(uniq, v) - 1).as(s"${k}_idx"))
    } :+ transform(
      sort_array(collect_list(struct(col(ordName)))),
      s => s.getField(ordName)).as(s"${ordName}_list")
    keyed.groupBy(col("__block").as("block")).agg(aggs.head, aggs.tail: _*)
  }

  /** Restore one compressed key column back to one row per original row:
    * gathers `<k>_uniq` through `<k>_idx` and explodes alongside the
    * order column list, yielding (block, ord, k). */
  def restore(compressed: DataFrame, k: String, ordName: String = "__ord"): DataFrame = {
    val gathered = transform(col(s"${k}_idx"), i => element_at(col(s"${k}_uniq"), (i + 1).cast("int")))
    compressed
      .withColumn("__rows", arrays_zip(col(s"${ordName}_list").as("ord"), gathered.as("val")))
      .select(col("block"), explode(col("__rows")).as("r"))
      .select(col("block"), col("r.ord").as(ordName), col("r.val").as(k))
  }

  /** Exact row-level deduplication (the `tf.unique` analog in the lookup
    * path, reference: embedding/sharding.py:186-187): distinct over key
    * columns. Restore-by-join is the inverse gather. */
  def distinctRows(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.dropDuplicates(keyCols)
}
