package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ragged-column structural conversions.
  *
  * The reference's Value(values, nested_row_splits) layout supports
  * to_tensor (dense pad — TabularReader.padToLength), to_sparse (COO
  * indices + values) and unbatch_and_to_sparse (reference:
  * hybridbackend/tensorflow/data/dataframe.py:332-376,510-549). On
  * Spark the list layout is ArrayType; the sparse view is rows of
  * (row key, position, value) via posexplode — a narrow generator, no
  * shuffle.
  */
object Ragged {

  /** COO (sparse) view of a list column: one row per element with its
    * 0-based position — `to_sparse` for ragged_rank=1. */
  def toCoo(df: DataFrame, key: Column, list: Column): DataFrame =
    df.select(key.as("key"), posexplode(list).as(Seq("pos", "value")))

  /** COO view of a doubly-nested list (ragged_rank=2): (key, outer
    * position, inner position, value). */
  def toCoo2(df: DataFrame, key: Column, nested: Column): DataFrame =
    df.select(key.as("key"), posexplode(nested).as(Seq("pos0", "inner")))
      .select(col("key"), col("pos0"), posexplode(col("inner")).as(Seq("pos1", "value")))

  /** Rebuild the list column from its COO view — groupBy key +
    * position-sorted collect. Inverse of [[toCoo]] up to rows whose
    * list was EMPTY or NULL: posexplode (SQL UNNEST semantics) emits no
    * COO row for them, so they do not come back — the same convention
    * as the reference's to_sparse (an empty ragged row has no sparse
    * entries). Callers needing those keys back re-join the key set and
    * coalesce to array(). */
  def fromCoo(coo: DataFrame, key: Column, pos: Column, value: Column): DataFrame =
    coo.groupBy(key.as("key"))
      .agg(transform(sort_array(collect_list(struct(pos.as("p"), value.as("v")))),
        s => s.getField("v")).as("values"))
}
