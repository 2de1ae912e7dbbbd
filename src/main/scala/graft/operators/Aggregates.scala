package graft.operators

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}

/** Aggregation shapes for group keys that defeat map-side partial
  * aggregation.
  *
  * Spark's two-phase hash aggregate (partial → exchange → final) assumes
  * the partial pass reduces: for low-cardinality keys it collapses each
  * map partition to ~|groups| rows before the shuffle. For HIGH-cardinality
  * keys spread across the layout (a per-order rollup over a multi-file
  * fact where each order's lines land in different files — the common
  * case for replicated/appended 100 TB fact tables), the partial pass
  * builds a near-input-sized hash table per task, reduces almost nothing,
  * and the exchange carries the same rows anyway: all of the partial
  * pass's hashing and spill pressure is pure overhead.
  *
  * `byShuffledKey` shuffles RAW rows on the key first. The following
  * `groupBy(key)` then sees a compatible distribution (no second
  * exchange), and both aggregate passes run post-shuffle where every
  * key IS colocated, so the first pass achieves full reduction with a
  * hash table sized |groups in partition|, not |rows in partition|.
  *
  * Measured (x200, 120M-row lineitem, 29M order groups, local[32]):
  * per-order count ~8.5 → ~5.0 s; the q21-shaped 5-aggregate 10.9 → 6.2 s.
  * At sf0.1 the two shapes tie at the noise floor. At 1000 executors the
  * argument is unchanged — the exchange bytes are identical, only the
  * wasted per-task partial pass is removed.
  *
  * When NOT to use: keys that are low-cardinality or clustered in the
  * layout (key-sorted files), where the partial pass legitimately
  * collapses the exchange — keep the plain `groupBy` there.
  *
  * Reference analog: the id-partitioned aggregation layout of the
  * sharded lookup path (embedding/sharding.py:168-205) — reduction
  * happens where the key lives, not where the row was read.
  */
object Aggregates {

  /** `df.repartition(key).groupBy(groupCols…)` — see object scaladoc for
    * when this beats the default two-phase aggregate. `groupCols` defaults
    * to the partition key itself; pass them explicitly to alias the key
    * (they must be functionally determined by `key` for the no-second-
    * exchange property to hold).
    */
  def byShuffledKey(df: DataFrame, key: Column, groupCols: Column*): RelationalGroupedDataset = {
    val g = if (groupCols.isEmpty) Seq(key) else groupCols
    df.repartition(key).groupBy(g: _*)
  }

  /** Multi-column key form of [[byShuffledKey]]: shuffle raw rows on all
    * `keys`, then group by them. */
  def byShuffledKeys(df: DataFrame, keys: Seq[Column]): RelationalGroupedDataset =
    df.repartition(keys: _*).groupBy(keys: _*)
}
