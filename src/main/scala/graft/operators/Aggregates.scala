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
    *
    * LAYOUT-AWARE (round 10): when `df` is a straight-line read of a
    * catalog table BUCKETED on `key` (the scaladoc's "when NOT to use"
    * case, detected instead of documented), the explicit repartition is
    * skipped — rows are already co-located, so the plain groupBy plans
    * exchange-free (and streams, on sorted layouts). Shipping the
    * explicit exchange there re-introduced the exact shuffle the layout
    * paid its write to remove: the x200 advisor sweep measured q18 with
    * the hardcoded repartition at 7.0 s over the bucketed table vs the
    * exchange-free shape's ~4 s class (PERF.md round-10). */
  def byShuffledKey(df: DataFrame, key: Column, groupCols: Column*): RelationalGroupedDataset = {
    val g = if (groupCols.isEmpty) Seq(key) else groupCols
    val pre = if (isCoLocatedOn(df, Seq(key))) df else df.repartition(key)
    pre.groupBy(g: _*)
  }

  /** Multi-column key form of [[byShuffledKey]]: shuffle raw rows on all
    * `keys`, then group by them. A bucketed layout co-locates on its
    * bucket key alone, so any superset grouping that CONTAINS the bucket
    * key is also co-located (all rows of one bucket-key value share a
    * partition). */
  def byShuffledKeys(df: DataFrame, keys: Seq[Column]): RelationalGroupedDataset = {
    val pre = if (isCoLocatedOn(df, keys)) df else df.repartition(keys: _*)
    pre.groupBy(keys: _*)
  }

  /** True iff `df` is a projection/filter over a catalog table whose
    * bucket column is among `keys` — then rows with equal `keys`
    * already share a partition and a pre-aggregation repartition is pure
    * waste. Conservative by construction: any node other than a
    * Project/Filter/alias chain over the relation (a join, a union, an
    * existing repartition) returns false and keeps the explicit
    * shuffle. Key names are resolved THROUGH the projection chain to
    * the leaf attribute they actually read — a projection that aliases
    * a different column to the bucket column's name
    * (`select(col("x").as("bucket_col"))`) must NOT claim co-location:
    * the grouped values are x's, and skipping the contract shuffle
    * would silently degrade to the partial-agg-then-exchange plan this
    * operator exists to avoid. A derived key (`expr(key)+1`) resolves
    * to no leaf attribute and correctly fails the match. */
  private[graft] def isCoLocatedOn(df: DataFrame, keys: Seq[Column]): Boolean =
    leafColumnsOf(df, keys).exists { case (lr, leafName) =>
      lr.catalogTable.exists(_.bucketSpec.exists { bs =>
        bs.bucketColumnNames.size == 1 &&
          bs.bucketColumnNames.head.toLowerCase == leafName
      })
    }

  /** The `(leaf relation, leaf column name)` each of `keys` resolves to
    * through a STRAIGHT-LINE Project/Filter/alias chain (the
    * [[isCoLocatedOn]] walk, factored out so other layout-aware
    * declines — [[BloomReduce.semiReduce]]'s rollup check — share the
    * exact same resolution rules). */
  private[graft] def leafColumnsOf(df: DataFrame, keys: Seq[Column])
      : Seq[(org.apache.spark.sql.execution.datasources.LogicalRelation, String)] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val names = keys.flatMap(k =>
      org.apache.spark.sql.graftbridge.Bridge.attrName(k).map(_.toLowerCase)).toSet
    if (names.isEmpty) return Nil
    // resolve an output name to the LEAF column it reads: follow pure
    // renames only; anything derived breaks the chain
    def leafColumn(p: LogicalPlan, name: String): Option[(LogicalRelation, String)] =
      p match {
        case Project(list, c) =>
          list.find(_.name.toLowerCase == name).flatMap {
            case ar: AttributeReference => leafColumn(c, ar.name.toLowerCase)
            case al: Alias => al.child match {
              case ar: AttributeReference => leafColumn(c, ar.name.toLowerCase)
              case _ => None
            }
            case _ => None
          }
        case Filter(_, c) => leafColumn(c, name)
        case SubqueryAlias(_, c) => leafColumn(c, name)
        case lr: LogicalRelation =>
          if (lr.output.exists(_.name.toLowerCase == name)) Some((lr, name)) else None
        case _ => None
      }
    names.toSeq.flatMap(n => leafColumn(df.queryExecution.analyzed, n))
  }
}
