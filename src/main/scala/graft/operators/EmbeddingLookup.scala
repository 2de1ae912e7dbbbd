package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sharded embedding lookup as a distributed hash equi-join.
  *
  * The reference rewrites `embedding_lookup` into partition_by_modulo →
  * alltoallv → unique → local gather → alltoallv back → gather-restore
  * (reference: hybridbackend/tensorflow/embedding/sharding.py:168-205).
  * Semantically that is `ids LEFT JOIN table ON id = key`, preserving
  * input multiplicity and order. On Spark the physical plan *is* the
  * rewrite: Exchange hashpartitioning ≡ partition+alltoallv, hash join
  * build ≡ local gather, AQE's broadcast switch ≡ the reference's
  * unsharded small-table path (sharding.py:174-176).
  */
object EmbeddingLookup {

  /** Look up `valueCols` from `table` for every row of `ids`.
    * Multiplicity-preserving left join; missing keys yield nulls (callers
    * may coalesce a default). `broadcastDim = true` forces the
    * small-dimension path. `preserveOrder` re-sorts by the input's
    * original position — at cluster scale ordering is a presentation
    * concern, so it is opt-in (costs one extra sort).
    */
  def lookup(
      ids: DataFrame,
      idCol: String,
      table: DataFrame,
      keyCol: String,
      valueCols: Seq[String],
      broadcastDim: Boolean = false,
      preserveOrder: Boolean = false): DataFrame = {
    // rename the dim key before joining: drop(keyCol) after a join would
    // remove BOTH columns when idCol and keyCol share a name
    val dim0 = table.select(col(keyCol).as("__dim_key") +: valueCols.map(col): _*)
    val dim = if (broadcastDim) broadcast(dim0) else dim0
    if (preserveOrder) {
      val withOrd = ids.withColumn("__pos", monotonically_increasing_id())
      withOrd
        .join(dim, withOrd(idCol) === dim("__dim_key"), "left")
        .orderBy(col("__pos"))
        .drop("__pos", "__dim_key")
    } else {
      ids.join(dim, ids(idCol) === dim("__dim_key"), "left").drop("__dim_key")
    }
  }

  /** Distinct-id pre-aggregation before the join — the reference's
    * `unique` step (sharding.py:186-195) that collapses duplicate ids
    * before the expensive exchange. Worth it when ids are highly
    * repetitive: join the distinct ids, then map results back by a
    * second (cheap, co-partitioned) join. */
  def lookupDedup(
      ids: DataFrame,
      idCol: String,
      table: DataFrame,
      keyCol: String,
      valueCols: Seq[String]): DataFrame = {
    // rename the dim key before joining (same reason as lookup():
    // col(idCol) after the join is ambiguous when idCol == keyCol)
    val dim = table.select(col(keyCol).as("__dim_key") +: valueCols.map(col): _*)
    val uniqueIds = ids.select(col(idCol)).distinct()
    val fetched = uniqueIds.join(dim, col(idCol) === col("__dim_key"), "left")
      .select(col(idCol) +: valueCols.map(col): _*)
    ids.join(fetched, Seq(idCol), "left")
  }

  /** Cache split — the `HbLookup` hit/miss partition (reference:
    * embedding/lookup_ops.cc:38-47): split keys into those present in
    * the cache table and those missing. */
  def cacheSplit(
      ids: DataFrame,
      idCol: String,
      cache: DataFrame,
      keyCol: String): (DataFrame, DataFrame) = {
    val keys = cache.select(col(keyCol).as(idCol))
    (ids.join(keys, Seq(idCol), "left_semi"), ids.join(keys, Seq(idCol), "left_anti"))
  }
}
