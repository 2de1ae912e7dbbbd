package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution primitives: modulo / dual-modulo ID partitioning,
  * seeded shuffle, even splits.
  *
  * The reference's `partition_by_modulo` / `partition_by_dual_modulo`
  * (reference: hybridbackend/tensorflow/distribute/partition/ops.py:33-221)
  * shard ID tensors across devices with floormod and return gather-back
  * indices. On Spark the same data motion is a single `Exchange
  * hashpartitioning`/explicit repartition; row identity is preserved by
  * the engine so no stitch indices are needed. `alltoall(v)` collapses to
  * the shuffle itself; `allreduce` to a global aggregate.
  */
object Partitioners {

  /** Non-negative floormod shard id (the reference's floormod,
    * ops.py:44-45). */
  def shardId(id: Column, numShards: Int): Column = pmod(id, lit(numShards))

  /** Repartition rows so each shard's rows are co-located — the Spark
    * physical form of partition_by_modulo + alltoallv. */
  def partitionByModulo(df: DataFrame, id: Column, numShards: Int): DataFrame =
    df.repartition(numShards, shardId(id, numShards))

  /** Hierarchical two-level shard (node, then device within node) — the
    * dual-modulo scheme (ops.py:106-221). A single Spark shuffle on the
    * combined shard subsumes the two physical hops; the (node, device)
    * pair is exposed for locality-aware layouts. */
  def dualModuloShard(id: Column, numNodes: Int, devicesPerNode: Int): (Column, Column) = {
    val flat = pmod(id, lit(numNodes.toLong * devicesPerNode))
    (pmod(flat, lit(numNodes)), (flat / numNodes).cast("long"))
  }

  def partitionByDualModulo(
      df: DataFrame,
      id: Column,
      numNodes: Int,
      devicesPerNode: Int): DataFrame = {
    val (node, dev) = dualModuloShard(id, numNodes, devicesPerNode)
    df.repartition(numNodes * devicesPerNode, node, dev)
  }

  /** Deterministic seeded shuffle — the `shuffle_batch` contract
    * (reference: data/tabular/table.py:230-275). The reference's
    * Fisher-Yates over a bounded buffer is not bit-reproducible here;
    * our documented contract is a total order by `rand(seed)` (global
    * shuffle) or per-partition sort (buffer-local analog).
    *
    * NOTE: rand(seed) is seeded per-partition, so this permutation is
    * reproducible only for a fixed input layout. For a layout-invariant
    * seeded shuffle use [[shuffleRowsByKey]]. */
  def shuffleRows(df: DataFrame, seed: Long, global: Boolean = true): DataFrame =
    if (global) df.orderBy(rand(seed))
    else df.sortWithinPartitions(rand(seed))

  /** Layout-invariant seeded shuffle: total order by a seeded hash of a
    * (unique) key column — same permutation regardless of how the input
    * is partitioned or re-read. */
  def shuffleRowsByKey(df: DataFrame, key: Column, seed: Long): DataFrame =
    df.orderBy(xxhash64(key, lit(seed)), key)

  /** Even splits — the sync-replicas/drop-remainder analog (reference:
    * data/sync/dataset_v2.py:34-104): balance rows across n partitions
    * so every replica sees the same row count ±1. `repartition(n)` with
    * no key plans RoundRobinPartitioning — exact balancing, no skew. */
  def evenSplits(df: DataFrame, n: Int): DataFrame =
    df.repartition(n)

  /** Contiguous global ordinals 1..N by (`primary`, `tieBreaks`...)
    * WITHOUT a single-partition sort — `row_number().over(orderBy(...))`
    * serializes the whole dataset through one task, the classic
    * scale-killer this engine's PlanShapeSpec guard forbids.
    *
    * Two-phase ranks instead (the [[graft.functions.Metrics.aucExact]]
    * pattern): range-bucket the primary key (order-preserving,
    * broadcast min/max stats), rank within each bucket in parallel,
    * and add per-bucket starting offsets from a buckets²-sized (tiny)
    * count self-join. Equal primary keys land in the same bucket, so
    * the in-bucket (primary, tieBreaks) order composes to the exact
    * global order.
    *
    * @param primary numeric column the ordinal ascends by
    * @return input + `ordinal` (1-based long)
    */
  def stableIds(df: DataFrame, primary: Column, tieBreaks: Seq[Column],
      buckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.withColumn("__pk", primary.cast("double"))
    // domain stats over FINITE keys only; rangeBucket places null/-Inf
    // in bucket 0 and NaN/+Inf in the top bucket, consistent with their
    // ascending sort positions — so the ordinal remains a total order
    // even on dirty keys, and one NaN cannot collapse every row into a
    // single window partition
    val stats = base.agg(
      min(Buckets.finiteOrNull(col("__pk"))).as("__lo"),
      max(Buckets.finiteOrNull(col("__pk"))).as("__hi"))
    val bucketed = base.crossJoin(broadcast(stats))
      .withColumn("__bkt",
        Buckets.rangeBucket(col("__pk"), col("__lo"), col("__hi"), buckets))
    val wIn = Window.partitionBy(col("__bkt"))
      .orderBy(col("__pk") +: tieBreaks: _*)
    val withRn = bucketed.withColumn("__rn", row_number().over(wIn))
    val cnts = bucketed.groupBy(col("__bkt")).agg(count(lit(1)).as("__c"))
    val offsets = Buckets.bucketOffsets(cnts, "__bkt", "__c", "__off")
    withRn.join(broadcast(offsets), "__bkt")
      .withColumn("ordinal", (col("__off") + col("__rn")).cast("long"))
      .drop("__pk", "__bkt", "__rn", "__off", "__lo", "__hi")
  }
}
