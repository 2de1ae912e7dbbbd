package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-based snapshot merge (SCD-1 upsert): the maintenance op for any
  * periodically-refreshed table — feature snapshots, canonical corpora,
  * dimension tables. `updates` rows replace same-key `base` rows
  * wholesale; unmatched update keys append.
  *
  * One shuffle (full-outer hash join on the key); row precedence is an
  * indicator column, not per-column coalesce, so NULLs inside an update
  * row correctly overwrite non-NULL base values. Keys must be unique
  * within each input (standard MERGE precondition — a duplicate update
  * key would fan out the join rather than pick a winner; dedupe the
  * delta first, e.g. `perGroupSample(k=1)` or a max-timestamp window,
  * when ingesting raw change streams). At warehouse scale
  * this is the operation formats like Delta/Iceberg run under `MERGE
  * INTO`; expressed here as a pure dataframe transform so any sink can
  * materialize the result.
  */
object Upsert {

  def merge(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge: need at least one key column")
    require(base.columns.toSeq == updates.columns.toSeq,
      s"merge: schemas differ: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    // SHUFFLE_HASH on the updates side: the delta is normally a small
    // fraction of the snapshot, so building its hash table beats
    // sort-merge's full sort of BOTH sides (Spark supports full-outer
    // shuffled-hash since 3.1); falls back to SMJ when the hint can't
    // apply. 2.3 s -> measured win at x200 (PERF.md).
    val u = updates.withColumn("__upd", lit(true)).hint("SHUFFLE_HASH").as("u")
    val b = base.as("b")
    // plain equality, NOT <=>: SQL MERGE never matches NULL keys, so a
    // NULL-keyed update appends rather than replacing a NULL-keyed base row
    val cond = keys.map(k => col(s"u.$k") === col(s"b.$k")).reduce(_ && _)
    val merged = u.join(b, cond, "full_outer")
    val out = base.columns.map { c =>
      if (keys.contains(c)) coalesce(col(s"u.$c"), col(s"b.$c")).as(c)
      else when(col("__upd").isNotNull, col(s"u.$c")).otherwise(col(s"b.$c")).as(c)
    }
    merged.select(out.toSeq: _*)
  }

  /** SCD-2 history merge: `history` carries validity intervals
    * (`validFrom`, `validTo` — NULL validTo = current row); `updates`
    * carries new attribute versions at an effective timestamp `ts`.
    * Matched current rows CLOSE (validTo := update ts) and the update
    * appends as the new open row; unmatched update keys append as
    * brand-new open rows; closed history is immutable. One update per
    * key per batch (the [[merge]] precondition — reduce a raw change
    * stream to latest-per-key first).
    *
    * Scale: one equi-shuffle of the history on the key (hash join with
    * the delta, delta side built) + a union of the delta — exactly the
    * plan `MERGE INTO` engines run for SCD-2; no window, no sort.
    */
  def scd2(history: DataFrame, updates: DataFrame, keys: Seq[String],
      tsCol: String, validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame = {
    require(keys.nonEmpty, "scd2: need at least one key column")
    val attrs = history.columns.filterNot(c =>
      keys.contains(c) || c == validFrom || c == validTo).toSeq
    require(updates.columns.toSet == (keys ++ attrs :+ tsCol).toSet,
      s"scd2: updates must carry keys + attrs + $tsCol, got ${updates.columns.mkString(",")}")
    // updates with a NULL ts are DROPPED from both sides: interval
    // arithmetic is undefined for them, and the asymmetric alternative
    // (open row stays open while the update still appends) would leave
    // two open rows per key — corrupting the SCD-2 invariant
    val validUpdates = updates.filter(col(tsCol).isNotNull)
    val u = validUpdates.select((keys ++ attrs :+ tsCol).map(col): _*)
      .withColumnRenamed(tsCol, "__uts").hint("SHUFFLE_HASH").as("u")
    val h = history.as("h")
    val cond = keys.map(k => col(s"u.$k") === col(s"h.$k")).reduce(_ && _)
    // left join: history rows pick up the matching update's ts (if any);
    // only OPEN rows close — closed intervals are immutable
    val closed = h.join(u, cond, "left")
      .select(history.columns.map { c =>
        if (c == validTo)
          when(col(s"h.$validTo").isNull && col("__uts").isNotNull, col("__uts"))
            .otherwise(col(s"h.$validTo")).as(validTo)
        else col(s"h.$c").as(c)
      }.toSeq: _*)
    val fresh = validUpdates.select(
      (keys.map(col) ++ attrs.map(col) :+ col(tsCol).as(validFrom)
        :+ lit(null).cast(history.schema(validTo).dataType).as(validTo)): _*)
      .select(history.columns.map(col).toSeq: _*) // column order
    closed.unionByName(fresh)
  }

  /** Incremental maintenance of a keyed ADDITIVE aggregate — the
    * materialized-view refresh loop: `state` holds per-key partials
    * (counts / sums / any commutative-monoid column), `delta` is the
    * new batch already aggregated to the same schema, and the result is
    * state ⊕ delta with absent keys treated as zero. Because addition
    * is associative and commutative, applying batches in ANY split or
    * order equals aggregating everything at once (gate- and
    * spec-proved) — historical rows are never re-read, so refresh cost
    * scales with the batch, not the history.
    *
    * Same physical shape as [[merge]]: one full-outer equi-shuffle with
    * the delta side's hash table built. Non-key columns must be numeric
    * (the additive contract); averages/variances must be carried as
    * (sum, count[, sumsq]) partials and finalized at read time —
    * exactly how engine partial aggregation does it.
    */
  def mergeAggState(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "mergeAggState: need at least one key column")
    require(state.columns.toSeq == delta.columns.toSeq,
      s"mergeAggState: schemas differ: ${state.columns.mkString(",")} vs ${delta.columns.mkString(",")}")
    val valCols = state.columns.filterNot(keys.contains).toSeq
    valCols.foreach { c =>
      require(state.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"mergeAggState: non-key column $c must be numeric (additive), got ${state.schema(c).dataType}")
    }
    val s = state.as("a")
    val d = delta.hint("SHUFFLE_HASH").as("b")
    val cond = keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
    s.join(d, cond, "full_outer")
      .select(state.columns.map { c =>
        if (keys.contains(c)) coalesce(col(s"a.$c"), col(s"b.$c")).as(c)
        else {
          val zero = lit(0).cast(state.schema(c).dataType)
          (coalesce(col(s"a.$c"), zero) + coalesce(col(s"b.$c"), zero))
            .cast(state.schema(c).dataType).as(c)
        }
      }.toSeq: _*)
  }

  /** Snapshot reconciliation: classify every key of two same-schema
    * snapshots as `added` (only in `b`), `removed` (only in `a`) or
    * `changed` (present in both, any non-key column differs — NULL-safe
    * comparison). Unchanged keys are dropped (the interesting output of
    * a reconciliation is the diff, and at 100 TB the `same` class is
    * ~everything). One full-outer equi-shuffle, no sort.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff: need at least one key column")
    require(a.columns.toSeq == b.columns.toSeq,
      s"snapshotDiff: schemas differ: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val attrs = a.columns.filterNot(keys.contains).toSeq
    val aa = a.withColumn("__ina", lit(true)).as("a")
    val bb = b.withColumn("__inb", lit(true)).as("b")
    val cond = keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
    val differs = attrs.map(c => !(col(s"a.$c") <=> col(s"b.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    aa.join(bb, cond, "full_outer")
      .withColumn("status",
        when(col("__ina").isNull, lit("added"))
          .when(col("__inb").isNull, lit("removed"))
          .when(differs, lit("changed")))
      .filter(col("status").isNotNull)
      .select(keys.map(k => coalesce(col(s"a.$k"), col(s"b.$k")).as(k))
        :+ col("status"): _*)
  }
}
