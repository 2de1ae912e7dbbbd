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
}
