package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Columnar sinks — the reference writes Parquet with pyarrow
  * (SNAPPY/ZSTD, dictionary encoding; reference:
  * docs/tutorial/ranking/taobao/data/prep_2_bahavior.py:54-59). Spark's
  * writers cover the same surface; this wrapper pins the options. */
object TabularWriter {

  def toParquet(df: DataFrame, path: String,
      compression: String = "snappy", overwrite: Boolean = true): Unit =
    df.write
      .mode(if (overwrite) "overwrite" else "errorifexists")
      .option("compression", compression)
      .parquet(path)

  def toOrc(df: DataFrame, path: String,
      compression: String = "snappy", overwrite: Boolean = true): Unit =
    df.write
      .mode(if (overwrite) "overwrite" else "errorifexists")
      .option("compression", compression)
      .orc(path)

  /** Hive-layout partitioned write: one directory tree level per
    * partition column, so downstream reads with partition-key
    * predicates plan `PartitionFilters` and never open non-matching
    * files (asserted in PruningSpec). */
  def toPartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      compression: String = "snappy"): Unit =
    df.write.mode("overwrite")
      .option("compression", compression)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Co-located bucketed layout: hash-bucket the rows on `key` into
    * `buckets` files per partition at WRITE time and register the
    * result as a catalog table. Every later per-`key` aggregate or
    * `key`-equi-join over the table plans WITHOUT an exchange — the
    * write IS the shuffle, paid once (PERF.md round-8: the x200
    * per-order rollup drops 11.7→3.8 s, full q18 10.2→4.1 s — 2×
    * faster than DuckDB — q21 9.3→6.1 s, q5 8.7→5.7 s). Carry only the
    * columns the query class needs: bucketed-scan cost is linear in
    * stored width. Reference analog: the id-partitioned embedding
    * layout (embedding/sharding.py:168-205) — reduction happens where
    * the key lives, not where the row was read. */
  def toBucketedTable(df: DataFrame, table: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    require(buckets > 0, s"toBucketedTable: buckets must be positive, got $buckets")
    // sorted layout: pre-repartition on the key into exactly `buckets`
    // partitions (the writer-side murmur3 mapping is identical to the
    // bucket-id function), so every bucket lands as ONE sorted file.
    // Spark only trusts — and only REPORTS — a bucketed table's sort
    // order when each bucket is a single file; with that proven, a
    // per-key aggregate can plan as a streaming SortAggregate holding
    // one group's state at a time instead of a groups-sized hash table
    // (PERF.md round-9: the x200 per-order rollup drops 2.4→1.6 s on
    // the identical layout; requires the two confs GraftSession sets —
    // legacy.bucketedTableScan.outputOrdering + replaceHashWithSortAgg).
    // Scan parallelism is unchanged (bucketed scans are one task per
    // bucket regardless of file count); size `buckets` so one bucket's
    // rows fit a task, exactly like the reference's id-partitioned
    // embedding shards (embedding/sharding.py:168-205).
    import org.apache.spark.sql.functions.col
    val src = if (sorted) df.repartition(buckets, col(key)) else df
    val w = src.write.mode("overwrite").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Sort-clustered layout: range-partition the rows on `sortCols` and
    * sort within each output file, so every file (and every row group
    * inside it) covers a DISJOINT key range. Parquet footers then carry
    * tight min/max stats and a range predicate prunes whole files/row
    * groups at scan time — the sorted-layout analogue of hive
    * partitioning for high-cardinality or continuous keys, where a
    * directory per value is infeasible. PruningSpec proves the
    * disjointness from the written footers. */
  def toRangeSorted(df: DataFrame, path: String, sortCols: Seq[String],
      numFiles: Int, compression: String = "snappy"): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").option("compression", compression).parquet(path)
  }

  /** Z-ordered (Morton-curve) two-dimensional layout: sort the data by
    * the bit-interleave of two keys before writing, so each output
    * file's footer stats carry a NARROW [min, max] on BOTH keys and a
    * box predicate on either (or both) prunes whole files/row-groups.
    * The single-key answer ([[toRangeSorted]]) clusters one dimension
    * perfectly and leaves the other unclustered; z-order trades a
    * little of each for pruning power on both — the standard lakehouse
    * layout move for two-key workloads. The z column is dropped before
    * the write: the layout is carried by row ORDER + footer stats, the
    * schema is unchanged. */
  def toZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      numFiles: Int, compression: String = "snappy"): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, max, min}
    // normalize both keys to equal-width 15-bit buckets first: raw
    // interleave of unequal domains degenerates to a single-key sort
    // (the wider key owns every leading bit). Equi-width is the shared
    // Buckets.rangeBucket; the min/max pass is one narrow map-side agg
    // broadcast as a one-row frame, keeping the plan fully lazy.
    val bits = 15
    // FINITE domain stats (Buckets.finiteOrNull): one NaN/Inf row would
    // otherwise poison hi/lo, flatten that axis to a single bucket and
    // silently destroy the clustering (files stop carrying narrow
    // min/max, box predicates stop pruning)
    def fin(c: String) = graft.operators.Buckets.finiteOrNull(col(c).cast("double"))
    val stats = df.agg(
      min(fin(xCol)).as("__xlo"), max(fin(xCol)).as("__xhi"),
      min(fin(yCol)).as("__ylo"), max(fin(yCol)).as("__yhi"))
    val bx = graft.operators.Buckets.rangeBucket(
      col(xCol).cast("double"), col("__xlo"), col("__xhi"), 1 << bits)
    val by = graft.operators.Buckets.rangeBucket(
      col(yCol).cast("double"), col("__ylo"), col("__yhi"), 1 << bits)
    df.crossJoin(broadcast(stats))
      .withColumn("__z", graft.functions.expressions.GraftExpressions
        .z_order(bx.cast("long"), by.cast("long")))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__xlo", "__xhi", "__ylo", "__yhi")
      .write.mode("overwrite").option("compression", compression).parquet(path)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files. The chronic 100 TB operational problem
    * — streaming ingest and fine-grained partitioning produce file
    * counts that swamp scan planning (one task + one open per tiny
    * file); compaction restores the scan-side economics. File count =
    * ceil(current bytes / target) from the source's actual on-disk
    * size. `shuffle=false` (default) coalesces — a narrow rewrite that
    * never moves rows between executors but inherits any source skew;
    * `shuffle=true` round-robins for even output sizes at the cost of
    * one exchange. */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
      targetBytes: Long = 128L * 1024 * 1024, shuffle: Boolean = false,
      compression: String = "snappy"): Unit = {
    val fs = new Path(srcDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify src so the ancestor walk below can actually STOP at it:
    // listFiles returns fully-qualified paths, and an unqualified src
    // never equals them — the walk would run to the filesystem root and
    // a '_'/'.'-named ancestor (a staging dir, a CI workdir) would mark
    // EVERY file invisible, silently coalescing the dataset to one file
    val src = fs.makeQualified(new Path(srcDir))
    // RECURSIVE listing: partitioned trees keep their data files in
    // subdirectories — a top-level listing would see only directories,
    // compute bytes=0 and collapse the whole dataset into one file.
    // Mirror the scan's visibility rules on EVERY path component below
    // src (not just the basename): files under _temporary/.hidden trees
    // (stale failed-write leftovers) are invisible to spark.read, so
    // counting them would size the rewrite from phantom data.
    def visible(p: Path): Boolean = {
      var cur = p
      while (cur != null && cur != src) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return false
        cur = cur.getParent
      }
      true
    }
    var bytes = 0L
    val it = fs.listFiles(src, true)
    while (it.hasNext) {
      val st = it.next()
      if (visible(st.getPath)) bytes += st.getLen
    }
    val files = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
    val df = spark.read.parquet(srcDir)
    // coalesce can only REDUCE partition count; when the target exceeds
    // what the scan yields (few huge input files), fall through to a
    // repartition or the "~targetBytes-sized" contract silently becomes
    // "scan-partition-sized". getNumPartitions costs a listing, no job.
    val scanParts = df.rdd.getNumPartitions
    val sized =
      if (shuffle || files > scanParts) df.repartition(files)
      else df.coalesce(files)
    toParquet(sized, dstDir, compression)
  }
}
