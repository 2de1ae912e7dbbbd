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
    // post-write assertion: the streaming-plan property is PHYSICAL
    // (one file per bucket) and Spark degrades silently when it breaks
    // — the scan just stops reporting order and every reader falls back
    // to hash aggregation. Fail here, at the write, instead.
    if (sorted) assertOneFilePerBucket(df.sparkSession, table)
    // sidecar for attach(): bucket membership is physical — BOTH the
    // count and the KEY travel with the files (empty trailing buckets
    // write no file, so the file list alone cannot prove the staged
    // count; nothing in the files proves the hash key at all)
    writeBucketSidecar(df.sparkSession, table, buckets, key)
  }

  private[graft] val BucketSidecar = "_graft_buckets"

  private def writeBucketSidecar(spark: SparkSession, table: String,
      buckets: Int, key: String): Unit = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val loc = new Path(spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(loc, BucketSidecar), true)
    try out.write(s"$buckets $key".getBytes("UTF-8")) finally out.close()
  }

  /** Append rows to an existing bucketed table created by
    * [[toBucketedTable]], preserving the bucket spec (validated against
    * the catalog — a mismatched spec is rejected by Spark's writer
    * rather than silently corrupting the bucketing).
    *
    * WHAT SURVIVES an append: the co-location property. The bucket-id
    * function is deterministic (murmur3 pmod buckets), so appended rows
    * land in the same bucket as existing rows with the same key —
    * per-key aggregates and key-equi-joins still plan with ZERO
    * exchange.
    *
    * WHAT BREAKS: the streaming-sort property. Each bucket now holds
    * ≥2 files (sorted internally, but Spark only trusts — and only
    * reports — a bucketed scan's sort order when every bucket is ONE
    * file), so per-key aggregates fall back from the streaming
    * SortAggregate to an exchange-free HashAggregate, and co-located
    * joins re-sort at query time. Run [[compactBuckets]] after an
    * append batch (or on a cadence — the classic LSM-style tradeoff) to
    * restore the streaming plans; BucketingSpec pins both plan shapes.
    *
    * The appended frame is pre-repartitioned onto the bucket function,
    * so one append adds at most ONE new file per bucket — without it,
    * every writing task would emit a file into every bucket it holds
    * rows for and N appends × M tasks files would swamp the scan.
    * Reference analog: the reference re-shards the whole embedding
    * table on every variable rebuild (embedding/sharding.py:168-205) —
    * this is the same rewrite-vs-append tension, resolved as
    * cheap-append + explicit compaction instead of always-rewrite. */
  def appendToBucketedTable(df: DataFrame, table: String): Unit = {
    import org.apache.spark.sql.functions.col
    val spec = bucketSpecOf(df.sparkSession, table)
    val key = spec.bucketColumnNames.head
    val src = df.repartition(spec.numBuckets, col(key))
    val w = src.write.mode("append").bucketBy(spec.numBuckets, key)
    (if (spec.sortColumnNames.nonEmpty)
       w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
     else w).saveAsTable(table)
  }

  /** Rewrite a bucketed table so every bucket is again ONE sorted file,
    * restoring the streaming SortAggregate / no-query-time-sort plans
    * after [[appendToBucketedTable]] calls have accumulated files. The
    * rewrite is a single data pass with NO exchange on the read side
    * (the scan is already bucketed) and lands via a RENAME-ASIDE swap
    * (table → `__precompact`, compacted → table, drop aside): every
    * crash window keeps BOTH copies on disk — the worst outcome is a
    * missing table name, recoverable by renaming the aside copy back —
    * unlike a drop-then-rename, whose managed-table DROP would delete
    * the only committed copy before the rename ran.
    * Cost model at 100 TB: one sequential rewrite of the table — the
    * same price as the original layout write — amortized over every
    * append since the last compaction (LSM economics). */
  def compactBuckets(spark: SparkSession, table: String): Unit = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val spec = bucketSpecOf(spark, table)
    val key = spec.bucketColumnNames.head
    val tmp = table + "__compacting"
    // clear BOTH the catalog entry and any stale on-disk location a
    // crashed previous compaction left behind (the warehouse dir
    // outlives the catalog; CREATE fails on a dead location otherwise)
    spark.sql(s"DROP TABLE IF EXISTS `$tmp`")
    val tmpLoc = new Path(spark.sessionState.catalog
      .defaultTablePath(TableIdentifier(tmp)))
    val fs = tmpLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tmpLoc)) fs.delete(tmpLoc, true)
    // Force the BUCKETED scan for the rewrite. A V1 write declares no
    // distribution requirement, so DisableUnnecessaryBucketedScan would
    // plan a per-FILE scan — while the repartition inside
    // toBucketedTable is simultaneously elided because the logical
    // relation reports the matching hash partitioning — and each
    // file-task would write its own per-bucket file: the compaction
    // would REPRODUCE the multi-file state it exists to fix (observed,
    // not hypothetical). With the bucketed scan pinned on, the plan is
    // one task per bucket merging that bucket's files: a single pass,
    // ZERO exchange — compaction costs IO, not a shuffle.
    val auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(auto)
    spark.conf.set(auto, "false")
    try toBucketedTable(spark.table(table), tmp, key, spec.numBuckets, sorted = true)
    finally spark.conf.set(auto, prev)
    // swap via rename-aside, NOT drop-then-rename: a managed-table DROP
    // deletes its data, so a crash between DROP and RENAME would leave
    // the compacted copy as the ONLY copy under the wrong name. With
    // rename-aside every crash window keeps BOTH copies on disk — the
    // worst outcome is a missing table name recoverable by renaming
    // `table__precompact` (or `table__compacting`) back.
    // RECOVERY RUNBOOK (a crash between the two renames leaves no table
    // under `table`, but BOTH copies on disk): `ALTER TABLE
    // `<table>__precompact` RENAME TO `<table>`` restores the
    // pre-compaction original; the compacted copy under
    // `<table>__compacting` can then be dropped or swapped in manually.
    // BucketingSpec drives exactly this crash (via compactCrashHook)
    // and proves the recovery.
    val old = table + "__precompact"
    spark.sql(s"DROP TABLE IF EXISTS `$old`")
    val oldLoc = new Path(spark.sessionState.catalog
      .defaultTablePath(TableIdentifier(old)))
    if (fs.exists(oldLoc)) fs.delete(oldLoc, true)
    spark.sql(s"ALTER TABLE `$table` RENAME TO `$old`")
    compactCrashHook()
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
    spark.sql(s"DROP TABLE `$old`")
  }

  /** Test-only injection point: invoked between [[compactBuckets]]'s
    * two renames — the widest crash window the swap has. Production
    * no-op. */
  private[graft] var compactCrashHook: () => Unit = () => ()

  /** Register ALREADY-STAGED bucketed data (written by a previous
    * session's [[toBucketedTable]]) as an EXTERNAL catalog table — no
    * data rewrite, one DDL statement. Spark's local catalog is
    * in-memory, so a fresh JVM forgets every staged layout while the
    * warehouse files live on; at cluster scale a persistent metastore
    * holds this mapping, and `attach` is its local-mode stand-in. The
    * bucket-file naming is the writer's own, so the re-registered scan
    * keeps the full co-location (and, via [[assertOneFilePerBucket]],
    * streaming-sort) properties. Schema is read from the parquet
    * footers. */
  def attach(spark: SparkSession, table: String, path: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    // validate the DECLARED bucket count against the files' own bucket
    // ids BEFORE registering: Spark trusts the declared spec, so
    // attaching 32-bucket files as a 16-bucket table would make every
    // co-located join/aggregate skip its exchange over rows that are
    // NOT where the spec claims — silently wrong results, not an error
    // (concrete trigger: re-deriving advice under a different
    // parallelism floor and attaching the old files with the new count)
    val loc = new Path(path)
    val pfs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucketId = "_(\\d{5})\\.".r
    val ids = pfs.listStatus(loc).map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .flatMap(n => bucketId.findFirstMatchIn(n).map(_.group(1).toInt))
    require(ids.nonEmpty,
      s"attach($table): no bucketed data files under $path")
    require(ids.max < buckets,
      s"attach($table): declared $buckets buckets but files carry bucket id " +
        s"${ids.max} — the location was staged with a different bucket count; " +
        "attach with the ORIGINAL count (bucket membership is physical)")
    // the writer's sidecar proves the exact staged count AND key (file
    // ids alone cannot: empty trailing buckets write no file, so an
    // OVER-declared count could slip through — and NOTHING in the files
    // records which column they were hashed on, so a wrong declared key
    // would be pure silent corruption)
    val sidecar = new Path(loc, BucketSidecar)
    if (pfs.exists(sidecar)) {
      val in = pfs.open(sidecar)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim finally in.close()
      val tokens = raw.split("\\s+")
      // a truncated/corrupt sidecar gets the same explanatory failure
      // as every other attach diagnostic, not a bare NumberFormatException
      // (`"".split` yields Array(""), so head exists but is not a count)
      require(tokens.head.nonEmpty && tokens.head.forall(_.isDigit),
        s"attach($table): sidecar $sidecar is corrupt — expected " +
          s"`<bucketCount> <key>`, found `$raw`; re-stage the layout " +
          "(toBucketedTable rewrites the sidecar)")
      val staged = tokens.head.toInt
      require(staged == buckets,
        s"attach($table): declared $buckets buckets but $path was staged " +
          s"with $staged (sidecar $BucketSidecar) — attach with the staged count")
      if (tokens.length > 1) require(tokens(1).equalsIgnoreCase(key),
        s"attach($table): declared bucket key `$key` but $path was staged " +
          s"hashed on `${tokens(1)}` (sidecar $BucketSidecar) — bucket " +
          "membership is physical; attach with the staged key")
    }
    val schema = spark.read.parquet(path).schema.toDDL
    val sortClause = if (sorted) s"SORTED BY (`$key` ASC) " else ""
    spark.sql(
      s"CREATE TABLE `$table` ($schema) USING parquet " +
        s"CLUSTERED BY (`$key`) ${sortClause}INTO $buckets BUCKETS " +
        s"LOCATION '$path'")
    if (sorted) assertOneFilePerBucket(spark, table)
  }

  private def bucketSpecOf(spark: SparkSession, table: String) = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val meta = spark.sessionState.catalog.getTableMetadata(TableIdentifier(table))
    meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$table is not a bucketed table (use toBucketedTable to create one)"))
  }

  /** Asserts every bucket of `table` is one data file — the physical
    * precondition for the scan to report its per-bucket sort order.
    * One directory listing; bucket ids parsed from the writer's
    * `part-NNNNN-<uuid>_<bucketId>.c000…` naming. */
  private[graft] def assertOneFilePerBucket(spark: SparkSession, table: String): Unit = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val loc = new Path(spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucketId = "_(\\d{5})\\.".r
    val ids = fs.listStatus(loc).map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .flatMap(n => bucketId.findFirstMatchIn(n).map(_.group(1).toInt))
    val dup = ids.groupBy(identity).collect { case (id, fs) if fs.length > 1 => id }
    require(dup.isEmpty,
      s"toBucketedTable($table): bucket(s) ${dup.toSeq.sorted.mkString(",")} have " +
        "multiple files — the streaming sorted-scan plan needs ONE file per " +
        "bucket; appends accumulate files, run compactBuckets to restore it")
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
