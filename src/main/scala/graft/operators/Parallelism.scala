package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-bound narrow pipelines.
  *
  * A scan of a few small files (or one fat row group) yields fewer input
  * partitions than cores, and a narrow pipeline (hashing, shingling,
  * vector math) then runs effectively single-threaded — Spark never
  * re-splits a stage that has no shuffle. `ensure` round-robins rows to
  * `min` partitions only when the plan has fewer, so at real scale
  * (thousands of splits) it is a no-op and costs nothing; on small or
  * badly-laid-out inputs it buys cores× throughput for one cheap
  * exchange of the raw rows.
  */
object Parallelism {
  /** Estimated scan partition count for file-backed frames, without
    * physical-planning the query (`df.rdd` would plan it per call).
    * The raw file count over-estimates when many small files pack into
    * few partitions (maxPartitionBytes bin-packing), so the estimate is
    * bounded by total bytes the same way Spark's FilePartition packing
    * is: ceil((Σ len + openCost·files) / maxPartitionBytes), capped at
    * the file count. Spark's actual maxSplitBytes is ≤ maxPartitionBytes
    * (it shrinks when bytes/defaultParallelism is smaller), so this
    * estimate can only be ≤ the real partition count when files are
    * splittable — i.e. it errs toward repartitioning, the safe
    * direction for a parallelism floor. */
  private def estimateScanPartitions(df: DataFrame, files: Array[String],
      enough: Int): Int = {
    val spark = df.sparkSession
    def bytesConf(k: String, dflt: String): Long =
      JavaUtils.byteStringAsBytes(spark.conf.get(k, dflt))
    val maxPartitionBytes = bytesConf("spark.sql.files.maxPartitionBytes", "128m")
    val openCost = bytesConf("spark.sql.files.openCostInBytes", "4m")
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    // the only question ensure() asks is "estimate >= enough?" — stop
    // stat-ing files as soon as the running byte total answers it. The
    // file stats are one driver RPC each; on an object store with
    // thousands of files (exactly where ensure is a no-op) the full
    // sequential sweep was the expensive way to decide to do nothing.
    val enoughBytes = enough.toLong * maxPartitionBytes
    var totalBytes = 0L
    val it = files.iterator
    while (it.hasNext && totalBytes < enoughBytes) {
      val p = new Path(it.next())
      // FileSystem instances are cached per scheme+authority by Hadoop
      totalBytes += p.getFileSystem(hadoopConf).getFileStatus(p).getLen + openCost
    }
    val byBytes = (totalBytes + maxPartitionBytes - 1) / maxPartitionBytes
    math.max(1L, math.min(files.length.toLong, byBytes)).toInt
  }

  def ensure(df: DataFrame, min: Int): DataFrame = {
    // streaming frames: parallelism is the source's per-micro-batch
    // concern (and .rdd/.inputFiles are illegal on a stream) — pass
    // through so narrow kernels compose onto readStream pipelines
    if (df.isStreaming) return df
    val files = df.inputFiles
    // estimate <= files.length always, so fewer files than `min` means
    // repartition without a single file stat
    val parts =
      if (files.nonEmpty)
        if (files.length < min) files.length
        else estimateScanPartitions(df, files, min)
      // non-file frames (tests, in-memory relations): RDD partition count
      else df.rdd.getNumPartitions
    if (parts >= min) df else df.repartition(min)
  }

  def ensureDefault(df: DataFrame): DataFrame =
    ensure(df, df.sparkSession.sparkContext.defaultParallelism)
}
