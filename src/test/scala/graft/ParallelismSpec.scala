package graft

import graft.operators.Parallelism
import java.nio.file.Files

class ParallelismSpec extends GraftSpec {

  test("ensure repartitions a scan of many tiny files (byte-bound estimate, not file count)") {
    val dir = Files.createTempDirectory("graft_par_tiny").toString + "/t"
    import spark.implicits._
    // 40 files, a few rows each: file count (40) exceeds the floor but
    // Spark bin-packs them into ~1 partition — ensure must still widen
    (1L to 200L).toDF("k").repartition(40).write.parquet(dir)
    val scan = spark.read.parquet(dir)
    assert(scan.inputFiles.length >= 32)
    val widened = Parallelism.ensure(scan, 32)
    assert(widened.rdd.getNumPartitions === 32)
    assert(widened.count() === 200)
  }

  test("ensure is a no-op when the byte-bound estimate already meets the floor") {
    val dir = Files.createTempDirectory("graft_par_big").toString + "/t"
    import spark.implicits._
    (1L to 1000L).toDF("k").repartition(4).write.parquet(dir)
    val scan = spark.read.parquet(dir)
    // floor of 2 is met by 4 files regardless of packing: with
    // maxPartitionBytes shrunk below a file's size the estimate is exact
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
      val kept = Parallelism.ensure(scan, 2)
      // no repartition node: the plan is still the raw scan
      assert(kept.queryExecution.analyzed === scan.queryExecution.analyzed)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", old)
  }

  test("ensure falls back to RDD partitions for non-file frames") {
    import spark.implicits._
    val mem = (1 to 10).toDF("k").repartition(3)
    assert(Parallelism.ensure(mem, 2).rdd.getNumPartitions === 3)
    assert(Parallelism.ensure(mem, 8).rdd.getNumPartitions === 8)
  }
}
