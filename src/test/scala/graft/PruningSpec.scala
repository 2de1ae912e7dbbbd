package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partition pruning: hive-partitioned layout + filters prune entire
  * directories at planning time (the engine-level answer to the
  * reference's row-group partition pruning, SURVEY §4 — Spark's is
  * richer: predicate-driven, not just index-range). */
class PruningSpec extends GraftSpec {

  test("partitioned layout prunes non-matching partitions at plan time") {
    val dir = Files.createTempDirectory("graft_parted").toString + "/events_by_type"
    Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "error")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"))
    // only the matching partition's rows are read
    assert(q.count() === Tables.events(spark, sf)
      .filter(col("event_type") === "error").count())
    val scanned = q.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(scanned.forall(_.contains("event_type=error")),
      s"scanned files outside the pruned partition: $scanned")
  }

  test("range-sorted layout writes files with disjoint key ranges (footer proof)") {
    import graft.sources.TabularWriter
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft_rangesort").toString + "/ev"
    TabularWriter.toRangeSorted(
      Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("value")),
      dir, Seq("user_id"), numFiles = 6)
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1, "need multiple files to prove disjointness")
    // every row group of every file carries user_id min/max stats; the
    // per-file [min, max] intervals must be pairwise disjoint — the
    // property that lets a range predicate prune whole files
    val ranges = files.map { f =>
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.getPath), conf))
      try {
        val idx = rd.getFooter.getFileMetaData.getSchema.getFieldIndex("user_id")
        val stats = rd.getFooter.getBlocks.asScala.map(_.getColumns.get(idx).getStatistics)
        assert(stats.forall(s => s != null && !s.isEmpty), s"${f.getName}: missing stats")
        (stats.map(_.genericGetMin.asInstanceOf[Long]).min,
          stats.map(_.genericGetMax.asInstanceOf[Long]).max)
      } finally rd.close()
    }.sortBy(_._1)
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"overlapping file key ranges: hi=$hi lo2=$lo2")
    }
    // and the scan still pushes the range predicate down
    val plan = spark.read.parquet(dir).where(col("user_id") >= 40 && col("user_id") < 80)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(user_id,40)"))
  }

  test("z-ordered layout clusters BOTH keys (footer bounding-box proof)") {
    import graft.sources.TabularWriter
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft_zorder").toString + "/li"
    val src = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    TabularWriter.toZOrdered(src, dir, "l_partkey", "l_suppkey", numFiles = 16)
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length > 8, "need many files to measure clustering")
    def minMax(f: java.io.File, column: String): (Long, Long) = {
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.getPath), conf))
      try {
        val idx = rd.getFooter.getFileMetaData.getSchema.getFieldIndex(column)
        val stats = rd.getFooter.getBlocks.asScala.map(_.getColumns.get(idx).getStatistics)
        (stats.map(_.genericGetMin.toString.toLong).min,
          stats.map(_.genericGetMax.toString.toLong).max)
      } finally rd.close()
    }
    // every file's footer bounding box must be narrow in BOTH
    // dimensions — the property no single-key sort can deliver (a
    // partkey sort leaves each file spanning ~the full suppkey domain).
    // 16 z-range files quarter each normalized dimension; boundary
    // files can straddle a split, so assert the MEAN width, at double a
    // perfect quarter to absorb stragglers.
    def meanWidthFrac(column: String): Double = {
      val boxes = files.map(minMax(_, column))
      val lo = boxes.map(_._1).min
      val hi = boxes.map(_._2).max
      boxes.map(b => (b._2 - b._1).toDouble / (hi - lo)).sum / boxes.length
    }
    val pw = meanWidthFrac("l_partkey")
    val sw = meanWidthFrac("l_suppkey")
    assert(pw <= 0.5, s"l_partkey mean file width $pw — not clustered")
    assert(sw <= 0.5, s"l_suppkey mean file width $sw — not clustered")
    // and the box predicate reaches the scan on both keys (the default
    // metadata string length elides the second pushed filter)
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    try {
      spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
      val plan = spark.read.parquet(dir)
        .where(col("l_partkey").between(100, 300) && col("l_suppkey").between(20, 60))
        .queryExecution.executedPlan.toString
      assert(plan.contains("GreaterThanOrEqual(l_partkey,100)"), plan)
      assert(plan.contains("GreaterThanOrEqual(l_suppkey,20)"), plan)
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", prev)
  }

  test("compaction rewrites to the computed file count with identical rows") {
    import graft.sources.TabularWriter
    val root = Files.createTempDirectory("graft_compact").toString
    val scattered = root + "/scattered"
    val compacted = root + "/compacted"
    val src = Tables.events(spark, sf).select("event_id", "user_id", "value")
    src.repartition(48).write.parquet(scattered)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(scattered) === 48)
    val target = 4L * 1024 * 1024
    TabularWriter.compact(spark, scattered, compacted, targetBytes = target)
    val bytes = new java.io.File(scattered).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val expected = math.max(1, ((bytes + target - 1) / target).toInt)
    assert(parquetFiles(compacted) === expected)
    val back = spark.read.parquet(compacted)
    assert(back.exceptAll(src).count() === 0 && src.exceptAll(back).count() === 0)
  }

  test("compaction sizes from a recursive listing (partitioned tree) and can split up") {
    import graft.sources.TabularWriter
    val root = Files.createTempDirectory("graft_compact2").toString
    val parted = root + "/parted"
    val out = root + "/out"
    val src = Tables.events(spark, sf).select("event_id", "user_id", "value", "event_type")
    TabularWriter.toPartitioned(src, parted, Seq("event_type"))
    def bytesUnder(p: java.io.File): Long =
      if (p.isFile) { if (p.getName.endsWith(".parquet")) p.length() else 0L }
      else p.listFiles().map(bytesUnder).sum
    val bytes = bytesUnder(new java.io.File(parted))
    assert(bytes > 0)
    // tiny target forces MORE output files than the scan's partitions —
    // the repartition fallback must engage (coalesce can't split)
    val target = math.max(1L, bytes / 12)
    TabularWriter.compact(spark, parted, out, targetBytes = target)
    val expected = ((bytes + target - 1) / target).toInt
    val gotFiles = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(gotFiles === expected, s"bytes=$bytes target=$target")
    val back = spark.read.parquet(out).select("event_id", "user_id", "value", "event_type")
    assert(back.exceptAll(src).count() === 0 && src.exceptAll(back).count() === 0)
  }

  test("compaction under a '_'-named ancestor still sizes from real bytes") {
    import graft.sources.TabularWriter
    // the source itself lives below a hidden-prefixed directory — the
    // visibility walk must stop AT src (qualified), not classify every
    // file invisible and silently coalesce the dataset into one file
    val root = Files.createTempDirectory("graft_compact3").toString
    val scattered = root + "/_staging/events"
    val out = root + "/out"
    val src = Tables.events(spark, sf).select("event_id", "user_id", "value")
    src.repartition(8).write.parquet(scattered)
    val bytes = new java.io.File(scattered).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val target = math.max(1L, bytes / 6)
    TabularWriter.compact(spark, scattered, out, targetBytes = target)
    val expected = ((bytes + target - 1) / target).toInt
    assert(expected > 1) // the bug produced exactly 1
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet")) === expected)
  }

  test("z-order survives a NaN row without flattening either axis") {
    import graft.sources.TabularWriter
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_z_nan").toString + "/t"
    val clean = (0L until 4000L).map(i => (i, (i * 37 % 1000).toDouble, (i * 91 % 1000).toDouble))
    val rows = clean :+ ((4000L, Double.NaN, 5.0))
    TabularWriter.toZOrdered(rows.toDF("id", "x", "y"), dir, "x", "y", numFiles = 8)
    // finite-domain stats: per-file x ranges must stay narrow (the NaN
    // bug collapsed x to one bucket => every file spanned the full range)
    val widths = spark.read.parquet(dir)
      .where(!isnan(col("x"))) // the NaN row itself sits in the top bucket
      .groupBy(input_file_name()).agg(
        ((max(col("x")) - min(col("x"))) / 1000.0).as("w"))
      .collect().map(_.getDouble(1))
    assert(widths.sum / widths.length <= 0.7,
      s"mean x file width ${widths.sum / widths.length} — axis flattened")
  }

  test("multi-probe ANN recall dominates single-probe") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(graft.operators.Ann.bruteForceTopK(queries, emb, 5))
    val single = pairs(graft.operators.Ann.bucketedTopK(queries, emb, 5, bits = 6))
    val multi = pairs(graft.operators.Ann.bucketedTopKMultiProbe(queries, emb, 5, bits = 6, probes = 3))
    val rSingle = brute.intersect(single).size.toDouble / brute.size
    val rMulti = brute.intersect(multi).size.toDouble / brute.size
    assert(rMulti >= rSingle, s"multi-probe recall $rMulti < single $rSingle")
  }
}
