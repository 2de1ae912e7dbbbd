package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingSpec extends GraftSpec {

  test("streaming windowed counts equal the batch result") {
    val batchEvents = Tables.events(spark, sf)
    // stage the (ns-normalized) events as a stream source directory
    val dir = Files.createTempDirectory("graft_stream").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    val stream = StreamingOps.fileStream(spark, dir, schema, maxFilesPerTrigger = 2)
    val q = StreamingOps.windowedCounts(stream, "1 hour", watermark = Some("2 hours"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_counts").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_counts")
        .select("window_start", "event_type", "n")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = StreamingOps.windowedCounts(spark.read.parquet(dir), "1 hour")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming session windows equal the batch session_window result") {
    val batchEvents = Tables.events(spark, sf)
    val dir = Files.createTempDirectory("graft_stream_sess").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("tss", timestamp_seconds(col("ts").cast("long")))
      .groupBy(col("user_id"), session_window(col("tss"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("s"),
        col("session_window.end").cast("long").as("e"), col("n"))

    val q = sessions(StreamingOps.fileStream(spark, dir, schema, maxFilesPerTrigger = 2))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_win").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess_win")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = sessions(spark.read.parquet(dir))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming metric aggregation (MeanAggregator) equals the batch value") {
    // the reference's metrics are streaming accumulate+merge
    // (metrics/mean.py) — the same typed Aggregator runs unchanged on a
    // micro-batched stream with complete output
    val dir = Files.createTempDirectory("graft_stream_metric").toString
    val batch = Tables.events(spark, sf).select("value", "user_id")
    batch.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val agg = udaf(new graft.functions.Metrics.MeanAggregator)
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir)
      .agg(agg(col("value"), lit(1.0)).as("mean"))
      .writeStream.outputMode("complete").format("memory").queryName("stream_mean").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_mean").collect().head.getDouble(0)
      val batched = batch.agg(agg(col("value"), lit(1.0))).collect().head.getDouble(0)
      assert(math.abs(streamed - batched) < 1e-9, s"stream=$streamed batch=$batched")
    } finally q.stop()
  }

  test("stream-static enrichment join equals the batch lookup join") {
    val dir = Files.createTempDirectory("graft_stream_enrich").toString
    val facts = Tables.events(spark, sf).select("event_id", "user_id")
    facts.repartition(2).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val dim = Tables.embeddings(spark, sf)
    val q = StreamingOps.enrich(
      StreamingOps.fileStream(spark, dir, schema), dim, "user_id", "vec_id", Seq("label"))
      .writeStream.outputMode("append").format("memory").queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_out")
      val batch = graft.operators.EmbeddingLookup.lookup(
        facts, "user_id", dim, "vec_id", Seq("label"))
        .select("event_id", "user_id", "label")
      assert(streamed.count() === batch.count())
      assert(streamed.select("event_id", "user_id", "label").exceptAll(batch).count() === 0)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch inequality join") {
    val ev = Tables.events(spark, sf)
    val vDir = Files.createTempDirectory("graft_ssj_v").toString
    val pDir = Files.createTempDirectory("graft_ssj_p").toString
    ev.filter(col("event_type") === "view")
      .select("event_id", "user_id", "ts").repartition(2)
      .write.mode("overwrite").parquet(vDir)
    ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts").repartition(2)
      .write.mode("overwrite").parquet(pDir)
    val vSchema = spark.read.parquet(vDir).schema
    val pSchema = spark.read.parquet(pDir).schema
    val q = StreamingOps.intervalJoin(
        StreamingOps.fileStream(spark, vDir, vSchema),
        StreamingOps.fileStream(spark, pDir, pSchema),
        "user_id", "4 hours", "35 days")
      .select(col("l.event_id"), col("r.event_id"))
      .writeStream.outputMode("append").format("memory").queryName("ssj").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssj")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val v = spark.read.parquet(vDir).alias("l")
      val p = spark.read.parquet(pDir).alias("r")
      val batch = v.join(p,
          col("l.user_id") === col("r.user_id") &&
            col("r.ts") >= col("l.ts") &&
            col("r.ts") <= col("l.ts") + expr("INTERVAL 4 hours"))
        .select(col("l.event_id"), col("r.event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("CDC upsert apply: later micro-batch overrides earlier snapshot values") {
    import spark.implicits._
    // batch 0: keys 1,2; batch 1: key 2 updated + key 3 inserted. Files
    // get staggered mtimes so the file source delivers them in order.
    val dir = Files.createTempDirectory("graft_cdc").toString
    def stage(rows: Seq[(Long, Long, String)], name: String, age: Long): Unit = {
      val tmp = dir + "_" + name
      rows.toDF("k", "ord", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val src = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, name + ".parquet")
      dst.getParentFile.mkdirs()
      Files.move(src.toPath, dst.toPath)
      dst.setLastModified(System.currentTimeMillis() - age)
    }
    stage(Seq((1L, 10L, "a0"), (2L, 11L, "b0"), (2L, 12L, "b1")), "b0", 120000L)
    stage(Seq((2L, 20L, "b2"), (3L, 21L, "c0")), "b1", 60000L)
    val schema = spark.read.parquet(dir).schema
    val snap = Files.createTempDirectory("graft_cdc_snap").toString
    val q = StreamingOps.upsertApply(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir),
        snap, Seq("k"), "ord")
      .option("checkpointLocation", snap + "_ck")
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val got = StreamingOps.latestSnapshot(spark, snap).get
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // key 1 from batch 0; key 2's batch-0 latest (b1) overridden by batch
    // 1's b2; key 3 inserted in batch 1
    assert(got === Set((1L, 10L, "a0"), (2L, 20L, "b2"), (3L, 21L, "c0")))
  }

  test("latestSnapshot skips uncommitted versions and honors the replay bound") {
    import spark.implicits._
    val snap = Files.createTempDirectory("graft_snap_guard").toString
    Seq((1L, "a")).toDF("k", "x").write.parquet(snap + "/v0")
    // a partial overwrite from a crashed batch: directory exists, no
    // _SUCCESS commit marker — must never be resolved as state
    new java.io.File(snap + "/v1").mkdirs()
    val got = StreamingOps.latestSnapshot(spark, snap).get
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "a")))
    // replay guard: batch 0 re-running must not see v0 (its own output)
    assert(StreamingOps.latestSnapshot(spark, snap, below = Some(0L)).isEmpty)
    // and a missing snapshot dir is None, not an exception
    assert(StreamingOps.latestSnapshot(spark, snap + "_nope").isEmpty)
  }

  test("stateful streaming dedup emits each key exactly once") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dedup").toString
    // two files with overlapping ids -> separate micro-batches
    Seq(1L, 2L, 3L).toDF("id").write.parquet(s"$dir/f1")
    Seq(2L, 3L, 4L).toDF("id").write.parquet(s"$dir/f2")
    val schema = spark.read.parquet(s"$dir/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val q = StreamingOps.statefulDedup(spark, stream.as[Long])
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_out").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("watermark dedup suppresses duplicates across the batch boundary, state is bounded") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_wmdedup").toString
    // duplicate keys split ACROSS the two micro-batches: suppression
    // must come from the state store, not intra-batch dedup
    Seq((10L, "2024-01-01 00:00:01"), (20L, "2024-01-01 00:00:02"))
      .toDF("user_id", "tss").withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      .write.parquet(s"$dir/f1")
    Seq((10L, "2024-01-01 00:10:00"), (30L, "2024-01-01 00:10:01"))
      .toDF("user_id", "tss").withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      .write.parquet(s"$dir/f2")
    val schema = spark.read.parquet(s"$dir/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val q = StreamingOps.watermarkDedup(stream, Seq("user_id"), "1 hour")
      .select("user_id")
      .writeStream.outputMode("append").format("memory").queryName("wmdedup_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("wmdedup_out").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(10L, 20L, 30L))
    } finally q.stop()
  }

  test("streaming LSH dedup equals the batch precedence semantics across batches") {
    import graft.operators.NearDup
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // two ordered files, ordered mtimes: arrival order == doc_id order
    val dir = Files.createTempDirectory("graft_stream_lsh").toString
    def stage(part: org.apache.spark.sql.DataFrame, name: String, age: Long): Unit = {
      val tmp = dir + "_" + name
      part.coalesce(1).write.mode("overwrite").parquet(tmp)
      val src = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, name + ".parquet")
      java.nio.file.Files.move(src.toPath, dst.toPath)
      dst.setLastModified(System.currentTimeMillis() - age)
    }
    stage(docs.where(col("doc_id") < 250), "b0", 120000L)
    stage(docs.where(col("doc_id") >= 250), "b1", 60000L)
    val schema = spark.read.parquet(dir).schema
    val q = StreamingOps.lshStreamClaims(spark,
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir))
      .toDF("doc_id", "preceded")
      .writeStream.outputMode("append").format("memory").queryName("lsh_claims").start()
    val kept =
      try {
        q.processAllAvailable()
        StreamingOps.lshStreamSurvivors(spark.table("lsh_claims"))
          .collect().map(_.getLong(0)).toSet
      } finally q.stop()

    // batch mirror: doc kept iff no smaller doc_id shares any band bucket
    val bt = NearDup.bandTuples(
      NearDup.minHashSignatures(docs, col("doc_id"), col("text"), 3, 16), 4, 4)
    val preceded = bt.as("a").join(bt.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("b.doc_id") < col("a.doc_id"))
      .select(col("a.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val expected = NearDup.minHashSignatures(docs, col("doc_id"), col("text"), 3, 16)
      .select("doc_id").collect().map(_.getLong(0)).toSet -- preceded
    assert(kept === expected)
    assert(kept.nonEmpty && preceded.nonEmpty) // both classes exercised
  }
}
