package graft

import graft.functions.TextFunctions
import graft.operators.{Ann, Multimodal, NearDup}
import org.apache.spark.sql.functions._

class NearDupSpec extends GraftSpec {

  lazy val docs = Tables.documents(spark, sf)
  lazy val emb = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("polyHash matches hand-computed value") {
    import spark.implicits._
    val h = Seq("abc").toDF("s")
      .select(TextFunctions.polyHash(col("s"))).collect().head.getLong(0)
    assert(h === (((0L * 31 + 97) * 31 + 98) * 31 + 99) % TextFunctions.P)
  }

  test("shingles: 3-grams of a 5-token doc, empty below n tokens") {
    import spark.implicits._
    val out = Seq("a b c d e", "a b").toDF("t")
      .select(TextFunctions.shingles(TextFunctions.tokenize(col("t")), 3).as("sh"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(out === List(List("a b c", "b c d", "c d e"), Nil))
  }

  test("minhash LSH finds most exact-jaccard pairs (recall), no false survivors") {
    val exact = NearDup.jaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = NearDup.minHashNearDups(docs, col("doc_id"), col("text"), 3, 16, 4, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // verification step kills false positives
    assert(lsh.size >= (exact.size * 0.8).toInt, s"recall too low: ${lsh.size}/${exact.size}")
  }

  test("simhash: near-duplicate docs have close fingerprints") {
    val pairs = NearDup.jaccardPairs(docs, col("doc_id"), col("text"), 3, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty)
    val fp = NearDup.simHash(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hammings = pairs.map { case (a, b) =>
      java.lang.Long.bitCount(fp(a) ^ fp(b))
    }
    // >=0.9-jaccard docs should differ in only a few of 60 bits; expected
    // hamming scales with bit width (each varying bit flips independently
    // with the same small probability), so the old 30-effective-bit bound
    // of 6 becomes 12 at 60 bits
    assert(hammings.forall(_ <= 12), s"hamming distances: ${hammings.toList}")
  }

  test("bucketed ANN returns a subset-quality result vs brute force") {
    val queries = emb.filter(col("id") < 8)
    val brute = Ann.bruteForceTopK(queries, emb, 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Ann.bucketedTopK(queries, emb, 5, bits = 4)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // approximate: some overlap expected, never more rows per query than k
    assert(bucketed.nonEmpty)
    val recall = brute.intersect(bucketed).size.toDouble / brute.size
    assert(recall > 0.1, s"suspiciously low ANN recall: $recall")
  }

  test("zero-norm vectors (NaN cosine) never rank in top-k or pair as near-dups") {
    import graft.operators.Ann
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f)),
      (99L, Seq(0.0f, 0.0f))) // failed-encode sentinel: cosine = 0/0 = NaN
      .toDF("id", "vec")
    val top = Ann.bruteForceTopK(vecs.filter(col("id") === 1), vecs, k = 3)
      .collect().map(_.getLong(1)).toSet
    // without the NaN guard, Spark's NaN-is-greatest ordering put 99 at rn=1
    assert(!top.contains(99L))
    val pairs = Ann.cosineNearDups(vecs, threshold = 0.9, bits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists(p => p._1 == 99L || p._2 == 99L))
  }

  test("degenerate LSH banding is rejected, not silently quadratic") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    // bands > k floors rowsPerBand to 0 => one all-corpus bucket
    intercept[IllegalArgumentException] {
      NearDup.minHashNearDups(docs, col("doc_id"), col("text"), k = 3, bands = 4)
    }
    // k not a multiple of bands silently dropped signature components
    intercept[IllegalArgumentException] {
      NearDup.minHashNearDups(docs, col("doc_id"), col("text"), k = 16, bands = 3)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Ann.bucketedTopKMultiProbe(docs.select(col("doc_id").as("id"),
        array(lit(1.0f)).as("vec")), docs.select(col("doc_id").as("id"),
        array(lit(1.0f)).as("vec")), k = 1, bits = 4, probes = 8)
    }
  }

  test("hardNegatives returns only cross-label neighbors, ranked by cosine") {
    val embL = Tables.embeddings(spark, sf).select(col("vec_id").as("id"),
      col("embedding").as("vec"), col("label"))
    val out = Ann.hardNegatives(embL.filter(col("id") < 8), embL, k = 3, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.nonEmpty)
    val labels = embL.select("id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every mined negative has a different label than its query
    assert(out.forall { case (q, n, _, _) => labels(q) != labels(n) })
    // per-query ranks are 1..m with cosine non-increasing
    out.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      })
    }
  }

  test("multimodal: decodeStub via mapPartitions matches expression features") {
    val packed = Multimodal.packBinary(docs.limit(50), col("doc_id"), col("text"), "text/plain")
    val viaUdf = Multimodal.decodeFeatures(spark, packed, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val viaExpr = packed.select(col("media_id"),
      Multimodal.asciiFeatures(decode(col("bytes"), "UTF-8"), 8).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    viaExpr.foreach { case (id, f) =>
      val g = viaUdf(id)
      // expression path has no zero-padding for short docs; compare prefix
      f.zip(g).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
    }
  }

  test("multimodal: REAL png decode round-trips the generator's closed form") {
    import spark.implicits._
    val packed = spark.range(0, 20)
      .as[Long].mapPartitions(_.map(id => (id, Multimodal.synthImagePng(id))))
      .toDF("media_id", "bytes")
    val got = Multimodal.decodeImageStats(spark, packed)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    (0L until 20L).foreach { id =>
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until 8; x <- 0 until 8) {
        sr += (id * 7 + x * 3 + y * 5) % 256
        sg += (id * 11 + x) % 256
        sb += (id * 13 + y) % 256
      }
      assert(got(id) === ((8, 8, sr, sg, sb)), s"id=$id")
    }
  }

  test("multimodal: nearest-neighbor resize and WAV decode match closed forms") {
    import spark.implicits._
    val imgs = spark.range(0, 10)
      .as[Long].mapPartitions(_.map(id => (id, Multimodal.synthImagePng(id))))
      .toDF("media_id", "bytes")
    val resized = Multimodal.resizeImageStats(spark, imgs, 4, 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    (0L until 10L).foreach { id =>
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until 4; x <- 0 until 4) {
        sr += (id * 7 + 2 * x * 3 + 2 * y * 5) % 256
        sg += (id * 11 + 2 * x) % 256
        sb += (id * 13 + 2 * y) % 256
      }
      assert(resized(id) === ((sr, sg, sb)), s"id=$id")
    }
    val wavs = spark.range(0, 10)
      .as[Long].mapPartitions(_.map(id => (id, Multimodal.synthWav(id))))
      .toDF("media_id", "bytes")
    val audio = Multimodal.decodeAudioStats(spark, wavs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    (0L until 10L).foreach { id =>
      val vs = (0 until 256).map(i => ((id * 31 + i * 7) % 65536) - 32768)
      assert(audio(id) === ((256L, vs.sum, vs.map(math.abs).sum)), s"id=$id")
    }
    // junk bytes -> audio marker row
    val junk = Seq((9L, Array[Byte](9, 9, 9))).toDF("media_id", "bytes")
    assert(Multimodal.decodeAudioStats(spark, junk).collect().head.getLong(1) === -1L)
  }

  test("multimodal: GIF frame sampling reads every stride-th frame exactly") {
    import spark.implicits._
    val gifs = spark.range(0, 6)
      .as[Long].mapPartitions(_.map(id => (id, Multimodal.synthGif(id, frames = 6))))
      .toDF("media_id", "bytes")
    val got = Multimodal.sampleFrameStats(spark, gifs, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for (id <- 0L until 6L; f <- Seq(0L, 2L, 4L)) {
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until 8; x <- 0 until 8) {
        sr += (id * 7 + f * 17 + x * 3 + y * 5) % 256
        sg += (id * 11 + f * 19 + x) % 256
        sb += (id * 13 + f * 23 + y) % 256
      }
      assert(got((id, f)) === ((sr, sg, sb)), s"id=$id frame=$f")
    }
    assert(got.keySet.map(_._2) === Set(0L, 2L, 4L))
  }

  test("multimodal: unreadable media yields a marker row, not a task failure") {
    import spark.implicits._
    // a TRUNCATED but recognizable PNG makes the JDK decoder throw a
    // RuntimeException (not IOException) — the guard must absorb it;
    // null payloads must also land on the marker row
    val truncated = Multimodal.synthImagePng(5L).take(40)
    val junk = Seq((1L, Array[Byte](1, 2, 3)), (2L, "not a png".getBytes.toArray),
      (3L, truncated), (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "bytes")
    val got = Multimodal.decodeImageStats(spark, junk)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got === Set((1L, -1, -1), (2L, -1, -1), (3L, -1, -1), (4L, -1, -1)))
    // resize and frame-sample take the same guard path
    assert(Multimodal.resizeImageStats(spark, junk, 4, 4)
      .collect().forall(_.getInt(1) === -1))
    assert(Multimodal.sampleFrameStats(spark, junk, 2)
      .collect().forall(_.getLong(1) === -1L))
    // a big-endian AIFF payload decodes in the JDK but NOT as the 16-bit
    // LE PCM the sample loop assumes — marker row, never silent garbage
    val fmtBe = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val pcm = new Array[Byte](64)
    val aiffOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmtBe, 32),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, aiffOut)
    val aiff = Seq((7L, aiffOut.toByteArray)).toDF("media_id", "bytes")
    assert(Multimodal.decodeAudioStats(spark, aiff).collect().head.getLong(1) === -1L)
  }

  test("line dedup: shared lines survive only in the min-id holder") {
    import spark.implicits._
    val in = Seq(
      (1L, Seq("common header", "body one")),
      (2L, Seq("common header", "body two")),
      (3L, Seq("body three", "body three")), // intra-doc repeat: untouched
      (4L, Seq("common header"))             // fully boilerplate
    ).toDF("doc_id", "lines")
    val out = NearDup.removeDuplicateLines(in, col("doc_id"), col("lines"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("common header\nbody one", 2L, 2L))) // keeper keeps its copy
    assert(out(2L) === (("body two", 2L, 1L)))
    assert(out(3L) === (("body three\nbody three", 2L, 2L)))
    assert(out(4L) === (("", 1L, 0L))) // row survives with empty text
  }

  test("jaccard dfCap drops stop-shingle-only pairs, keeps rare-shingle pairs") {
    import spark.implicits._
    // every doc shares the stop shingle "x y z" (df = 12 > cap); docs 1
    // and 2 share ONLY that shingle, docs 3 and 4 are near-identical
    val docs = (Seq(
      (1L, "x y z p q r"),
      (2L, "x y z u v w"),
      (3L, "x y z a b c d"),
      (4L, "x y z a b c e")) ++
      (5L to 12L).map(i => (i, s"x y z t$i s$i r$i"))).toDF("doc_id", "text")
    def pairs(cap: Int) =
      NearDup.jaccardPairs(docs, col("doc_id"), col("text"), n = 3, threshold = 0.1, dfCap = cap)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Int.MaxValue)
    val capped = pairs(5)
    assert(uncapped.contains((1L, 2L))) // via the stop shingle alone
    assert(!capped.contains((1L, 2L))) // stop shingle removed
    assert(capped.contains((3L, 4L)), capped.toString) // rare shared shingles survive
  }

  test("bucketPairs: pair set is invariant to maxBucket (hot self-join == cold collect)") {
    // maxBucket = 2 forces nearly every band bucket down the self-join
    // path on this corpus; results must be identical to the default
    val cold = NearDup.simHashNearDups(docs, col("doc_id"), col("text"), maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hot = NearDup.simHashNearDups(docs, col("doc_id"), col("text"),
        maxHamming = 2, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hot === cold)
    val lshCold = NearDup.lshCandidates(
      NearDup.minHashSignatures(docs, col("doc_id"), col("text"), 3, 16), 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshHot = NearDup.lshCandidates(
      NearDup.minHashSignatures(docs, col("doc_id"), col("text"), 3, 16), 4, 4,
      maxBucket = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lshHot === lshCold)
  }

  test("near-dup plans contain no unbounded per-bucket collect_list") {
    // the cold path's collect_list is guarded by the __bsz <= maxBucket
    // filter; verify the guard window sits below every aggregate
    val plan = NearDup.simHashNearDups(docs, col("doc_id"), col("text"), maxHamming = 2)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__bsz"), "bucket-size guard missing from plan")
  }

  test("hammingNearDups masks stray bits above the banded domain (exact recall holds)") {
    import spark.implicits._
    // two fingerprints identical in the low 8 bits but differing in bits
    // 8+: without the entry mask the bands (low 8 bits only) bucket them
    // together while bit_count over the full 64-bit XOR inflates past
    // maxHamming — a silently dropped pair
    val fp = Seq((1L, 0x0f000000000000aaL), (2L, 0x00ff0000000000aaL))
      .toDF("doc_id", "fp")
    val pairs = NearDup.hammingNearDups(fp, bits = 8, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0L)),
      s"stray high bits must not void the pigeonhole guarantee: ${pairs.toSeq}")
  }

  test("text pipeline stays in whole-stage codegen (no UDFs in the plan)") {
    val plan = docs.select(
      TextFunctions.fingerprint(col("text")),
      TextFunctions.qualityScore(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }
}
