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

  test("text pipeline stays in whole-stage codegen (no UDFs in the plan)") {
    val plan = docs.select(
      TextFunctions.fingerprint(col("text")),
      TextFunctions.qualityScore(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }
}
