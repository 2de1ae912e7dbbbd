package graft

import graft.operators.TermStats
import org.apache.spark.sql.functions._

class TermStatsSpec extends GraftSpec {

  test("tf-idf matches a hand-computed tiny corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana")).toDF("id", "body")
    val top = TermStats.tfIdfTopTerms(docs, col("id"), col("body"), k = 1)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    // banana appears in all 3 docs -> idf 0; apple/cherry idf = ln 3
    assert(top(1L)._1 === "apple")
    assert(BigDecimal(top(1L)._2) === r9(2 * math.log(3.0)))
    assert(top(2L)._1 === "cherry")
    assert(BigDecimal(top(2L)._2) === r9(math.log(3.0)))
    // doc 3 has only banana: tfidf 0, still emitted as its top term
    assert(top(3L) === ("banana", 0.0))
  }

  test("bigram cross-entropy matches a hand-computed tiny corpus") {
    import spark.implicits._
    // corpus bigrams: (a b) x2, (a c) x1 -> c(a .) = 3
    // doc 1 "a b": ce = -ln(2/3); doc 2 "a b a c": pairs (a b)(b a)(a c)
    // but (b a) is unseen-prefix? b occurs as prefix in (b a): c(b .)=1,
    // c(b a)=1 -> p=1 -> ln 1 = 0.
    val docs = Seq((1L, "a b"), (2L, "a b a c"), (3L, "z")).toDF("id", "body")
    val out = TermStats.bigramCrossEntropy(docs, docs, col("id"), col("body"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def nano(p: Double) = math.round(math.log(p) * 1e9)
    assert(out(1L)._1 === 1L)
    assert(out(1L)._2 === -(nano(2.0 / 3).toDouble / (1e9 * 1)))
    // doc 2: (a b): c2=2,c1(a)=3; (b a): c2=1,c1(b)=1; (a c): c2=1,c1(a)=3
    val expect2 = -((nano(2.0 / 3) + nano(1.0) + nano(1.0 / 3)).toDouble / (1e9 * 3))
    assert(out(2L)._1 === 3L)
    assert(out(2L)._2 === expect2)
    // single-token doc has no bigrams -> no row
    assert(!out.contains(3L))
  }

  test("bigram cross-entropy is layout-invariant and bounded below by 0") {
    val docs = Tables.documents(spark, sf)
    val a = TermStats.bigramCrossEntropy(docs, docs, col("doc_id"), col("text"))
    val b = TermStats.bigramCrossEntropy(docs.repartition(17), docs.repartition(5),
      col("doc_id"), col("text"))
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    // MLE probabilities are <= 1, so cross-entropy is never negative
    assert(a.filter(col("cross_entropy") < 0).count() === 0)
  }

  test("bigram hash-pair kernel equals the zip-based column formulation") {
    import graft.functions.TextFunctions
    import graft.functions.expressions.GraftExpressions.bigram_hash_pairs
    val docs = Tables.documents(spark, sf)
    val toks = TextFunctions.tokenize(col("text"))
    val viaKernel = docs
      .select(col("doc_id"), explode(bigram_hash_pairs(toks)).as("bg"))
      .select(col("doc_id"), col("bg.h1"), col("bg.h2"))
    val viaColumns = docs
      .filter(size(toks) >= 2)
      .select(col("doc_id"),
        posexplode(TextFunctions.shingles(toks, 2)).as(Seq("i", "g")))
      .select(col("doc_id"),
        TextFunctions.polyHash(split(col("g"), " ").getItem(0)).as("h1"),
        TextFunctions.polyHash(col("g")).as("h2"))
    assert(viaKernel.exceptAll(viaColumns).count() === 0)
    assert(viaColumns.exceptAll(viaKernel).count() === 0)
  }

  test("tf-idf tie-break is deterministic and layout-invariant") {
    val docs = Tables.documents(spark, sf)
    val a = TermStats.tfIdfTopTerms(docs, col("doc_id"), col("text"), 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    val b = TermStats.tfIdfTopTerms(docs.repartition(17), col("doc_id"), col("text"), 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(a === b)
  }

  test("quality filter keeps ~(1-q) of the corpus and never drops a better doc") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val kept = TermStats.qualityFilter(docs, col("text"), 0.25)
    val total = docs.count()
    val nKept = kept.count()
    assert(nKept >= (total * 0.70).toLong && nKept <= (total * 0.80).toLong,
      s"kept $nKept of $total")
    val minKept = kept.agg(min(col("quality"))).head().getDouble(0)
    val dropped = docs.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val maxDropped = TermStats.qualityFilter(dropped, col("text"), 0.0) // just score
      .agg(max(col("quality"))).head().getDouble(0)
    assert(maxDropped < minKept)
  }
}
