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
