package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

/** Fixed-point hard-sigmoid logistic GD: the distributed trainer must
  * agree bit-for-bit with a plain-Scala reference loop, and be
  * layout-invariant (integer sums are order-free). */
class ClassifierSpec extends GraftSpec {

  private val (d, iters, lr) = (65, 3, 4000L)

  private def feats = Classifier.embeddingFeatures(Tables.embeddings(spark, sf),
    col("vec_id"), col("embedding"), col("label") < 5, scale = 1000.0)

  /** Truncating division (Java's `/` on Long is already trunc — named
    * for symmetry with the SQL mirror). */
  private def tdiv(a: Long, b: Long): Long = a / b

  /** Driver-side reference: the exact same integer recipe over
    * collected rows. */
  private def referenceWeights(rows: Array[(Array[Long], Long)]): Array[Long] = {
    var w = new Array[Long](d)
    for (_ <- 1 to iters) {
      val g = new Array[Long](d)
      rows.foreach { case (x, y) =>
        val z = tdiv(x.zip(w).map { case (a, b) => a * b }.sum, 1000L)
        val p = math.max(0L, math.min(1000000000L, 500000000L + tdiv(z, 4L)))
        val em = tdiv(p - y * 1000000000L, 1000L)
        var j = 0
        while (j < d) { g(j) += em * x(j); j += 1 }
      }
      val n = rows.length.toLong
      w = w.zip(g).map { case (wj, gj) => wj - tdiv(lr * tdiv(gj, n), 1000L) }
    }
    w
  }

  test("distributed trainer matches the driver-side integer reference bit-for-bit") {
    val rows = feats.collect()
      .map(r => (r.getSeq[Long](1).toArray, r.getLong(2)))
    val expect = referenceWeights(rows)
    val got = Classifier.trainHardSigmoid(feats, d, iters, lr)
    assert(got.toSeq === expect.toSeq)
  }

  test("training is layout-invariant (order-free integer gradient sums)") {
    val a = Classifier.trainHardSigmoid(feats, d, iters, lr)
    val b = Classifier.trainHardSigmoid(feats.repartition(17), d, iters, lr)
    assert(a.toSeq === b.toSeq)
  }

  test("confusion cells sum to the corpus and match a local apply of the weights") {
    val rows = feats.collect()
      .map(r => (r.getSeq[Long](1).toArray, r.getLong(2)))
    val w = referenceWeights(rows)
    val expect = rows.groupBy { case (x, y) =>
      val z = tdiv(x.zip(w).map { case (a, b) => a * b }.sum, 1000L)
      val p = math.max(0L, math.min(1000000000L, 500000000L + tdiv(z, 4L)))
      (y, if (p >= 500000000L) 1L else 0L)
    }.view.mapValues(_.length.toLong).toMap
    val got = Classifier.confusion(feats, d, iters, lr).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expect)
    assert(got.values.sum === rows.length.toLong)
  }

  test("empty corpus trains to zero weights instead of crashing") {
    val w = Classifier.trainHardSigmoid(feats.filter(col("id") < 0), d, iters, lr)
    assert(w.toSeq === Seq.fill(d)(0L))
  }

  test("dimension mismatch fails loudly") {
    val bad = feats.withColumn("x", slice(col("x"), 1, 10))
    val e = intercept[Exception] {
      Classifier.trainHardSigmoid(bad, d, iters, lr)
    }
    assert(e.getMessage != null)
  }
}
