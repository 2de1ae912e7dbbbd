package graft.operators

import graft.functions.expressions.GraftExpressions.{dot_l, quantize_vec}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed linear-classifier training for data curation — the
  * "train a quality/domain classifier on weak labels, score the whole
  * corpus" loop every large-scale pipeline runs (fastText-style quality
  * filtering; the reference trains its ranking models over exactly this
  * kind of assembled feature frame, docs/high_level_api.md). Full-batch
  * gradient descent on a HARD-SIGMOID logistic loss, in pure fixed-point
  * BIGINT arithmetic.
  *
  * Determinism / oracle story: features live on the floor(v·scale)
  * integer grid (the shared [[Ivf]] quantizer), weights in nano units,
  * and the hard sigmoid clamp(1/2 + z/4, 0, 1) replaces exp-based
  * sigmoid — so there is NO floating point and NO libm anywhere:
  * per-row probabilities, gradient sums, and weight updates are all
  * BIGINT with truncating division (Spark `div`, DuckDB `//`, Java `/`
  * all truncate toward zero — verified, and every division here mirrors
  * across all three). The DuckDB oracle re-trains from scratch and must
  * agree bit-for-bit.
  *
  * Scale design: each GD iteration is ONE distributed aggregate — a
  * typed [[Aggregator]] whose buffer is the d-long gradient vector, so
  * ObjectHashAggregate mutates one array per map partition and the
  * exchange carries d·8 bytes per partition, never rows (the
  * [[Gram.UpperGramAgg]] discipline). The driver holds only the weight
  * vector; scoring/prediction is a narrow map over a weight literal.
  * Overflow envelope: |err_micro·x_j| ≤ 10⁶·|x|, so gradient sums stay
  * under 2⁶³ past 10⁹ rows per partition-tree even at |x| ~ 10³; z
  * products |w·x| ≤ |w|·10³·d — weights bounded by the clamp keep this
  * far from 2⁶³. */
object Classifier {

  private val NANO = 1000000000L

  /** Truncating integer division as a column (Spark's `div`). */
  private def idiv(a: Column, b: Long): Column = call_function("div", a, lit(b))

  /** Hard-sigmoid probability in nano units from z in nano units:
    * clamp(5·10⁸ + z/4, 0, 10⁹). */
  def pNano(zNano: Column): Column =
    greatest(lit(0L), least(lit(NANO), lit(NANO / 2) + idiv(zNano, 4L)))

  /** z in nano units for quantized features `x` against nano weights:
    * dot is exact BIGINT, then /1000 undoes the feature grid. */
  def zNano(x: Column, wNano: Array[Long]): Column =
    idiv(dot_l(x, typedLit(wNano)), 1000L)

  /** Σ err_micro·x over rows — the full-batch gradient, one buffer per
    * map partition. Null feature rows are skipped like SQL aggregates
    * skip nulls (callers filter, this is the belt to that suspender). */
  final class GradAgg(d: Int) extends Aggregator[(Array[Long], Long), Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](d)
    override def reduce(b: Array[Long], in: (Array[Long], Long)): Array[Long] = {
      val x = in._1
      if (x == null) return b
      require(x.length == d, s"classifier: expected dim $d, got feature vector of ${x.length}")
      val e = in._2
      var j = 0
      while (j < d) { b(j) += e * x(j); j += 1 }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var k = 0
      while (k < d) { a(k) += b(k); k += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: ExpressionEncoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: ExpressionEncoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Feature frame from an embedding table: x = quantized embedding ++
    * [scale] (the appended constant is the bias feature — its raw value
    * is 1.0, so its grid value is `scale`), y = 1 iff `posCond` (the
    * weak-label rule — "is English", "above quality median", …). */
  def embeddingFeatures(emb: DataFrame, id: Column, vec: Column,
      posCond: Column, scale: Double): DataFrame =
    emb.select(id.cast("long").as("id"),
      concat(quantize_vec(vec, scale), array(lit(scale.toLong))).as("x"),
      when(posCond, 1L).otherwise(0L).as("y"))

  /** `iters` full-batch GD steps from w = 0. Per iteration: one
    * distributed aggregate computes (Σ err_micro·x, n); the driver
    * updates w_j ← w_j − (lrMilli · (g_j quot n)) quot 1000. All
    * divisions truncate toward zero on every engine involved. */
  def trainHardSigmoid(feats: DataFrame, d: Int, iters: Int, lrMilli: Long): Array[Long] = {
    require(d > 0 && iters >= 0 && lrMilli > 0,
      s"classifier: need d > 0, iters >= 0, lrMilli > 0, got d=$d iters=$iters lrMilli=$lrMilli")
    val grad = udaf(new GradAgg(d))
    var w = new Array[Long](d)
    for (_ <- 1 to iters) {
      val err = pNano(zNano(col("x"), w)) - col("y") * lit(NANO)
      val row = feats.filter(col("x").isNotNull)
        .select(col("x"), idiv(err, 1000L).as("em"))
        .agg(grad(col("x"), col("em")).as("g"), count(lit(1)).as("n"))
        .collect()(0)
      val g = row.getSeq[Long](0)
      val n = row.getLong(1)
      if (n > 0)
        w = w.zip(g).map { case (wj, gj) => wj - (lrMilli * (gj / n)) / 1000 }
    }
    w
  }

  /** Trained model as a frame: (j, w_nano) — the [[Ivf]] centroid-dump
    * convention (driver holds the model, output is the model). */
  def weightsFrame(feats: DataFrame, d: Int, iters: Int, lrMilli: Long): DataFrame = {
    val w = trainHardSigmoid(feats, d, iters, lrMilli)
    val spark = feats.sparkSession
    import spark.implicits._
    w.zipWithIndex.map { case (wj, j) => (j.toLong, wj) }.toSeq.toDF("j", "w_nano")
  }

  /** Confusion matrix of the trained model over the corpus: (y, pred,
    * n) with pred = [p ≥ 1/2] — one narrow map over a weight literal +
    * a 4-group aggregate. */
  def confusion(feats: DataFrame, d: Int, iters: Int, lrMilli: Long): DataFrame = {
    val w = trainHardSigmoid(feats, d, iters, lrMilli)
    feats.filter(col("x").isNotNull)
      .select(col("y"),
        when(pNano(zNano(col("x"), w)) >= NANO / 2, 1L).otherwise(0L).as("pred"))
      .groupBy(col("y"), col("pred")).agg(count(lit(1)).as("n"))
  }
}
