package graft.operators

import graft.functions.expressions.GraftExpressions.quantize_vec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/** Distributed Gram matrix G = Σ v·vᵀ over an embedding column — the
  * one-pass sufficient statistic behind PCA / whitening / covariance
  * estimation over a corpus of vectors (covariance follows as
  * (G − n·μμᵀ)/n with the per-dimension mean, itself a plain sum).
  *
  * Determinism: vectors are first snapped to the integer grid
  * floor(v·scale) ([[graft.functions.expressions.VecUtil.quantizeVec]],
  * the same grid the IVF trainer uses), so every pair sum is exact
  * BIGINT arithmetic — order-free, overflow-safe far beyond corpus
  * scale (|q| ≤ scale·max|v|; d=64, scale=1000, |v|≤4 gives headroom
  * past 10¹⁸ rows), and reproducible bit-for-bit by an external engine.
  *
  * Scale design: a typed [[Aggregator]] whose buffer is the packed
  * upper triangle (d(d+1)/2 longs). ObjectHashAggregate keeps the
  * buffer deserialized per partition and `reduce` mutates it in place,
  * so the per-row cost is d(d+1)/2 fused multiply-adds with NO
  * allocation, and the exchange carries one ~8·d²/2-byte buffer per
  * map partition — never rows. Contrast the relational formulation
  * (unnest×unnest → group-by), which shuffles n·d(d+1)/2 rows.
  */
object Gram {

  /** Packed-upper-triangle index map: (i,j), j≥i, row-major. */
  private def pairs(d: Int): Seq[(Int, Int)] =
    for { i <- 0 until d; j <- i until d } yield (i, j)

  final class UpperGramAgg(d: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    private val m = d * (d + 1) / 2
    override def zero: Array[Long] = new Array[Long](m)
    override def reduce(b: Array[Long], q: Array[Long]): Array[Long] = {
      // udaf-wrapped Aggregators do NOT skip null inputs (a null vector
      // reaches reduce as q = null via the null-propagating quantizer);
      // skip it like SQL aggregates skip nulls instead of NPE-ing the job
      if (q == null) return b
      require(q.length == d, s"gram: expected dim $d, got vector of ${q.length}")
      var idx = 0
      var i = 0
      while (i < d) {
        val qi = q(i)
        var j = i
        while (j < d) { b(idx) += qi * q(j); j += 1; idx += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var k = 0
      while (k < m) { a(k) += b(k); k += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder = ExpressionEncoder[Array[Long]]()
    override def outputEncoder = ExpressionEncoder[Array[Long]]()
  }

  /** Upper-triangular Gram matrix of `vec` (array<float>, dimension
    * `d`) on the floor(v·scale) integer grid: one row per (i ≤ j) pair
    * with the exact BIGINT sum Σ q[i]·q[j]. The (idx → i,j) unpack is a
    * broadcast join against a d(d+1)/2-row literal table — no FP index
    * arithmetic. */
  def upperGram(spark: SparkSession, df: DataFrame, vec: Column, d: Int,
      scale: Double = 1000.0): DataFrame = {
    import spark.implicits._
    val gram = udaf(new UpperGramAgg(d))
    val packed = df
      .select(quantize_vec(vec, scale).as("qv"))
      .agg(gram(col("qv")).as("g"))
      .select(posexplode(col("g")).as(Seq("idx", "gram_q")))
    val unpack = pairs(d).zipWithIndex
      .map { case ((i, j), idx) => (idx, i.toLong, j.toLong) }
      .toDF("idx", "i", "j")
    packed.join(broadcast(unpack), "idx")
      .select(col("i"), col("j"), col("gram_q"))
  }
}
