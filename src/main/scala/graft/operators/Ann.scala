package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: the brute-force path broadcasts the (small) query set
  * against the full corpus — one narrow pass, no shuffle of the corpus,
  * embarrassingly parallel; use it as the exact baseline. The bucketed
  * path pre-partitions the corpus by a coarse sign-bucket (IVF-style
  * coarse quantizer): each query only scans its own bucket, trading
  * recall for a ~2^bits reduction in scanned vectors — the 100 TB path,
  * where buckets map to co-located partitions.
  */
object Ann {

  /** Exact top-k cosine neighbors for each query vector.
    * `queries`/`corpus`: (id, vec: array<float>). Query set is assumed
    * small enough to broadcast. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // raw float vectors go straight to the native dot kernel (which
    // accumulates in double) — no per-element cast pass
    val q = broadcast(queries.select(col("id").as("q_id"), col("vec").as("qv")))
    val c = corpus.select(col("id").as("n_id"), col("vec").as("cv"))
    topK(c.crossJoin(q).filter(col("q_id") =!= col("n_id")), k)
  }

  /** Bucketed (approximate) top-k: queries only scan the corpus bucket
    * matching their own sign-bucket. */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int = 8): DataFrame = {
    val q = queries.select(col("id").as("q_id"), col("vec").as("qv"),
      signBucket(col("vec"), bits).as("bucket"))
    val c = corpus.select(col("id").as("n_id"), col("vec").as("cv"),
      signBucket(col("vec"), bits).as("bucket"))
    topK(c.join(broadcast(q), Seq("bucket")).filter(col("q_id") =!= col("n_id")), k)
  }

  /** Multi-probe bucketed top-k: each query also probes the buckets
    * reachable by flipping one of its first `probes` sign bits (the
    * standard multi-probe LSH recall/scan trade — probes+1 buckets per
    * query instead of 1). */
  def bucketedTopKMultiProbe(queries: DataFrame, corpus: DataFrame, k: Int,
      bits: Int = 8, probes: Int = 3): DataFrame = {
    // a probe beyond the bucket width would flip a bit no corpus bucket
    // carries — matching nothing and silently lowering effective recall
    // below the configured probe count
    require(probes >= 0 && probes <= bits,
      s"bucketedTopKMultiProbe: probes must be in 0..bits ($bits), got $probes")
    val base = signBucket(col("vec"), bits)
    val probeBuckets = array(
      base +: (0 until probes).map(j => base.bitwiseXOR(lit(1L << j))): _*)
    val q = queries.select(col("id").as("q_id"), col("vec").as("qv"),
      explode(probeBuckets).as("bucket"))
    val c = corpus.select(col("id").as("n_id"), col("vec").as("cv"),
      signBucket(col("vec"), bits).as("bucket"))
    topK(
      c.join(broadcast(q), Seq("bucket"))
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("qv"), col("n_id"), col("cv"))
        .distinct(), // a pair can match via several probes
      k)
  }

  /** Hard-negative mining for contrastive training: for each query,
    * the k most-similar same-bucket corpus vectors with a DIFFERENT
    * label — the "hardest" negatives, the standard embedding-training
    * prep step. `queries`/`corpus`: (id, vec, label). Same scale shape
    * as [[bucketedTopK]]: the query set broadcasts, each query scans
    * only its own coarse bucket, and the label filter runs before the
    * per-query top-k window. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
      bits: Int = 8): DataFrame = {
    val q = queries.select(col("id").as("q_id"), col("vec").as("qv"),
      col("label").as("q_label"), signBucket(col("vec"), bits).as("bucket"))
    val c = corpus.select(col("id").as("n_id"), col("vec").as("cv"),
      col("label").as("n_label"), signBucket(col("vec"), bits).as("bucket"))
    topK(
      c.join(broadcast(q), Seq("bucket"))
        .filter(col("q_id") =!= col("n_id") && col("q_label") =!= col("n_label")),
      k)
  }

  private[operators] def topK(pairs: DataFrame, k: Int): DataFrame = {
    // a zero-norm vector (failed-encode sentinel) yields cosine 0/0 =
    // NaN, and Spark's NaN-is-greatest ordering would rank it rn=1 for
    // EVERY query — undefined similarity is excluded, not top-ranked
    val scored = pairs.withColumn("cosine", cosine(col("qv"), col("cv")))
      .filter(col("cosine").isNotNull && !isnan(col("cosine")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id").asc)
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rn"))
  }

  /** Embedding-cosine near-duplicate pairs (a<b) within the same sign
    * bucket with cosine >= threshold — the bucketed all-pairs variant
    * (each bucket is a small dense block; cross-bucket pairs are
    * sacrificed for scalability). */
  def cosineNearDups(corpus: DataFrame, threshold: Double, bits: Int = 8): DataFrame = {
    val c = corpus.select(col("id"), col("vec").as("v"),
      signBucket(col("vec"), bits).as("bucket"))
    c.as("a").join(c.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("cosine"))
      // a zero-norm vector must not pair with everything: cosine() is
      // NULL for it, and a NaN (from NaN elements) compares greater
      // than any threshold under Spark's ordering semantics
      .filter(col("cosine").isNotNull && !isnan(col("cosine")) && col("cosine") >= threshold)
  }
}
