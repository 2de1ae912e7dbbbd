package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine a lexical ranking (BM25,
  * [[TermStats.bm25TopK]]) and a dense ranking (ANN cosine,
  * [[Ann.bucketedTopK]]) without comparable scores.
  *
  * Reciprocal-rank fusion (Cormack et al., SIGIR '09) uses only the
  * RANKS: score(d) = Σ_r 1/(K + rank_r(d)). Ranks are integers in both
  * engines, each reciprocal is one IEEE division, and the two-term sum
  * is written in a fixed order — so the fused score is bit-exact
  * across engines with no rounding tricks (nothing here is libm, and
  * no float ever sums across rows).
  *
  * Scale design: both inputs are already top-k-per-query (bounded:
  * queries × k rows), so the full-outer join and the per-query window
  * run on a frame that is tiny regardless of corpus size — the corpus
  * never reaches this operator.
  */
object Fusion {

  /** RRF over two (query_id, doc_id, rn) rankings.
    *
    * @return (query_id, doc_id, rrf_score, fused_rank) with
    *         fused_rank in 1..k per query; ties break by doc_id
    */
  def rrf(a: DataFrame, b: DataFrame, k: Int, kRrf: Int = 60): DataFrame = {
    val l = a.select(col("query_id"), col("doc_id"), col("rn").as("rn_a"))
    val r = b.select(col("query_id"), col("doc_id"), col("rn").as("rn_b"))
    val fused = l.join(r, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(kRrf) + col("rn_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("rn_b")), lit(0.0))).as("rrf_score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    fused.withColumn("fused_rank", row_number().over(w).cast("long"))
      .where(col("fused_rank") <= k)
  }
}
