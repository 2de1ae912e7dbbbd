package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Sketch-based approximate aggregates for corpus-scale profiling.
  *
  * Spark ships HLL (`approx_count_distinct`) and KLL-style quantiles
  * (`approx_percentile`) natively — those stay the defaults. This adds
  * the one sketch family worth owning: KMV (k minimum values), chosen
  * because it is *engine-portable and deterministic* — the sketch is
  * just the k smallest values of a portable hash, so an external system
  * (or the DuckDB oracle) reproduces the estimate bit-for-bit, and two
  * engines can union sketches without sharing an HLL register format.
  * That is the property a cross-engine 100 TB pipeline actually needs
  * from a sketch: auditability of the estimate, not another estimator.
  */
object Sketches {

  private val P = TextFunctions.P

  /** KMV distinct-count estimate of `key`: hash every key with the
    * portable mod-P mix ([[graft.operators.Sampling.modPHash]], uniform
    * on [0, P)), keep the k smallest DISTINCT hash values, and estimate
    * `(k-1) * P / h_k` from the k-th minimum. When fewer than k distinct
    * hashes exist the count of survivors IS the exact distinct count
    * (collision probability ~n²/2P) and is returned directly.
    *
    * Plan shape: hash is a narrow projection; DISTINCT is one
    * map-side-combinable aggregate on an 8-byte key; the k-minimum is
    * `sort+limit`, which Spark plans as TakeOrderedAndProject — each
    * partition keeps its local k, only k-row fragments travel. The
    * sketch state is O(k) end-to-end; nothing scales with the corpus.
    *
    * Returns 1 row: (kmv_estimate: double, n_hashes_kept: long). */
  def kmvDistinct(df: DataFrame, key: Column, k: Int, seed: Long): DataFrame = {
    require(k > 1, s"kmvDistinct: k must be > 1, got $k")
    val kept = df.select(Sampling.modPHash(key, seed).as("h"))
      .distinct().orderBy(col("h")).limit(k)
    kept.agg(count(lit(1)).as("n_hashes_kept"), max(col("h")).as("hk"))
      .select(
        when(col("n_hashes_kept") < k, col("n_hashes_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * P / col("hk")).as("kmv_estimate"),
        col("n_hashes_kept"))
  }
}
