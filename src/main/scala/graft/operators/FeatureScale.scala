package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-dimension embedding standardization (diagonal whitening): center
  * each dimension at its corpus mean and scale to unit variance — the
  * standard prep before clustering / linear probing / distance metrics
  * that assume isotropic coordinates (full PCA whitening adds a
  * rotation; the diagonal form is the distributable sufficient-stat
  * version, and [[Gram.upperGram]] supplies the covariance for the
  * rotated variant when needed).
  *
  * Determinism discipline (same as [[Gram]]): float coordinates are
  * quantized to a micro-integer grid (`round(x·1e6)` as BIGINT) and the
  * per-dimension Σx / Σx² accumulate as exact integer sums — order-free,
  * so Spark's partition-parallel aggregation and any external oracle
  * agree bit-for-bit; mean/variance then derive in double from exact
  * integers with one fixed expression shape.
  *
  * Scale: one posexplode feeding a `groupBy(dim)` whose partial
  * aggregation collapses to d rows per task BEFORE the exchange (the
  * shuffle carries executors×d tiny rows, never the corpus); the d-row
  * stats table rides back as a one-row broadcast of two arrays and the
  * z-transform itself is row-local (zero additional shuffle).
  */
object FeatureScale {

  /** Standardize `vec` per dimension. Output: (id, z) where
    * `z[i] = (xm[i] − μ_i) / σ_i` in double, `xm` the micro-grid
    * quantization and μ/σ the micro-grid population mean / stddev.
    * Constant dimensions (σ = 0) yield ±Infinity/NaN rather than being
    * silently dropped — callers filter constant dims first.
    *
    * Overflow envelope: Σx² on the micro grid is ≤ rows·(1e6·|x|max)²;
    * with unit-normalized coordinates that stays inside a BIGINT up to
    * ~9×10⁶ vectors per dimension. Beyond that, compute the stats on a
    * deterministic sample (Sampling.bernoulliByKey) or a coarser grid —
    * ANSI mode makes the overflow loud, never silent.
    */
  def standardize(df: DataFrame, id: Column, vec: Column): DataFrame = {
    val base = df.select(id.as("__id"),
      transform(vec, x => round(x.cast("double") * lit(1e6)).cast("long")).as("__xm"))
    val stats = base
      .select(posexplode(col("__xm")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(sum(col("x")).as("s"), sum(col("x") * col("x")).as("ss"),
        count(lit(1)).as("n"))
      .groupBy()
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("s"), col("n")))),
          r => r.getField("s").cast("double") / r.getField("n")).as("__mu"),
        transform(array_sort(collect_list(struct(col("pos"), col("ss"), col("s"), col("n")))),
          r => sqrt(r.getField("ss").cast("double") / r.getField("n")
            - (r.getField("s").cast("double") / r.getField("n"))
              * (r.getField("s").cast("double") / r.getField("n")))).as("__sigma"))
    base.crossJoin(broadcast(stats))
      .select(col("__id").as("id"),
        transform(col("__xm"), (x, i) =>
          (x.cast("double") - element_at(col("__mu"), i + 1))
            / element_at(col("__sigma"), i + 1)).as("z"))
  }
}
