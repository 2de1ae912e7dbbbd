package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The order-preserving equi-width range bucket shared by every
  * distributed two-phase pattern in the engine (prefix sums, exact AUC
  * ranks, histograms): bucket i covers
  * `[lo + i*(hi-lo)/n, lo + (i+1)*(hi-lo)/n)` with the top bucket
  * closed, and a degenerate domain (hi <= lo) collapses to bucket 0.
  * One definition so the clamp and degenerate-case semantics cannot
  * drift between call sites (the DuckDB oracles mirror this expression
  * shape verbatim). */
object Buckets {

  /** Bucket placement is total over doubles, consistent with Spark's
    * ascending sort order (nulls first, NaN last): null and -Inf land
    * in bucket 0, NaN and +Inf in bucket n-1, finite values by the
    * range formula. Without the explicit branches a NaN would bucket
    * inconsistently with its sort position (floor(NaN) -> null ->
    * least() skips it into the TOP bucket while null sorts FIRST) and
    * a single non-finite value could silently collapse the whole
    * two-phase pattern into one window partition. */
  def rangeBucket(value: Column, lo: Column, hi: Column, n: Int): Column =
    when(value.isNull || value === Double.NegativeInfinity, lit(0L))
      .otherwise(when(isnan(value) || value === Double.PositiveInfinity, lit(n - 1L))
        .otherwise(when(hi <= lo, lit(0L))
          .otherwise(least(floor((value - lo) / (hi - lo) * n), lit(n - 1L)))))

  /** `value` with non-finite doubles nulled — feed THIS to the min/max
    * that derive a bucket domain (aggregates skip nulls), so one
    * NaN/Inf row cannot poison lo/hi for every other row (Spark's max
    * treats NaN as greatest: one NaN => hi = NaN => every bucket
    * expression NaN). */
  def finiteOrNull(value: Column): Column =
    when(isnan(value) || value === Double.PositiveInfinity ||
      value === Double.NegativeInfinity, lit(null)).otherwise(value)

  /** Prefix-sum offsets of per-bucket counts — the second phase of
    * every two-phase ranked pattern: a tiny bucket x bucket theta join
    * (<= n² integer rows), never a single-partition window. `cnts` must
    * have columns (`bkt`, `c`); returns (`bkt`, `as`). One definition so
    * the left-join/coalesce empty-prefix semantics cannot drift between
    * the rank callers. */
  def bucketOffsets(cnts: DataFrame, bkt: String, c: String, as: String): DataFrame =
    cnts.as("x").join(cnts.as("z"), col(s"z.$bkt") < col(s"x.$bkt"), "left")
      .groupBy(col(s"x.$bkt").as(bkt))
      .agg(coalesce(sum(col(s"z.$c")), lit(0L)).as(as))
}
