package graft.operators

import org.apache.spark.sql.Column
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

  def rangeBucket(value: Column, lo: Column, hi: Column, n: Int): Column =
    when(hi <= lo, lit(0L))
      .otherwise(least(floor((value - lo) / (hi - lo) * n), lit(n - 1L)))
}
