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
    * NULL keys are IGNORED (SQL count-distinct convention) — a NULL
    * hash would otherwise sort first, occupy a sketch slot, and bias
    * the estimate high.
    *
    * Returns 1 row: (kmv_estimate: double, n_hashes_kept: long). */
  /** The kept sketch every KMV estimator is built from: the k smallest
    * DISTINCT portable hashes of `key` (NULLs ignored) — one shared
    * construction so the distinct-count and overlap estimators can
    * never drift on the hash/NULL/tie conventions. */
  private def keptSketch(df: DataFrame, key: Column, k: Int, seed: Long): DataFrame =
    df.select(Sampling.modPHash(key, seed).as("h"))
      .filter(col("h").isNotNull)
      .distinct().orderBy(col("h")).limit(k)

  def kmvDistinct(df: DataFrame, key: Column, k: Int, seed: Long): DataFrame = {
    require(k > 1, s"kmvDistinct: k must be > 1, got $k")
    keptSketch(df, key, k, seed)
      .agg(count(lit(1)).as("n_hashes_kept"), max(col("h")).as("hk"))
      .select(
        when(col("n_hashes_kept") < k, col("n_hashes_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * P / col("hk")).as("kmv_estimate"),
        col("n_hashes_kept"))
  }

  /** Per-group [[kmvDistinct]]: one O(k) sketch per group key (distinct
    * users per event type, distinct URLs per host, ...). The per-group
    * k-minimum is a rank-over-window on the 8-byte hash, which Spark
    * plans with a partial WindowGroupLimit — each map partition forwards
    * at most k hashes PER GROUP before the exchange, so the shuffle is
    * bounded by k × groups regardless of corpus size.
    *
    * NULL keys are ignored, as in [[kmvDistinct]].
    *
    * Returns one row per group: (group, kmv_estimate, n_hashes_kept). */
  def kmvDistinctPerGroup(df: DataFrame, group: Column, key: Column,
      k: Int, seed: Long): DataFrame = {
    require(k > 1, s"kmvDistinctPerGroup: k must be > 1, got $k")
    val hashed = df.select(group.as("grp"), Sampling.modPHash(key, seed).as("h"))
      .filter(col("h").isNotNull).distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp").orderBy("h")
    hashed.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy("grp").agg(count(lit(1)).as("n_hashes_kept"), max(col("h")).as("hk"))
      .select(col("grp"),
        when(col("n_hashes_kept") < k, col("n_hashes_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * P / col("hk")).as("kmv_estimate"),
        col("n_hashes_kept"))
  }

  /** KMV cross-corpus overlap estimate — the O(k)-state answer to "how
    * much of corpus B's content already appears in corpus A?"
    * (contamination screening, ingest-batch novelty triage) when the
    * corpora are too large to intersect exactly.
    *
    * Estimator (Beyer et al. 2007): sketch each corpus as its k
    * smallest distinct portable hashes; the union sketch is the k
    * smallest of the two sketches' union, and
    * `jaccard_est = |union sketch ∩ A sketch ∩ B sketch| / |union sketch|`.
    * The union sketch's k-th minimum also yields the KMV distinct-count
    * estimate of |A ∪ B|. When fewer than k distinct hashes survive the
    * union, the sketches ARE the full hash sets and both estimates are
    * exact (up to mod-P hash collisions).
    *
    * Plan shape: each sketch is the [[kmvDistinct]] shape (narrow hash
    * projection, map-side-combinable DISTINCT, TakeOrderedAndProject
    * k-minimum); everything after operates on ≤ k-row frames joined
    * broadcast. Nothing scales with the corpora. Deterministic and
    * engine-portable — the oracle reproduces the estimate bit-for-bit.
    *
    * Returns 1 row: (n_union_kept, n_both, jaccard_est, union_est). */
  def kmvOverlap(dfA: DataFrame, keyA: Column, dfB: DataFrame, keyB: Column,
      k: Int, seed: Long): DataFrame = {
    require(k > 1, s"kmvOverlap: k must be > 1, got $k")
    val sa = keptSketch(dfA, keyA, k, seed).withColumnRenamed("h", "ha")
    val sb = keptSketch(dfB, keyB, k, seed).withColumnRenamed("h", "hb")
    val su = sa.select(col("ha").as("h")).union(sb.select(col("hb").as("h")))
      .distinct().orderBy(col("h")).limit(k)
    su.join(broadcast(sa), col("h") === col("ha"), "left")
      .join(broadcast(sb), col("h") === col("hb"), "left")
      .agg(
        count(lit(1)).as("n_union_kept"),
        coalesce(sum((col("ha").isNotNull && col("hb").isNotNull).cast("long")),
          lit(0L)).as("n_both"),
        max(col("h")).as("hk"))
      .select(
        col("n_union_kept"), col("n_both"),
        // empty union (both corpora empty / all-NULL keys): 0/0 would be
        // NULL — two empty sets have Jaccard 0 by convention here
        when(col("n_union_kept") === 0, lit(0.0))
          .otherwise(col("n_both").cast("double") / col("n_union_kept")).as("jaccard_est"),
        when(col("n_union_kept") < k, col("n_union_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * P / col("hk")).as("union_est"))
  }

  /** Deterministic fixed-grid quantile estimates: two passes — exact
    * (min, max, count), then integer occupancy of an equi-width
    * `buckets`-cell grid — and a midpoint read-out at each requested
    * quantile: the smallest bucket whose cumulative count reaches
    * ceil(q·n). Error is bounded by one grid cell of the value RANGE
    * (vs approx_percentile's rank-error bound), and unlike t-digest/KLL
    * the state is mergeable integers with NO estimator freedom — any
    * engine mirroring the arithmetic reproduces the estimate
    * bit-for-bit, which is what makes it gateable (and auditable)
    * cross-engine.
    *
    * Plan shape: both passes are map-side-combinable aggregates (the
    * grid has `buckets` groups); the cumulative sum runs on the
    * bucket×bucket triangle join (≤ buckets² tiny integer rows) rather
    * than a single-partition window, so nothing in the plan is
    * unpartitioned. The two passes are SERIAL by contract — the
    * range-relative cell function needs global min/max before any row
    * can be bucketed — and that is this function's documented cost
    * (2× scan wall time); when one data pass matters more than
    * range-relative error, use [[fixedStepQuantiles]], which trades a
    * caller-fixed absolute error bound for a single pass. Returns one
    * row per q: (q, grid_quantile, n). */
  def gridQuantiles(df: DataFrame, value: Column, buckets: Int,
      qs: Seq[Double]): DataFrame = {
    require(buckets > 1 && qs.nonEmpty,
      s"gridQuantiles: need buckets > 1 and qs nonempty, got $buckets / $qs")
    require(qs.forall(q => q > 0 && q <= 1),
      s"gridQuantiles: every q must be in (0, 1], got $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(value.cast("double").as("v")).where(col("v").isNotNull)
    val mm = v.agg(min("v").as("lo"), max("v").as("hi"), count(lit(1)).as("n"))
    val bucketed = v.crossJoin(broadcast(mm))
      .select(when(col("hi") === col("lo"), lit(0))
        .otherwise(least(lit(buckets - 1),
          floor((col("v") - col("lo")) / ((col("hi") - col("lo")) / buckets)).cast("int")))
        .as("b"))
    val counts = bucketed.groupBy("b").agg(count(lit(1)).as("c"))
    val cum = counts.as("a").join(counts.as("x"), col("x.b") <= col("a.b"))
      .groupBy(col("a.b").as("b")).agg(sum(col("x.c")).as("cum"))
    val targets = qs.toDF("q").crossJoin(broadcast(mm))
      .select(col("q"), col("lo"), col("hi"), col("n"),
        greatest(lit(1L), ceil(col("q") * col("n")).cast("long")).as("tgt"))
    // LEFT join: an empty input still emits one row per q (with NULL
    // grid_quantile and n = 0) instead of silently vanishing
    targets.join(cum, col("cum") >= col("tgt"), "left")
      .groupBy(col("q"), col("lo"), col("hi"), col("n"))
      .agg(min(col("b")).as("mb"))
      .select(col("q"),
        round(col("lo") + (col("mb").cast("double") + 0.5) *
          ((col("hi") - col("lo")) / buckets), 9).as("grid_quantile"),
        col("n"))
  }

  /** ONE-pass fixed-step quantiles — the scale path beside
    * [[gridQuantiles]]. gridQuantiles' grid is RANGE-relative (cells of
    * (max-min)/buckets), which is what forces its exact two-pass shape:
    * the bucket function depends on global min/max, so one full scan
    * must finish before the other starts (both map-combinable and
    * sound at scale, but serial — the documented cost of the
    * range-relative contract). This variant fixes the cell function
    * up front — cell(v) = floor(v / step) for a caller-chosen
    * fixed-point `step` — so occupancy is a SINGLE map-combinable pass
    * over the data; everything after (cumulative via the cell×cell
    * triangle join, total row count as a sum over cells) runs on ≤
    * #occupied-cells rows, not data. Read-out: midpoint (cell+0.5)·step
    * of the first cell whose cumulative count reaches ceil(q·n).
    *
    * Contract trade: absolute error ≤ step/2 (data-independent),
    * instead of gridQuantiles' range-relative cell; the occupied-cell
    * count is spread/step, so `step` is sized to the domain the way
    * `buckets` sizes the grid — same state bound, half the scans.
    * Deterministic integer/binary arithmetic end-to-end (floor of an
    * IEEE division, integer counts): any engine mirroring it is
    * bit-identical, which is what the DuckDB gate checks. Contract:
    * size `step` so |v|/step < 2^63 for the data domain — a cell index
    * beyond long range would saturate under Spark's non-ANSI cast
    * where a strict engine (DuckDB CAST) errors, so out-of-range
    * domains are outside the mirrored arithmetic (the same
    * finite-domain discipline as the filter above). Returns one
    * row per q: (q, fixed_quantile, n); empty input emits NULL
    * quantile with n = 0, mirroring gridQuantiles. */
  def fixedStepQuantiles(df: DataFrame, value: Column, step: Double,
      qs: Seq[Double]): DataFrame = {
    require(step > 0 && java.lang.Double.isFinite(step),
      s"fixedStepQuantiles: step must be positive and finite, got $step")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"fixedStepQuantiles: every q must be in (0, 1], got $qs")
    val spark = df.sparkSession
    import spark.implicits._
    // finite-domain filter (drops NULL, NaN, ±Inf — a NaN would
    // otherwise CAST to cell 0 under non-ANSI semantics and silently
    // poison the histogram); the explicit isnotnull(cell) is a
    // semantic no-op that keeps all three references to `cells` below
    // canonically IDENTICAL — the triangle join infers isnotnull on
    // its keys, and without the filter present everywhere the total-
    // count subtree would differ and AQE stage reuse could not collapse
    // the three scans into the one pass this function promises
    val v = df.select(value.cast("double").as("v"))
      .where(col("v") > lit(Double.NegativeInfinity) &&
        col("v") < lit(Double.PositiveInfinity))
    val cells = v.select(floor(col("v") / step).cast("long").as("cell"))
      .where(col("cell").isNotNull)
      .groupBy("cell").agg(count(lit(1)).as("c"))
    val tot = cells.agg(coalesce(sum("c"), lit(0L)).as("n"))
    // a.c rides along as a grouping key (same cardinality — cell is
    // unique in the histogram) so column pruning can NOT reduce the
    // `a` side to a distinct-only subtree: all three `cells`
    // references stay canonically identical and AQE stage reuse
    // computes the scan + histogram exchange exactly once
    val cum = cells.as("a").join(cells.as("x"), col("x.cell") <= col("a.cell"))
      .groupBy(col("a.cell").as("cell"), col("a.c").as("ac"))
      .agg(sum(col("x.c")).as("cum"))
      .select(col("cell"), col("cum"))
    val targets = qs.toDF("q").crossJoin(broadcast(tot))
      .select(col("q"), col("n"),
        greatest(lit(1L), ceil(col("q") * col("n")).cast("long")).as("tgt"))
    targets.join(cum, col("cum") >= col("tgt"), "left")
      .groupBy(col("q"), col("n")).agg(min(col("cell")).as("mc"))
      .select(col("q"),
        round((col("mc").cast("double") + 0.5) * step, 9).as("fixed_quantile"),
        col("n"))
  }

  /** Count-min sketch hash families: independent polyHash multipliers
    * (row i of the sketch uses [[CmsMults]](i)) — the single source the
    * oracle SQL mirrors. */
  val CmsMults: Vector[Long] = Vector(31L, 131L, 257L)

  /** Count-min-sketch heavy hitters over a one-column DataFrame of term
    * occurrences: terms whose CMS estimate is at least 1/`hhDenom` of
    * all occurrences, with the estimate and the exact count side by
    * side (CMS guarantees estimate >= exact; width bounds the
    * overestimate).
    *
    * Scale story — the point of the sketch: the frequency state is
    * `depth x width` counters NO MATTER the corpus size. Building it is
    * one explode (depth rows per occurrence, no string payload — just
    * (row, bucket) ints) into a map-side-combinable count whose group
    * count is bounded by depth*width, so the shuffle carries at most
    * depth*width rows per map partition. Candidate evaluation joins the
    * tiny sketch back broadcast — no second pass over the data — and
    * the total-count threshold is a broadcast scalar. The exact-count
    * column is gate instrumentation (it is what the sketch would
    * replace at 100 TB); the sketch build itself never holds a
    * per-term state.
    *
    * Returns (term, cms_est, exact_n), heavy hitters only. */
  def cmsHeavyHitters(df: DataFrame, term: Column, width: Int, hhDenom: Int): DataFrame = {
    require(width > 1, s"cmsHeavyHitters: width must be > 1, got $width")
    require(hhDenom > 1, s"cmsHeavyHitters: hhDenom must be > 1, got $hhDenom")
    // NULL terms are dropped from BOTH the sketch and the total: a NULL
    // bucket hash can never join back to the sketch, so counting nulls
    // in `tot` would only raise the heavy-hitter bar while the null
    // "term" itself can never surface
    val t = df.select(term.as("term")).filter(col("term").isNotNull)
    def buckets: Column = array(CmsMults.zipWithIndex.map { case (m, i) =>
      struct(lit(i).as("r"),
        pmod(TextFunctions.polyHashMult(col("term"), m), lit(width.toLong)).as("b"))
    }: _*)
    val cms = t.select(explode(buckets).as("rb"))
      .select(col("rb.r").as("r"), col("rb.b").as("b"))
      .groupBy("r", "b").agg(count(lit(1)).as("c"))
    val exact = t.groupBy(col("term")).agg(count(lit(1)).as("exact_n"))
    val est = exact.select(col("term"), col("exact_n"), explode(buckets).as("rb"))
      .select(col("term"), col("exact_n"), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(cms), Seq("r", "b"))
      .groupBy(col("term"), col("exact_n")).agg(min(col("c")).as("cms_est"))
    val tot = t.agg(count(lit(1)).as("tot"))
    est.crossJoin(broadcast(tot))
      .filter(col("cms_est") * hhDenom >= col("tot"))
      .select(col("term"), col("cms_est"), col("exact_n"))
  }
}
