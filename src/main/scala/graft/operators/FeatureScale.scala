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

  /** Equal-mass quantile binning with RANK semantics: each row gets the
    * bin of its exact global rank among `value` — `bin = (rank−1)·bins
    * div n`, where tied values share the MINIMUM rank and therefore
    * always land in the same bin (the property ntile/row_number binning
    * lacks, and the one that matters for features: equal inputs must
    * produce equal features). NULL values are excluded — a null has no
    * rank.
    *
    * Scale: the global rank is [[Partitioners.stableIds]]' bucketed
    * prefix-sum (no single-partition window anywhere), tie collapse is
    * one `groupBy(value) → min(ordinal)` aggregate joined back on the
    * value (both map-side combinable / one exchange each), and the bin
    * arithmetic is exact integer math — bit-reproducible by any engine
    * with a rank() window (the oracle's formulation at gate scale).
    *
    * @return (id, v, bin) with bin in 0..bins−1
    */
  def quantileBin(df: DataFrame, id: Column, value: Column, bins: Int,
      buckets: Int = 1024): DataFrame = {
    require(bins > 0, s"quantileBin: bins must be positive, got $bins")
    val base = df.select(id.as("id"), value.cast("double").as("v"))
      .filter(col("v").isNotNull)
    val ord = Partitioners.stableIds(base, col("v"), Seq(col("id")), buckets)
    val ranks = ord.groupBy(col("v")).agg(min(col("ordinal")).as("__rnk"))
    val n = base.agg(count(lit(1)).as("__n"))
    ord.join(ranks, "v").crossJoin(broadcast(n))
      .select(col("id"), col("v"),
        expr(s"((__rnk - 1) * $bins) div __n").cast("long").as("bin"))
  }

  /** PCA projection onto the top-`k` principal components — the rotated
    * complement of [[standardize]], built on the [[Gram]] sufficient
    * statistic: ONE distributed pass produces the d-dim sums and the
    * d²/2 quantized-grid pair sums (shuffle carries one buffer per
    * partition, never rows — Gram's design) plus one narrow aggregate
    * for the per-dimension means (two scans of the input total — the
    * mean sums could fold into the Gram buffer to make it literally
    * one pass; at d extra longs per buffer that is the obvious next
    * squeeze if the scan ever dominates), the d×d covariance
    * eigensolves on the DRIVER (cyclic Jacobi; d ≤ a few hundred makes
    * this microseconds — the bounded-model-materialization discipline
    * of [[Ivf.kmeans]] centroids), and the projection itself is a
    * row-local straight-line expression over the eigenvector literals
    * (codegen'd arithmetic, zero additional shuffle).
    *
    * Determinism: covariance derives from exact integer sums on the
    * quantize_vec grid, Jacobi sweeps in fixed cyclic order, eigenpairs
    * sort by (eigenvalue desc, index), and each component's sign is
    * normalized so its largest-magnitude coordinate is positive —
    * identical output on any partition layout (spec-asserted).
    *
    * Output: (id, proj: array<double> of length k, center_norm2), proj
    * = Vᵀ(x − μ) on the grid-quantized coordinates and center_norm2 =
    * ‖x − μ‖² (Bessel bound: ‖proj‖² ≤ center_norm2 up to rounding —
    * the gate's oracle-assertable invariant).
    */
  def pcaProject(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
      id: Column, vec: Column, d: Int, k: Int,
      scale: Double = 1000.0): DataFrame = {
    require(k >= 1 && k <= d, s"pcaProject: need 1 <= k <= d, got k=$k d=$d")
    val q = graft.functions.expressions.GraftExpressions.quantize_vec(vec, scale)
    val base = df.select(id.as("__id"), q.as("__q"))
    // one tiny stats pass: n + per-dim integer sums
    // count(col) not count(lit(1)): a null element must show up as a
    // per-position count discrepancy (caught below), not silently bias
    // the sum/mean of its dimension
    val sumsRow = base.select(posexplode(col("__q")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(sum(col("x")).as("s"), count(col("x")).as("n"))
      .collect()
    require(sumsRow.nonEmpty,
      "pcaProject: input has no rows (or no non-null vectors) — nothing to fit")
    // collect() order is arbitrary: validate the dense length-d contract
    // instead of trusting whichever row arrives first (ragged input made
    // the statistics partition-layout-dependent; an over-length vector
    // crashed the driver with a bare AIOOBE)
    require(sumsRow.length == d && sumsRow.forall(r => r.getInt(0) >= 0 && r.getInt(0) < d),
      s"pcaProject: vectors must be dense length-$d, got positions " +
        sumsRow.map(_.getInt(0)).sorted.mkString("[", ",", "]"))
    val ns = sumsRow.map(_.getLong(2)).distinct
    require(ns.length == 1,
      "pcaProject: per-dimension counts differ — ragged or null-element vectors: " +
        sumsRow.sortBy(_.getInt(0)).map(_.getLong(2)).mkString(","))
    val n = ns.head
    val s1 = new Array[Double](d)
    sumsRow.foreach(r => s1(r.getInt(0)) = r.getLong(1).toDouble)
    // pair sums from the Gram aggregate (d²/2 rows)
    val s2 = Array.ofDim[Double](d, d)
    Gram.upperGram(spark, df, vec, d, scale).collect().foreach { r =>
      val (i, j, g) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toDouble)
      s2(i)(j) = g; s2(j)(i) = g
    }
    val mu = s1.map(_ / n)
    val cov = Array.tabulate(d, d)((i, j) => s2(i)(j) / n - mu(i) * mu(j))
    val (eval, evec) = jacobiEigen(cov) // evec columns are eigenvectors
    val order = eval.indices.sortBy(i => (-eval(i), i)).take(k)
    // sign convention: largest-|coordinate| entry positive
    val comps: Seq[Array[Double]] = order.map { c =>
      val col0 = Array.tabulate(d)(i => evec(i)(c))
      val m = col0.indices.maxBy(i => (math.abs(col0(i)), -i))
      if (col0(m) < 0) col0.map(x => -x) else col0
    }
    val proj = array(comps.map { w =>
      (0 until d).map(i =>
        lit(w(i)) * (element_at(col("__q"), i + 1).cast("double") - lit(mu(i))))
        .reduce(_ + _)
    }: _*)
    val cn2 = (0 until d).map { i =>
      val z = element_at(col("__q"), i + 1).cast("double") - lit(mu(i))
      z * z
    }.reduce(_ + _)
    base.select(col("__id").as("id"), proj.as("proj"), cn2.as("center_norm2"))
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: returns
    * (eigenvalues, V) with V's COLUMNS the eigenvectors. Fixed sweep
    * order → deterministic to the bit for identical input. */
  private[graft] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < 64 && off() > 1e-22) {
      var p = 0
      while (p < d - 1) {
        var qq = p + 1
        while (qq < d) {
          val apq = a(p)(qq)
          if (apq != 0.0) {
            val theta = (a(qq)(qq) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(qq)
              a(i)(p) = c * aip - s * aiq
              a(i)(qq) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(qq)(i)
              a(p)(i) = c * api - s * aqi
              a(qq)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(qq)
              v(i)(p) = c * vip - s * viq
              v(i)(qq) = s * vip + c * viq
              i += 1
            }
          }
          qq += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

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
      // count(col) not count(lit(1)): sum() skips a null element, so
      // counting its row would silently bias that dimension's mu/sigma
      .agg(sum(col("x")).as("s"), sum(col("x") * col("x")).as("ss"),
        count(col("x")).as("n"))
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
