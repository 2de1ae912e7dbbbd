package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus/table profiling — the data-quality pass a training pipeline
  * runs before committing a snapshot: per-column summaries and value
  * histograms. Everything is a single aggregation pass (map-side
  * combinable), deterministic to the bit (means accumulate in DECIMAL
  * and cast to DOUBLE at the end — the same float discipline as the
  * metric suite), so an external engine reproduces the profile exactly.
  */
object Profile {

  /** One row per requested column: (column, n, n_null, min, max, mean).
    * min/max/mean as DOUBLE; mean is exact-DECIMAL-accumulated. All
    * columns profile in ONE aggregate over one scan (no per-column
    * passes), then unpivot to rows via a literal stack. */
  def summary(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.distinct.size == cols.size,
      s"summary: column list must be non-empty and duplicate-free, got ${cols.mkString(",")}")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        (count(lit(1)) - count(col(c))).as(s"__nn_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        // exact DECIMAL sum, then ONE double division — decimal/int
        // division scale rules differ across engines, double division
        // of the same exact sum does not
        (sum(col(c).cast("decimal(30,10)")).cast("double") / count(col(c)))
          .as(s"__mean_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n"),
        col(s"__nn_$c").as("n_null"), col(s"__min_$c").as("min"),
        col(s"__max_$c").as("max"), col(s"__mean_$c").as("mean"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** A declarative data-quality expectation: rows where `pred` is FALSE
    * OR NULL count as violations (a null input cannot satisfy "value in
    * range" — the Great-Expectations convention), and the expectation
    * passes while the violation rate stays within `maxPpm` parts per
    * million (0 = no violations tolerated). The rate check is exact
    * integer arithmetic (`violations·10⁶ ≤ maxPpm·n`) — no float
    * threshold to drift across engines. */
  final case class Expectation(name: String, pred: Column, maxPpm: Long = 0L)

  /** Evaluate all expectations in ONE aggregation over one scan (N
    * checks never cost N passes; every conditional sum is map-side
    * combinable), then unpivot to a row per expectation:
    * (name, violations, n_rows, pass). The gate a pipeline puts in
    * front of committing a snapshot. */
  def expect(df: DataFrame, exps: Seq[Expectation]): DataFrame = {
    require(exps.nonEmpty, "expect: need at least one expectation")
    require(exps.map(_.name).distinct.size == exps.size,
      s"expect: duplicate expectation names in ${exps.map(_.name).mkString(",")}")
    // coalesce: sum over ZERO rows is null, and a null violation count
    // would make `pass` null too — an indeterminate gate verdict on an
    // empty snapshot, where "0 violations tolerated" trivially holds
    val aggs = count(lit(1)).as("__n") +: exps.zipWithIndex.map { case (e, i) =>
      coalesce(sum(when(coalesce(e.pred, lit(false)), 0L).otherwise(1L)), lit(0L)).as(s"__v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = exps.zipWithIndex.map { case (e, i) =>
      struct(lit(e.name).as("name"), col(s"__v$i").as("violations"),
        col("__n").as("n_rows"),
        (col(s"__v$i") * 1000000L <= lit(e.maxPpm) * col("__n")).as("pass"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Equi-width histogram of a numeric column: `bins` buckets over the
    * observed [min, max] (derived lazily, broadcast back — no collect),
    * top bucket closed. Returns (bin, lo, hi, n) rows for non-empty
    * bins. The bucket arithmetic is plain double math mirrored by the
    * oracle. */
  def histogram(df: DataFrame, value: Column, bins: Int): DataFrame = {
    require(bins > 0, s"histogram: bins must be positive, got $bins")
    // non-finite values are excluded from the histogram entirely: one
    // +/-Inf row would otherwise poison the [lo, hi] domain and collapse
    // every finite value into one bucket (same rationale as
    // Buckets.finiteOrNull); a NaN has no orderable bin either way
    val v = df.select(Buckets.finiteOrNull(value.cast("double")).as("v"))
      .filter(col("v").isNotNull)
    val stats = v.agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))
    v.crossJoin(broadcast(stats))
      .withColumn("bin", Buckets.rangeBucket(col("v"), col("__lo"), col("__hi"), bins))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        min(col("__lo")).as("__lo"), min(col("__hi")).as("__hi"))
      .select(col("bin"),
        (col("__lo") + col("bin") * (col("__hi") - col("__lo")) / bins).as("lo"),
        (col("__lo") + (col("bin") + 1) * (col("__hi") - col("__lo")) / bins).as("hi"),
        col("n"))
  }
}
