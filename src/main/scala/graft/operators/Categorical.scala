package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical input prep: dictionary (string-index) and hashing-trick
  * encodings — the step between raw string features and
  * [[EmbeddingLookup]]-style id-keyed training input (the reference
  * consumes pre-encoded int ids; producing them is the pipeline's job).
  *
  * Scale design: a frequency dictionary is vocabulary-sized (sublinear
  * in the corpus), built with one map-side-combinable count and ranked
  * by the two-phase [[Partitioners.stableIds]] — no single-partition
  * window even when the vocabulary is huge. Applying it is a broadcast
  * equi-join; the hashing-trick variant is a pure row-local codegen'd
  * expression with no vocabulary state at all (the classic
  * memory/collision trade).
  */
object Categorical {

  /** Frequency dictionary for `value`: (value, cnt, index) with index
    * 0..|vocab|-1 assigned by count DESC, then value ASC — the
    * conventional most-frequent-gets-0 layout. */
  def stringIndex(df: DataFrame, value: Column): DataFrame = {
    // nulls are not vocabulary: indexApply's equi-join can never match a
    // null entry, so indexing it would only shift every real value's
    // index and waste an embedding slot on an unreachable id
    val vocab = df.select(value.as("value")).filter(col("value").isNotNull)
      .groupBy(col("value")).agg(count(lit(1)).as("cnt"))
    Partitioners.stableIds(vocab, -col("cnt"), Seq(col("value")))
      .select(col("value"), col("cnt"), (col("ordinal") - 1).as("index"))
  }

  /** Join `df`'s `valueCol` to its dictionary index (broadcast — the
    * dictionary is vocabulary-sized). Unseen values (apply-time drift)
    * get index -1 rather than a dropped row. */
  def indexApply(df: DataFrame, valueCol: String, dict: DataFrame,
      as: String): DataFrame =
    df.join(
        broadcast(dict.select(col("value").as("__dv"), col("index").as("__di"))),
        df(valueCol) === col("__dv"), "left")
      .withColumn(as, coalesce(col("__di"), lit(-1L)))
      .drop("__dv", "__di")

  /** Hashing-trick encoding: pmod(polyHash(value), buckets) — stateless
    * and row-local (no dictionary to build, broadcast, or keep in sync
    * across train/serve), at the cost of hash collisions. */
  def featureHash(value: Column, buckets: Int): Column = {
    require(buckets > 0, s"featureHash: buckets must be positive, got $buckets")
    pmod(graft.functions.TextFunctions.polyHash(value), lit(buckets.toLong))
  }

  /** Leakage-safe (leave-one-out) smoothed target encoding: each row's
    * categorical becomes
    * `enc = (Σ_cat label − own label + m·prior) / (cnt_cat − 1 + m)`
    * with `prior` the global label mean — the row's OWN label is
    * excluded from its encoding (plain mean encoding leaks the target
    * into the feature; single-member categories collapse to the prior).
    * `m` is the smoothing pseudo-count pulling rare categories toward
    * the prior.
    *
    * Parity/scale: label sums accumulate in exact DECIMAL(12,2) (the q1
    * discipline — order-free, so any engine reproduces them
    * bit-for-bit), one map-side-combinable category aggregate broadcasts
    * back (category tables are vocabulary-sized), the global prior rides
    * as a one-row broadcast, and the encoding itself is row-local with
    * one fixed double expression shape rounded to 9 decimals.
    *
    * @return input + `target_enc`
    */
  def targetEncodeLoo(df: DataFrame, cat: Column, label: Column,
      smoothing: Long, labelCents: Boolean = false): DataFrame = {
    require(smoothing > 0, s"targetEncodeLoo: smoothing must be positive, got $smoothing")
    // two accumulation modes, identical results for 2-dp labels:
    // DECIMAL(12,2) sums (general exact path) or integer-cents longs
    // (q1_pricing_summary_cents discipline — primitive codegen'd sums,
    // measured 2.5x faster at 20M rows because Decimal partial
    // aggregation is boxed). cents/100.0 and DECIMAL→DOUBLE both yield
    // the correctly-rounded double of the same exact rational, so the
    // final expression is bit-identical either way (spec-asserted).
    val y: Column =
      if (labelCents) round(label * 100).cast("long")
      else label.cast(org.apache.spark.sql.types.DecimalType(12, 2))
    def toDouble(c: Column): Column =
      if (labelCents) c.cast("double") / 100.0 else c.cast("double")
    val withCat = df.withColumn("__cat", cat).withColumn("__y", y)
    // stats over NON-NULL categories and labels: count(__y) (not
    // count(*)) so a null label cannot deflate its category's mean, and
    // the category aggregate subtree stays canonically identical to the
    // prior's source, so ReuseExchange collapses them to one physical
    // aggregation instead of two corpus scans
    val stats = withCat.filter(col("__cat").isNotNull).groupBy(col("__cat"))
      .agg(sum(col("__y")).as("__sum"), count(col("__y")).as("__cnt"))
    // global prior from the category-sized stats table, not a second
    // corpus aggregate — Σ of exact per-category sums equals the direct
    // corpus sum bit-for-bit, and it saves a full input scan (the naive
    // three-scan plan measured 1.4x slower at 20M rows). nullif: a
    // fully-unlabeled corpus yields a null prior, not NaN.
    val prior = stats.agg(
      (toDouble(sum(col("__sum"))) / nullif(sum(col("__cnt")), lit(0L))).as("__prior"))
    // LEFT join + explicit branches: every input row comes back (the
    // "@return input + target_enc" contract) — a null/unseen category
    // encodes as the prior, a null-label row takes the category mean
    // WITHOUT the own-label exclusion (it contributed nothing to
    // exclude), and the common case is the LOO formula
    withCat
      .join(broadcast(stats), Seq("__cat"), "left")
      .crossJoin(broadcast(prior))
      .withColumn("target_enc",
        when(col("__cnt").isNull, round(col("__prior"), 9))
          .otherwise(when(col("__y").isNull,
            round((coalesce(toDouble(col("__sum")), lit(0.0))
                + lit(smoothing) * col("__prior"))
              / (col("__cnt") + lit(smoothing)), 9))
          .otherwise(round((toDouble(col("__sum")) - toDouble(col("__y"))
              + lit(smoothing) * col("__prior"))
            / (col("__cnt") - 1 + lit(smoothing)), 9))))
      .drop("__cat", "__y", "__sum", "__cnt", "__prior")
  }
}
