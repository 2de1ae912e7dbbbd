package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling primitives for training-data pipelines: deterministic
  * seeded sampling, stratified (per-class) sampling, and negative
  * downsampling — the usual class-imbalance tooling for recommender
  * data. All narrow (per-row Bernoulli on a seeded hash), no shuffle,
  * reproducible across runs and partition layouts.
  */
object Sampling {

  /** Deterministic Bernoulli sample: keep a row iff
    * hash(key, seed) mod 1e6 < fraction*1e6. Unlike `df.sample`, the
    * decision depends only on the key — stable under re-partitioning
    * and re-runs (the property pipelines need for reproducible
    * train/test splits). */
  def bernoulliByKey(df: DataFrame, key: Column, fraction: Double, seed: Long): DataFrame =
    df.filter(pmod(xxhash64(key, lit(seed)), lit(1000000L)) < (fraction * 1e6).toLong)

  /** Mod-P mixing of an integer key — the engine-portable hash used by
    * the `*ModP` sampling variants. Two rounds of multiply-add mod
    * P = 1e9+7 (same prime as the text-hash family): plain integer
    * arithmetic that any SQL engine reproduces bit-for-bit, unlike
    * xxhash64. Products stay under 2^63 (P² ≈ 2^60). */
  private val P = graft.functions.TextFunctions.P
  private val MixA = 104729L
  private val MixB = 104659L
  def modPHash(key: Column, seed: Long): Column =
    pmod(pmod(pmod(key, lit(P)) * MixA + seed, lit(P)) * MixB + lit(1L), lit(P))

  /** [[bernoulliByKey]] with the portable mod-P hash: same keep/drop
    * contract, reproducible outside Spark (for cross-engine pipelines
    * and external verification). Prefer xxhash64 when portability is
    * not needed — it mixes better on adversarial key sets. */
  def bernoulliByKeyModP(df: DataFrame, key: Column, fraction: Double, seed: Long): DataFrame =
    df.filter(pmod(modPHash(key, seed), lit(1000000L)) < (fraction * 1e6).toLong)

  /** [[stratified]] with the portable mod-P hash. */
  def stratifiedModP(df: DataFrame, stratum: Column, key: Column,
      fractions: Map[String, Double], seed: Long): DataFrame = {
    val frac = fractions.foldLeft(lit(1.0)) { case (acc, (v, f)) =>
      when(stratum === v, lit(f)).otherwise(acc)
    }
    df.filter(pmod(modPHash(key, seed), lit(1000000L)).cast("double") < frac * 1e6)
  }

  /** Per-stratum fractions (e.g. downsample negatives): map of stratum
    * value -> keep fraction; unlisted strata keep everything. */
  def stratified(df: DataFrame, stratum: Column, key: Column,
      fractions: Map[String, Double], seed: Long): DataFrame = {
    val frac = fractions.foldLeft(lit(1.0)) { case (acc, (v, f)) =>
      when(stratum === v, lit(f)).otherwise(acc)
    }
    df.filter(pmod(xxhash64(key, lit(seed)), lit(1000000L)).cast("double") < frac * 1e6)
  }

  /** Importance sampling: keep each row with probability equal to its
    * `weight` (clamped to [0,1]) — quality-weighted corpus curation
    * where better documents survive proportionally more often. Same
    * portable mod-P coin as the other `*ModP` samplers, so the
    * keep/drop set is deterministic, layout-invariant and reproducible
    * by any engine that mirrors the weight expression. Narrow (no
    * shuffle). */
  def weightedByKeyModP(df: DataFrame, key: Column, weight: Column, seed: Long): DataFrame = {
    // NaN weight = keep-probability 0 (drop): the conservative default
    // for a curation sampler — without the branch, Spark's NaN-is-
    // greatest comparison makes greatest(NaN,0)=NaN, least(NaN,1)=1.0
    // and an undefined quality score would survive on EVERY run
    val wd = weight.cast("double")
    val w = when(isnan(wd), lit(0.0)).otherwise(least(greatest(wd, lit(0.0)), lit(1.0)))
    df.filter(pmod(modPHash(key, seed), lit(1000000L)).cast("double") < w * 1e6)
  }

  /** Deterministic train/val/test split: each row's label is a pure
    * function of its key hash — layout-invariant, reproducible, and
    * STABLE UNDER CORPUS GROWTH (a doc never changes split when other
    * docs arrive, unlike randomSplit). Thresholds are integer
    * micro-fractions (round(frac*1e6) cumulated as longs), so the split
    * boundaries are exact and any engine mirroring the hash reproduces
    * the assignment bit-for-bit — no FP cumulative sums. Narrow, no
    * shuffle.
    *
    * @param fractions (label, fraction) in order; fractions must sum to
    *                  1 within 1e-6 (the last bucket absorbs the rest)
    */
  def splitAssign(df: DataFrame, key: Column,
      fractions: Seq[(String, Double)], seed: Long): DataFrame = {
    require(fractions.nonEmpty, "splitAssign needs at least one split")
    // the ONE definition of the cut points — splitThresholds is what
    // external oracles mirror, so the assignment must use it verbatim
    val cum = splitThresholds(fractions)
    require(math.abs(cum.last - 1000000L) <= 1,
      s"splitAssign fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val h6 = pmod(modPHash(key, seed), lit(1000000L))
    val label = fractions.map(_._1).zip(cum).dropRight(1)
      .foldRight(lit(fractions.last._1): Column) { case ((name, c), els) =>
        when(h6 < c, lit(name)).otherwise(els)
      }
    df.withColumn("split", label)
  }

  /** The integer micro-fraction thresholds [[splitAssign]] compares
    * against — exposed so the oracle SQL mirrors the exact cut points. */
  def splitThresholds(fractions: Seq[(String, Double)]): Seq[Long] =
    fractions.map(f => math.round(f._2 * 1e6)).scanLeft(0L)(_ + _).tail

  /** Exactly-k-per-group sample: within each `group`, keep the k rows
    * with the smallest portable key hash (ties broken by the key
    * itself, so the sample is total-ordered and layout-invariant).
    * Hash-ordering makes this a *deterministic reservoir*: every row
    * wins with equal probability, the same rows win on every run and
    * any partitioning, and the sample is downward-consistent (the k=10
    * sample is a superset of the k=5 sample — useful for growing eval
    * sets without resampling). One shuffle on the group key; the window
    * is per-group, never global.
    *
    * PRECONDITION (same as [[SeqPack.packContiguous]]'s order key):
    * `key` must uniquely identify rows within a group — duplicate keys
    * tie on the full ordering tuple, making which physical row wins
    * partition-order-dependent, which voids the layout-invariance and
    * downward-consistency guarantees above. */
  def perGroupSample(df: DataFrame, group: Column, key: Column, k: Int, seed: Long): DataFrame = {
    require(k > 0, s"perGroupSample: k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(modPHash(key, seed), key)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Data-mixture resampling: subsample the corpus so the kept rows hit
    * target per-stratum proportions EXACTLY (up to floor rounding) —
    * the "data mixing" step of LLM corpus assembly (rebalance web/books/
    * code sources to a training recipe). Strata not in `shares` are
    * dropped.
    *
    * The output size is the largest N with `share_s * N <= count_s` for
    * every stratum (no stratum can be oversampled — this op never
    * duplicates rows), i.e. `N = min_s(count_s / share_s)`; each stratum
    * then keeps its `floor(share_s * N)` smallest-hash rows, so the
    * sample is deterministic, layout-invariant and downward-consistent
    * (same reservoir contract — and same key-uniqueness PRECONDITION —
    * as [[perGroupSample]]).
    *
    * Plan: one groupBy for the ≤|strata|-row count table, quotas derived
    * lazily and broadcast back, one per-stratum window. No collect —
    * the whole recipe is a single lazy plan. */
  def rebalanceToMix(df: DataFrame, stratum: Column, key: Column,
      shares: Map[String, Double], seed: Long): DataFrame = {
    require(shares.nonEmpty && shares.values.forall(s => s > 0),
      "rebalanceToMix: shares must be positive")
    val shareCol = shares.foldLeft(lit(null).cast("double")) { case (acc, (v, f)) =>
      when(stratum === v, lit(f)).otherwise(acc)
    }
    val tagged = df.withColumn("__share", shareCol).filter(col("__share").isNotNull)
    // N is the min over the RECIPE's strata, not just those present in
    // the data: a recipe stratum with zero rows makes the mixture
    // infeasible (N = 0, empty output) rather than silently delivering
    // renormalized proportions of the remaining strata. The literal
    // share list left-joins the observed counts so absent strata
    // contribute cnt = 0.
    val shareRows = shares.toSeq.map { case (v, f) =>
      struct(lit(v).as("__s"), lit(f).as("__sh"))
    }
    val shareDf = df.sparkSession.range(1)
      .select(explode(array(shareRows: _*)).as("e")).select(col("e.*"))
    val counts = tagged.groupBy(stratum.as("__s")).agg(count(lit(1)).as("__cnt"))
    val byShare = shareDf.join(counts, Seq("__s"), "left")
      .withColumn("__cnt", coalesce(col("__cnt"), lit(0L)))
    val total = byShare.agg(min(col("__cnt").cast("double") / col("__sh")).as("__N"))
    val quotas = byShare.crossJoin(broadcast(total))
      .select(col("__s"), floor(col("__sh") * col("__N")).cast("long").as("__quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(modPHash(key, seed), key)
    tagged.withColumn("__rn", row_number().over(w))
      .join(broadcast(quotas), stratum === col("__s"))
      .filter(col("__rn") <= col("__quota"))
      .drop("__share", "__s", "__quota", "__rn")
  }

  /** Negative downsampling for binary labels: keep all positives, a
    * fraction of negatives — the standard CTR-data imbalance fix. */
  def downsampleNegatives(df: DataFrame, label: Column, key: Column,
      negativeFraction: Double, seed: Long): DataFrame =
    df.filter(label ||
      pmod(xxhash64(key, lit(seed)), lit(1000000L)) < (negativeFraction * 1e6).toLong)

  /** Deterministic candidate-negative generation (recommender /
    * contrastive training prep — the sampled-softmax "draw k random
    * items per example" step): for each input row, `k` item ids from
    * [0, itemCount) drawn by the portable seeded mod-P hash of
    * (key·k + draw). Row-local — no shuffle, no RNG state — so it is
    * layout-invariant, reproducible across runs, and mirrorable by an
    * external engine. A draw that collides with the row's positive is
    * shifted by one (mod itemCount), so every emitted row is a true
    * negative. Output: (key, pos, draw_idx, neg), k rows per input.
    * `key·k + draw` must stay within long range (keys below ~2⁶⁰/k). */
  def negativesPerKey(df: DataFrame, key: Column, positive: Column, k: Int,
      itemCount: Long, seed: Long): DataFrame = {
    require(k > 0, s"negativesPerKey needs k > 0, got $k")
    require(itemCount > 1, s"negativesPerKey needs itemCount > 1, got $itemCount")
    val draws = (0 until k).map { i =>
      struct(lit(i.toLong).as("draw_idx"),
        pmod(modPHash(key * lit(k.toLong) + lit(i.toLong), seed), lit(itemCount)).as("raw"))
    }
    df.select(key.as("key"), positive.as("pos"), explode(array(draws: _*)).as("d"))
      .select(col("key"), col("pos"), col("d.draw_idx").as("draw_idx"),
        when(col("d.raw") === col("pos"),
          pmod(col("d.raw") + 1, lit(itemCount))).otherwise(col("d.raw")).as("neg"))
  }
}
