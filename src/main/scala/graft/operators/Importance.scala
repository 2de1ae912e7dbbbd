package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style importance resampling (Data Selection via Importance
  * Resampling, Xie et al. 2023): select the raw-corpus documents whose
  * hashed n-gram feature distribution looks most like a target corpus.
  * The published recipe — hashed unigram bucket counts per corpus,
  * per-bucket smoothed log-likelihood-ratio weights, a per-document
  * importance score that is the sum of its occurrences' bucket
  * weights, then keep the highest-scoring documents — is the standard
  * data-selection step in front of LLM pretraining (the reference's
  * data pipeline stops at dedup/sampling; this is the selection stage
  * a training-data engine adds on top —
  * /root/reference/docs/data.md:1-40 motivates the pipeline position).
  *
  * Scale/parity design:
  *   - The ONLY data-volume stages are the two token explodes, each
  *     feeding a map-side-combinable `groupBy(bucket).count` whose
  *     group count is bounded by `buckets` — the shuffle carries at
  *     most `buckets` partial rows per map partition no matter the
  *     corpus size.
  *   - The weight table is `buckets` rows by construction, so the
  *     per-occurrence weight join is always a broadcast; the per-doc
  *     score is one more map-side-combinable aggregation.
  *   - Float parity is engineered the way [[TermStats.bigramCrossEntropy]]
  *     does it: each bucket weight is `round((ln(pT) - ln(pR)) * 1e9)`
  *     as a BIGINT nano-log — both `ln` arguments are exact-integer
  *     ratios evaluated identically by any engine, and every cross-row
  *     aggregate after that point is order-free integer arithmetic.
  *   - Selection is `ORDER BY score DESC LIMIT n`, which Spark plans as
  *     TakeOrderedAndProject — per-partition top-n, only n-row
  *     fragments travel; ties break on doc_id for determinism.
  */
object Importance {

  /** Hashed feature bucket of a token: polyHash (mult family) reduced
    * mod `buckets` — non-negative, mirrored by the oracle as
    * `(polyHashSql % buckets)`. */
  def tokenBucket(tok: Column, buckets: Int, mult: Long = 31L): Column = {
    // guard where the parameter is first consumed: pmod(h, 0) would
    // yield NULL buckets and silently collapse every count onto one key
    require(buckets > 1, s"tokenBucket: buckets must be > 1, got $buckets")
    pmod(TextFunctions.polyHashMult(tok, mult), lit(buckets.toLong))
  }

  private def tokenBuckets(docs: DataFrame, id: Column, text: Column,
      buckets: Int, mult: Long): DataFrame =
    Parallelism.ensureDefault(docs.select(id.as("doc_id"), text.as("__text")))
      .select(col("doc_id"),
        explode(TextFunctions.tokenize(col("__text"))).as("tok"))
      .select(col("doc_id"), tokenBucket(col("tok"), buckets, mult).as("b"))

  /** Per-bucket nano-log importance weights
    * `round((ln((cT+1)/(nT+B)) - ln((cR+1)/(nR+B))) * 1e9)` — add-one
    * smoothed log-likelihood ratio of the target vs raw hashed-unigram
    * distributions. Output is at most `buckets` rows: (b, w_nano). */
  def bucketWeights(raw: DataFrame, target: DataFrame, id: Column, text: Column,
      buckets: Int, mult: Long = 31L): DataFrame = {
    val ct = tokenBuckets(target, id, text, buckets, mult)
      .groupBy("b").agg(count(lit(1)).as("ct"))
    val cr = tokenBuckets(raw, id, text, buckets, mult)
      .groupBy("b").agg(count(lit(1)).as("cr"))
    // an empty (or all-null-text) corpus makes the token sum NULL and
    // every downstream weight silently NULL — fail loudly inside the
    // lazy plan instead (same assert_true discipline as
    // EmbeddingLookup.inputLayer's width guard)
    def totalOrFail(agg: DataFrame, c: String, which: String): DataFrame =
      agg.select(when(assert_true(col(c).isNotNull,
          lit(s"bucketWeights: $which corpus has no tokens — importance weights undefined"))
          .isNull, col(c)).as(c))
    val nt = totalOrFail(ct.agg(sum(col("ct")).as("nt")), "nt", "target")
    val nr = totalOrFail(cr.agg(sum(col("cr")).as("nr")), "nr", "raw")
    // full outer: a bucket seen in only one corpus still gets a weight
    // (the +1 smoothing is exactly what makes that well-defined)
    cr.join(ct, Seq("b"), "full_outer")
      .select(col("b"),
        coalesce(col("ct"), lit(0L)).as("ct"), coalesce(col("cr"), lit(0L)).as("cr"))
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("b"),
        (round(log((col("ct") + 1).cast("double") / (col("nt") + buckets)) * 1e9) -
          round(log((col("cr") + 1).cast("double") / (col("nr") + buckets)) * 1e9))
          .cast("long").as("w_nano"))
  }

  /** Per-document importance scores of the RAW corpus against the
    * target distribution: (doc_id, n_tokens, score_nano) where
    * score_nano = Σ over token occurrences of the token's bucket
    * weight. Documents with no tokens produce no row (their likelihood
    * ratio is empty — same convention as the LM scorer). */
  def importanceScores(raw: DataFrame, target: DataFrame, id: Column, text: Column,
      buckets: Int, mult: Long = 31L): DataFrame = {
    // NOTE the raw corpus is deliberately tokenized TWICE (once for the
    // bucket counts, once for the score join) — the same 2-pass choice
    // as LOO target encoding: the columnar scan + codegen explode is
    // cheap to repeat, while persisting the exploded token frame would
    // materialize a structure far larger than the input at corpus scale.
    val w = bucketWeights(raw, target, id, text, buckets, mult)
    tokenBuckets(raw, id, text, buckets, mult)
      .join(broadcast(w), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("w_nano")).as("score_nano"))
  }

  /** The resampling step: the `n` highest-importance raw documents
    * (ties on doc_id), planned as TakeOrderedAndProject. */
  def resampleTopN(raw: DataFrame, target: DataFrame, id: Column, text: Column,
      buckets: Int, n: Int, mult: Long = 31L): DataFrame =
    importanceScores(raw, target, id, text, buckets, mult)
      .orderBy(col("score_nano").desc, col("doc_id"))
      .limit(n)
}
