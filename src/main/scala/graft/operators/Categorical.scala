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
    val vocab = df.select(value.as("value"))
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
  def featureHash(value: Column, buckets: Int): Column =
    pmod(graft.functions.TextFunctions.polyHash(value), lit(buckets.toLong))
}
