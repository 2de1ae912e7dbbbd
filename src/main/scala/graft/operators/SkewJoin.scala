package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins on hot keys.
  *
  * When one join key carries a disproportionate share of rows, the
  * shuffle sends them all to one reducer. Salting splits each hot key
  * into `saltFactor` sub-keys: the fact side gets a uniform random salt,
  * the dimension side is replicated once per salt value, and the join
  * runs on (key, salt) — spreading the hot key over `saltFactor`
  * reducers at the cost of `saltFactor`× the (small) dimension side.
  * Result set is identical to the unsalted join.
  *
  * Spark's AQE skew-join handles sort-merge skew automatically
  * (spark.sql.adaptive.skewJoin.enabled, on by default in GraftSession);
  * this operator is the explicit form for when the optimizer can't see
  * the skew (e.g. pre-aggregated inputs) or for deterministic layout
  * control.
  */
object SkewJoin {

  /** Salted inner/left equi-join: `facts` (skewed, large) ⋈ `dim`
    * (replicated saltFactor×). The salt is seeded so the physical layout
    * is identical run to run (unseeded rand() would re-derive a new salt
    * per execution — correct but nondeterministic to debug/profile). */
  def salted(
      facts: DataFrame,
      dim: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner",
      seed: Long = 0x5a17): DataFrame = {
    val saltedFacts = facts.withColumn("__salt",
      (rand(seed) * saltFactor).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFacts.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Salted aggregation for skewed group keys: partial aggregate on
    * (key, salt), then final aggregate on key. `partialAggs` build the
    * per-salt partials from input columns; `finalAggs` merge partials
    * (e.g. sum of sums, sum of counts). */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      saltFactor: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column],
      seed: Long = 0x5a17): DataFrame =
    df.withColumn("__salt", (rand(seed) * saltFactor).cast("int"))
      .groupBy(key.as("key"), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col("key"))
      .agg(finalAggs.head, finalAggs.tail: _*)
}
