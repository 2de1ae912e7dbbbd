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

  /** The salt expression both operators use: a seeded hash of the
    * row-identity columns when given (fully deterministic, independent
    * of input partition layout — property-tested), else `rand(seed)`
    * (deterministic only for a fixed scan layout). Exposed so tests
    * exercise the production formula, not a copy. */
  def saltColumn(saltBy: Seq[String], saltFactor: Int, seed: Long): Column =
    if (saltBy.nonEmpty)
      pmod(xxhash64(lit(seed) +: saltBy.map(col): _*), lit(saltFactor)).cast("int")
    else (rand(seed) * saltFactor).cast("int")

  /** Salted inner/left equi-join: `facts` (skewed, large) ⋈ `dim`
    * (replicated saltFactor×).
    *
    * Salt assignment must spread rows of the SAME hot key across salts,
    * so it cannot be a function of the join key. With `saltBy` columns
    * given (any row-identity columns — a primary key, an event id), the
    * salt is a seeded hash of them: fully deterministic, independent of
    * input partition layout (same guarantee [[Sampling]]'s mod-P hashing
    * gives — property-tested under repartitioned inputs). Without
    * `saltBy` it falls back to `rand(seed)`, which is deterministic only
    * for a FIXED scan layout (Spark seeds rand per partition), not
    * across layout changes — fine for spreading, weaker for debugging. */
  def salted(
      facts: DataFrame,
      dim: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner",
      seed: Long = 0x5a17,
      saltBy: Seq[String] = Nil): DataFrame = {
    val saltedFacts = facts.withColumn("__salt", saltColumn(saltBy, saltFactor, seed))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFacts.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Salted aggregation for skewed group keys: partial aggregate on
    * (key, salt), then final aggregate on key. `partialAggs` build the
    * per-salt partials from input columns; `finalAggs` merge partials
    * (e.g. sum of sums, sum of counts). `saltBy` as in [[salted]]:
    * row-identity columns give a layout-independent deterministic salt. */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      saltFactor: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column],
      seed: Long = 0x5a17,
      saltBy: Seq[String] = Nil): DataFrame = {
    df.withColumn("__salt", saltColumn(saltBy, saltFactor, seed))
      .groupBy(key.as("key"), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col("key"))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
