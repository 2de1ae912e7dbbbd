package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sharded embedding lookup as a distributed hash equi-join.
  *
  * The reference rewrites `embedding_lookup` into partition_by_modulo →
  * alltoallv → unique → local gather → alltoallv back → gather-restore
  * (reference: hybridbackend/tensorflow/embedding/sharding.py:168-205).
  * Semantically that is `ids LEFT JOIN table ON id = key`, preserving
  * input multiplicity and order. On Spark the physical plan *is* the
  * rewrite: Exchange hashpartitioning ≡ partition+alltoallv, hash join
  * build ≡ local gather, AQE's broadcast switch ≡ the reference's
  * unsharded small-table path (sharding.py:174-176).
  */
object EmbeddingLookup {

  /** Look up `valueCols` from `table` for every row of `ids`.
    * Multiplicity-preserving left join; missing keys yield nulls (callers
    * may coalesce a default). `broadcastDim = true` forces the
    * small-dimension path. `preserveOrder` re-sorts by the input's
    * original position — at cluster scale ordering is a presentation
    * concern, so it is opt-in (costs one extra sort).
    */
  def lookup(
      ids: DataFrame,
      idCol: String,
      table: DataFrame,
      keyCol: String,
      valueCols: Seq[String],
      broadcastDim: Boolean = false,
      preserveOrder: Boolean = false): DataFrame = {
    // rename the dim key before joining: drop(keyCol) after a join would
    // remove BOTH columns when idCol and keyCol share a name
    val dim0 = table.select(col(keyCol).as("__dim_key") +: valueCols.map(col): _*)
    val dim = if (broadcastDim) broadcast(dim0) else dim0
    if (preserveOrder) {
      val withOrd = ids.withColumn("__pos", monotonically_increasing_id())
      withOrd
        .join(dim, withOrd(idCol) === dim("__dim_key"), "left")
        .orderBy(col("__pos"))
        .drop("__pos", "__dim_key")
    } else {
      ids.join(dim, ids(idCol) === dim("__dim_key"), "left").drop("__dim_key")
    }
  }

  /** Distinct-id pre-aggregation before the join — the reference's
    * `unique` step (sharding.py:186-195) that collapses duplicate ids
    * before the expensive exchange. Worth it when ids are highly
    * repetitive: join the distinct ids, then map results back by a
    * second (cheap, co-partitioned) join. */
  def lookupDedup(
      ids: DataFrame,
      idCol: String,
      table: DataFrame,
      keyCol: String,
      valueCols: Seq[String]): DataFrame = {
    // rename the dim key before joining (same reason as lookup():
    // col(idCol) after the join is ambiguous when idCol == keyCol)
    val dim = table.select(col(keyCol).as("__dim_key") +: valueCols.map(col): _*)
    val uniqueIds = ids.select(col(idCol)).distinct()
    val fetched = uniqueIds.join(dim, col(idCol) === col("__dim_key"), "left")
      .select(col(idCol) +: valueCols.map(col): _*)
    ids.join(fetched, Seq(idCol), "left")
  }

  /** Dense input-layer assembly — the data-prep form of the reference's
    * embedding-column input layer (`hb.dense_features` /
    * `tf.feature_column`: docs/high_level_api.md:76-100,
    * embedding/deeprecev.py): each categorical id is looked up in the
    * embedding table, misses are default-filled with a zero vector (the
    * reference's lookup-miss default), and the per-example input tensor
    * is the concatenation [numerics ++ embedding(cat0) ++ embedding(cat1)
    * ++ …] as one `array<double>` column — exactly what an estimator's
    * input layer would see, produced by the engine instead of inside the
    * model graph.
    *
    * Scale: one broadcast hash join per categorical column (embedding
    * tables are vocabulary-sized; pass `broadcastDim = false` for
    * beyond-memory vocabularies to shuffle on the key instead), zero-fill
    * dimension travels as a broadcast one-row aggregate — no collect, no
    * shuffle of the example side on the broadcast path.
    *
    * @param examples  one row per training example
    * @param exampleId output key column
    * @param numerics  dense feature expressions (cast to double, caller
    *                  does any scaling/rounding)
    * @param cats      categorical id expressions (long-castable), e.g.
    *                  [[Categorical.featureHash]] output
    * @param table     embedding table
    * @param keyCol    id column of `table`
    * @param vecCol    float/double array column of `table`
    */
  def inputLayer(
      examples: DataFrame,
      exampleId: Column,
      numerics: Seq[Column],
      cats: Seq[Column],
      table: DataFrame,
      keyCol: String,
      vecCol: String,
      broadcastDim: Boolean = true): DataFrame = {
    require(cats.nonEmpty, "inputLayer: at least one categorical column")
    val dim0 = table.select(col(keyCol).cast("long").as("__k"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val dim = if (broadcastDim) broadcast(dim0) else dim0
    // zero-fill width from a broadcast one-row aggregate (plan stays
    // lazy). min==max guard: a ragged table would zero-fill misses at a
    // different width than hits carry, silently varying the per-example
    // tensor length; an EMPTY table has no width at all (null) — both
    // must fail loudly, not produce malformed features. assert_true
    // keeps the check inside the lazy plan (no driver action).
    val width = broadcast(table.agg(
      min(size(col(vecCol))).as("__zmin"), max(size(col(vecCol))).as("__zmax"))
      .select(when(assert_true(col("__zmin").isNotNull && col("__zmin") === col("__zmax"),
          lit("inputLayer: embedding table is empty or ragged — uniform non-null " +
            "vector widths required")).isNull,
        col("__zmin")).as("__zdim")))
    val base = examples.select(
      exampleId.as("id") +:
        (numerics.zipWithIndex.map { case (c, i) => c.cast("double").as(s"__n$i") } ++
          cats.zipWithIndex.map { case (c, i) => c.cast("long").as(s"__c$i") }): _*)
      .crossJoin(width)
    val joined = cats.indices.foldLeft(base) { (df, i) =>
      df.join(dim.as(s"__dim$i"), col(s"__c$i") === col(s"__dim$i.__k"), "left")
        .withColumn(s"__e$i",
          coalesce(col(s"__dim$i.__v"), array_repeat(lit(0.0), col("__zdim"))))
        .drop(col(s"__dim$i.__k")).drop(col(s"__dim$i.__v"))
    }
    val numArr = array(numerics.indices.map(i => col(s"__n$i")): _*)
    joined.select(col("id"),
      concat(numArr +: cats.indices.map(i => col(s"__e$i")): _*).as("features"))
  }

  /** Cache split — the `HbLookup` hit/miss partition (reference:
    * embedding/lookup_ops.cc:38-47): split keys into those present in
    * the cache table and those missing. */
  def cacheSplit(
      ids: DataFrame,
      idCol: String,
      cache: DataFrame,
      keyCol: String): (DataFrame, DataFrame) = {
    val keys = cache.select(col(keyCol).as(idCol))
    (ids.join(keys, Seq(idCol), "left_semi"), ids.join(keys, Seq(idCol), "left_anti"))
  }
}
