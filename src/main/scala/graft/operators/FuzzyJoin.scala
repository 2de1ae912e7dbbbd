package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy self-join via deletion-neighborhood blocking
  * (the SymSpell construction): each string emits itself plus every
  * single-character deletion as join keys; two strings within
  * Levenshtein distance 1 ALWAYS share a variant (substitution → delete
  * the differing position from both; insertion/deletion → the shorter
  * string is itself a variant of the longer), so an equi-join over
  * variants finds every qualifying pair — no cross product, exact
  * recall, and the verify step re-checks the distance so blocking can
  * never add false pairs.
  *
  * Scale: the variant table is rows × (len+1) — linear blow-up with
  * 8-byte-hashable keys, shuffled by variant like any equi-join;
  * candidate volume is bounded by true near-matches plus same-variant
  * collisions (short strings collide more — filter by a minimum length
  * upstream for noisy corpora). The all-pairs alternative is O(n²) and
  * exists here only as the oracle's semantic definition.
  */
object FuzzyJoin {

  /** All unordered pairs (idA < idB) whose strings are within
    * Levenshtein distance 1. Output: (id_a, id_b, dist). */
  def selfJoinLev1(df: DataFrame, id: Column, str: Column): DataFrame = {
    val base = df.select(id.as("__fid"), str.as("__fs"))
    val dels = when(length(col("__fs")) > 0,
      transform(sequence(lit(1), length(col("__fs"))),
        i => concat(col("__fs").substr(lit(1), i - 1),
          col("__fs").substr(i + 1, length(col("__fs"))))))
      .otherwise(array().cast("array<string>"))
    val variants = base.select(col("__fid"), col("__fs"),
      explode(array_union(array(col("__fs")), dels)).as("__v"))
    val a = variants.select(col("__fid").as("id_a"), col("__fs").as("sa"), col("__v"))
    val b = variants.select(col("__fid").as("id_b"), col("__fs").as("sb"), col("__v").as("__vb"))
    a.join(b, col("__v") === col("__vb") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sa"), col("sb"))
      .distinct() // a pair can share several variants (repeated chars)
      .filter(levenshtein(col("sa"), col("sb")) <= 1)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("sa"), col("sb")).cast("long").as("dist"))
  }
}
