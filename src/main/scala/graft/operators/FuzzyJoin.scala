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
    * Levenshtein distance 1. Output: (id_a, id_b, dist).
    *
    * Variants are tagged with their deletion POSITION (−1 for the
    * identity variant): a substitution pair shares the variant obtained
    * by deleting the SAME position from both strings, and an
    * insertion/deletion pair matches the shorter string's identity
    * against one deletion of the longer — so candidates join on
    * (variant, pos) plus a variant-equal/identity-residual pass, which
    * prunes the distance-2 pairs that share a variant via two DIFFERENT
    * deletions (on low-entropy keys — zero-padded ids, URLs — those are
    * the overwhelming bulk of untagged collisions). */
  def selfJoinLev1(df: DataFrame, id: Column, str: Column): DataFrame = {
    // parallelism floor (same guard as the text kernels): the variant
    // Generate + broadcast probe + per-candidate levenshtein verify are
    // narrow CPU-bound work over the RAW row count — a small input (one
    // parquet split) would otherwise run the dominant stage on as many
    // tasks as there are file splits (event-log measured at sf0.1: the
    // fused probe/verify stage ran on 3 tasks at ~1.4 s each while 29
    // cores idled; ensureDefault is a no-op at real scale where splits
    // already exceed cores)
    val base = Parallelism.ensureDefault(
      df.select(id.as("__fid"), str.as("__fs")))
    val dels = when(length(col("__fs")) > 0,
      transform(sequence(lit(1), length(col("__fs"))),
        i => struct(
          concat(col("__fs").substr(lit(1), i - 1),
            col("__fs").substr(i + 1, length(col("__fs")))).as("v"),
          i.as("pos"))))
      .otherwise(array().cast("array<struct<v:string,pos:int>>"))
    // no array_distinct: deletion structs always differ in pos, so it
    // could never deduplicate — repeated-char pairs collapse in the
    // final .distinct() instead
    val taggedDels = base.select(col("__fid"), col("__fs"),
      explode(dels).as("__t"))
      .select(col("__fid"), col("__fs"), col("__t.v").as("__v"), col("__t.pos").as("__p"))
    // three structurally-bounded candidate joins, no bare-variant join:
    // (1) substitution: deletions meet deletions on (variant, SAME pos) —
    //     bucket mates must agree on every other character
    val dA = taggedDels.select(col("__fid").as("id_a"), col("__fs").as("sa"),
      col("__v"), col("__p"))
    val dB = taggedDels.select(col("__fid").as("id_b"), col("__fs").as("sb"),
      col("__v").as("__vb"), col("__p").as("__pb"))
    val subs = dA.join(dB,
      col("__v") === col("__vb") && col("__p") === col("__pb") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sa"), col("sb"))
    // (2) insertion/deletion: a full string meets the other's deletion —
    //     the identity side is corpus-sized (no variant blow-up) and a
    //     match requires the deletion to EQUAL a real string
    val idsA = base.select(col("__fid").as("ia"), col("__fs").as("fa"))
    val indel = idsA.join(dB, col("fa") === col("__vb") && col("ia") =!= col("id_b"))
      .select(least(col("ia"), col("id_b")).as("id_a"),
        greatest(col("ia"), col("id_b")).as("id_b"),
        when(col("ia") < col("id_b"), col("fa")).otherwise(col("sb")).as("sa"),
        when(col("ia") < col("id_b"), col("sb")).otherwise(col("fa")).as("sb"))
    // (3) exact duplicates: identities meet identities
    val idsB = base.select(col("__fid").as("id_b"), col("__fs").as("fb"))
    val dups = idsA.join(idsB, col("fa") === col("fb") && col("ia") < col("id_b"))
      .select(col("ia").as("id_a"), col("id_b"), col("fa").as("sa"), col("fb").as("sb"))
    subs.unionByName(indel).unionByName(dups)
      .distinct() // a pair can share several tagged variants (repeated chars)
      // compute the O(len²) edit distance ONCE per surviving pair —
      // Spark does not eliminate the common subexpression across a
      // Filter and the Project above it
      .withColumn("dist", levenshtein(col("sa"), col("sb")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
