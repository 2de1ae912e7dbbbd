package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: for every training document, the
  * fraction of its token n-gram shingles that also occur anywhere in a
  * benchmark corpus — the standard pre-training hygiene check (published
  * pipelines use 8-13-gram overlap; the n is a parameter).
  *
  * Scale story: the benchmark corpus is SMALL by construction (eval
  * sets are thousands of documents, the training corpus is billions),
  * so its distinct shingle-hash set is broadcast and the whole check is
  * one broadcast semi-join over the exploded training shingles + one
  * map-side-combinable count per doc — the 100 TB side streams, nothing
  * about it is ever shuffled wider than its own groupBy. Shingles
  * travel as mod-P hashes from the fused [[NearDup.shingleHashSets]]
  * kernel (no n-gram strings materialized); a hash collision inflates
  * overlap identically in any engine mirroring the hash, keeping the
  * check oracle-reproducible bit-for-bit.
  */
object Contamination {

  /** Per-training-doc overlap: (doc_id, hit, tot, contamination) for
    * docs sharing at least one shingle with `bench`; `hit` counts the
    * doc's distinct shingle hashes seen in the benchmark, `tot` its
    * distinct shingle count. */
  def overlap(train: DataFrame, bench: DataFrame, id: Column, text: Column,
      n: Int = 3): DataFrame = {
    val benchShingles = NearDup.shingleHashSets(bench, id, text, n)
      .select(explode(col("shingles")).as("s")).distinct()
    val ex = NearDup.shingleHashSets(train, id, text, n)
      .select(col("doc_id"), size(col("shingles")).cast("long").as("tot"),
        explode(col("shingles")).as("s"))
    ex.join(broadcast(benchShingles), Seq("s"), "left_semi")
      .groupBy(col("doc_id"), col("tot"))
      .agg(count(lit(1)).as("hit"))
      .select(col("doc_id"), col("hit"), col("tot"),
        (col("hit").cast("double") / col("tot")).as("contamination"))
  }
}
