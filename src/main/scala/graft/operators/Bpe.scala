package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding tokenizer: distributed training + codegen'd
  * inference — the canonical LLM-prep tokenization the "BPE-ish regex"
  * token counter approximates.
  *
  * Training follows the original word-dictionary formulation (Sennrich
  * et al. 2016, the algorithm every production BPE trainer uses): the
  * corpus collapses to a word-frequency dictionary with ONE distributed
  * aggregation, and the merge loop runs over that bounded dictionary —
  * pair statistics over distinct words weighted by frequency are
  * EXACTLY the corpus pair statistics, so no per-merge corpus pass
  * exists. At 100 TB the word aggregation is the only data-scale job
  * (map-side combined, vocabulary-bounded output); the driver loop sees
  * at most `maxWords` rows (deterministic frequency-then-lexicographic
  * top-k), the same bounded-model-materialization discipline as
  * [[Ivf.kmeans]] centroids.
  *
  * Determinism: ties in pair frequency break lexicographically, the
  * word top-k breaks on the word, and inference applies merges by rank
  * — identical results on any partition layout (spec-asserted).
  *
  * Simplifications vs a production tokenizer, documented: whitespace
  * pre-tokenization (no regex word classes), UTF-16-char initial
  * symbols (BMP; no byte fallback), no end-of-word marker. The merge
  * loop and inference rank semantics are the real algorithm.
  */
object Bpe {

  /** Learn `numMerges` merges from a text column. Returns rank-ordered
    * symbol pairs. */
  def train(df: DataFrame, text: Column, numMerges: Int,
      maxWords: Int = 100000): Seq[(String, String)] = {
    require(numMerges > 0, s"Bpe.train: numMerges must be positive, got $numMerges")
    require(maxWords > 0, s"Bpe.train: maxWords must be positive, got $maxWords")
    val wordFreq: Array[(Array[String], Long)] =
      df.select(explode(split(text, " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(maxWords)
        .collect()
        .map(r => (r.getString(0).map(String.valueOf(_)).toArray, r.getLong(1)))

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    val words = wordFreq.map { case (syms, f) => (mutable.ArrayBuffer(syms: _*), f) }
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max frequency, lexicographic tie-break — deterministic
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words.foreach { case (syms, _) =>
          // left-to-right non-overlapping replacement
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms(i) = best._1 + best._2
              syms.remove(i + 1)
            }
            i += 1
          }
        }
        m += 1
      }
    }
    merges.toSeq
  }

  /** Encode a text column with a trained merge table: array<string> of
    * BPE tokens (native codegen'd kernel, row-local). */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.expressions.GraftExpressions.bpe_encode(text, merges)
}
