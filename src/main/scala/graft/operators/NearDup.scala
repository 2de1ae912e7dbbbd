package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over a document corpus: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: every variant avoids the O(n²) all-pairs comparison.
  * Jaccard joins only pairs sharing a shingle; MinHash compares only
  * pairs sharing an LSH band bucket (sub-linear candidate set); SimHash
  * reduces each document to one 60-bit fingerprint (pairs = bucketed
  * hamming neighbors). Hash arithmetic is plain mod-P integer math so
  * an external oracle can reproduce results bit-for-bit.
  */
object NearDup {

  // ---- shingle sets ----------------------------------------------------

  /** (id, shingles: distinct token n-grams). Shingling is CPU-bound and
    * narrow, so the input is spread across cores first (no-op at real
    * scale — see [[Parallelism]]). */
  def shingleSets(docs: DataFrame, id: Column, text: Column, n: Int = 3): DataFrame =
    Parallelism.ensureDefault(docs.select(id.as("doc_id"), text.as("__text")))
      .select(col("doc_id"),
        array_distinct(shingles(tokenize(col("__text")), n)).as("shingles"))
      .filter(size(col("shingles")) > 0)

  // ---- exact -----------------------------------------------------------

  /** Exact duplicate groups by full text: (text groups with count and
    * the kept representative = min id). Hash-groupBy — one shuffle,
    * map-side combinable. */
  def exactGroups(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(text.as("text"))
      .agg(count(lit(1)).as("n"), min(id).as("keeper"))

  // ---- n-gram Jaccard --------------------------------------------------

  /** All pairs with Jaccard(shingle sets) >= threshold. Candidate pairs
    * come from an equi-join on shared shingles (never a cross join), and
    * because shingle sets are distinct per doc, the per-pair join row
    * count IS the intersection size — so Jaccard needs only a count
    * aggregate plus two (small, broadcastable) size lookups. No
    * array_intersect over candidate pairs, no distinct pass: one shuffle
    * join + one groupBy. */
  def jaccardPairs(docs: DataFrame, id: Column, text: Column,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sets = shingleSets(docs, id, text, n)
    val ex = sets.select(col("doc_id"), explode(col("shingles")).as("s"))
    val shared = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    // sizes is corpus-cardinality (one row/doc): no broadcast hint — let
    // AQE pick broadcast when it fits and shuffle-join when it doesn't
    val sizes = sets.select(col("doc_id"), size(col("shingles")).as("sz"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "nb"), "doc_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Attach exact Jaccard to candidate (doc_a, doc_b) pairs and filter.
    * Right for a SMALL candidate set (e.g. LSH survivors): two joins
    * against the shingle arrays + an array_intersect per pair. For
    * candidate sets comparable to the corpus itself, use the count-based
    * path inside [[jaccardPairs]] instead (arrays never travel). */
  def verifyJaccard(cand: DataFrame, sets: DataFrame, threshold: Double): DataFrame = {
    val a = sets.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = sets.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("shared").cast("double")
          / (size(col("sh_a")) + size(col("sh_b")) - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // ---- MinHash + LSH ---------------------------------------------------

  /** Permutation constants for MinHash: a_i, b_i < P, deterministic. */
  def permA(i: Int): Long = (104729L * (i + 1)) % P
  def permB(i: Int): Long = (104659L * (i + 1)) % P

  /** MinHash signatures: (doc_id, m0..m{k-1}) — min over shingles of
    * (a_i * polyHash(s) + b_i) mod P per permutation. Computed entirely
    * row-locally (hash the shingle array once, then k array_min passes)
    * — NO shuffle: the explode+groupBy formulation moves every
    * (doc, shingle) pair through an exchange, this moves nothing. */
  def minHashSignatures(sets: DataFrame, k: Int = 16): DataFrame = {
    val withHashes = sets.select(col("doc_id"),
      transform(col("shingles"), s => polyHash(s)).as("hs"))
    val mins = (0 until k).map(i =>
      array_min(transform(col("hs"), h => (h * permA(i) + permB(i)) % P)).as(s"m$i"))
    withHashes.select(col("doc_id") +: mins: _*)
  }

  /** Band hash: fold the band's signature slice with h = (h*31 + m) mod P. */
  private def bandHash(cols: Seq[Column]): Column =
    cols.foldLeft(lit(0L))((acc, m) => (acc * 31 + m) % P)

  /** LSH candidate pairs: documents sharing any band bucket.
    * k = bands * rowsPerBand.
    *
    * Pairs are generated bucket-locally (groupBy bucket, then all pairs
    * within the collected id list) instead of a bucket self-join — one
    * aggregation instead of recomputing the signature pipeline on both
    * join sides, and pair explosion stays confined to each (tiny)
    * bucket. */
  def lshCandidates(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = sig.select(col("doc_id"),
      explode(array((0 until bands).map { j =>
        struct(lit(j).as("band"),
          bandHash((0 until rowsPerBand).map(r => col(s"m${j * rowsPerBand + r}"))).as("bh"))
      }: _*)).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.bh"))
    val buckets = banded.groupBy(col("band"), col("bh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val pairs = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        y => struct(x.as("a"), y.as("b")))))
    buckets.select(explode(pairs).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: signatures -> band buckets ->
    * candidate pairs -> exact-Jaccard verification. */
  def minHashNearDups(docs: DataFrame, id: Column, text: Column,
      n: Int = 3, k: Int = 16, bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    // no cache: every reuse of `sets` is a narrow scan+shingle pass, so
    // recomputation is cheaper than a materialization barrier
    val sets = shingleSets(docs, id, text, n)
    val cand = lshCandidates(minHashSignatures(sets, k), bands, k / bands)
    verifyJaccard(cand, sets, threshold)
  }

  // ---- SimHash ---------------------------------------------------------

  // 60 bits: two independent 30-bit mod-P hash families side by side
  // (a single mod-P value carries only 30 varying bits — 1e9+7 < 2^30 —
  // so a wider fingerprint MUST combine two hashes or the upper bits are
  // constant zero and every band above bit 30 degenerates into a single
  // all-corpus bucket; a 30-bit space also proved too dense — hamming<=6
  // matched 60% of all pairs on a small-vocabulary corpus)
  val SimHashBits = 60

  /** SimHash near-duplicate pairs: fingerprints within `maxHamming`
    * bits. Candidates come from banded bucketing — the 60 fingerprint
    * bits split into (maxHamming+1) bands, so any pair within the
    * hamming budget shares at least one exact band (pigeonhole) and
    * recall is exact; verification is one bit_count(xor). */
  def simHashNearDups(docs: DataFrame, id: Column, text: Column,
      maxHamming: Int = 6): DataFrame = {
    val fp = simHash(docs, id, text)
    val nBands = maxHamming + 1
    // split SimHashBits into nBands near-equal (offset, width) slices
    val widths = Array.tabulate(nBands)(j =>
      SimHashBits / nBands + (if (j < SimHashBits % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val banded = fp.select(col("doc_id"), col("simhash"),
      explode(array((0 until nBands).map { j =>
        struct(lit(j).as("band"),
          shiftright(col("simhash"), offsets(j))
            .bitwiseAND((1L << widths(j)) - 1).as("bv"))
      }: _*)).as("e"))
      .select(col("doc_id"), col("simhash"), col("e.band"), col("e.bv"))
    val buckets = banded.groupBy(col("band"), col("bv"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("ids"))
      .filter(size(col("ids")) > 1)
    val pairs = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        y => struct(x.getField("doc_id").as("a"), y.getField("doc_id").as("b"),
          x.getField("simhash").as("fa"), y.getField("simhash").as("fb")))))
    buckets.select(explode(pairs).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"),
        expr("bit_count(p.fa ^ p.fb)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** 60-bit SimHash fingerprint per document: bit b of the fingerprint
    * is set when the occurrence-weighted sum of (±1 per token, + when
    * token-hash bit b is set) is positive. The token hash places two
    * independent mod-P hash families side by side (bits 0-29 from the
    * *31 family, 30-59 from the *131 family) so all 60 bits genuinely
    * vary. One explode + one groupBy with 60 sum-aggregates. */
  def simHash(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = Parallelism.ensureDefault(docs.select(id.as("doc_id"), text.as("__text")))
      .select(col("doc_id"), explode(tokenize(col("__text"))).as("t"))
      .withColumn("h", polyHash(col("t")) + shiftleft(polyHash2(col("t")), 30))
    val sums = (0 until SimHashBits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"w$b"))
    toks.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        (0 until SimHashBits).map(b =>
          when(col(s"w$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }
}
