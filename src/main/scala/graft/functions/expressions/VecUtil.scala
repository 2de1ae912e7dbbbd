package graft.functions.expressions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels called from generated code (Scala object methods are
  * reachable from Janino via their static forwarders). Sums run
  * left-to-right in element order — identical to the higher-order
  * `aggregate` fold they replace and to the DuckDB oracle's
  * `list_reduce`, so swapping implementations cannot change results. */
object VecUtil {

  /** Dot product of two double arrays. */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Dot product of two float arrays, accumulated in double (each float
    * widens exactly, matching cast-then-multiply semantics). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  private val P = 1000000007L

  /** Token count of a space-separated string under `split(s, " ")`
    * semantics — count of 0x20 bytes + 1 (split keeps empty tokens, so
    * the identity is exact for every input, including "" and runs of
    * spaces). Byte scan is UTF-8-safe: 0x20 never occurs inside a
    * multi-byte sequence. No array materialization — this is what makes
    * token counting ~decode-speed instead of split-speed. */
  def tokenCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var c = 1
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) c += 1
      i += 1
    }
    c
  }

  /** Polynomial rolling hash h = (h*mult + codepoint) mod P over a UTF-8
    * string. ASCII fast path reads bytes directly; non-ASCII falls back
    * to a codepoint loop (same value the per-char `ascii()` fold
    * produces). Different multipliers give independent hash families
    * (31 is the default; 131 is the second family used to widen SimHash
    * fingerprints beyond the 30 bits a single mod-P value carries). */
  def polyHash(s: UTF8String): Long = polyHash(s, 31L)

  def polyHash(s: UTF8String, mult: Long): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b < 0) return polyHashSlow(s, mult)
      h = (h * mult + b) % P
      i += 1
    }
    h
  }

  /** MinHash permutation constants: a_i, b_i < P, deterministic (the
    * single source; NearDup and the oracle SQL both read these). */
  def permA(i: Int): Long = (104729L * (i + 1)) % P
  def permB(i: Int): Long = (104659L * (i + 1)) % P

  /** k MinHash signature values over the token n-grams of a document,
    * one row-local pass — the fused form of shingle + polyHash + k
    * permutation mins. Identical values to the column formulation
    * (array_distinct(shingles) -> polyHash -> k array_min passes,
    * [[graft.operators.NearDup.minHashSignaturesCols]]) because a min
    * over the n-gram multiset equals the min over the distinct set.
    *
    * The n-gram hash is built incrementally from per-token hashes
    * without materializing the joined string: polyHash of
    * "t1 t2 ... tn" = fold of (h * 31^steps(t_j) + polyHash(t_j)) with
    * an (h*31 + 32) space step between tokens — algebraically equal to
    * hashing the concatenated string, asserted in EquivalenceSpec.
    * Returns null when the doc has fewer than n tokens (the
    * shingle-set formulation drops those docs). */
  def minHashSigs(tokens: ArrayData, n: Int, k: Int): ArrayData = {
    val t = tokens.numElements()
    if (t < n) return null
    val th = new Array[Long](t) // polyHash per token
    val tp = new Array[Long](t) // 31^steps per token
    var i = 0
    while (i < t) {
      val s = tokens.getUTF8String(i)
      th(i) = polyHash(s, 31L)
      tp(i) = pow31(s)
      i += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
    var g = 0
    while (g <= t - n) {
      var h = 0L
      var j = g
      while (j < g + n) {
        if (j > g) h = (h * 31 + 32) % P // ' ' separator
        h = (h * tp(j) + th(j)) % P
        j += 1
      }
      var x = 0
      while (x < k) {
        val v = (h * permA(x) + permB(x)) % P
        if (v < mins(x)) mins(x) = v
        x += 1
      }
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** Distinct, sorted n-gram shingle hashes of a token array — the
    * row-local fused form of shingle-string building + polyHash +
    * array_distinct (same incremental gram hash as [[minHashSigs]]).
    * Null when the doc has fewer than n tokens. */
  def shingleHashes(tokens: ArrayData, n: Int): ArrayData = {
    val t = tokens.numElements()
    if (t < n) return null
    val th = new Array[Long](t)
    val tp = new Array[Long](t)
    var i = 0
    while (i < t) {
      val s = tokens.getUTF8String(i)
      th(i) = polyHash(s, 31L)
      tp(i) = pow31(s)
      i += 1
    }
    val hs = new Array[Long](t - n + 1)
    var g = 0
    while (g <= t - n) {
      var h = 0L
      var j = g
      while (j < g + n) {
        if (j > g) h = (h * 31 + 32) % P
        h = (h * tp(j) + th(j)) % P
        j += 1
      }
      hs(g) = h
      g += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1
    var r = 1
    while (r < hs.length) {
      if (hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(hs, w))
  }

  /** 31^steps(s) mod P, where steps is the number of fold steps
    * [[polyHash]] takes for `s` (bytes on the ASCII fast path,
    * codepoints otherwise). */
  private def pow31(s: UTF8String): Long = {
    val nb = s.numBytes()
    var ascii = true
    var i = 0
    while (ascii && i < nb) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    val steps =
      if (ascii) nb
      else { val str = s.toString; str.codePointCount(0, str.length) }
    var r = 1L
    var b = 31L
    var e = steps
    while (e > 0) {
      if ((e & 1) == 1) r = r * b % P
      b = b * b % P
      e >>= 1
    }
    r
  }

  /** 60-bit SimHash fingerprint of a token array, one row-local pass:
    * per token, hash = two independent mod-P families side by side
    * (bits 0-29 from the *31 family, 30-59 from *131 — one mod-P value
    * carries only 30 varying bits); fingerprint bit b is set when more
    * than half the tokens have hash bit b set (2*ones > n, identical to
    * the sign of the +-1 occurrence sum the aggregate formulation
    * computes). Bit-for-bit equal to [[graft.operators.NearDup.simHashAgg]]
    * — asserted in EquivalenceSpec — with no explode and no shuffle. */
  def simHash60(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](60)
    var total = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val h = polyHash(t, 31L) + (polyHash(t, 131L) << 30)
        var b = 0
        while (b < 60) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
        total += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) { if (2 * counts(b) > total) fp |= 1L << b; b += 1 }
    fp
  }

  /** IEEE 754 binary16 (2 little-endian bytes, the Parquet FLOAT16
    * physical layout) -> binary32. Exact: every half value is a float.
    * Mirrors the reference's fp16 decode path
    * (hybridbackend/common/arrow.cc:48-73); same contract as JDK 21's
    * Float.float16ToFloat (unavailable on 17). */
  def halfToFloat(bytes: Array[Byte]): Float = {
    if (bytes.length != 2)
      throw new IllegalArgumentException(
        s"half_to_float expects 2-byte fp16 values, got ${bytes.length} bytes")
    halfBitsToFloat(((bytes(1) & 0xFF) << 8) | (bytes(0) & 0xFF))
  }

  def halfBitsToFloat(h: Int): Float = {
    val sign = (h & 0x8000) << 16
    val e = (h >> 10) & 0x1F
    val m = h & 0x3FF
    val f =
      if (e == 0x1F) sign | 0x7F800000 | (m << 13) // Inf / NaN
      else if (e == 0) {
        if (m == 0) sign // signed zero
        else { // subnormal half -> normal float
          var mm = m
          var ex = -1
          while ((mm & 0x400) == 0) { mm <<= 1; ex += 1 }
          sign | ((127 - 15 - ex) << 23) | ((mm & 0x3FF) << 13)
        }
      } else sign | ((e - 15 + 127) << 23) | (m << 13)
    java.lang.Float.intBitsToFloat(f)
  }

  private def polyHashSlow(s: UTF8String, mult: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}
