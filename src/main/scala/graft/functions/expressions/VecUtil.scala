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
