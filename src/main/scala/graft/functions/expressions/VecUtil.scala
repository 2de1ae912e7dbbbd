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

  /** Polynomial rolling hash h = (h*31 + codepoint) mod P over a UTF-8
    * string. ASCII fast path reads bytes directly; non-ASCII falls back
    * to a codepoint loop (same value the per-char `ascii()` fold
    * produces). */
  def polyHash(s: UTF8String): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b < 0) return polyHashSlow(s)
      h = (h * 31 + b) % P
      i += 1
    }
    h
  }

  private def polyHashSlow(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}
