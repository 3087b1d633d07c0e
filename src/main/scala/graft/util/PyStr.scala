package graft.util

import scala.collection.mutable.ArrayBuffer

/** Python `str` whitespace semantics, shared by every parity-pinned
  * port (Chunker, GrammarRules context). Java's `isWhitespace` misses
  * two families Python strips/splits on: the no-break Zs spaces
  * (NBSP, U+2007, U+202F) and NEL (U+0085).
  */
object PyStr extends Serializable {

  @inline def pySpace(c: Char): Boolean =
    Character.isWhitespace(c) ||
      Character.getType(c) == Character.SPACE_SEPARATOR ||
      c == 0x85.toChar // NEL

  /** Python no-arg `str.strip()`. */
  def pyStrip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && pySpace(s.charAt(a))) a += 1
    while (b > a && pySpace(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Python no-arg `str.split()`: runs of whitespace, no empties. */
  def pySplit(s: String): Array[String] = {
    val out = new ArrayBuffer[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (pySpace(c)) {
        if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      } else sb.append(c)
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** Python `len` (code points, not UTF-16 units). */
  @inline def pyLen(s: String): Int = s.codePointCount(0, s.length)
}
