package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Text-hash runtime shared by the native expressions' interpreted and
  * generated code paths (see org.apache.spark.sql.graft.SimHash64).
  */
object TextImpl {

  /** FNV-1a 64-bit over UTF-8 bytes — public-domain hash, deterministic
    * across JVMs and platforms.
    */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash: per-token FNV-1a, bitwise majority vote. */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = fnv1a64(tokens.getUTF8String(t).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
