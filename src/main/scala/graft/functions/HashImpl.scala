package graft.functions

import java.security.MessageDigest

import org.apache.spark.unsafe.types.UTF8String

/** MD5 runtime with a per-thread reused digest — Spark's builtin `md5()`
  * instantiates a MessageDigest per row, which dominates the minhash and
  * winnowing pipelines (millions of small digests per scan). Output is
  * byte-identical lowercase hex, so DuckDB oracles are unaffected.
  */
object HashImpl {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  def md5Hex(s: UTF8String): UTF8String = {
    val d = digest.get()
    d.reset()
    val out = d.digest(s.getBytes)
    val hex = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = hexChars((out(i) >> 4) & 0xf).toByte
      hex(2 * i + 1) = hexChars(out(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  /** All k-gram Karp–Rabin hashes of a string's UTF-8 bytes in ONE pass:
    * Horner polynomial `h = h*31 + byte` over each k-byte window, maintained
    * rolling (subtract the outgoing byte's 31^(k-1) term, shift, add the
    * incoming byte). O(1) per position vs a full digest per position — the
    * winnowing gram stream is the hot path this replaces. Long arithmetic
    * wraps mod 2^64, which the DuckDB oracle replays with HUGEINT math.
    * Strings shorter than k produce their single whole-string hash.
    */
  def gramHashes(s: UTF8String, k: Int): Array[Long] = {
    val bytes = s.getBytes
    val len = bytes.length
    val ng = math.max(len - k + 1, 1)
    val out = new Array[Long](ng)
    if (len <= k) {
      var h = 0L
      var j = 0
      while (j < len) { h = h * 31 + (bytes(j) & 0xff); j += 1 }
      out(0) = h
    } else {
      var h = 0L
      var j = 0
      while (j < k) { h = h * 31 + (bytes(j) & 0xff); j += 1 }
      out(0) = h
      var pow = 1L
      j = 0
      while (j < k - 1) { pow *= 31; j += 1 }
      var i = 1
      while (i < ng) {
        h = (h - (bytes(i - 1) & 0xff) * pow) * 31 + (bytes(i + k - 1) & 0xff)
        out(i) = h
        i += 1
      }
    }
    out
  }

  /** [[gramHashes]] boxed for the codegen call site. */
  def gramHashesData(s: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(gramHashes(s, k))
}
