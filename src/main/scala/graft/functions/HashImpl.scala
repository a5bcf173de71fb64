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
}
