package graft

import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.BloomWordsAgg

/** The native Bloom-words aggregate must reproduce the md5 double-hash
  * position math of the two existing replicas (the Spark-side
  * `bloomPositions` expression and the driver-side `pointPositions`
  * probe) BIT-FOR-BIT — a divergent bit silently breaks file skipping in
  * one direction or correctness in the other.
  */
class BloomAggSpec extends SparkSuite {

  import spark.implicits._

  private def replica(vals: Seq[String], bits: Int, hashes: Int): Array[Long] = {
    val arr = new Array[Long](bits / 64)
    vals.foreach { v =>
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      val h1 = java.lang.Long.parseLong(hx.substring(0, 8), 16)
      val h2 = java.lang.Long.parseLong(hx.substring(8, 16), 16)
      (0 until hashes).foreach { i =>
        val p = (((h1 + i.toLong * h2) % bits + bits) % bits).toInt
        arr(p / 64) |= 1L << (p % 64)
      }
    }
    arr
  }

  test("bloom_words matches the md5 double-hash replica bit-for-bit") {
    val vals = Seq("a", "xyz", "42", "", "héllo", "k-123456789", "ASIA|1995")
    val got = vals.toDF("v")
      .agg(BloomWordsAgg.column(col("v"), 8192, 4).as("w"))
      .head().getSeq[Long](0).toArray
    assert(got.toSeq == replica(vals, 8192, 4).toSeq)
  }

  test("merge across partitions and null inputs behave") {
    val vals = (0 until 500).map(i => s"key-$i")
    val withNulls = (vals.map(Option(_)) ++ Seq(None, None)).toDF("v")
      .repartition(7)
    val got = withNulls.agg(BloomWordsAgg.column(col("v"), 8192, 4).as("w"))
      .head().getSeq[Long](0).toArray
    assert(got.toSeq == replica(vals, 8192, 4).toSeq)
    // all-null input yields the empty filter, not a crash
    val empty = Seq(Option.empty[String]).toDF("v")
      .agg(BloomWordsAgg.column(col("v"), 8192, 4).as("w"))
      .head().getSeq[Long](0)
    assert(empty.forall(_ == 0L))
  }
}
