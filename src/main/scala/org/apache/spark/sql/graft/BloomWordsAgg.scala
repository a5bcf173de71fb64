/*
 * Per-group Bloom-filter words as a native aggregate.
 *
 * The manifest table's per-file Bloom harvest used to EXPLODE every value
 * into its k bit positions and groupBy (file, word) — k× the rows through
 * the shuffle, and a second aggregation job next to the NDV sketch. This
 * aggregate ORs the k positions straight into a fixed Array[Long] buffer
 * (m/64 longs, map-side combinable), so ONE `groupBy(file).agg(bloom, kmv)`
 * job serves both skipping sidecars — per-commit harvest cost is one
 * aggregation pass whatever the filter math.
 */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** OR of the k md5-double-hashed bit positions of every non-null input
  * string, as `bits/64` longs. The position math matches BOTH existing
  * replicas bit-for-bit (ManifestTable.bloomPositions Spark-side,
  * pointPositions driver-side): h1/h2 = the md5 digest's first/second
  * 4 bytes as unsigned big-endian ints, position_i = (h1 + i·h2) mod bits.
  */
case class BloomWordsAgg(child: Expression, bitsExpr: Expression,
                         hashesExpr: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  private lazy val bits: Int = {
    val b = bitsExpr.eval().asInstanceOf[Number].intValue()
    require(b >= 64 && b % 64 == 0, s"bloom_words needs bits % 64 == 0, got $b")
    b
  }
  private lazy val hashes: Int = {
    val k = hashesExpr.eval().asInstanceOf[Number].intValue()
    require(k >= 1, s"bloom_words needs hashes >= 1, got $k")
    k
  }

  override def children: Seq[Expression] = Seq(child, bitsExpr, hashesExpr)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, IntegerType, IntegerType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_words"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(v.asInstanceOf[UTF8String].getBytes)
      val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var i = 0
      while (i < hashes) {
        val pos = (((h1 + i.toLong * h2) % bits) + bits) % bits
        buf(pos.toInt / 64) |= 1L << (pos % 64)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomWordsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomWordsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), bitsExpr = newChildren(1),
      hashesExpr = newChildren(2))
}

object BloomWordsAgg {
  def column(v: Column, bits: Int, hashes: Int): Column =
    ExpressionUtils.column(BloomWordsAgg(
      ExpressionUtils.expression(v),
      org.apache.spark.sql.catalyst.expressions.Literal(bits),
      org.apache.spark.sql.catalyst.expressions.Literal(hashes))
      .toAggregateExpression())
}
