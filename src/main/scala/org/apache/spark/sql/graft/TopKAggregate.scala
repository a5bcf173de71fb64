/*
 * Bounded-heap top-k-per-group aggregate.
 *
 * The window formulation of per-group top-k (`row_number().over(partitionBy
 * key orderBy score) <= k`) shuffles EVERY row to its key's reducer and sorts
 * the whole group. This TypedImperativeAggregate keeps a k-bounded heap per
 * group instead: map-side partial aggregation means each mapper ships at most
 * k rows per key, and no full sort ever happens — the difference between
 * shuffling |corpus| and |keys|*k at 100 TB.
 */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Accumulates the k (score, id) pairs with the highest score; ties prefer
  * the SMALLER id (pinned, so results are deterministic and oracle-able).
  * Result: `array<struct<score: double, id: long>>` sorted score desc,
  * id asc.
  */
case class TopKByScore(score: Expression, id: Expression, kExpr: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
    with ExpectsInputTypes {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, LongType, IntegerType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by_score"

  // min-heap on (score asc, id desc): the head is the WORST kept entry —
  // evict it when a better (higher score, or equal score with smaller id)
  // candidate arrives
  private def heapOrdering: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrdering)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    s: Double, i: Long): Unit = {
    // NaN compares false against everything: it could neither be evicted nor
    // ranked consistently with the window form — treat it as unrankable
    if (s.isNaN) return
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val (ws, wi) = buf.head
      if (s > ws || (s == ws && i < wi)) { buf.dequeue(); buf.enqueue((s, i)) }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (s, i) => offer(buf, s, i) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

object TopKColumns {
  /** `array<struct<score,id>>` of the k best (score desc, id asc) per group. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(TopKByScore(
      ExpressionUtils.expression(score),
      ExpressionUtils.expression(id),
      org.apache.spark.sql.catalyst.expressions.Literal(k))
      .toAggregateExpression())
}
