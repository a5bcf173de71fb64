/*
 * KMV (k-minimum-values) distinct-count sketch as a native aggregate.
 *
 * `approx_count_distinct` (HLL++, q78) is the built-in answer, but its
 * register merges are engine-internal — no external system can replay the
 * estimate, so the oracle can only assert a tolerance band. KMV is the
 * sketch you pick when the estimate itself must be REPRODUCIBLE across
 * engines and mergeable across shards: the state is just the k smallest
 * distinct values of a portable hash, so any engine that can sort hashes
 * (DuckDB: row_number over the distinct hash set) reproduces the sketch —
 * and the estimate — bit-for-bit.
 *
 * 100 TB shape: a TypedImperativeAggregate with map-side partial
 * aggregation — every mapper ships at most k longs per group, merges are
 * set-unions truncated to k, and sketches persisted per shard/day can be
 * unioned later without rescanning (the property HLL shares but exact
 * countDistinct lacks: countDistinct shuffles EVERY distinct value to one
 * reducer per group). Beyer/Haas/Reinwald/Sismanis/Gemulla, "On synopses
 * for distinct value estimation under multiset operations" (SIGMOD 2007)
 * is the published analysis of the (k-1)/kth estimator.
 */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Keeps the k smallest DISTINCT non-null values of `hash` (a 60-bit
  * md5-derived portable hash — the q95 convention, so DuckDB replays the
  * identical longs via `('0x' || substr(md5(x), 1, 15))::BIGINT`).
  *
  * Result `struct<n_kept: int, kth: long, est: long>`:
  *   - fewer than k distinct hashes seen → the sketch IS the exact distinct
  *     set: `n_kept` = that count, `kth` null, `est` exact;
  *   - otherwise `kth` = the k-th smallest hash and
  *     `est` = floor((k-1) * 2^60 / kth) — every term is a double both
  *     engines compute identically ((k-1)*2^60 is exact in 53 bits for any
  *     sane k, the quotient is one correctly-rounded IEEE op, and floor
  *     pins the integer), so the estimate is oracle-exact, not a tolerance
  *     check.
  */
case class KmvSketch(hash: Expression, kExpr: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]]
    with ExpectsInputTypes {

  private lazy val k: Int = {
    val kk = kExpr.eval().asInstanceOf[Number].intValue()
    require(kk >= 2, s"kmv_sketch needs k >= 2, got $kk")
    kk
  }

  override def children: Seq[Expression] = Seq(hash, kExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, IntegerType)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", IntegerType, nullable = false),
    StructField("kth", LongType, nullable = true),
    StructField("est", LongType, nullable = false)))
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(buf: mutable.TreeSet[Long],
                      input: InternalRow): mutable.TreeSet[Long] = {
    val v = hash.eval(input)
    if (v != null) KmvSketch.offer(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: mutable.TreeSet[Long],
                     other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(KmvSketch.offer(buf, _, k))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any = {
    if (buf.size < k) InternalRow(buf.size, null, buf.size.toLong)
    else InternalRow(k, buf.last, KmvSketch.estimate(buf, k))
  }

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf += bb.getLong; j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), kExpr = newChildren(1))
}

object KmvSketch {
  /** Maintains "the k smallest DISTINCT values seen" — fully
    * order-independent (the final set is a pure function of the input
    * multiset), which is what makes batch partials, shard merges, and
    * streaming state updates all land on the identical sketch.
    */
  def offer(buf: mutable.TreeSet[Long], v: Long, k: Int): Unit = {
    if (buf.size < k) buf += v            // TreeSet dedups re-offers
    else if (v < buf.last && !buf.contains(v)) { buf -= buf.last; buf += v }
  }

  /** Exact count below k; floor((k-1)·2^60/kth) at k — every term a double
    * both engines compute identically (k >= 2 distinct non-negative longs
    * means the k-th smallest is > 0).
    */
  def estimate(buf: mutable.TreeSet[Long], k: Int): Long =
    if (buf.size < k) buf.size.toLong
    else math.floor((k - 1).toDouble * math.pow(2.0, 60) / buf.last.toDouble).toLong
}

/** [[KmvSketch]]'s buffer evaluated as the raw sorted bottom-k array — the
  * PERSISTABLE form: store it per (key, shard/day), merge stored arrays
  * later with `slice(array_sort(array_distinct(concat(...))), 1, k)` (the
  * exact KMV union), and derive `n_kept`/`kth`/`est` from the merged array
  * with plain column functions. The incremental-view leg
  * ([[graft.ops.IncrementalAgg]]) builds on this.
  */
case class KmvState(hash: Expression, kExpr: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]]
    with ExpectsInputTypes {

  private lazy val k: Int = {
    val kk = kExpr.eval().asInstanceOf[Number].intValue()
    require(kk >= 2, s"kmv_state needs k >= 2, got $kk")
    kk
  }

  override def children: Seq[Expression] = Seq(hash, kExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, IntegerType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_state"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]
  override def update(buf: mutable.TreeSet[Long],
                      input: InternalRow): mutable.TreeSet[Long] = {
    val v = hash.eval(input)
    if (v != null) KmvSketch.offer(buf, v.asInstanceOf[Long], k)
    buf
  }
  override def merge(buf: mutable.TreeSet[Long],
                     other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(KmvSketch.offer(buf, _, k))
    buf
  }
  override def eval(buf: mutable.TreeSet[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf += bb.getLong; j += 1 }
    buf
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), kExpr = newChildren(1))
}

object KmvColumns {
  /** `struct<n_kept, kth, est>` KMV sketch of the 60-bit hashes in `hash`. */
  def kmvSketch(hash: Column, k: Int): Column =
    ExpressionUtils.column(KmvSketch(
      ExpressionUtils.expression(hash),
      org.apache.spark.sql.catalyst.expressions.Literal(k))
      .toAggregateExpression())

  /** Sorted bottom-k distinct-hash array (the persistable sketch state). */
  def kmvState(hash: Column, k: Int): Column =
    ExpressionUtils.column(KmvState(
      ExpressionUtils.expression(hash),
      org.apache.spark.sql.catalyst.expressions.Literal(k))
      .toAggregateExpression())
}
