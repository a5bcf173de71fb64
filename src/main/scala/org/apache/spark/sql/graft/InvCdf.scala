/*
 * Broadcast sorted-array inverse-CDF lookup.
 *
 * Replaces the quantile-normalization lookup join
 * `rows.join(broadcast(inv), pr <= cdf).groupBy(...).agg(min(calib))` — a
 * BroadcastNestedLoopJoin that compares every data row against the whole
 * bucket relation (O(rows x buckets) at 100 TB; VERDICT r08 #1) — with a
 * per-row binary search over ONE broadcast sorted array:
 * O(log buckets) per row, zero join, zero post-join aggregation.
 *
 * Lives in the sql package tree for the same reason as GraftExpressions: the
 * Column <-> Expression bridge is private[sql].
 */
package org.apache.spark.sql.graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The broadcast payload: `cuts` is an ascending array of CDF breakpoints,
  * `values(i)` the (Catalyst-internal, boxed) answer for any probe `pr` with
  * `cuts(i-1) < pr <= cuts(i)`. [[lookup]] returns the value at the FIRST
  * breakpoint `>= pr` — exactly the `min(calib) WHERE pr <= cdf` of the join
  * form, because the CDF is strictly increasing in the bucket sort order.
  * Probes above the last breakpoint clamp to it (unreachable for percent
  * ranks: pr <= 1.0 and the final CDF value is exactly n/n = 1.0).
  */
final class InvCdfTable(val cuts: Array[Double], val values: Array[AnyRef])
    extends Serializable {
  require(cuts.length == values.length,
    s"cuts/values length mismatch: ${cuts.length} vs ${values.length}")

  def lookup(pr: Double): AnyRef = {
    var lo = 0
    var hi = cuts.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) >= pr) hi = mid else lo = mid + 1
    }
    values(lo)
  }
}

/** `inv_cdf_lookup(pr)`: binary search of a broadcast [[InvCdfTable]]. The
  * table rides the expression as a `Broadcast` HANDLE — tasks fetch the
  * arrays from the block manager once per executor, not once per task
  * closure — and the generated code resolves it once per operator instance.
  */
case class InvCdfLookup(child: Expression, bc: Broadcast[InvCdfTable],
                        valueType: DataType)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = valueType
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "inv_cdf_lookup"

  @transient private lazy val table: InvCdfTable = bc.value

  override protected def nullSafeEval(pr: Any): Any =
    table.lookup(pr.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tblClass = classOf[InvCdfTable].getName
    val bcRef = ctx.addReferenceObj("invCdfBc", bc,
      classOf[Broadcast[InvCdfTable]].getName)
    val tbl = ctx.addMutableState(tblClass, "invCdfTable",
      v => s"$v = ($tblClass) $bcRef.value();")
    val boxed = CodeGenerator.boxedType(dataType)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = (($boxed) $tbl.lookup($c));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object InvCdf {

  /** External (collected Row) value -> Catalyst-internal boxed value. Only
    * the types a quantile-normalization score can carry; extend as needed.
    */
  private def toInternal(v: Any, dt: DataType): AnyRef = {
    require(v != null, "quantile-normalization scores must be non-null")
    dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | BooleanType => v.asInstanceOf[AnyRef]
      case StringType => UTF8String.fromString(v.asInstanceOf[String])
      case d: DecimalType =>
        org.apache.spark.sql.types.Decimal(v.asInstanceOf[java.math.BigDecimal],
          d.precision, d.scale)
      case other => throw new IllegalArgumentException(
        s"inv_cdf_lookup: unsupported score type $other")
    }
  }

  private def numeric(row: Row, i: Int): Double = {
    require(!row.isNullAt(i), "quantile-normalization scores must be non-null")
    row.get(i) match {
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"mean quantile normalization needs a numeric score, got $other")
    }
  }

  /** Global inverse CDF (quantileNormalize): `sorted` is the distinct-score
    * bucket relation `(calib, cnt)` in ascending calib order (Spark-side
    * sort, so string scores keep UTF8 binary order — identical to the old
    * window's `ORDER BY calib`). The CDF is `cum/n` in the same long-sum /
    * double-division arithmetic the window form used, so every breakpoint
    * double is bit-identical to the join version's.
    */
  def globalTable(spark: SparkSession, sorted: Array[Row],
                  valueType: DataType): Broadcast[InvCdfTable] = {
    val n = sorted.iterator.map(_.getLong(1)).sum.toDouble
    val cuts = new Array[Double](sorted.length)
    val values = new Array[AnyRef](sorted.length)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i).getLong(1)
      cuts(i) = cum.toDouble / n
      values(i) = toInternal(sorted(i).get(0), valueType)
      i += 1
    }
    spark.sparkContext.broadcast(new InvCdfTable(cuts, values))
  }

  /** Cross-source MEAN inverse CDF (quantileNormalizeMean): `sorted` is the
    * per-(source, score) bucket relation `(bst, bv, cnt)` sorted by
    * (bst, bv). The per-source CDFs are merged ON THE DRIVER into one table:
    * breakpoints are the union of all sources' CDF values, and each
    * breakpoint's value is `cast(sum(cast(v_s as decimal(18,6))) as double)
    * / nSources` — the exact decimal arithmetic of the old
    * join + groupBy-min + groupBy-decimal-mean, replayed with
    * `BigDecimal.valueOf(v).setScale(6, HALF_UP)` (= Spark's double->
    * decimal(18,6) cast) and exact decimal adds (order-independent). Every
    * source contributes exactly one value at any pr (its last CDF value is
    * exactly 1.0 >= pr), so the divisor is always nSources. Per-row cost is
    * then ONE binary search, independent of the source count.
    *
    * Scores are read as doubles: integral scores above 2^53 would lose
    * precision (callers with such scores should pre-scale; percentile
    * semantics are magnitude-free).
    */
  def meanTable(spark: SparkSession, sorted: Array[Row]): Broadcast[InvCdfTable] = {
    // split into per-source (cdfs, vals) runs — input is sorted by (bst, bv)
    val srcs = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Array[Double])]
    var start = 0
    while (start < sorted.length) {
      var end = start
      while (end < sorted.length && sorted(end).get(0) == sorted(start).get(0)) end += 1
      val m = end - start
      val cdfs = new Array[Double](m)
      val vals = new Array[Double](m)
      var cum = 0L
      var ns = 0L
      var i = start
      while (i < end) { ns += sorted(i).getLong(2); i += 1 }
      i = start
      while (i < end) {
        cum += sorted(i).getLong(2)
        cdfs(i - start) = cum.toDouble / ns.toDouble
        vals(i - start) = numeric(sorted(i), 1)
        i += 1
      }
      srcs += ((cdfs, vals))
      start = end
    }
    val nSrc = srcs.length
    val cuts = srcs.iterator.flatMap(_._1.iterator).toArray.distinct.sorted
    val means = new Array[AnyRef](cuts.length)
    if (nSrc > 0) {
      def dec(v: Double): JBigDecimal =
        JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP)
      val ptr = new Array[Int](nSrc)
      var sum = JBigDecimal.ZERO
      var s = 0
      while (s < nSrc) { sum = sum.add(dec(srcs(s)._2(0))); s += 1 }
      var i = 0
      while (i < cuts.length) {
        val c = cuts(i)
        s = 0
        while (s < nSrc) {
          val (cdfs, vals) = srcs(s)
          while (ptr(s) < cdfs.length - 1 && cdfs(ptr(s)) < c) {
            sum = sum.subtract(dec(vals(ptr(s)))).add(dec(vals(ptr(s) + 1)))
            ptr(s) += 1
          }
          s += 1
        }
        means(i) = java.lang.Double.valueOf(sum.doubleValue() / nSrc.toDouble)
        i += 1
      }
    }
    spark.sparkContext.broadcast(new InvCdfTable(cuts, means))
  }

  /** The Column surface (private[sql] bridge, GraftColumns convention). */
  def lookup(pr: Column, bc: Broadcast[InvCdfTable], valueType: DataType): Column =
    ExpressionUtils.column(
      InvCdfLookup(ExpressionUtils.expression(pr.cast("double")), bc, valueType))
}
