package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Dense-vector primitives for the north-star similarity operators
  * (SURVEY.md §7: llm/SimSearch) over `array<double>` embedding columns.
  *
  * A single fused loop (dot + both norms in one pass) as a native Catalyst
  * expression: stays inside whole-stage codegen and allocates nothing per row,
  * unlike a `zip_with`+`aggregate` composition which materializes intermediate
  * arrays — the difference is the whole game when the crossJoin fan-out is
  * |queries| × |corpus| rows on a 100 TB corpus.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorImpl.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorImpl.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorImpl {
  /** cosine = dot/(sqrt(na)*sqrt(nb)), summed in index order (matches the
    * DuckDB oracle's sequential list_cosine_similarity evaluation).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = Math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (Math.sqrt(na) * Math.sqrt(nb))
  }

  /** Plain dot product, same fused-loop rationale. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = Math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorImpl.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorImpl.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a.cast("array<double>")),
      ExpressionUtils.expression(b.cast("array<double>"))))

  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a.cast("array<double>")),
      ExpressionUtils.expression(b.cast("array<double>"))))
}
