package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Indel-weighted fuzzy ratio (the reference's `fuzz.ratio`).
  *
  * The reference scores candidate place names with fuzzywuzzy's `fuzz.ratio`
  * (reference: src/ingest_places_data.py:58-59), which with python-Levenshtein
  * installed is `round(100 * (la + lb - d) / (la + lb))` where `d` is edit
  * distance with substitution cost 2 — equivalently `100 * 2*LCS / (la + lb)`.
  * That is NOT plain Levenshtein (SURVEY.md §2.9/F1), so Spark's builtin
  * `levenshtein()` can only approximate it.
  *
  * Implemented as a native Catalyst Expression whose generated code calls the
  * static [[FuzzyImpl.ratio]] — keeps the hot loop inside whole-stage codegen
  * instead of a boxed Scala UDF.
  */
case class FuzzRatio(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fuzz_ratio"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    FuzzyImpl.ratio(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FuzzyImpl.ratio($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FuzzyImpl {
  /** fuzz.ratio == round(100 * 2*LCS(a,b) / (|a|+|b|)), on unicode code points. */
  def ratio(a: UTF8String, b: UTF8String): Int = {
    val s = a.toString
    val t = b.toString
    val la = s.codePointCount(0, s.length)
    val lb = t.codePointCount(0, t.length)
    if (la + lb == 0) return 100
    val lcs = lcsLen(s, t)
    Math.round(100.0 * 2.0 * lcs / (la + lb)).toInt
  }

  /** Two-row DP LCS over code points; O(|a|*|b|) time, O(min) space. */
  private def lcsLen(s: String, t: String): Int = {
    val aa = s.codePoints().toArray
    val bb0 = t.codePoints().toArray
    val (lo, hi) = if (aa.length < bb0.length) (aa, bb0) else (bb0, aa)
    val prev = new Array[Int](lo.length + 1)
    val cur = new Array[Int](lo.length + 1)
    var i = 0
    while (i < hi.length) {
      var j = 0
      while (j < lo.length) {
        cur(j + 1) =
          if (hi(i) == lo(j)) prev(j) + 1
          else Math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      i += 1
    }
    prev(lo.length)
  }
}

object Fuzzy {
  /** Exact fuzz.ratio as a Column (native expression, codegen'd). */
  def fuzzRatio(a: Column, b: Column): Column =
    ExpressionUtils.column(FuzzRatio(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Oracle-expressible approximation on plain Levenshtein (SURVEY.md §2.9
    * option 1): `100 - ceil(100*lev/(|a|+|b|))`. DuckDB computes the identical
    * formula, so fuzzy queries can be hash-checked differentially.
    */
  def ratioApprox(a: Column, b: Column): Column =
    lit(100) - ceil(lit(100.0) * levenshtein(a, b) /
      greatest(length(a) + length(b), lit(1))).cast("int")
}
