package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.ArrayData

/** Dense-vector runtime for the similarity operators (SURVEY.md §7:
  * llm/SimSearch) — static methods shared by the native expressions'
  * interpreted and generated code paths (see
  * org.apache.spark.sql.graft.{CosineSimilarity, DotProduct}).
  */
object VectorImpl {
  /** cosine = dot/(sqrt(na)*sqrt(nb)), accumulated in index order — the same
    * sequential evaluation order as DuckDB's list_cosine_similarity, so the
    * differential hash-check compares bitwise-identical doubles.
    *
    * Dimension mismatch throws (DuckDB's oracle errors too — silently
    * truncating would mask bad embedding data); zero-norm yields NaN.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"cosine_similarity: dimension mismatch ($n vs ${b.numElements()})")
    }
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
    dot / (Math.sqrt(na) * Math.sqrt(nb))
  }

  /** Plain dot product, same fused-loop + strict-dimension rationale. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"dot_product: dimension mismatch ($n vs ${b.numElements()})")
    }
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** round(d, 6) exactly as Spark's `Round` evaluates doubles (NaN/Inf pass
    * through; otherwise decimal-string HALF_UP at scale 6) — the nearest-*
    * argmins below must rank by the very doubles the old
    * `round(..., 6)`-then-window pipelines ranked by, or a tie could
    * resolve differently between the two implementations.
    */
  def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Argmin over a packed codebook by (round-6 squared L2 asc, cid asc):
    * `cents` is `array<struct<cid: long, cv: array<double>>>`, the fold per
    * entry is the exact [[graft.llm.ProductQuant.sqDist]] sequence
    * (((0+t₀²)+t₁²)+…). Returns `InternalRow(d, cid)` of the winner, null
    * only for an empty entry set. NaN distances (impossible on finite
    * inputs) rank last via Double.compare — the window form's asc-NaN-last
    * convention.
    */
  def nearestSq(v: ArrayData, cents: ArrayData): Any = {
    val n = v.numElements()
    val m = cents.numElements()
    var found = false
    var bd = 0.0
    var bc = 0L
    var i = 0
    while (i < m) {
      val e = cents.getStruct(i, 2)
      val cid = e.getLong(0)
      val cv = e.getArray(1)
      if (cv.numElements() != n) {
        throw new IllegalArgumentException(
          s"nearest_sq: dimension mismatch ($n vs ${cv.numElements()})")
      }
      var acc = 0.0
      var j = 0
      while (j < n) {
        val t = v.getDouble(j) - cv.getDouble(j)
        acc += t * t
        j += 1
      }
      val d = round6(acc)
      if (!found || java.lang.Double.compare(d, bd) < 0 ||
          (java.lang.Double.compare(d, bd) == 0 && cid < bc)) {
        found = true; bd = d; bc = cid
      }
      i += 1
    }
    if (!found) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bd, bc))
  }

  /** Argmax over a packed centroid set by (round-6 cosine desc, cent_id
    * asc): `cents` is `array<struct<cent_id: long, cent_emb:
    * array<double>>>`. NaN scores (zero-norm vectors) are SKIPPED — the
    * assignTo convention: a vector scoring NaN against every centroid is
    * unassignable and yields null (caller drops the row), matching the old
    * pre-window isnan filter.
    */
  def nearestCosine(v: ArrayData, cents: ArrayData): Any = {
    val m = cents.numElements()
    var found = false
    var bs = 0.0
    var bc = 0L
    var i = 0
    while (i < m) {
      val e = cents.getStruct(i, 2)
      val cid = e.getLong(0)
      val cs = round6(cosine(v, e.getArray(1)))
      if (!java.lang.Double.isNaN(cs) &&
          (!found || cs > bs || (cs == bs && cid < bc))) {
        found = true; bs = cs; bc = cid
      }
      i += 1
    }
    if (!found) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bs, bc))
  }
}

object VectorFunctions {
  /** Fused cosine similarity over two array<float|double> columns. */
  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftColumns.cosineSim(a, b)

  /** Fused dot product over two array<float|double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftColumns.dotProduct(a, b)
}
