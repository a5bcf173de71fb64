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
}

object VectorFunctions {
  /** Fused cosine similarity over two array<float|double> columns. */
  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftColumns.cosineSim(a, b)

  /** Fused dot product over two array<float|double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftColumns.dotProduct(a, b)
}
