package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** fuzz.ratio runtime (shared by the native expression's interpreted and
  * generated code paths — see org.apache.spark.sql.graft.FuzzRatio).
  */
object FuzzyImpl {
  /** fuzz.ratio == round(100 * 2*LCS(a,b) / (|a|+|b|)), on unicode code
    * points, with Python-style half-to-even rounding (fuzzywuzzy uses
    * Python's `round`, which is banker's rounding — `Math.rint` matches).
    */
  def ratio(a: UTF8String, b: UTF8String): Int = {
    val s = a.toString
    val t = b.toString
    val la = s.codePointCount(0, s.length)
    val lb = t.codePointCount(0, t.length)
    if (la + lb == 0) return 100
    val lcs = lcsLen(s, t)
    Math.rint(100.0 * 2.0 * lcs / (la + lb)).toInt
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

/** Fuzzy string similarity (the reference's `fuzz.ratio`,
  * reference: src/ingest_places_data.py:58-59). See SURVEY.md §2.9/F1.
  */
object Fuzzy {
  /** Exact fuzz.ratio as a Column (native codegen'd expression). */
  def fuzzRatio(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftColumns.fuzzRatio(a, b)

  /** Oracle-expressible approximation on plain Levenshtein (SURVEY.md §2.9
    * option 1): `100 - ceil(100*lev/(|a|+|b|))`. DuckDB computes the identical
    * formula, so fuzzy queries can be hash-checked differentially.
    */
  def ratioApprox(a: Column, b: Column): Column =
    lit(100) - ceil(lit(100.0) * levenshtein(a, b) /
      greatest(length(a) + length(b), lit(1))).cast("int")
}
