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

/** Jaro-Winkler runtime (shared by the native expression's interpreted and
  * generated code paths — see org.apache.spark.sql.graft.JaroWinkler).
  *
  * Semantics pinned to the textbook definition DuckDB's
  * `jaro_winkler_similarity` implements (probed empirically: MARTHA/MARHTA
  * = 0.9611…, DWAYNE/DUANE = 0.84, DIXON/DICKSONX = 0.8133…): match window
  * `max(l1,l2)/2 - 1`, transpositions = half the out-of-order matched
  * chars, Winkler boost `+ prefix·0.1·(1−jaro)` applied only when
  * jaro > 0.7 with the common prefix capped at 4, and 0.0 when either
  * string is empty (DuckDB returns 0 even for ''/''). Oracle comparisons
  * still route through round6 — the VALUE is a ratio of small integers,
  * but the two engines' op ORDER inside the final expression is not
  * contractual.
  */
object JaroWinklerImpl {
  def sim(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val l1 = s.length
    val l2 = t.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = Math.max(0, Math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = Math.max(0, i - window)
      val hi = Math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s.charAt(i) == t.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars compared in order
    var transp = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) transp += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - transp / 2.0) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < Math.min(4, Math.min(l1, l2)) &&
      s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
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

  /** Jaro-Winkler similarity in [0, 1] (native codegen'd expression) — the
    * record-linkage scorer for SHORT name-like strings, where fuzz.ratio's
    * LCS view over-penalizes transposed characters.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftColumns.jaroWinkler(a, b)
}
