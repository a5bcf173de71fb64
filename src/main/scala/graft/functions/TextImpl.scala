package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Text-hash runtime shared by the native expressions' interpreted and
  * generated code paths (see org.apache.spark.sql.graft.SimHash64).
  */
object TextImpl {

  /** FNV-1a 64-bit over UTF-8 bytes — public-domain hash, deterministic
    * across JVMs and platforms.
    */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Stopword tables for the language-ID heuristic — the single source of
    * truth, re-exported by graft.llm.TextStats and compiled into the
    * [[langId]] lookup table below.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "you", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "ich", "zu"),
    "es" -> Seq("el", "la", "que", "los", "y", "en", "un", "ser", "se", "no"),
    "fr" -> Seq("le", "les", "des", "et", "dans", "en", "un", "du", "une", "est"),
    "zh" -> Seq("的", "一", "是", "不", "了", "人", "我", "在", "有", "他"))

  private val langsSorted: Array[String] = stopwords.keys.toArray.sorted
  private val langsUtf8: Array[org.apache.spark.unsafe.types.UTF8String] =
    langsSorted.map(org.apache.spark.unsafe.types.UTF8String.fromString)
  private val und = org.apache.spark.unsafe.types.UTF8String.fromString("und")

  /** The "undetermined" label, shared with LangId's null branch. */
  def undLabel: org.apache.spark.unsafe.types.UTF8String = und

  /** token -> bitmask of language indexes (a token can appear in several
    * lists: "en"/"un" sit in both es and fr). UTF8String keys so probe
    * tokens need no conversion.
    */
  private val tokenLangMask: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
    for ((lang, words) <- stopwords; w <- words) {
      val key = org.apache.spark.unsafe.types.UTF8String.fromString(w)
      val idx = langsSorted.indexOf(lang)
      val prev: Integer = m.getOrDefault(key, 0)
      m.put(key, prev | (1 << idx))
    }
    m
  }

  /** Language ID over a LOWERCASE token array: one hash lookup per token
    * into the stopword mask table, argmax over per-language hit counts with
    * ties going to the alphabetically-first language; no hits -> "und".
    * Exactly the semantics of graft.llm.TextStats.langIdFromTokens, without
    * its 5 interpreted array-lambda passes per row.
    */
  def langId(tokens: ArrayData): org.apache.spark.unsafe.types.UTF8String = {
    val counts = new Array[Int](langsSorted.length)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val mask = tokenLangMask.getOrDefault(tokens.getUTF8String(i), 0)
        if (mask != 0) {
          var m = mask.intValue()
          var b = 0
          while (m != 0) {
            if ((m & 1) != 0) counts(b) += 1
            m >>>= 1
            b += 1
          }
        }
      }
      i += 1
    }
    var best = -1
    var bestHits = 0
    var j = 0
    while (j < counts.length) {
      if (counts(j) > bestHits) { bestHits = counts(j); best = j }
      j += 1
    }
    if (best < 0) und else langsUtf8(best)
  }

  /** 64-bit SimHash: per-token FNV-1a, bitwise majority vote. */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = fnv1a64(tokens.getUTF8String(t).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Replicates Spark's `round(double, scale)` exactly: Spark's Round goes
    * through scala BigDecimal(d) == java BigDecimal.valueOf(d) (the SHORTEST
    * decimal representation, not the exact binary expansion), HALF_UP. The
    * native entropy kernel must produce bit-identical values to the
    * relational round()-chain it replaces — LlmSpec pins the differential.
    */
  private def roundHalfUp(x: Double, scale: Int): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(scale, java.math.RoundingMode.HALF_UP)

  /** One-pass Shannon character entropy over codepoints: (n_chars,
    * n_distinct, entropy), null for the empty string (no distribution).
    * Value-identical to the relational explode form: p = c/n exact IEEE,
    * ln rounded to 6 at the source, each p·(−ln p) term rounded to 12 and
    * summed EXACTLY (scaled longs — the decimal(28,12)-sum twin), entropy =
    * that sum rounded to 6. All rounding via [[roundHalfUp]] == Spark round.
    */
  def charEntropy(s: org.apache.spark.unsafe.types.UTF8String):
      org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    if (str.isEmpty) return null
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1
      n += 1
    }
    var unscaled = 0L // sum of 1e-12-scaled terms, exact
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      val p = c.toDouble / n.toDouble
      val lnp6 = roundHalfUp(math.log(p), 6).doubleValue()
      unscaled += roundHalfUp(p * -lnp6, 12).unscaledValue().longValueExact()
    }
    val h = java.math.BigDecimal.valueOf(unscaled, 12).doubleValue()
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, counts.size().toLong,
        roundHalfUp(h, 6).doubleValue()))
  }
}
