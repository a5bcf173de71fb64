package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language ID, fingerprinting. All pure column expressions —
  * whole-stage-codegen'd, no UDFs, so a 100 TB scan stays one fused pipeline
  * over the parquet reader.
  */
object TextStats {

  /** Whitespace tokens, empty-safe (split of "" yields [""], which we drop). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: letter runs, digit runs, and single punctuation
    * marks each count as one token — the cheap public approximation of a BPE
    * pre-tokenizer's segment count.
    */
  def bpeIshTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  def punctCount(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]"))

  /** Quality score in [0,1]: long-enough docs with low punctuation density
    * and diverse vocabulary score high — the standard cheap pre-filter
    * before expensive dedup/model scoring.
    * All integer ratios are computed in double then rounded to 4 places so
    * the DuckDB oracle hashes identically.
    *
    * `toks` should be a MATERIALIZED token-array column (an expression here
    * would be re-evaluated for every reference); pass
    * `tokens(text)` through its own projection first — see
    * [[qualityScore(text* qualityScore(text)]] for the one-shot form.
    */
  def qualityScoreFromTokens(text: Column, toks: Column): Column = {
    val nTok = size(toks).cast("double")
    val nChar = length(text).cast("double")
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    val punctScore = lit(1.0) - least(
      punctCount(text).cast("double") / greatest(nChar, lit(1.0)) * lit(10.0), lit(1.0))
    val diversity = size(array_distinct(toks)).cast("double") /
      greatest(nTok, lit(1.0))
    round((lenScore + punctScore + diversity) / lit(3.0), 4)
  }

  /** One-expression convenience form; re-tokenizes per reference. */
  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(text, tokens(text))

  /** Stopword tables for the n-gram/stopword language-ID heuristic (the
    * table itself lives in the functions layer, shared with the native
    * `lang_id` expression).
    */
  val stopwords: Map[String, Seq[String]] = graft.functions.TextImpl.stopwords

  /** Language ID: argmax over per-language stopword hit counts, ties broken
    * by language code (deterministic); no hits at all → "und".
    * `toks` should be a materialized lowercase token-array column (see
    * [[qualityScoreFromTokens]] on why).
    *
    * This is the pure-builtin SPECIFICATION form — five interpreted array
    * lambdas per row; [[langIdNative]] is the one-pass codegen'd production
    * form (FunctionsSpec asserts agreement).
    */
  def langIdFromTokens(toks: Column): Column = {
    val langs = stopwords.toSeq.sortBy(_._1)
    // struct compare is field-by-field: (hits, rank) with rank descending by
    // alphabetical position makes greatest() an argmax over hits with
    // alphabetically-FIRST language winning ties — deterministic, and
    // expressible identically in the DuckDB oracle. The zero-hit sentinel
    // (rank above all real languages) wins exactly when every count is 0,
    // folding the "und" fallback INTO the greatest() instead of a when()
    // that would re-evaluate the whole scored tree twice.
    val scored = langs.zipWithIndex.map { case ((lang, words), i) =>
      struct(
        size(filter(toks, t => t.isin(words: _*))).as("hits"),
        lit(langs.size - i).as("rank"),
        lit(lang).as("lang"))
    }
    val sentinel = struct(lit(0).as("hits"), lit(langs.size + 1).as("rank"),
      lit("und").as("lang"))
    greatest(scored :+ sentinel: _*).getField("lang")
  }

  /** One-pass native-expression language ID (see [[langIdFromTokens]] for
    * the specification): one stopword-mask hash lookup per token, inside
    * whole-stage codegen. NULL tolerance lives in the expression itself —
    * a NULL token array (NULL text) identifies as "und" on the Column
    * surface, the SQL surface, and in generated code alike.
    */
  def langIdNative(toks: Column): Column =
    org.apache.spark.sql.graft.GraftColumns.langId(toks)

  /** One-expression convenience form; re-tokenizes per language. */
  def langId(text: Column): Column = langIdFromTokens(tokens(lower(text)))

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * byte-identical in every engine. For partial-overlap detection see
    * [[winnowMins]] (winnowing) and Dedup.minhashPairs.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Character k-gram hashes of `text`: one 56-bit md5-derived int per
    * position — the "rolling hash" stream winnowing selects from. `text`
    * should be a materialized column (cheap attribute reference inside the
    * lambda); the md5s are the per-element work itself, evaluated once each.
    */
  def gramHashes(text: Column, k: Int): Column =
    transform(sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => conv(substring(md5(text.substr(i, lit(k))), 1, 14), 16, 10).cast("long"))

  /** Winnowing (Schleimer/Wilkerson/Aiken): slide a window of `w` hashes and
    * keep each window's minimum; the distinct minima are the document's
    * fingerprint set. Guarantees any shared substring of length >= w+k-1
    * yields a shared fingerprint. `hashes` MUST be a materialized array
    * column — inlining [[gramHashes]] here would re-run the md5s per window.
    */
  def winnowMins(hashes: Column, w: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(hashes) - (w - 1), lit(1))),
      j => array_min(slice(hashes, j, lit(w)))))

  /** Winnowing as a relational pipeline — the shape that scales: grams
    * explode to rows so the md5 stays inside whole-stage codegen (the array-
    * lambda form above evaluates interpreted, measured ~2x slower per gram),
    * the sliding-window minimum is a `rowsBetween` window, and the only
    * exchange is the per-document window shuffle. Returns (idCol, fp) rows.
    */
  def winnowFingerprints(df: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String, k: Int, w: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = df.select(col(idCol), col(textCol).as("__t"),
        greatest(length(col(textCol)) - (k - 1), lit(1)).as("__ng"))
      .select(col(idCol), col("__t"), col("__ng"),
        explode(sequence(lit(1), col("__ng"))).as("__i"))
      .select(col(idCol), col("__ng"), col("__i"),
        conv(substring(org.apache.spark.sql.graft.GraftColumns.fastMd5(
          col("__t").substr(col("__i"), lit(k))), 1, 14), 16, 10)
          .cast("long").as("__h"))
    winnowSelect(grams, idCol, w)
  }

  /** [[winnowFingerprints]] with a Karp–Rabin ROLLING gram hash (Schleimer
    * et al.'s own choice): the whole per-document hash stream is ONE native-
    * expression call doing O(1) work per position, vs a full md5 digest per
    * position above — measured >3x faster end-to-end on the winnow query.
    * Hash = Horner fold `h*31 + byte` over each k-byte window mod 2^64,
    * exactly replayable in DuckDB HUGEINT arithmetic. Same winnowing
    * guarantee (any shared substring of length >= w+k-1 bytes shares a
    * fingerprint); the md5 variant remains for hash-stability with external
    * md5-based corpora.
    */
  def winnowFingerprintsRolling(df: org.apache.spark.sql.DataFrame, idCol: String,
                                textCol: String, k: Int, w: Int): org.apache.spark.sql.DataFrame = {
    val grams = df.select(col(idCol),
        org.apache.spark.sql.graft.GraftColumns.gramHashes(col(textCol), k).as("__g"))
      .select(col(idCol), size(col("__g")).as("__ng"),
        posexplode(col("__g")).as(Seq("__p", "__h")))
      .select(col(idCol), col("__ng"), (col("__p") + 1).as("__i"), col("__h"))
    winnowSelect(grams, idCol, w)
  }

  /** Shared winnow selection: sliding `rowsBetween` minimum per document,
    * valid window positions only, distinct minima.
    */
  private def winnowSelect(grams: org.apache.spark.sql.DataFrame, idCol: String,
                           w: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col(idCol)).orderBy(col("__i"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("__wm", min(col("__h")).over(win))
      // winnowing defines windows only at positions 1..ng-w+1; the tail rows
      // would otherwise emit spurious short-window minima
      .filter(col("__i") <= greatest(col("__ng") - (w - 1), lit(1)))
      .select(col(idCol), col("__wm").as("fp"))
      .distinct()
  }

  /** Per-document Shannon character entropy — the Gopher-family signal that
    * catches low-information text (key-mash, padding, binary spill) that
    * length/punctuation ratios miss: (idCol, n_chars, n_distinct, entropy)
    * over the whitespace-normalized text; empty-after-normalize docs have no
    * distribution and are dropped.
    *
    * One native codegen'd expression per row (CharEntropy) — zero shuffle,
    * fused into the scan; the q30 lang_id playbook. The relational form
    * below is the differential REFERENCE: its per-index substr is
    * O(position) on UTF8 (quadratic per doc — measured 2.7s vs 0.2s at
    * sf0.1) and it shuffles (doc, char) rows twice.
    *
    * Determinism (both forms, value-identical — LlmSpec pins it): p = c/n
    * exact IEEE; ln rounds to 6 at the source (q72); each p·(−ln p) term
    * rounds to 12 and sums exactly (decimal(28,12) / scaled longs); entropy
    * is that sum rounded to 6.
    */
  def charEntropyProfile(docs: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String): org.apache.spark.sql.DataFrame =
    docs
      // empty-doc drop as a CHEAP pushable predicate: filtering on
      // e.isNotNull instead re-evaluates char_entropy inside the pushed
      // isnotnull — the kernel would run twice per row (observed in the
      // q103 plan)
      .filter(length(Dedup.normalize(col(textCol))) > 0)
      .select(col(idCol), org.apache.spark.sql.graft.GraftColumns
        .charEntropy(Dedup.normalize(col(textCol))).as("e"))
      .select(col(idCol), col("e.n_chars").as("n_chars"),
        col("e.n_distinct").as("n_distinct"), col("e.entropy").as("entropy"))

  /** Relational (explode + two keyed aggregations) twin of
    * [[charEntropyProfile]] — kept as the differential oracle for the
    * native expression; see the scaladoc above for why it loses at scale.
    */
  private[graft] def charEntropyProfileRelational(
      docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val p = col("c").cast("double") / col("n").cast("double")
    val chars = docs
      .select(col(idCol).as("id"), Dedup.normalize(col(textCol)).as("t"))
      .select(col("id"),
        explode(when(length(col("t")) > 0,
          transform(sequence(lit(1), length(col("t"))), i => col("t").substr(i, lit(1))))
          .otherwise(array().cast("array<string>"))).as("ch"))
    val cnt = chars.groupBy("id", "ch").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("id").agg(sum(col("c")).as("n"))
    cnt.join(tot, Seq("id"))
      .select(col("id"), col("n"),
        round(p * -round(log(p), 6), 12).as("term"))
      .groupBy("id")
      .agg(max(col("n")).as("n_chars"), count(lit(1)).as("n_distinct"),
        round(sum(col("term").cast("decimal(28,12)")).cast("double"), 6).as("entropy"))
      .select(col("id").as(idCol), col("n_chars"), col("n_distinct"), col("entropy"))
  }
}
