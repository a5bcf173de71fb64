package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring detection — the "exact substring dedup" leg of
  * training-data curation (Lee et al., "Deduplicating Training Data Makes
  * Language Models Better", ACL 2022): find every maximal token span that is
  * covered by k-grams occurring more than once in the corpus. Unlike the
  * document-level dedup family (minhash/simhash/PPJoin, which drop WHOLE
  * near-duplicate docs), this finds the repeated passages INSIDE otherwise
  * distinct documents — licence headers, quoted tweets, syndicated
  * paragraphs — so curation can trim the span, not the doc.
  *
  * The published implementation builds a corpus-wide suffix array, which is
  * inherently single-machine. The relational reformulation here gets the
  * same span set for a fixed gram length k:
  *   - a span is duplicated iff every one of its k-grams occurs >= minCount
  *     times corpus-wide (a repeated span of length L >= k repeats all of
  *     its L-k+1 k-grams);
  *   - so: hash every gram position (slim 16-byte (id, pos, hash) rows),
  *     count occurrences per hash (one map-side-combined shuffle), semi-join
  *     the duplicated hash set back against positions, and merge the
  *     surviving [i, i+k-1] windows into maximal spans per document.
  * The only per-document step is the span merge — a gaps-and-islands window
  * PARTITIONED BY doc id, so the sort is per-doc (bounded by doc length),
  * never global. Everything corpus-wide is a keyed aggregate or semi-join on
  * 56-bit md5-derived hashes (the q41/q89 portable-hash convention, so the
  * DuckDB oracle replays identical ints).
  *
  * False positives: two different spans can share a gram only by hash
  * collision (2^-56 per pair); a span whose grams are each duplicated by
  * DIFFERENT partners is still reported (it is a mosaic of repeated text —
  * the curation answer is the same: trim it).
  */
object SubstringDedup {

  /** 56-bit engine-portable gram hash (DuckDB: ('0x'||substr(md5(g),1,14))::BIGINT). */
  private def gramHash(g: Column): Column =
    conv(substring(org.apache.spark.sql.graft.GraftColumns.fastMd5(g), 1, 14), 16, 10)
      .cast("long")

  /** One row per gram position: (id, i, gh), i 1-based in token space.
    * Docs shorter than k tokens contribute nothing (a span must be at least
    * one full gram long to be evidence of repetition).
    */
  private def gramPositions(docs: DataFrame, textCol: String, idCol: String,
                            k: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        TextStats.tokens(Dedup.normalize(col(textCol))).as("w"))
      .select(col("id"), col("w"), (size(col("w")) - (k - 1)).as("ng"))
      .filter(col("ng") > 0)
      .select(col("id"), col("w"), explode(sequence(lit(1), col("ng"))).as("i"))
      .select(col("id"), col("i").cast("long").as("i"),
        gramHash(concat_ws(" ", slice(col("w"), col("i"), lit(k)))).as("gh"))

  /** Maximal duplicated spans: one row per (doc, span) with 1-based token
    * bounds — (idCol, span_start, span_end, span_tokens). A position
    * survives when its k-gram occurs >= `minCount` times corpus-wide
    * (occurrences, not distinct docs: a phrase repeated within one document
    * is duplication too — the Lee et al. definition). Overlapping and
    * adjacent surviving windows merge into one span.
    */
  def duplicatedSpans(docs: DataFrame, textCol: String, idCol: String,
                      k: Int, minCount: Long = 2L): DataFrame = {
    val pos = gramPositions(docs, textCol, idCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val dup = pos.groupBy("gh").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount).select("gh")
    // surviving windows [i, i+k-1]; (id, i) is unique so the island walk
    // below has a deterministic order
    val cov = pos.join(dup, Seq("gh"), "left_semi")
      .select(col("id"), col("i"), (col("i") + (k - 1)).as("e"))
    // gaps-and-islands: a new span starts where this window neither overlaps
    // nor touches the furthest end seen so far in this doc
    val byDoc = Window.partitionBy("id").orderBy("i")
    val prevEnd = max(col("e")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val isle = cov
      .withColumn("brk",
        when(prevEnd.isNull || col("i") > prevEnd + 1, 1L).otherwise(0L))
      .withColumn("isle", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isle.groupBy("id", "isle")
      .agg(min(col("i")).as("span_start"), max(col("e")).as("span_end"))
      .select(col("id").as(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Per-document duplication profile over [[duplicatedSpans]]: every input
    * doc appears with its total token count, duplicated-token count, and
    * rounded duplicated fraction — the number curation thresholds on.
    */
  def duplicationProfile(docs: DataFrame, textCol: String, idCol: String,
                         k: Int, minCount: Long = 2L): DataFrame = {
    val spans = duplicatedSpans(docs, textCol, idCol, k, minCount)
      .groupBy(idCol).agg(sum(col("span_tokens")).as("dup_tokens"))
    docs.select(col(idCol),
        TextStats.tokenCount(Dedup.normalize(col(textCol))).cast("long").as("n_tokens"))
      .join(spans, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          greatest(col("n_tokens"), lit(1L)).cast("double"), 6).as("dup_frac"))
  }
}
