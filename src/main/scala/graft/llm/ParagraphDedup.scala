package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide duplicate-PARAGRAPH removal — the Dolma/C4 curation step
  * between document-level dedup (drop whole near-dup docs, `Dedup`) and
  * span-level dedup (trim repeated passages, `SubstringDedup`): keep exactly
  * ONE occurrence of every distinct paragraph across the WHOLE corpus and
  * rewrite each document with its surviving paragraphs. Boilerplate that
  * repeats verbatim across pages (footers, cookie banners, licence blocks)
  * disappears from every copy but the first; each document keeps its unique
  * prose. The reference pipeline has no equivalent (its lake stores API JSON
  * rows, not prose — reference: src/ingest_weather_data.py:63-66); this is
  * part of the LLM-training-data extension surface.
  *
  * Winner pinning: the kept occurrence is the one with the smallest
  * (docId, position) — a deterministic, oracle-able rule (the q11/q24
  * pinned-winner convention).
  *
  * 100 TB shape: posexplode paragraphs → md5 key → `groupBy(hash).min(
  * struct(id, pos))` (map-side partial min: each mapper ships ONE candidate
  * winner per distinct paragraph, not every occurrence) → equi-join the
  * winner set back → per-doc reassembly via collect_list + array_sort,
  * bounded by paragraphs-per-document. No window over the corpus, no global
  * sort, no non-equi join. The paragraph TEXT itself rides the explode only
  * until the hash projection; the winner relation is slim (hash, id, pos).
  */
object ParagraphDedup {

  /** Documents (`idCol`, `textCol` with blank-line-separated paragraphs) →
    * one row per input document:
    * (doc_id, clean_text, n_paras, n_kept, n_dropped), where `clean_text`
    * is the document rewritten with only its corpus-winning paragraphs
    * (original order, `\n\n`-rejoined; empty string when every paragraph
    * lost — the q104 coalesce convention). Empty/whitespace-only paragraphs
    * are not counted (C4 drops blank lines before any dedup decision).
    */
  def dedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val paras = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), "\n\n")).as(Seq("pos", "para")))
      .filter(length(trim(col("para"))) > 0)
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("para"),
        md5(col("para")).as("ph"))

    // one row per DISTINCT paragraph: its first occurrence corpus-wide
    val winners = paras
      .groupBy("ph")
      .agg(min(struct(col("doc_id"), col("pos"))).as("w"))
      .select(col("ph"), col("w.doc_id").as("w_id"), col("w.pos").as("w_pos"))

    val kept = paras
      .join(winners, Seq("ph"))
      .filter(col("doc_id") === col("w_id") && col("pos") === col("w_pos"))

    val totals = paras.groupBy("doc_id").agg(count(lit(1)).as("n_paras"))
    val keptAgg = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws("\n\n",
        transform(array_sort(collect_list(struct(col("pos"), col("para")))),
          x => x.getField("para"))).as("clean_text"))

    totals
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_paras") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
