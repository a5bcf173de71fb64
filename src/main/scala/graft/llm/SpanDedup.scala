package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN removal — the "ExactSubstr" dedup of
  * Deduplicating Training Data Makes Language Models Better (Lee et al.
  * 2022, arXiv:2107.06499): delete from every document each maximal token
  * span that occurs more than once in the corpus, keeping the surrounding
  * text. Distinct from whole/near-doc dedup ([[Dedup]]) and from
  * boilerplate SCORING ([[Boilerplate]] flags, this op rewrites).
  *
  * The paper's single-node algorithm is a corpus suffix array. The
  * distributed formulation here is the n-window equivalence: a substring
  * of length >= n occurs twice iff ALL of its n-token windows occur
  * twice, so the union of duplicated n-windows covers EXACTLY the token
  * positions inside duplicated substrings of length >= n (shorter repeats
  * are below the dedup threshold by definition). Occurrences count
  * per-position — a span repeated within one document is duplicated too,
  * matching the paper (self-repetition is removed the same as
  * cross-document repetition).
  *
  * Scale design (100 TB):
  *   - grams travel as 56-bit md5-derived hashes (the q89/minhash
  *     engine-portable convention), so the (id, p, gh) shuffle rows stay
  *     ~24 bytes; positions explode to ROWS, never array lambdas, keeping
  *     the hashing inside whole-stage codegen.
  *   - the duplicated-gram set is a keyed count(*)>1 — one hash exchange
  *     with map-side partials; Zipf keeps it far smaller than the gram
  *     universe, and the flag pass is a LEFT SEMI join against it.
  *   - span assembly is per-document: covered positions dedupe on
  *     (id, ti), span starts come from a per-doc lag window (bounded by
  *     document length, never a global sort), and the kept text
  *     reassembles via one per-doc sorted collect.
  *   - every stage is linear in corpus tokens; nothing is all-pairs.
  */
object SpanDedup {

  /** 56-bit engine-portable gram hash (DuckDB: ('0x'||substr(md5(g),1,14))::BIGINT). */
  private def gramHash(g: Column): Column =
    conv(substring(org.apache.spark.sql.graft.GraftColumns.fastMd5(g), 1, 14), 16, 10)
      .cast("long")

  /** Per-document span-dedup profile and rewrite:
    * (idCol, n_tokens, dup_tokens, n_spans, dup_frac, kept_md5) —
    * `n_spans` maximal duplicated spans covering `dup_tokens` positions;
    * `kept_md5` digests the space-joined surviving tokens (empty string
    * when the whole document is duplicated — distinguishable from
    * "nothing removed" by dup_tokens). Every input doc appears; docs
    * shorter than n tokens pass through untouched.
    */
  def removeDuplicatedSpans(docs: DataFrame, textCol: String, idCol: String,
                            n: Int): DataFrame = {
    require(n >= 2, s"span window must be >= 2 tokens, got $n")
    val toks = docs
      .select(col(idCol).as("id"),
        TextStats.tokens(Dedup.normalize(col(textCol))).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val pos = toks
      .select(col("id"), col("w"), (size(col("w")) - (n - 1)).as("ng"))
      .filter(col("ng") > 0)
      .select(col("id"), col("w"), explode(sequence(lit(1), col("ng"))).as("i"))
      .select(col("id"), (col("i") - 1).cast("long").as("p"),
        gramHash(concat_ws(" ", slice(col("w"), col("i"), lit(n)))).as("gh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val dup = pos.groupBy("gh").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("gh")
    val covered = pos.join(dup, Seq("gh"), "left_semi")
      .select(col("id"), explode(sequence(col("p"), col("p") + (n - 1))).as("ti"))
      .distinct()
    val byDoc = Window.partitionBy("id").orderBy("ti")
    val spans = covered
      .withColumn("brk",
        when(lag("ti", 1).over(byDoc).isNull ||
          col("ti") - lag("ti", 1).over(byDoc) > 1, 1L).otherwise(0L))
      .groupBy("id")
      .agg(count(lit(1)).as("dup_tokens"), sum("brk").as("n_spans"))
    val kept = toks
      .select(col("id"), posexplode(col("w")).as(Seq("ti", "tok")))
      .join(covered, Seq("id", "ti"), "left_anti")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("ti"), col("tok")))).as("a"))
      .select(col("id"), concat_ws(" ", col("a.tok")).as("kept_text"))
    toks
      .select(col("id"), size(col("w")).cast("long").as("n_tokens"))
      .join(spans, Seq("id"), "left")
      .join(kept, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        Sampling.round6(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          greatest(col("n_tokens"), lit(1L)).cast("double")).as("dup_frac"),
        // a fully-duplicated (or empty) doc keeps NO tokens → no group →
        // NULL here; '' is the correct cleaned text for exactly those
        md5(coalesce(col("kept_text"), lit(""))).as("kept_md5"))
  }
}
