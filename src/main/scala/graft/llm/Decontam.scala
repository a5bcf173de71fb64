package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination by word n-gram overlap — the standard
  * eval-leakage scrub (the GPT-3 appendix / Llama method: a training doc
  * sharing an n-gram with any eval-benchmark doc is flagged/dropped, with
  * n ≈ 8–13 words). [[graft.llm.Split]] guards against EXACT duplicates
  * straddling a split; this catches the partial-overlap leak exact
  * fingerprints miss — a benchmark question quoted inside a larger
  * training doc.
  *
  * Scale posture: the benchmark side is eval-set-sized (thousands of
  * docs), so its DISTINCT gram-hash set BROADCASTS; the training corpus
  * explodes to (doc, gram-hash) rows — one scan, no widening beyond the
  * gram count — and membership is a broadcast hash join, never an
  * all-pairs or a shuffle of the corpus beyond the final per-doc
  * aggregate. Gram hashing is md5 of the space-joined normalized token
  * window (engine-portable; the [[Dedup.normalize]] +
  * [[TextStats.tokens]] tokenization every text op shares).
  */
object Decontam {

  /** (doc_id, gram-hash) rows: one per word n-gram window. Docs shorter
    * than `n` tokens contribute nothing (the empty-sequence guard — Spark
    * `sequence(1, 0)` would DESCEND, not empty).
    */
  private def gramRows(df: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        TextStats.tokens(Dedup.normalize(col(textCol))).as("__t"))
      .select(col("doc_id"), col("__t"),
        explode(when(size(col("__t")) >= n,
          sequence(lit(1), size(col("__t")) - (n - 1)))
          .otherwise(array().cast("array<int>"))).as("pos"))
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(col("__t"), col("pos"), lit(n)))).as("g"))

  /** Per-training-doc contamination report against the benchmark:
    * `(doc_id, n_grams, hits)` for every training doc with at least one
    * colliding n-gram. `hits` counts the doc's gram WINDOWS that appear
    * anywhere in the benchmark (window multiplicity on the training side,
    * set semantics on the benchmark side — the literature's convention).
    */
  def gramHits(train: DataFrame, bench: DataFrame, idCol: String,
               textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n=$n")
    val bg = gramRows(bench, idCol, textCol, n).select("g").distinct()
    val tg = gramRows(train, idCol, textCol, n)
    tg.join(broadcast(bg.withColumn("__hit", lit(1L))), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("hits"))
      .filter(col("hits") > 0)
  }

  /** Contamination TRACEABILITY (the audit [[gramHits]] can't answer):
    * for every flagged training doc, WHICH benchmark doc(s) it collides
    * with — `(doc_id, bench_id, pair_hits, rk)`, the top `k` benchmark
    * docs per training doc by colliding-window count, ties pinned on
    * `bench_id` so the report is deterministic. `pair_hits` counts the
    * training doc's gram WINDOWS found in that benchmark doc's gram SET
    * (the [[gramHits]] convention per pair); a window shared by several
    * benchmark docs counts toward each, so per-doc pair sums can exceed
    * the [[gramHits]] total.
    *
    * Scale: the benchmark `(g, bench_id)` pairs stay eval-set-sized and
    * broadcast; the per-pair aggregate keys on `(doc_id, bench_id)` over
    * COLLIDING windows only (inner join), and the top-k ranking
    * partitions on `doc_id` AFTER that aggregate — the window shuffle
    * carries one row per contaminated pair, never the corpus. The
    * rank-limit filter compiles to a bounded per-partition heap
    * (WindowGroupLimit), no full sort of the pair relation.
    */
  def gramTrace(train: DataFrame, bench: DataFrame, idCol: String,
                textCol: String, n: Int, k: Int = 3): DataFrame = {
    require(n >= 1, s"n=$n")
    require(k >= 1, s"k=$k")
    val bg = gramRows(bench, idCol, textCol, n)
      .select(col("g"), col("doc_id").as("bench_id")).distinct()
    val pairs = gramRows(train, idCol, textCol, n)
      .join(broadcast(bg), Seq("g"))
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("pair_hits"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("pair_hits").desc, col("bench_id"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Training docs with at most `maxHits` colliding n-gram windows — the
    * applied scrub ([[gramHits]] is the audit). Docs shorter than `n`
    * tokens pass (no windows, nothing to collide).
    */
  def filterClean(train: DataFrame, bench: DataFrame, idCol: String,
                  textCol: String, n: Int, maxHits: Long = 0L): DataFrame = {
    // no broadcast hint: the dirty set is usually tiny (AQE will pick the
    // broadcast), but a pathologically contaminated corpus must not OOM
    // the driver on a forced build side
    val dirty = gramHits(train, bench, idCol, textCol, n)
      .filter(col("hits") > maxHits).select(col("doc_id").as(idCol))
    train.join(dirty, Seq(idCol), "left_anti")
  }
}
