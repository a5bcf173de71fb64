package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical language-model scoring and vocabulary construction — the
  * CCNet-style quality leg of corpus curation (Wenzek et al., LREC 2020
  * score web text by LM perplexity; fastText-style pipelines filter on
  * out-of-vocabulary rate). Two-pass relational shapes throughout: pass one
  * aggregates corpus statistics (token counts — a Zipf-bounded relation,
  * tiny next to the corpus), pass two joins them back per token position.
  *
  * Cross-engine determinism follows the q72/BM25 convention: `ln` is the one
  * kernel the two engines need not agree on bit-for-bit, so every log is
  * rounded to 6 places AT THE SOURCE; everything downstream is correctly-
  * rounded IEEE +,-,*,/ and decimal-routed sums, so Spark and DuckDB produce
  * identical doubles.
  */
object LangModel {

  private def tokenRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(TextStats.tokens(Dedup.normalize(col(textCol)))).as("term"))

  /** Add-one-smoothed unigram LM over the corpus: (term, c, logp) with
    * logp = round(ln((c+1)/(N+V)), 6), N total token positions, V distinct
    * terms. Smoothing keeps the table usable for scoring OTHER corpora
    * (unseen term => ln(1/(N+V)), the floor the smoothing reserves).
    * One shuffle (term counts, map-side partials); N and V are one-row
    * aggregates OF THE COUNTS relation, broadcast into the projection.
    */
  def unigramLm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = tokenRows(docs, idCol, textCol)
      .groupBy("term").agg(count(lit(1)).as("c"))
    val stats = counts.agg(sum(col("c")).as("n_total"),
      count(lit(1)).as("n_vocab"))
    counts.crossJoin(broadcast(stats))
      .select(col("term"), col("c"),
        round(log((col("c") + 1).cast("double") /
          (col("n_total") + col("n_vocab")).cast("double")), 6).as("logp"))
  }

  /** Score each document against a unigram LM: (idCol, n_tokens, avg_nll) —
    * average negative log-likelihood per token, the monotone stand-in for
    * perplexity (perplexity = exp(avg_nll); exp would reintroduce the
    * non-portable kernel, and curation only thresholds the ranking, which
    * exp preserves). Docs with no tokens are dropped (nothing to score).
    *
    * `lm` is (term, logp) from [[unigramLm]] — possibly of a DIFFERENT
    * (reference) corpus, which is the CCNet setup: score the raw corpus
    * against a clean reference LM. `floorLogp` scores terms absent from the
    * LM (pass round(ln(1/(N+V)),6) of the reference; scoring a corpus
    * against its own LM never hits it).
    *
    * Scale: explode to (id, term) rows, equi-join the LM on term, one
    * decimal-routed sum per doc. The LM rides the join hash-partitioned; at
    * reference-LM sizes (<= a few M rows) AQE broadcasts it.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                lm: DataFrame, floorLogp: Double): DataFrame =
    tokenRows(docs, idCol, textCol)
      .join(lm.select(col("term"), col("logp")), Seq("term"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        // portable round4, not round(): the decimal-exact nll sum divided by
        // a small count lands exactly on 4-decimal halves on unlucky data
        Sampling.round4(sum((-coalesce(col("logp"), lit(floorLogp)))
          .cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_nll"))
      .select(col("id").as(idCol), col("n_tokens"), col("avg_nll"))

  /** Interpolated bigram LM (KenLM-style one-level backoff, fixed weights —
    * a data-scale stand-in for the full Kneser–Ney stack):
    * p(w|v) = 0.75·c(v,w)/c(v·) + 0.25·p_uni(w), with p_uni the add-one
    * unigram of [[unigramLm]] and c(v·) the count of bigram events starting
    * with v. Fixed interpolation weights keep the model a pure function of
    * the corpus — replayable in SQL, no EM fitting.
    *
    * Returns (uniRel, biRel): uniRel = (term, logp_uni, logp_bo) where
    * logp_bo = round(ln(0.25·p_uni), 6) scores a bigram whose PAIR is
    * unseen but whose word is known (the interpolation's backoff floor);
    * biRel = (prev, term, logp_bi) over observed pairs. Every log rounds
    * to 6 at the source (the standing ln convention); the inner prob is
    * mul-mul-add of identically-derived doubles, so both engines agree.
    *
    * Scale: the bigram relation is one per-doc lag window (sort bounded by
    * doc length) + two keyed aggregations; both LM relations are
    * Zipf-bounded, tiny next to the corpus.
    */
  def bigramLm(docs: DataFrame, idCol: String,
               textCol: String): (DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol).as("id"),
      posexplode(TextStats.tokens(Dedup.normalize(col(textCol))))
        .as(Seq("pos", "term")))
    val counts = toks.groupBy("term").agg(count(lit(1)).as("c"))
    val stats = counts.agg(sum(col("c")).as("n_total"),
      count(lit(1)).as("n_vocab"))
    def pUni = (col("c") + 1).cast("double") /
      (col("n_total") + col("n_vocab")).cast("double")
    val uniRel = counts.crossJoin(broadcast(stats))
      .select(col("term"),
        round(log(pUni), 6).as("logp_uni"),
        round(log(lit(0.25) * pUni), 6).as("logp_bo"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    val big = toks.withColumn("prev", lag(col("term"), 1).over(w))
      .filter(col("prev").isNotNull)
    val cb = big.groupBy("prev", "term").agg(count(lit(1)).as("cb"))
    val cp = cb.groupBy("prev").agg(sum(col("cb")).as("cp"))
    val biRel = cb.join(cp, Seq("prev"))
      .join(counts, Seq("term")).crossJoin(broadcast(stats))
      .select(col("prev"), col("term"),
        round(log(lit(0.75) * (col("cb").cast("double") / col("cp").cast("double"))
          + lit(0.25) * pUni), 6).as("logp_bi"))
    (uniRel, biRel)
  }

  /** Score each document against an interpolated bigram LM (possibly of a
    * reference corpus): (idCol, n_tokens, avg_nll). The first token of a
    * doc scores by the unigram; every later position by its (prev, term)
    * pair, falling back to the interpolation floor `logp_bo` for unseen
    * pairs and to `floorLogp` for unseen words. Same relational shape as
    * [[scoreDocs]] plus the per-doc lag window; the LM relations ride
    * equi-joins (AQE broadcasts at reference-LM sizes).
    */
  def scoreDocsBigram(docs: DataFrame, idCol: String, textCol: String,
                      uniRel: DataFrame, biRel: DataFrame,
                      floorLogp: Double): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      posexplode(TextStats.tokens(Dedup.normalize(col(textCol))))
        .as(Seq("pos", "term")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    val withPrev = toks.withColumn("prev", lag(col("term"), 1).over(w))
    val firstRows = withPrev.filter(col("prev").isNull)
      .join(uniRel.select(col("term"), col("logp_uni")), Seq("term"), "left")
      .select(col("id"),
        (-coalesce(col("logp_uni"), lit(floorLogp))).as("nll"))
    val bigRows = withPrev.filter(col("prev").isNotNull)
      .join(biRel, Seq("prev", "term"), "left")
      .join(uniRel.select(col("term"), col("logp_bo")), Seq("term"), "left")
      .select(col("id"),
        (-coalesce(col("logp_bi"), col("logp_bo"), lit(floorLogp))).as("nll"))
    firstRows.unionByName(bigRows)
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        Sampling.round4(sum(col("nll").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_nll"))
      .select(col("id").as(idCol), col("n_tokens"), col("avg_nll"))
  }

  /** Top-`v` vocabulary by corpus frequency, ties pinned by term text
    * ascending: (term, c, rank), rank 1-based. orderBy+limit compiles to
    * TakeOrderedAndProject — per-partition top-v then a single merge of
    * v-row heaps, never a global sort of the term relation.
    */
  def vocab(docs: DataFrame, idCol: String, textCol: String, v: Int): DataFrame = {
    val counts = tokenRows(docs, idCol, textCol)
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term"))
      .limit(v)
    // rank AFTER the limit: the window sorts v rows, not the vocabulary
    counts.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("term"))))
  }

  /** Per-document out-of-vocabulary profile against [[vocab]]:
    * (idCol, n_tokens, n_oov, oov_frac) over token POSITIONS (a repeated
    * OOV term counts each occurrence). Docs with no tokens are dropped.
    * The vocab is v rows — broadcast into an anti-join, so the corpus-side
    * pass is one scan plus a per-doc count.
    */
  def oovProfile(docs: DataFrame, idCol: String, textCol: String,
                 vocabDf: DataFrame): DataFrame = {
    val toks = tokenRows(docs, idCol, textCol)
    val oov = toks.join(broadcast(vocabDf.select("term")), Seq("term"), "left_anti")
      .groupBy("id").agg(count(lit(1)).as("n_oov"))
    toks.groupBy("id").agg(count(lit(1)).as("n_tokens"))
      .join(oov, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        round(coalesce(col("n_oov"), lit(0L)).cast("double") /
          col("n_tokens").cast("double"), 6).as("oov_frac"))
  }
}
