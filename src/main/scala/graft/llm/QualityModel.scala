package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-based quality classifier: a linear model over cheap text features
  * with a logistic-shaped link — the public-recipe stand-in for the
  * fastText-style quality filters production pipelines run before expensive
  * curation (the model SHAPE is real; the weights here are fixtures, and a
  * trained coefficient vector drops in without touching the plan).
  *
  * Everything is rational arithmetic on purpose: the link is the "fast
  * sigmoid" z ↦ 0.5·(1 + z/(1+|z|)) rather than 1/(1+e^-z), because exp()
  * is a libm transcendental whose last ulp differs across engines — a
  * rational link replays bit-identically in DuckDB, so the score can be
  * hash-compared after round(6). Same monotone S-shape, same 0.5 decision
  * boundary at z = 0.
  *
  * Scale: pure per-row column expressions (no shuffle, no UDF) — the whole
  * classifier fuses into the scan's whole-stage-codegen pipeline. Tokens
  * must be a MATERIALIZED array column: expressions nested in array
  * lambdas re-evaluate per element, so an inline tokenizer would re-run
  * once per probed feature.
  */
object QualityModel {

  /** Model coefficients. Defaults are plausible hand-set fixtures: length
    * and vocabulary diversity up-weight, punctuation density down-weights,
    * stopword presence mildly up-weights (prose-ness).
    */
  final case class Weights(bias: Double = -1.5, wLen: Double = 2.0,
                           wPunct: Double = -3.0, wTtr: Double = 1.5,
                           wStop: Double = 1.0)

  /** Rational logistic link: 0.5·(1 + z/(1+|z|)) — engine-exact. */
  def fastSigmoid(z: Column): Column =
    (lit(1.0) + z / (lit(1.0) + abs(z))) * lit(0.5)

  /** Feature vector from text + materialized lowercase tokens:
    * (lenScore, punctRatio, ttr, stopRatio), all exact integer-ratio
    * doubles. Empty docs (0 tokens) get all-zero features.
    */
  private def features(text: Column, toks: Column): (Column, Column, Column, Column) = {
    val nTok = size(toks).cast("double")
    val safeTok = greatest(nTok, lit(1.0))
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    val punctRatio = TextStats.punctCount(text).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    val ttr = size(array_distinct(toks)).cast("double") / safeTok
    val en = graft.functions.TextImpl.stopwords("en")
    val stopRatio = size(filter(toks, t => t.isin(en: _*))).cast("double") / safeTok
    (lenScore, punctRatio, ttr, stopRatio)
  }

  /** Quality score in [0,1], rounded to 6 places (cross-engine hashable).
    * `toks` must be the materialized lowercase token array of `text`.
    */
  def scoreFromTokens(text: Column, toks: Column, w: Weights = Weights()): Column = {
    val (lenScore, punctRatio, ttr, stopRatio) = features(text, toks)
    val z = lit(w.bias) + lit(w.wLen) * lenScore + lit(w.wPunct) * punctRatio +
      lit(w.wTtr) * ttr + lit(w.wStop) * stopRatio
    round(fastSigmoid(z), 6)
  }

  /** Per-source curation funnel — the dashboard every curation run reports:
    * docs in → after the length gate → after the repetition gate → after
    * exact dedup, gates applied IN SEQUENCE so each count is "survivors so
    * far". Decisions are all-integer (token counts, `max_tf·100 ≤
    * maxRepPct·n_tok`, min-id dedup winner over ALL docs — the [[Dedup]]
    * canonical-winner convention), so the funnel replays exactly.
    *
    * Scale: one tokenize→(doc, term) aggregate (map-side combinable), one
    * fingerprint aggregate, one per-source rollup; no joins wider than the
    * doc relation, no window over the corpus.
    */
  def curationFunnel(docs: DataFrame, idCol: String, textCol: String,
                     srcCol: String, minTokens: Int = 30,
                     maxRepPct: Int = 20): DataFrame = {
    val post = docs.select(col(idCol).as("doc_id"),
        explode(TextStats.tokens(lower(col(textCol)))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val rep = post.groupBy("doc_id")
      .agg(max("tf").as("max_tf"), sum("tf").as("n_tok"))
    val fp = docs.select(col(idCol).as("doc_id"), col(srcCol).as("source"),
      md5(Dedup.normalize(col(textCol))).as("fp"))
    val winner = fp.groupBy("fp").agg(min("doc_id").as("w"))
    val flags = fp.join(rep, Seq("doc_id"), "left")
      .join(winner, Seq("fp"))
      .select(col("source"),
        (coalesce(col("n_tok"), lit(0L)) >= minTokens.toLong).as("k_len"),
        (coalesce(col("max_tf"), lit(0L)) * 100L <=
          coalesce(col("n_tok"), lit(0L)) * maxRepPct.toLong).as("k_rep"),
        (col("doc_id") === col("w")).as("k_dup"))
    flags.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("k_len"), 1L).otherwise(0L)).as("n_after_len"),
      sum(when(col("k_len") && col("k_rep"), 1L).otherwise(0L)).as("n_after_rep"),
      sum(when(col("k_len") && col("k_rep") && col("k_dup"), 1L).otherwise(0L))
        .as("n_after_dedup"))
  }
}
