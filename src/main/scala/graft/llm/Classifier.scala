package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linear document-quality classifier — the CCNet / GPT-3 "looks like the
  * target domain" filter (Wenzek et al., LREC 2020 §4.3; Brown et al., 2020
  * App. A): logistic regression over hashed bag-of-words features, trained
  * full-batch by gradient descent, applied as a per-doc keep score. The
  * reference has no trained filter; this is the LLM-pipeline extension of
  * its rule-based quality gates.
  *
  * Cross-engine determinism: ALL iterative state is fixed-point BIGINT in
  * micro units (1e-6) — weights, margins, residuals and gradients are exact
  * integer arithmetic on both engines (the q100 PageRank discipline; no
  * `round(x, k)` anywhere in the loop). The only float kernel is the
  * sigmoid, quantized at the source: `p_micro = floor(1e6·σ(m) + 0.5)`.
  * σ's output is transcendental in the margin, so it never lands within an
  * ulp of a micro half-boundary except at margin 0, where σ = 0.5 exactly —
  * an exact float on both engines. The learning rate is a power-of-two
  * divisor applied by truncated (toward-zero) integer division, sign-split
  * so Spark `div` (truncating) and DuckDB `//` (flooring) agree on
  * negative gradients.
  *
  * Scale: features are a slim (doc, bucket, count) relation — one tokenize
  * pass, localCheckpointed and reused across rounds; each GD round is one
  * join against the broadcast (buckets+1)-row weight relation plus one
  * hash aggregate — map-side-combinable, no driver collect of anything
  * unbounded, weight lineage truncated per round. Residual·count gradient
  * sums stay inside BIGINT to ~1e12 docs per bucket (1e6 · tf · docs).
  */
object Classifier {

  /** (doc_id, b, x): hashed-unigram counts — md5 14-hex → bucket, the
    * [[Importance]] DSIR convention.
    */
  def tokenBuckets(docs: DataFrame, idCol: String, textCol: String,
                   buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextStats.tokens(lower(col(textCol)))).as("term"))
      .select(col("doc_id"),
        (conv(substring(md5(col("term")), 1, 14), 16, 10).cast("long")
          % buckets.toLong).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("x"))

  /** [[tokenBuckets]] plus the bias pseudo-feature `b = buckets, x = 1` on
    * every doc — bias margins and gradients flow through the same uniform
    * path as the token features.
    */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     buckets: Int): DataFrame =
    tokenBuckets(docs, idCol, textCol, buckets)
      .unionByName(docs.select(col(idCol).as("doc_id"),
        lit(buckets.toLong).as("b"), lit(1L).as("x")))

  private def lnMicro(num: org.apache.spark.sql.Column,
                      den: org.apache.spark.sql.Column) =
    Sampling.lnMicro(num, den) // the engine-wide micro-quantized ln

  /** One-pass multinomial Naive Bayes — the cheap trained text filter
    * (McCallum & Nigam, AAAI-98 WS; the weak-supervision classifier shape
    * CCNet/GPT-3 instantiate with fastText). Laplace-smoothed per-class
    * bucket likelihoods from ONE aggregation over the feature relation;
    * score(d) = prior-LLR + Σ_b x_db · llr_b, predicted = score ≥ 0.
    * Unlike [[trainLogRegMicro]] there is no iteration to converge — the
    * model is exact in a single pass, the right default at corpus scale.
    *
    * Determinism: both ln kernels quantize at the source ([[lnMicro]]), so
    * the llr model and every score are exact BIGINT micro arithmetic.
    * Scale: training is one (bucket)-keyed aggregate (map-side combinable);
    * the model is `buckets` rows, broadcast into the scoring join.
    */
  def naiveBayes(docs: DataFrame, idCol: String, textCol: String,
                 isPosCol: String, buckets: Int = 64): DataFrame = {
    val labels = docs.select(col(idCol).as("doc_id"),
      col(isPosCol).cast("long").as("y"))
    // one tokenize pass serves both training and scoring in the fused form
    val feat = tokenBuckets(docs, idCol, textCol, buckets).localCheckpoint()
    val (model, priorMicro) = nbTrainFeat(feat, labels, buckets)
    labels.join(
        nbScoreFeat(docs.select(col(idCol).as("doc_id")), feat, model,
          priorMicro),
        Seq("doc_id"))
      .select(col("doc_id"), col("y").as("label"), col("score"),
        col("predicted"))
  }

  /** Train the NB model alone: (model, priorMicro). The model is COMPLETE
    * over all `buckets` rows — buckets no training token hashed into carry
    * the pure-Laplace default llr — so a FROZEN model scores future docs
    * whose unseen tokens land in training-empty buckets (the production
    * reuse path; an incomplete model would silently drop those features).
    */
  def nbTrain(docs: DataFrame, idCol: String, textCol: String,
              isPosCol: String, buckets: Int = 64): (DataFrame, Long) =
    nbTrainFeat(tokenBuckets(docs, idCol, textCol, buckets),
      docs.select(col(idCol).as("doc_id"), col(isPosCol).cast("long").as("y")),
      buckets)

  private def nbTrainFeat(feat: DataFrame, labels: DataFrame,
                          buckets: Int): (DataFrame, Long) = {
    val docsSpark = feat.sparkSession
    val cyb = feat
      .join(labels, Seq("doc_id"))
      .groupBy("b").agg(
        sum(when(col("y") === 1, col("x")).otherwise(0L)).as("c1"),
        sum(when(col("y") === 0, col("x")).otherwise(0L)).as("c0"))
    val tot = cyb.agg(sum("c1").as("t1"), sum("c0").as("t0"))
    val nn = labels.agg(sum("y").as("n1"),
      (count(lit(1)) - sum("y")).as("n0"), count(lit(1)).as("n"))
    val Array(r) = nn.collect() // 1-row class stats (bounded-model collect)
    val (n1, n0, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
    require(n1 > 0 && n0 > 0, s"both classes must be non-empty (n1=$n1 n0=$n0)")
    val spine = docsSpark.range(buckets).toDF("b")
    val model = spine.join(cyb, Seq("b"), "left")
      .select(col("b"), coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c0"), lit(0L)).as("c0"))
      .crossJoin(broadcast(tot))
      .select(col("b"),
        (lnMicro(col("c1") + 1L, col("t1") + buckets.toLong) -
          lnMicro(col("c0") + 1L, col("t0") + buckets.toLong)).as("llr"))
      .localCheckpoint() // the frozen, bounded (buckets-row) artifact
    val priorMicro = // exact long micro prior — computed on the driver with
      // the SAME op sequence as lnMicro (double div, ln, ×1e6, +0.5, floor)
      math.floor(math.log(n1.toDouble / n.toDouble) * 1e6 + 0.5).toLong -
        math.floor(math.log(n0.toDouble / n.toDouble) * 1e6 + 0.5).toLong
    (model, priorMicro)
  }

  /** Score any doc set under a FROZEN [[nbTrain]] model: (doc_id, score,
    * predicted). Docs with no tokens stay present at the prior.
    */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
              model: DataFrame, priorMicro: Long,
              buckets: Int = 64): DataFrame =
    nbScoreFeat(docs.select(col(idCol).as("doc_id")),
      tokenBuckets(docs, idCol, textCol, buckets), model, priorMicro)

  private def nbScoreFeat(ids: DataFrame, feat: DataFrame, model: DataFrame,
                          priorMicro: Long): DataFrame = {
    val sc = feat.join(broadcast(model), Seq("b"))
      .groupBy("doc_id").agg(sum(col("x") * col("llr")).as("s"))
    ids.join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        ((coalesce(col("s"), lit(0L)) + lit(priorMicro)).cast("double") /
          lit(1e6)).as("score"),
        (coalesce(col("s"), lit(0L)) + lit(priorMicro) >= 0L).as("predicted"))
  }

  /** `floor(1e6·σ(margin_micro/1e6) + 0.5)` — the quantized sigmoid. The
    * op sequence (÷, exp, +, ÷, ×, +, floor) is fixed so both engines
    * execute it bit-identically up to exp's 1-ulp licence, which the
    * source quantization absorbs.
    */
  private def sigmoidMicro(marginMicro: org.apache.spark.sql.Column) = {
    val m = marginMicro.cast("double") / lit(1e6)
    floor(lit(1.0) / (lit(1.0) + exp(negate(m))) * lit(1e6) + lit(0.5))
      .cast("long")
  }

  /** `rounds` full-batch GD rounds from w = 0. `labels` is (doc_id, y) with
    * y ∈ {0, 1}; `lrDenom` must be positive (1/lrDenom is the learning
    * rate). Returns the (b, wm) weight relation — buckets+1 rows, wm in
    * micro units, row b = buckets is the bias.
    */
  def trainLogRegMicro(feat: DataFrame, labels: DataFrame, buckets: Int,
                       rounds: Int, lrDenom: Long): DataFrame = {
    require(rounds >= 1 && lrDenom > 0, s"rounds=$rounds lrDenom=$lrDenom")
    val spark = feat.sparkSession
    import spark.implicits._
    // the per-round margin join reads feat `rounds` times — pin it once
    val f = feat.localCheckpoint()
    val lab = labels.select(col("doc_id"), col("y").cast("long").as("y"))
    var w = (0L to buckets.toLong).map((_, 0L)).toDF("b", "wm")
    for (_ <- 1 to rounds) {
      val resid = marginsMicro(f, w)
        .join(lab, Seq("doc_id"))
        .select(col("doc_id"), (sigmoidMicro(col("mm")) - col("y") * 1000000L).as("rm"))
      val grad = f.join(resid, Seq("doc_id"))
        .groupBy("b").agg(sum(col("rm") * col("x")).as("gm"))
      // truncated-div learning step; left join keeps feature-less buckets
      w = w.join(grad, Seq("b"), "left")
        .select(col("b"), (col("wm") -
          signum(coalesce(col("gm"), lit(0L))).cast("long") *
            expr(s"abs(coalesce(gm, 0L)) div $lrDenom")).as("wm"))
        .localCheckpoint() // truncate the per-round lineage (q100 discipline)
    }
    w
  }

  /** (doc_id, mm): per-doc margin Σ wm·x in micro units — one broadcast
    * join of the bounded weight relation into the feature scan.
    */
  private def marginsMicro(feat: DataFrame, weights: DataFrame): DataFrame =
    feat.join(broadcast(weights), Seq("b"))
      .groupBy("doc_id").agg(sum(col("wm") * col("x")).as("mm"))

  /** Train on the whole corpus, then score every doc: (doc_id, label,
    * score, predicted) — score = σ(margin) quantized to 6 places,
    * predicted = score ≥ 0.5. `isPosCol` names a 0/1 column on `docs`
    * (the weak supervision signal, e.g. "source is the target domain").
    */
  def qualityClassifier(docs: DataFrame, idCol: String, textCol: String,
                        isPosCol: String, buckets: Int = 64, rounds: Int = 3,
                        lrDenom: Long = 4096L): DataFrame = {
    val feat = hashedFeatures(docs, idCol, textCol, buckets)
    val labels = docs.select(col(idCol).as("doc_id"),
      col(isPosCol).cast("long").as("y"))
    val w = trainLogRegMicro(feat, labels, buckets, rounds, lrDenom)
    marginsMicro(feat, w)
      .join(labels, Seq("doc_id"))
      .select(col("doc_id"), col("y").as("label"),
        (sigmoidMicro(col("mm")).cast("double") / lit(1e6)).as("score"),
        (sigmoidMicro(col("mm")) >= 500000L).as("predicted"))
  }
}
