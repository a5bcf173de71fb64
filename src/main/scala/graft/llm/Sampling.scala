package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling/gating for training-data pipelines: deterministic
  * hash-threshold sampling (replayable, join-free, per-stratum rates) and
  * percentile-based quality gates.
  *
  * Scale design: sampling is a pure per-row predicate fused into the scan —
  * no shuffle, no RNG state, reproducible across runs/engines (`rand()` is
  * neither); the percentile gate is a two-pass distribution threshold (see
  * [[percentileGate]]) — NO per-stratum global sort, so a dominant source
  * cannot pin the whole gate on one reducer chain.
  */
object Sampling {

  /** Uniform [0,1) hash of a key: first 8 md5 hex digits as a 32-bit uint,
    * scaled. Engine-portable (DuckDB: `('0x'||substr(md5(..),1,8))::BIGINT`).
    */
  def hash01(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)

  /** Portable 6-decimal rounding: `floor(x·1e6 + 0.5) / 1e6`. Unlike
    * `round(x, 6)` — which Spark evaluates through the double's SHORTEST
    * decimal representation and DuckDB through a scaled multiply, so the two
    * engines can disagree whenever that representation lands EXACTLY on a
    * half boundary — this is a fixed sequence of IEEE double ops both
    * engines execute bit-identically. Exact halves are ROUTINE for values
    * like centroid means: 6-decimal fixture data summed exactly (decimal
    * routing) and divided by a small count lands on ...5e-7 constantly
    * (q124 found one; the q100 round() rule). Negative halves round toward
    * +inf rather than away from zero — a convention change, but the SAME
    * convention on both engines, which is the property that matters.
    */
  def round6(x: Column): Column = floor(x * lit(1e6) + lit(0.5)) / lit(1e6)

  /** `floor(1e6·ln(num/den) + 0.5)` as BIGINT — the micro-quantized
    * log-likelihood shared by the trained classifiers and TF-IDF weighting.
    * ln is transcendental, so its output never lands within an ulp of a
    * micro boundary; the fixed (÷, ln, ×, +, floor) sequence is
    * bit-identical on both engines.
    */
  def lnMicro(num: Column, den: Column): Column =
    floor(log(num.cast("double") / den.cast("double")) * lit(1e6) + lit(0.5))
      .cast("long")

  /** [[round6]] at 4 decimals — for scores whose inputs can land EXACTLY on
    * a 4-decimal half boundary (e.g. avg_nll: a decimal-exact sum of
    * 6-decimal logps divided by a small count hits ...5e-5 on unlucky
    * data, where engine `round()` conventions diverge — the q100 class).
    */
  def round4(x: Column): Column = floor(x * lit(1e4) + lit(0.5)) / lit(1e4)

  /** Deterministic sample: keep rows whose key-hash falls under `frac`.
    * `frac` may be a literal or a per-row column (per-stratum rates). The
    * SAME rows are kept on every run and every engine — the property that
    * makes ablation experiments and incremental re-runs reproducible.
    */
  def deterministicSample(df: DataFrame, keyCol: Column, frac: Column): DataFrame =
    df.filter(hash01(keyCol) < frac)

  /** Epoch-aware mixture resampling: materialize each row `weight` times,
    * where `weight` may EXCEED 1 — the "wiki ×2.5, web ×0.3" data-mixing
    * recipe every LLM training run uses. A row with weight w is emitted
    * `floor(w)` times plus one more iff `hash01(key#e) < frac(w)`, so the
    * expected multiplicity is exactly w, the realized multiset is a pure
    * function of the keys (replayable across runs and engines, unlike
    * `rand()`), and [[deterministicSample]] is the w ≤ 1 special case in
    * expectation. `copyCol` carries the 0-based copy index so downstream
    * shuffling/packing can treat epochs as distinct rows.
    *
    * Scale shape: a per-row `explode(sequence(...))` fused into the scan —
    * no shuffle, no RNG state, output size = Σ⌈w⌉ bounded by the weights
    * the caller chose. The fractional-copy hash is salted (`#e`) so it is
    * independent of any plain [[hash01]] gate already applied to the key.
    */
  def epochMixture(df: DataFrame, keyCol: Column, weight: Column,
                   copyCol: String = "copy_idx"): DataFrame = {
    val w = weight.cast("double")
    val nCopies = (floor(w).cast("int") +
      when(hash01(concat(keyCol.cast("string"), lit("#e"))) < (w - floor(w)),
        lit(1)).otherwise(lit(0))).as("__n")
    df.withColumn("__n", nCopies)
      .withColumn(copyCol,
        explode(when(col("__n") > 0, sequence(lit(0), col("__n") - 1))
          .otherwise(array().cast("array<int>"))))
      .drop("__n")
  }

  /** Per-stratum percentile gate: keep rows whose `scoreCol` reaches the
    * `minPercentRank` percent-rank WITHIN their stratum (ties pinned by
    * `tieCol` so the gate is deterministic). The standard "keep the top X%
    * per source" curation step. Output carries the exact `pr` column a
    * `percent_rank() OVER (PARTITION BY stratum ORDER BY score, tie)` window
    * would produce — same integers, same double division, bit-identical.
    *
    * Scale design (two-pass, no per-stratum global sort): a naive
    * `percent_rank` window sorts each ENTIRE stratum on one reducer chain —
    * at 100 TB a dominant source makes that sort the job. Instead:
    *
    *  1. Aggregate the (stratum, score) value DISTRIBUTION — tiny relative
    *     to the data when scores are discrete (token counts, quantized
    *     quality scores; quantize first for continuous scores). A window
    *     over this distinct-value relation yields, per score bucket, the
    *     count of rows below it (`below`), the stratum size (`n`), and the
    *     best percent-rank any row in the bucket can reach.
    *  2. Broadcast the buckets that can reach the threshold and inner-join:
    *     rows in hopeless buckets are pruned BEFORE any sort. Survivors are
    *     ranked only WITHIN their (stratum, score) bucket — partition keys
    *     are fine-grained, so no stratum lands on a single reducer — and
    *     `pr = (below + rank_in_bucket - 1) / (n - 1)` reproduces the
    *     window's value exactly (rank over (score, tie) decomposes into
    *     bucket offset + tie-order within the bucket).
    */
  def percentileGate(df: DataFrame, stratumCol: String, scoreCol: Column,
                     tieCol: Column, minPercentRank: Double): DataFrame = {
    val st = col(stratumCol)
    val scored = df.withColumn("__score", scoreCol)
    // Pass 1: distinct-value distribution per stratum (tiny relation).
    val wCum = Window.partitionBy(col("__st")).orderBy(col("__sc"))
    val buckets = scored.groupBy(st.as("__st"), col("__score").as("__sc"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__below", coalesce(
        sum(col("__cnt")).over(wCum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(Window.partitionBy(col("__st"))))
      .filter( // best pr in the bucket: its LAST row's rank is below+cnt
        when(col("__n") === 1, lit(0.0))
          .otherwise((col("__below") + col("__cnt") - 1).cast("double")
            / (col("__n") - 1).cast("double")) >= minPercentRank)
      .select(col("__st"), col("__sc"), col("__below"), col("__n"))
    // Pass 2: broadcast-prune, then rank within fine-grained buckets only.
    val wBucket = Window.partitionBy(st, col("__score")).orderBy(tieCol)
    scored
      .join(broadcast(buckets), st <=> col("__st") && col("__score") <=> col("__sc"))
      .withColumn("pr", when(col("__n") === 1, lit(0.0))
        .otherwise((col("__below") + row_number().over(wBucket) - 1).cast("double")
          / (col("__n") - 1).cast("double")))
      .filter(col("pr") >= minPercentRank)
      .drop("__score", "__st", "__sc", "__cnt", "__below", "__n")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): label each doc
    * head / middle / tail by its LM score's percent-rank WITHIN its source
    * stratum — the standard curation split (head ≈ wiki-like, tail ≈ noisy)
    * that downstream mixes sample from at different rates. `scoreCol` is an
    * already-QUANTIZED perplexity proxy (q97's round-4 avg_nll): the
    * percent-rank rides [[percentileGate]]'s two-pass decomposition at
    * threshold 0 (per-stratum distribution relation + fine-grained bucket
    * ranking — no per-stratum global sort), which q62 proved lands
    * bit-identically on the window `percent_rank()`. LOWER perplexity =
    * better = head; cuts at pr < 1/3 and < 2/3 (exact double compares on
    * both engines).
    */
  def ccnetBuckets(scored: DataFrame, idCol: String, stratumCol: String,
                   scoreCol: Column): DataFrame =
    percentileGate(scored, stratumCol, scoreCol, col(idCol), 0.0)
      .withColumn("bucket",
        when(col("pr") < lit(1.0 / 3.0), lit("head"))
          .when(col("pr") < lit(2.0 / 3.0), lit("middle"))
          .otherwise(lit("tail")))

  /** Temperature-flattened mixture rates at α = 0.5 (the multilingual-
    * sampling flatten: sample source s proportional to p_s^α, upweighting
    * tail sources so head domains don't drown them): per-stratum keep-rate
    * rate_s = min(1, T·q_s/n_s) with q_s = sqrt(n_s)/Σ_t sqrt(n_t), so the
    * expected sample size is ~T rows distributed ∝ sqrt(n_s). Feed the
    * rates to [[deterministicSample]] (per-stratum `frac` column).
    *
    * α = 0.5 on purpose: sqrt is IEEE-CORRECTLY-ROUNDED (exactly portable),
    * unlike the pow/exp/ln a general α needs. The denominator sum is still
    * order-dependent in doubles, so each sqrt rounds to 6 at the source and
    * sums through decimal(18,6) — the ln convention applied to sqrt.
    *
    * Scale: one count per stratum (map-side partials into a |sources|-row
    * relation), one broadcast scalar, zero data-sized shuffles.
    */
  def temperatureRatesSqrt(df: DataFrame, stratumCol: String,
                           targetRows: Long): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val cnts = df.groupBy(stratumCol).agg(count(lit(1)).as("n_s"))
      .withColumn("__sq", round(sqrt(col("n_s").cast("double")), 6))
    val denom = cnts.agg(
      sum(col("__sq").cast("decimal(18,6)")).cast("double").as("__denom"))
    cnts.crossJoin(broadcast(denom))
      .select(col(stratumCol), col("n_s"),
        least(lit(1.0),
          lit(targetRows.toDouble) * (col("__sq") / col("__denom")) / col("n_s").cast("double"))
          .as("rate"))
  }

  /** Cross-source QUANTILE NORMALIZATION — score calibration: different
    * sources' quality scores aren't comparable (a mid-tier web doc and a
    * mid-tier paper score differently on the same features), so curation
    * maps each row's within-source percent-rank onto the GLOBAL score
    * distribution: calib = G⁻¹(F_source(x)), the standard quantile-mapping
    * normalization. After it, "keep calib >= t" thresholds every source at
    * the same effective stringency.
    *
    * Relational shape: within-source percent-ranks come from
    * [[percentileGate]]'s two-pass decomposition (no per-stratum global
    * sort); the global inverse CDF is the DISTINCT-score bucket relation
    * (tiny for discrete scores — quantize first for continuous ones, the
    * percentileGate caveat), collected sorted to the driver (bounded by
    * `maxBuckets`) and broadcast as ONE sorted array; the lookup is a
    * per-row O(log buckets) binary search via the native
    * [[org.apache.spark.sql.graft.InvCdfLookup]] expression. The earlier
    * `pr <= cdf` join + keyed-min form was a BroadcastNestedLoopJoin —
    * O(rows × buckets) candidates at scale (VERDICT r08 #1); the search
    * makes the same comparisons against the same doubles (cum/n in
    * identical long-sum / double-division arithmetic), so output is
    * bit-identical.
    *
    * Determinism: pr and cdf are ratios of exact integers (same-engine
    * IEEE division), so the >= comparison is exact; ties in pr are pinned
    * by `tieCol` inside percentileGate.
    */
  def quantileNormalize(df: DataFrame, stratumCol: String, scoreCol: Column,
                        tieCol: Column, maxBuckets: Long = 65536L): DataFrame = {
    val rows = percentileGate(df.withColumn("__qscore", scoreCol),
      stratumCol, col("__qscore"), tieCol, minPercentRank = 0.0)
    val buckets = df.groupBy(scoreCol.as("calib")).agg(count(lit(1)).as("__cnt"))
    // The bucket relation is collected to the driver — correct only because
    // it is bounded. Enforce boundedness BEFORE collecting (VERDICT r06 #4):
    // a continuous score would otherwise pull the whole corpus to the driver.
    val nBuckets = buckets.count()
    require(nBuckets <= maxBuckets,
      s"quantileNormalize saw $nBuckets distinct scores (> $maxBuckets): the " +
        "inverse-CDF bucket relation must stay broadcast-scale — quantize a " +
        "continuous score first (e.g. round(score, k)) or raise maxBuckets " +
        "if the bucket relation genuinely fits in driver memory")
    val valueType = buckets.schema("calib").dataType
    // Spark-side sort (not driver-side): string scores keep UTF8 binary
    // order, exactly the old window's ORDER BY calib semantics.
    val sorted = buckets.orderBy(col("calib")).collect()
    val bc = org.apache.spark.sql.graft.InvCdf.globalTable(df.sparkSession, sorted, valueType)
    rows.withColumn("calib",
        org.apache.spark.sql.graft.InvCdf.lookup(col("pr"), bc, valueType))
      .drop("__qscore")
  }

  /** PER-SOURCE quantile normalization onto the cross-source MEAN
    * distribution — the textbook quantile-normalization target
    * (Bolstad et al. 2003, microarray normalization): each row takes its
    * within-source percent-rank, and the calibrated value at rank p is the
    * AVERAGE over all sources of their own inverse CDFs at p. Two shifted
    * copies of the same distribution land on one identical scale, each
    * source keeps its internal ordering, and no single dominant source
    * defines the target (the distinction from [[quantileNormalize]], whose
    * reference is the pooled global distribution).
    *
    * Relational shape: within-source pr from [[percentileGate]]'s two-pass
    * decomposition; the per-(source, score) bucket relation is collected
    * sorted to the driver (TOTAL size bounded by `maxTotalBuckets`, the
    * per-source worst by `maxBuckets`), where the per-source CDFs are
    * merged into ONE sorted breakpoint array whose values are the
    * cross-source decimal means — see
    * [[org.apache.spark.sql.graft.InvCdf.meanTable]]. The lookup is then a
    * per-row O(log totalBuckets) binary search, independent of the source
    * count. The earlier `pr <= cdf` join + two keyed aggregations was a
    * BroadcastNestedLoopJoin fanning every row out to the UNION of all
    * sources' buckets — O(rows × totalBuckets) at scale (VERDICT r08 #1,
    * ADVICE r08 on the union-sized broadcast).
    *
    * Determinism: pr and cdf are ratios of exact integers; the per-source
    * lookup is exact; the cross-source mean sums through decimal(18,6)
    * (exact, order-independent — replayed with the same HALF_UP scale-6
    * arithmetic in meanTable) and divides by an exact count —
    * bit-identical across engines. Quantize continuous scores first (the
    * [[percentileGate]] caveat).
    */
  def quantileNormalizeMean(df: DataFrame, stratumCol: String, scoreCol: Column,
                            tieCol: Column, maxBuckets: Long = 65536L,
                            maxTotalBuckets: Long = 1L << 22): DataFrame = {
    val rows = percentileGate(df.withColumn("__qscore", scoreCol),
      stratumCol, col("__qscore"), tieCol, minPercentRank = 0.0)
    val buckets = df.groupBy(col(stratumCol).as("__bst"), scoreCol.as("__bv"))
      .agg(count(lit(1)).as("__cnt"))
    // Guard the TOTAL bucket count before collecting (ADVICE r08): the old
    // per-source-worst guard let nSources × maxBuckets through unchecked.
    val total = buckets.count()
    require(total <= maxTotalBuckets,
      s"quantileNormalizeMean saw $total (source, score) buckets " +
        s"(> $maxTotalBuckets): the union of per-source CDFs must stay " +
        "driver/broadcast-scale — quantize the score first or raise " +
        "maxTotalBuckets")
    val sorted = buckets.orderBy(col("__bst"), col("__bv")).collect()
    // per-source worst-case distinct-score guard, computed driver-side from
    // the already-collected relation (no extra job; empty input => worst 0,
    // the ADVICE r08 empty-frame NPE is structurally gone)
    val worst = if (sorted.isEmpty) 0L else
      sorted.iterator.map(_.get(0)).foldLeft((0L, 0L, null: Any)) {
        case ((best, run, prev), s) =>
          val r = if (s == prev) run + 1 else 1L
          (math.max(best, r), r, s)
      }._1
    require(worst <= maxBuckets,
      s"quantileNormalizeMean saw a source with $worst distinct scores " +
        s"(> $maxBuckets): quantize the score first or raise maxBuckets")
    val bc = org.apache.spark.sql.graft.InvCdf.meanTable(df.sparkSession, sorted)
    rows.withColumn("calib",
        org.apache.spark.sql.graft.InvCdf.lookup(col("pr"), bc,
          org.apache.spark.sql.types.DoubleType))
      .drop("__qscore")
  }

  /** Weighted sampling WITHOUT replacement, k rows per stratum —
    * Efraimidis–Spirakis A-ES: each row draws u = hash01(key) and ranks by
    * u^(1/w); the top-k by that key are a true weighted sample without
    * replacement. Ranking by `ln(u)/w` is order-equivalent (ln is monotone,
    * w > 0) and avoids `pow`, a second non-portable libm kernel; ln rounds
    * to 6 at the source (q72 convention) and ties are pinned by the key
    * column, so the SAME sample comes out of every run and engine.
    *
    * Scale: a pure per-row selection key plus one per-stratum top-k window —
    * WindowGroupLimit pushes the k-limit into per-partition heaps, so no
    * stratum is globally sorted. Rows with non-positive weight never
    * qualify (weight 0 must be unsampleable; A-ES requires w > 0).
    *
    * u is (h32 + 0.5)/2^32 ∈ (0, 1), not hash01's h32/2^32 ∈ [0, 1): the
    * open lower bound matters — one row in 2^32 draws h32 = 0, and ln(0)
    * is where a 100 TB run dies (Spark's round() throws on -Infinity).
    */
  def weightedSampleK(df: DataFrame, stratumCol: String, keyCol: Column,
                      weightCol: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (conv(substring(md5(keyCol.cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(4294967296.0)
    val rk = round(log(u), 6) / weightCol.cast("double")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("sel_key").desc, keyCol)
    df.filter(weightCol > 0)
      .withColumn("sel_key", rk)
      .withColumn("draw", row_number().over(w).cast("long"))
      .filter(col("draw") <= k)
  }

  /** Greedy data selection under a TOKEN BUDGET — the curation endgame
    * ("fill a 10B-token training budget with the best-quality documents"):
    * documents ordered by (score desc, id) are taken while the running
    * token cost fits. The naive form is one global single-partition sort +
    * cumsum over the corpus; this is the [[percentileGate]] two-pass
    * decomposition instead: (1) aggregate cost per DISTINCT score
    * (continuous scores must be quantized upstream — round6/round(…,6) —
    * or the bucket relation degenerates to the row count), run the
    * cumulative total over that BOUNDED bucket relation (the one
    * single-partition window, bucket-sized, never corpus-sized), (2) join
    * the per-bucket "cost before this bucket" back and keep rows whose
    * bucket-prefix + within-bucket id-ordered cumsum fits — bit-identical
    * to the global take-while, with only keyed shuffles touching the
    * corpus. Returns (id, score, cost) of the selected rows.
    */
  def tokenBudgetSelect(df: DataFrame, idCol: String, scoreCol: Column,
                        costCol: Column, budget: Long,
                        maxBuckets: Long = 2000000L): DataFrame = {
    require(budget >= 0, s"budget=$budget")
    val base = df.select(col(idCol), scoreCol.as("__s"),
      costCol.cast("long").as("__c"))
    // the single-partition window below is safe ONLY because the bucket
    // relation is distinct-score-bounded; an unquantized continuous score
    // degenerates it to the corpus row count — the exact global sort this
    // op exists to avoid. Gate with one HLL pass (map-side partial, no
    // shuffle state to blow up) and fail loudly instead of silently
    // running the scale-killer plan.
    val nBuckets = base.agg(
      approx_count_distinct(col("__s"), 0.05).as("n")).head().getLong(0)
    require(nBuckets <= maxBuckets,
      s"tokenBudgetSelect: ~$nBuckets distinct score values exceed maxBuckets=$maxBuckets — " +
        "the score looks continuous; quantize it first (round(score, 6) / Sampling.round6) " +
        "so the bucket cumsum stays bounded, or raise maxBuckets deliberately")
    val buckets = base.groupBy(col("__s")).agg(sum(col("__c")).as("__bc"))
    val wB = Window.orderBy(col("__s").desc)
    val run = buckets.withColumn("__before",
      coalesce(sum(col("__bc")).over(
        wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__s"), col("__before"))
    val wIn = Window.partitionBy(col("__s")).orderBy(col(idCol))
    base.join(run, Seq("__s"))
      .withColumn("__cum", col("__before") + sum(col("__c")).over(wIn))
      .filter(col("__cum") <= budget)
      .select(col(idCol), col("__s").as("score"), col("__c").as("cost"))
  }
}
