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

  /** Deterministic sample: keep rows whose key-hash falls under `frac`.
    * `frac` may be a literal or a per-row column (per-stratum rates). The
    * SAME rows are kept on every run and every engine — the property that
    * makes ablation experiments and incremental re-runs reproducible.
    */
  def deterministicSample(df: DataFrame, keyCol: Column, frac: Column): DataFrame =
    df.filter(hash01(keyCol) < frac)

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
}
