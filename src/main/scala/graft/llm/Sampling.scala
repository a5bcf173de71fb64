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
  * neither); the percentile gate is one window per stratum (keyed shuffle).
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
    * per source" curation step.
    */
  def percentileGate(df: DataFrame, stratumCol: String, scoreCol: Column,
                     tieCol: Column, minPercentRank: Double): DataFrame = {
    val w = Window.partitionBy(col(stratumCol)).orderBy(scoreCol, tieCol)
    df.withColumn("pr", percent_rank().over(w))
      .filter(col("pr") >= minPercentRank)
  }
}
