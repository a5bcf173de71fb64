package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contamination-safe dataset splitting — the train/val cut every LLM
  * pipeline makes before eval, done so duplicated content cannot straddle
  * the split (the eval-leakage failure mode the decontamination literature
  * warns about: an exact copy of a val doc in train inflates every metric).
  *
  * Policy: split on a hash of the doc's CONTENT FINGERPRINT (md5 of
  * normalized text) instead of the doc id — every exact duplicate shares a
  * fingerprint, so the whole dup group lands on one side BY CONSTRUCTION;
  * no post-hoc leakage scrub needed. [[leakageReport]] measures both
  * policies side by side: the id split's leaked cross-pair count vs the
  * fingerprint split's structural zero.
  *
  * Determinism: the split decision is the engine-portable
  * [[Sampling.hash01]] threshold (md5 8-hex / 2^32 < valFrac) — the same
  * rows split the same way on any cluster size, any engine, any run.
  * Scale: one projection per doc plus one fingerprint-keyed aggregate;
  * pair counts come from per-group side tallies (tr·va), never a pair
  * self-join.
  */
object Split {

  /** (doc_id, fp, split_by_id, split_by_fp) — both policies' assignments
    * for every doc; `fp` is the exact-dedup fingerprint.
    */
  def assign(docs: DataFrame, idCol: String, textCol: String,
             valFrac: Double): DataFrame = {
    require(valFrac > 0.0 && valFrac < 1.0, s"valFrac=$valFrac")
    docs.select(col(idCol).as("doc_id"),
        md5(Dedup.normalize(col(textCol))).as("fp"))
      .withColumn("split_by_id",
        when(Sampling.hash01(col("doc_id")) < valFrac, "val").otherwise("train"))
      .withColumn("split_by_fp",
        when(Sampling.hash01(col("fp")) < valFrac, "val").otherwise("train"))
  }

  /** One row per policy: (policy, n_train, n_val, cross_dup_pairs) —
    * cross_dup_pairs = Σ over fingerprint groups of (train count · val
    * count), the number of exact-duplicate pairs the split separates. The
    * fingerprint policy's count is structurally zero; the id policy's
    * count is the leak the report exists to surface.
    */
  def leakageReport(docs: DataFrame, idCol: String, textCol: String,
                    valFrac: Double): DataFrame = {
    val a = assign(docs, idCol, textCol, valFrac)
    val long = a.select(col("fp"), lit("by_id").as("policy"),
        col("split_by_id").as("split"))
      .unionByName(a.select(col("fp"), lit("by_fp").as("policy"),
        col("split_by_fp").as("split")))
    val byFp = long.groupBy("policy", "fp").agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("tr"),
      sum(when(col("split") === "val", 1L).otherwise(0L)).as("va"))
    byFp.groupBy("policy").agg(
      sum(col("tr")).as("n_train"), sum(col("va")).as("n_val"),
      sum(col("tr") * col("va")).as("cross_dup_pairs"))
  }
}
