package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) maintenance: collapse a change log
  * into validity intervals `(key, attrs..., valid_from, valid_to,
  * is_current)` — the dimension-table shape every warehouse join-on-history
  * uses (Kimball SCD2), and the point-in-time-correct feature store layout
  * for training-data pipelines (join facts to the attribute version that was
  * live AT the fact's timestamp via [[TemporalJoin.asOf]] on `valid_from`).
  *
  * Scale design: everything partitions by `key` — one hash shuffle, then
  * per-key windows over timelines that are each small; no global window, no
  * collect. Run collapse is the gaps-and-islands pattern (lag-compare →
  * running sum → group), the same shape as [[graft.llm.SubstringDedup]]'s
  * span merge. The incremental [[type2Apply]] touches ONLY open intervals
  * plus the batch — closed history is never rescanned, so a daily batch
  * against a 100 TB dimension costs O(batch + live keys), not O(history).
  */
object Scd {

  /** NULL-framed change fingerprint of the attribute tuple — the shared
    * [[Diff.rowFingerprint]] framing.
    */
  private def fp(attrs: Seq[String]): Column =
    Diff.rowFingerprint(attrs.map(col))

  /** One observation per (key, ts): the row with the HIGHEST `tieCol` wins
    * (deterministic pin — a change log can record several writes in one
    * timestamp grain; the last-writer convention matches [[Upsert]]).
    */
  private def pickPerTs(log: DataFrame, key: String, ts: String,
                        attrs: Seq[String], tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(key), col(ts)).orderBy(col(tieCol).desc)
    log.select((Seq(key, ts, tieCol) ++ attrs).distinct.map(col): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((Seq(key, ts) ++ attrs).map(col): _*)
  }

  /** Full-history build: collapse consecutive runs of identical attribute
    * tuples per key into intervals. `valid_to` is the NEXT run's first
    * timestamp (half-open intervals, NULL = still current) — so a fact at
    * time t joins the row with `valid_from <= t < coalesce(valid_to, ∞)`.
    */
  def type2(log: DataFrame, key: String, ts: String, attrs: Seq[String],
            tieCol: String): DataFrame = {
    require(attrs.nonEmpty, "type2 needs at least one tracked attribute")
    val picked = pickPerTs(log, key, ts, attrs, tieCol)
    val wk = Window.partitionBy(col(key)).orderBy(col(ts))
    val runs = picked
      .withColumn("__fp", fp(attrs))
      .withColumn("__new", when(lag(col("__fp"), 1).over(wk).isNull
        .or(lag(col("__fp"), 1).over(wk) =!= col("__fp")), 1L).otherwise(0L))
      .withColumn("__run", sum(col("__new")).over(
        wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val intervals = runs
      .groupBy((col(key) +: col("__run") +: attrs.map(col)): _*)
      .agg(min(col(ts)).as("valid_from"))
    val wv = Window.partitionBy(col(key)).orderBy(col("valid_from"))
    intervals
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
      .select((Seq(key) ++ attrs ++ Seq("valid_from", "valid_to", "is_current")).map(col): _*)
  }

  /** Incremental batch apply: fold new change-log rows into an existing
    * Type-2 dimension WITHOUT rescanning closed history. Open intervals are
    * re-expressed as log entries at their `valid_from` and re-collapsed
    * together with the batch — a batch observation equal to the open run
    * extends it (no spurious new version), a differing one closes it; keys
    * absent from the batch pass through untouched (their open row re-emerges
    * from the same collapse, bit-identical).
    *
    * CONTRACT: per key, batch timestamps must be STRICTLY GREATER than
    * that key's open `valid_from` (CDC batches arrive forward in time). A
    * late event older than the open interval would need to rewrite closed
    * history — a full [[type2]] rebuild by definition — and a batch row AT
    * the open interval's exact grain cannot displace it (the dimension does
    * not retain the original winner's tie value, so the open state is
    * pinned authoritative at its own timestamp; a rebuild could decide that
    * grain differently).
    *
    * Equivalence `type2Apply(type2(log₁), log₂) == type2(log₁ ∪ log₂)`
    * under the contract is property-tested in OpsSpec.
    */
  def type2Apply(dim: DataFrame, batch: DataFrame, key: String, ts: String,
                 attrs: Seq[String], tieCol: String): DataFrame = {
    val closed = dim.filter(!col("is_current"))
      .select((Seq(key) ++ attrs ++ Seq("valid_from", "valid_to", "is_current")).map(col): _*)
    // the open interval as a change-log row; MAX_VALUE tie so a batch row in
    // the same timestamp grain can never displace the established state
    val openAsLog = dim.filter(col("is_current"))
      .select((col(key) +: col("valid_from").as(ts) +:
        lit(Long.MaxValue).as(tieCol) +: attrs.map(col)): _*)
    val batchLog = batch
      .select((Seq(key, ts, tieCol) ++ attrs).distinct.map(col): _*)
    val reopened = type2(openAsLog.unionByName(batchLog), key, ts, attrs, tieCol)
    closed.unionByName(reopened)
  }
}
