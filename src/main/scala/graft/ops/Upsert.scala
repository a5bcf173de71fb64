package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge/upsert without a transactional table format (SURVEY.md §2.1 S12,
  * §2.8 ST4): the reference's per-event `UPDATE ... WHERE id` + insert-if-
  * missing (reference: src/process_insert_update_weather_data.py:131-162)
  * becomes a batch MERGE rewrite.
  *
  * Scale note: `merge` rewrites the whole target — fine per micro-batch on a
  * partitioned table if the write is partition-pruned to only the partitions
  * containing touched keys; a lakehouse format's MERGE is the production path
  * (not available offline — documented tradeoff, SURVEY.md §7.4.2).
  */
object Upsert {

  /** Updates win over target rows with the same key; new keys are appended. */
  def merge(target: DataFrame, updates: DataFrame, key: String): DataFrame =
    target.join(updates.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(updates)

  /** Last-wins collapse of a key's history by `versionCol` (ties broken by
    * `tieCol` for determinism) — the per-batch form of ST4 when one
    * micro-batch may carry several versions of the same key.
    */
  def lastWins(df: DataFrame, key: String, versionCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(versionCol).desc, col(tieCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
