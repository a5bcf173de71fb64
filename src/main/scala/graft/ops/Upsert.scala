package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge/upsert without a transactional table format (SURVEY.md §2.1 S12,
  * §2.8 ST4): the reference's per-event `UPDATE ... WHERE id` + insert-if-
  * missing (reference: src/process_insert_update_weather_data.py:131-162)
  * becomes a batch MERGE rewrite.
  *
  * Scale note: `merge` rewrites the whole target. The 100 TB path is a
  * partition-pruned merge: when the target is partitioned on (a prefix of)
  * the key or a correlated column, read ONLY the partitions containing
  * touched keys, merge those, and leave the rest untouched — see
  * `mergePartitionPruned`. A lakehouse format's MERGE is the production
  * endgame (not available offline — documented tradeoff, SURVEY.md §7.4.2).
  */
object Upsert {

  /** Updates win over target rows with the same key; new keys are appended.
    * `updates` may carry several versions of a key: the winner is pinned by
    * `versionCol` (desc), ties by `tieCol` (desc), so the merged target never
    * holds duplicate keys.
    */
  def merge(target: DataFrame, updates: DataFrame, key: String,
            versionCol: String, tieCol: String): DataFrame =
    mergeUnique(target, lastWins(updates, key, versionCol, tieCol), key)

  /** Merge leg for callers that guarantee `updates` is unique per key
    * (e.g. output of [[lastWins]] or a per-key aggregate).
    */
  def mergeUnique(target: DataFrame, updates: DataFrame, key: String): DataFrame =
    target.join(updates.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(updates)

  /** Partition-pruned merge: `partCol` is the target's physical partition
    * column. Only target partitions that contain a touched key are rewritten;
    * the caller overwrite-writes the result with dynamic partition overwrite
    * (`spark.sql.sources.partitionOverwriteMode=dynamic`), leaving untouched
    * partitions on disk. This is the shape that survives 100 TB: the rewrite
    * cost is O(touched partitions), not O(target).
    */
  def mergePartitionPruned(target: DataFrame, updates: DataFrame, key: String,
                           partCol: String): DataFrame = {
    val touched = updates.select(partCol).distinct()
    val pruned = target.join(touched, Seq(partCol), "left_semi")
    pruned.join(updates.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(updates)
  }

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
