package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integrity-as-computation: the reference enforces what BigQuery's missing
  * PK/FK constraints would, by per-row probe queries; here each becomes one
  * set-oriented join per batch (SURVEY.md §2.3 J1-J3, §2.4 A2-A3).
  *
  * Scale note: the probe side of each join is a key set, not full rows — at
  * 100 TB the target's key column is still small enough to broadcast in most
  * CDC settings (bounded dimension); when it isn't, Catalyst falls back to a
  * shuffled join on the key, which is the right plan anyway.
  */
object Integrity {

  /** J1: rows whose key is NOT already in the target (insert dedup).
    * Reference probes `SELECT 1 FROM t WHERE id=x` per document
    * (reference: src/process_insert_update_weather_data.py:49-62); one
    * left_anti join replaces N round trips.
    */
  def newRowsOnly(incoming: DataFrame, target: DataFrame, key: String): DataFrame =
    incoming.join(broadcast(target.select(key).distinct()), Seq(key), "left_anti")

  /** J2: rows whose foreign key exists in the dimension (FK validation).
    * Reference: src/process_insert_update_weather_data.py:66-79.
    */
  def fkValid(facts: DataFrame, dim: DataFrame, factKey: String, dimKey: String): DataFrame =
    facts.join(
      broadcast(dim.select(col(dimKey).as(factKey)).distinct()),
      Seq(factKey), "left_semi")

  /** J2 rejected leg: FK violations, for the dead-letter/skip log. */
  def fkViolations(facts: DataFrame, dim: DataFrame, factKey: String, dimKey: String): DataFrame =
    facts.join(
      broadcast(dim.select(col(dimKey).as(factKey)).distinct()),
      Seq(factKey), "left_anti")

  /** A2: duplicate audit — keys appearing more than once.
    * Reference: src/process_insert_places_data.py:36-37,47-49.
    */
  def dupAudit(df: DataFrame, key: String): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n")).filter(col("n") > 1)

  /** J3: batch dedup against existing keys, first-wins within the batch
    * pinned by an explicit ordering (SURVEY.md §2.10.4 — the reference's
    * scan-order winner is nondeterministic; we pin by `orderCol`).
    * Reference: src/process_insert_places_data.py:36-46.
    */
  def batchDedup(batch: DataFrame, existing: DataFrame, key: String, orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol))
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .join(broadcast(existing.select(key).distinct()), Seq(key), "left_anti")
  }
}
