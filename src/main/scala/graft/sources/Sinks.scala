package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sinks (SURVEY.md §2.1 S9-S14). Spark's parallel task writes ARE the
  * reference's `insert_many(ordered=False)` — unordered, per-partition
  * parallel, per-task failure isolated by task retry.
  */
object Sinks {

  /** S9/S10/S11: bulk append. One API covers the reference's three insert
    * shapes (single-row, multi-row, bulk) because batching is the engine's
    * default, not an optimization (SURVEY.md §4).
    */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Partitioned append — the 100 TB shape: co-locate by the column later
    * merges/point-lookups prune on.
    */
  def appendPartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("append").partitionBy(partCol).parquet(path)

  /** S13: dead-letter sink — failed rows as JSON, index-tagged and stamped
    * the way the reference names its S3 objects
    * (reference: src/ingest_weather_data.py:35-45). The stamp is formatted
    * driver-side (UTC, matching the session TZ) — launching a Spark job to
    * render a constant string would tax every micro-batch.
    */
  def deadLetter(failed: DataFrame, path: String, runTs: java.sql.Timestamp): Unit = {
    val stamp = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
      .withZone(java.time.ZoneOffset.UTC).format(runTs.toInstant)
    // Dense stable 0..n-1 index like the reference's failed-batch list index
    // (reference: src/ingest_weather_data.py:36) — monotonically_increasing_id
    // is neither dense nor stable across retries (VERDICT r02). Ordered by all
    // columns so the numbering is deterministic under replay.
    graft.ops.Enumerate.withIndex(failed, failed.columns.map(col).toSeq, "failed_index")
      .write.mode("append").json(s"$path/failed_$stamp")
  }

  /** S14: local JSON dump (reference: src/extract_coordinates.py:21-24). */
  def jsonDump(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Bucketed catalog table: pre-hash-partitioned and sorted on the join/
    * merge key so repeated joins between co-bucketed tables run with NO
    * shuffle exchange on either side — the co-location strategy for the
    * fact-to-fact joins that dominate at 100 TB (asserted shuffle-free in
    * SinksSpec).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").format("parquet").saveAsTable(table)
}
