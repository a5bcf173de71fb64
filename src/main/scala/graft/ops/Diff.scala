package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff: classify every key across two table versions as
  * `added` / `removed` / `changed` / `unchanged` by comparing a payload
  * fingerprint. The audit step behind any incremental pipeline — "what did
  * this refresh actually change?" — and the precondition check before an
  * incremental dedup/index-maintenance pass (q92/q124) is allowed to treat
  * the old corpus as frozen.
  *
  * Scale design: each side is reduced to `(key, md5(payload))` FIRST — the
  * shuffle moves two thin columns, never document text — and the diff is one
  * full-outer hash join on the key. Both sides hash-partition on `key`, so
  * at 100 TB this is a single co-partitioned shuffle with no skew beyond the
  * key distribution itself; no window, no collect, no broadcast of anything
  * data-sized. Fingerprint comparison instead of column-wise equality keeps
  * the join schema fixed no matter how wide the payload is.
  */
object Diff {

  /** NULL-safe framed row text: columns joined on the 0x1F unit separator,
    * NULLs replaced by a 0x1E sentinel, so ("ab", NULL) and ("a", "b")
    * cannot collide. THE shared framing — every fingerprint/checksum
    * consumer ([[Scd]], [[Integrity.tableChecksum]],
    * [[graft.sources.ManifestTable.changes]]) routes through here so the
    * convention cannot drift between them.
    */
  def framedRow(cols: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
    concat_ws("\u001f", cols.map(c => coalesce(c.cast("string"), lit("\u001e"))): _*)

  /** md5 of [[framedRow]] — the standard row fingerprint. */
  def rowFingerprint(cols: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
    md5(framedRow(cols))

  private def fingerprints(df: DataFrame, key: String,
                           payload: Seq[String], as: String): DataFrame =
    df.select(col(key), rowFingerprint(payload.map(col)).as(as))

  /** The single full-outer diff join with its status classification. */
  private def classified(oldDf: DataFrame, newDf: DataFrame, key: String,
                         payload: Seq[String]): DataFrame =
    fingerprints(oldDf, key, payload, "old_fp")
      .join(fingerprints(newDf, key, payload, "new_fp"), Seq(key), "full_outer")
      .select(col(key),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))

  /** Per-key status relation: `(key, status)` for keys whose status is NOT
    * `unchanged` (the interesting minority — emitting unchanged rows would
    * make the diff as big as the corpus).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
                   payload: Seq[String]): DataFrame =
    classified(oldDf, newDf, key, payload)
      .filter(col("status") =!= "unchanged")

  /** Roll-up of the same single join including the unchanged tally: one row
    * per status, reduced to four rows before anything leaves the executors.
    */
  def snapshotDiffSummary(oldDf: DataFrame, newDf: DataFrame, key: String,
                          payload: Seq[String]): DataFrame =
    classified(oldDf, newDf, key, payload)
      .groupBy("status").agg(count(lit(1)).as("n"))
}
