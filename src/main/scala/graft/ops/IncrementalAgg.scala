package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.ManifestTable

/** Incremental aggregate-view maintenance: keep a per-key (n, sum, min,
  * max) table current under a stream of delta batches WITHOUT ever
  * recomputing from the base data — `new_state = merge(old_state,
  * agg(delta))`, the classic self-maintainable-view identity for
  * distributive aggregates. At 100 TB the difference between "re-aggregate
  * the corpus per batch" and "touch O(|delta| + affected buckets)".
  *
  * Scale design: the state table is a [[ManifestTable]] hash-bucketed on
  * the key (`bucket = xxhash64(key) mod nBuckets` — immutable per key, the
  * [[graft.cdc.Dispatch.runPartitioned]] partition contract), so each batch
  * (1) aggregates its delta map-side, (2) reads back ONLY the touched
  * buckets' state, (3) merges two already-aggregated relations on the key,
  * and (4) commits just those buckets, untouched buckets carrying forward
  * by manifest entry. Sums route through `decimal(18,6)` so the maintained
  * state is bit-identical to a from-scratch aggregate under ANY batch
  * arrival order or partitioning.
  */
object IncrementalAgg {

  /** State schema: key (string-typed for layout stability), bucket, n,
    * sum (decimal so merge order cannot drift), min, max.
    */
  def stateSchema: StructType = StructType.fromDDL(
    "key STRING, bucket STRING, n BIGINT, s DECIMAL(28,6), mn DOUBLE, mx DOUBLE")

  /** Map-side aggregate of one delta batch into state-shaped rows. */
  def aggregateDelta(delta: DataFrame, key: String, valueCol: String,
                     nBuckets: Int): DataFrame =
    delta.select(col(key).cast("string").as("key"),
        col(valueCol).cast("double").as("v"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,6)")).cast("decimal(28,6)").as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .withColumn("bucket",
        pmod(xxhash64(col("key")), lit(nBuckets.toLong)).cast("string"))
      .select("key", "bucket", "n", "s", "mn", "mx")

  /** Merge two state-shaped relations: distributive on every column. */
  def mergeStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("key", "bucket")
      .agg(sum(col("n")).as("n"), sum(col("s")).cast("decimal(28,6)").as("s"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  /** Fold one delta batch into the committed state table at `root`;
    * returns the committed version. Only buckets holding a delta key are
    * read, merged, and rewritten.
    */
  def applyBatch(spark: SparkSession, root: String, delta: DataFrame,
                 key: String, valueCol: String, nBuckets: Int = 64): Long = {
    val da = aggregateDelta(delta, key, valueCol, nBuckets)
      .localCheckpoint() // feeds the touched-set probe AND the merge once
    if (!ManifestTable.exists(spark, root))
      ManifestTable.commit(da, root, Some("bucket"))
    else {
      // bounded driver collect (≤ nBuckets strings): a LITERAL partition
      // filter prunes the scan statically — no reliance on runtime DPP
      // reaching through the manifest read's union
      val touched = da.select("bucket").distinct()
        .collect().map(_.getString(0)).toSeq
      val state = ManifestTable.read(spark, root, stateSchema)
        .filter(col("bucket").isin(touched: _*))
      ManifestTable.commit(mergeStates(state, da), root, Some("bucket"))
    }
  }
}
