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
  * CONTRACT: deltas are INSERT-ONLY. n/sum are invertible (a delete delta
  * could fold in with negated counts), but min/max and the KMV distinct
  * state are not — retracting the current minimum requires the base data.
  * Feed deletes through a periodic from-scratch rebuild (or drop min/max
  * from the view), the standard self-maintainability boundary.
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
    // the touched-bucket set RIDES the checkpoint's materialization pass
    // (r22, the stream-sink pattern): the former distinct().collect() was a
    // second driver action over the just-checkpointed delta. Accumulator
    // re-adds from a retried task dedupe below — the set stays exact.
    val acc = spark.sparkContext.collectionAccumulator[String]("graft.iagg.touched")
    val shaped = aggregateDelta(delta, key, valueCol, nBuckets)
    val bIdx = shaped.schema.fieldNames.indexOf("bucket")
    val enc = org.apache.spark.sql.Encoders.row(shaped.schema)
    val da = shaped.mapPartitions { it =>
      it.map { r => acc.add(r.getString(bIdx)); r }
    }(enc).localCheckpoint() // feeds the touched-set probe AND the merge once
    if (!ManifestTable.exists(spark, root))
      ManifestTable.commit(da, root, Some("bucket"))
    else {
      // bounded driver set (≤ nBuckets strings): a LITERAL partition
      // filter prunes the scan statically — no reliance on runtime DPP
      // reaching through the manifest read's union
      val touched = {
        import scala.jdk.CollectionConverters._
        acc.value.asScala.toSeq.distinct
      }
      val state = ManifestTable.read(spark, root, stateSchema)
        .filter(col("bucket").isin(touched: _*))
      ManifestTable.commit(mergeStates(state, da), root, Some("bucket"))
    }
  }

  // ================== distinct-count view (KMV state) ===================
  //
  // COUNT(DISTINCT x) is NOT distributive — the one aggregate the (n, s,
  // mn, mx) view above cannot maintain, and the reason warehouses bolt
  // sketch columns onto incremental views (Druid/BigQuery materialized
  // views do exactly this). The maintained state is the KMV bottom-k
  // distinct-hash array ([[org.apache.spark.sql.graft.KmvState]]): merge =
  // exact set-union-truncate on two ≤k arrays, so any batch arrival order
  // lands on the identical sketch a one-shot aggregate produces, and the
  // estimate replays cross-engine bit-for-bit (the q116 property, kept
  // under incremental maintenance).

  /** Distinct-view state schema: the sorted bottom-k hash array per key. */
  def distinctStateSchema: StructType = StructType.fromDDL(
    "key STRING, bucket STRING, kmv ARRAY<BIGINT>")

  /** Map-side KMV aggregate of one delta batch (bounded k-long buffers,
    * partial-aggregation friendly). `hash` must be the 60-bit md5-derived
    * portable hash (the q95/q116 convention).
    */
  def aggregateDistinctDelta(delta: DataFrame, key: String,
                             hash: org.apache.spark.sql.Column,
                             k: Int, nBuckets: Int): DataFrame =
    delta.select(col(key).cast("string").as("key"), hash.as("hv"))
      .filter(col("hv").isNotNull)
      .groupBy("key")
      .agg(org.apache.spark.sql.graft.KmvColumns.kmvState(col("hv"), k).as("kmv"))
      .withColumn("bucket",
        pmod(xxhash64(col("key")), lit(nBuckets.toLong)).cast("string"))
      .select("key", "bucket", "kmv")

  /** Exact KMV union of two state relations: concat → distinct → sort →
    * truncate, all on ≤2k-element arrays — no explode, no re-shuffle of raw
    * values.
    */
  def mergeDistinctStates(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.unionByName(b).groupBy("key", "bucket")
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("kmv"))))),
        1, k).as("kmv"))

  /** Fold one delta batch into the distinct-count view at `root` — same
    * touched-bucket pruning as [[applyBatch]].
    */
  def applyDistinctBatch(spark: SparkSession, root: String, delta: DataFrame,
                         key: String, hash: org.apache.spark.sql.Column,
                         k: Int = 64, nBuckets: Int = 64): Long = {
    // touched buckets ride the checkpoint pass, as in [[applyBatch]] (r22)
    val acc = spark.sparkContext.collectionAccumulator[String]("graft.iagg.dtouched")
    val shaped = aggregateDistinctDelta(delta, key, hash, k, nBuckets)
    val bIdx = shaped.schema.fieldNames.indexOf("bucket")
    val enc = org.apache.spark.sql.Encoders.row(shaped.schema)
    val da = shaped.mapPartitions { it =>
      it.map { r => acc.add(r.getString(bIdx)); r }
    }(enc).localCheckpoint()
    if (!ManifestTable.exists(spark, root))
      ManifestTable.commit(da, root, Some("bucket"))
    else {
      val touched = {
        import scala.jdk.CollectionConverters._
        acc.value.asScala.toSeq.distinct
      }
      val state = ManifestTable.read(spark, root, distinctStateSchema)
        .filter(col("bucket").isin(touched: _*))
      ManifestTable.commit(mergeDistinctStates(state, da, k), root, Some("bucket"))
    }
  }

  /** `(key, n_kept, kth, est)` from the maintained state — the q116 output
    * contract: exact count below k, floor((k-1)·2^60/kth) at k.
    */
  def distinctEstimate(state: DataFrame, k: Int): DataFrame =
    state.select(col("key"),
      size(col("kmv")).as("n_kept"),
      when(size(col("kmv")) >= k, element_at(col("kmv"), k)).as("kth"),
      when(size(col("kmv")) >= k,
        floor(lit((k - 1).toDouble) * lit(math.pow(2.0, 60))
          / element_at(col("kmv"), k).cast("double")).cast("long"))
        .otherwise(size(col("kmv")).cast("long")).as("est"))
}
