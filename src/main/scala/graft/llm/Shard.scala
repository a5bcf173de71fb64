package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-data export: shard assignment + a reproducible
  * within-shard order — the step between a curated corpus and the files a
  * training job reads. Everything is md5-derived so a re-run (or a different
  * engine) produces byte-identical shard membership and order: no rand(), no
  * partition-index dependence.
  */
object Shard {

  /** Assign every row a shard in [0, nShards) and a 1-based `seq` within its
    * shard, both pure functions of the id:
    *
    *   - shard: bits 33..64 of md5(id) mod nShards — deliberately a DIFFERENT
    *     md5 window than Sampling's threshold (bits 1..32), so sampling and
    *     sharding decisions are independent coin flips off one digest.
    *   - seq: rank of the FULL md5 hex within the shard (ties by id) — a
    *     deterministic global shuffle, which is exactly what a training run
    *     wants (hash order ≈ uniform random order, but replayable).
    *
    * Scale design: the only exchange is the hash partition on `shard`, and
    * the per-shard sort is bounded by shard SIZE — nShards is the knob (a
    * 100 TB corpus exports to ~100k shards of ~1 GB, not 8 giant ones; the
    * reducer-side sort then spills within one shard's worth of rows). For
    * ordinal assignment WITHOUT a meaningful order there is the cheaper
    * ops/Enumerate zipWithIndex path; this one pays the sort to pin the
    * hash-shuffled order.
    */
  def assignShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive (got $nShards)")
    val hx = md5(col(idCol).cast("string"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__hx"), col(idCol))
    df.withColumn("__hx", hx)
      .withColumn("shard",
        pmod(conv(substring(col("__hx"), 9, 8), 16, 10).cast("long"), lit(nShards.toLong)))
      .withColumn("seq", row_number().over(w).cast("long"))
      .drop("__hx")
  }

  /** Per-shard manifest: row count and payload-weight total (e.g. tokens) —
    * the balance audit a 100 TB export job logs before writing. Relative
    * spread shrinks as 1/sqrt(rows per shard); the law of large numbers IS
    * the balancing strategy (no greedy bin packing across executors).
    */
  def shardManifest(df: DataFrame, idCol: String, nShards: Int,
                    weightCol: String): DataFrame =
    assignShards(df, idCol, nShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        sum(col(weightCol).cast("long")).as("total_weight"))
}
