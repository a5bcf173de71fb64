package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Hashed n-gram importance weights — the DSIR selection signal (Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling"):
  * score each raw document by how much more likely its n-gram mass is under
  * a TARGET distribution (a trusted domain slice) than under the raw-corpus
  * distribution. Documents with high log-weights are resampled into the
  * training mixture.
  *
  * Relational shape (the 100 TB-relevant part): grams are hashed into a
  * FIXED bucket space (default 1024), so both distributions are <= nBuckets
  * rows regardless of corpus size — bucket counting is a map-side partial
  * aggregation, the per-bucket log-ratio table broadcasts, and per-doc
  * scoring is one broadcast join plus one doc-keyed sum. Two passes over the
  * exploded gram relation, off one persisted materialization; a production
  * pipeline computes the target distribution once on the reference corpus
  * and reuses it across raw shards.
  *
  * Cross-engine determinism: the gram->bucket hash is the portable md5
  * 56-bit-half (the minhash convention, llm/Dedup.scala:176); `ln` is
  * rounded to 6 places at the source (the q72 convention) so the per-bucket
  * log-ratio is an exact IEEE difference of identical doubles; per-doc sums
  * are decimal(18,6)-routed.
  */
object Importance {

  /** (idCol, n_grams, logw) per document: logw = sum over the doc's gram
    * occurrences of ln p_target(bucket) - ln p_raw(bucket), both add-one
    * smoothed over `nBuckets` buckets. `isTarget` is a boolean Column over
    * `docs`' columns selecting the target slice (target ⊆ raw, the DSIR
    * setup). Docs shorter than `shingleN` words contribute their whole text
    * as one gram, so every document is scored.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, nBuckets: Int = 1024,
                        shingleN: Int = 2): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    // tokens materialized in their own projection (the minhash lesson:
    // expressions inside array lambdas re-evaluate per element), gram md5
    // applied AFTER the explode where it is a flat codegen'd expression
    val grams = docs
      .select(col(idCol).as("id"), isTarget.as("is_t"),
        TextStats.tokens(Dedup.normalize(col(textCol))).as("w"))
      .select(col("id"), col("is_t"),
        explode(Dedup.shingleOccurrences(col("w"), shingleN)).as("g"))
      .select(col("id"), col("is_t"),
        (conv(substring(md5(col("g")), 1, 14), 16, 10).cast("long") % nBuckets).as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val raw = grams.groupBy("b").agg(count(lit(1)).as("cr"))
    val tgt = grams.filter(col("is_t")).groupBy("b").agg(count(lit(1)).as("ct"))
    val nr = grams.agg(count(lit(1)).as("n_raw"))
    val nt = grams.filter(col("is_t")).agg(count(lit(1)).as("n_tgt"))
    // raw covers every bucket any doc hits (target ⊆ raw), so a left join
    // with coalesce(ct, 0) gives the smoothed target count everywhere
    val lw = raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .select(col("b"),
        (round(log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
          (col("n_tgt") + nBuckets).cast("double")), 6) -
          round(log((col("cr") + 1).cast("double") /
            (col("n_raw") + nBuckets).cast("double")), 6)).as("lw"))
    // the gram cache stays live for the consumer (the minhashPairs
    // convention: unpersisting before the caller's action would just force
    // a full recompute; Bench clears the cache between queries)
    grams.join(broadcast(lw), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(col("lw").cast("decimal(18,6)")).cast("double").as("logw"))
      .select(col("id").as(idCol), col("n_grams"), col("logw"))
  }
}
