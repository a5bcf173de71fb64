package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming forms of the engine's event-time semantics
  * (SURVEY.md §2.8): the reference's "one row per place per hour, replays
  * deduped" contract restated with real streaming machinery — watermarks,
  * tumbling windows, and keyed state.
  *
  * Scale notes: all state here is keyed and watermark-bounded — the hourly
  * aggregation state is |event_type| x open-windows, dedup state expires with
  * the watermark, and `mapGroupsWithState` state is one small struct per key.
  * Nothing accumulates unboundedly on a 1000-executor cluster.
  */
object Streams {

  /** Event row shape of the harness `events` table. */
  case class EventRow(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                      event_type: String, value: Double)

  /** Per-user running aggregate maintained by [[runningUserStats]]. */
  case class UserStats(user_id: Long, n_events: Long, sum_value: Double,
                       last_ts: java.sql.Timestamp)

  /** Event-time hourly tumbling counts per event type, late data bounded by
    * the watermark — the streaming twin of the batch `q37_stream_hourly`
    * (the reference's "exactly this hour" gate, §2.8, made honest).
    */
  def hourlyTypeCounts(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Event-time SESSION windows (dynamic-length, gap-closed) per user —
    * Spark's native `session_window` generator: a session closes when no
    * event arrives within `gap`; state is bounded by the watermark. The
    * streaming twin of the batch gaps-and-islands `q47_sessionize`.
    */
  def sessionAgg(events: DataFrame, gap: String = "1 hour",
                 watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Stream-stream interval join (the canonical ad-attribution shape):
    * each click pairs with the impression of the same key that preceded it
    * by at most `attributionWindow`. BOTH sides are watermarked and the
    * join condition bounds event-time distance, so Spark derives a state
    * eviction horizon for each side — without the interval bound the state
    * store would hold every impression forever (the unbounded-state trap of
    * naive stream joins). Inner join: unattributed clicks drop.
    *
    * `impressions` carries (`impKey`, `imp_ts`, …), `clicks` (`clickKey`,
    * `click_ts`, …) — column NAMES must differ across the two sides
    * (stream-stream joins can't disambiguate self-resolved aliases).
    */
  def intervalJoin(impressions: DataFrame, clicks: DataFrame,
                   impKey: String, clickKey: String,
                   attributionWindow: String = "1 hour",
                   watermarkDelay: String = "2 hours"): DataFrame =
    impressions.withWatermark("imp_ts", watermarkDelay)
      .join(clicks.withWatermark("click_ts", watermarkDelay),
        expr(s"""$impKey = $clickKey AND click_ts >= imp_ts
          AND click_ts <= imp_ts + INTERVAL $attributionWindow"""))

  /** ST3 as streaming state: replayed event ids are dropped for as long as a
    * replay can still arrive (the watermark horizon), so state can't grow
    * without bound the way a bare dropDuplicates would.
    */
  def dedupById(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom keyed state via mapGroupsWithState: a per-user running
    * (count, sum, last-seen) — the shape of per-entity enrichment state the
    * reference keeps implicitly in its warehouse (§2.8 ST4's "current row").
    * Emits the updated stats for every user touched by each micro-batch.
    */
  def runningUserStats(events: Dataset[EventRow]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0.0, new java.sql.Timestamp(0)))
          val next = rows.foldLeft(prev) { (acc, e) =>
            UserStats(uid, acc.n_events + 1, acc.sum_value + e.value,
              if (e.ts.after(acc.last_ts)) e.ts else acc.last_ts)
          }
          state.update(next)
          next
      }
  }

  /** Session summaries via flatMapGroupsWithState with an event-count flush:
    * per user, accumulate (n, sum); once `flushEvery` events arrive, emit a
    * summary row and reset — the emit-zero-or-more shape (and explicit state
    * reset) that mapGroupsWithState can't express. Timeout handling follows
    * the same pattern with GroupStateTimeout in production; the flush
    * trigger keeps the test deterministic.
    */
  def sessionSummaries(events: Dataset[EventRow], flushEvery: Int): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, UserStats](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserStats]) =>
          var cur = state.getOption.getOrElse(UserStats(uid, 0L, 0.0, new java.sql.Timestamp(0)))
          val out = scala.collection.mutable.ArrayBuffer.empty[UserStats]
          rows.foreach { e =>
            cur = UserStats(uid, cur.n_events + 1, cur.sum_value + e.value,
              if (e.ts.after(cur.last_ts)) e.ts else cur.last_ts)
            if (cur.n_events >= flushEvery) {
              out += cur
              cur = UserStats(uid, 0L, 0.0, new java.sql.Timestamp(0))
            }
          }
          state.update(cur)
          out.iterator
      }
  }

  /** A candidate near-duplicate hit from [[nearDupGate]]: `doc_id` collided
    * with earlier doc `dup_of` on LSH band `band`.
    */
  case class BandHit(doc_id: Long, dup_of: Long, band: String)

  /** STREAMING near-duplicate gate: per micro-batch, each document's MinHash
    * band keys (byte-identical to the batch pipeline's — Dedup.perRowBands)
    * are checked against keyed state holding the first doc id seen per
    * bucket; collisions emit (doc_id, dup_of, band) CANDIDATE hits. Same
    * contract as batch LSH: candidates over-approximate (a doc may hit on
    * several bands, and band collisions need an exact-Jaccard verify
    * downstream — the production shape is this gate feeding a verify
    * service / batch verify join).
    *
    * Determinism: within a micro-batch a bucket's rows are folded in doc-id
    * order, so the bucket owner is the min id of the first batch that
    * touches it, independent of task scheduling.
    *
    * Scale: state is one long per OBSERVED band bucket — bounded by corpus
    * band cardinality, not stream length; hot boilerplate buckets cost one
    * state row regardless of how many docs hit them. The PRODUCTION
    * posture bounds staleness with `stateTtlMs` (ProcessingTimeTimeout):
    * a bucket whose owner goes unseen for the TTL is EVICTED, and a band
    * seen again afterwards RE-SEEDS under the new min id — a bounded
    * recall loss (hits against evicted owners are missed), never a wrong
    * hit and never a crash; run periodic batch dedup to recover the tail.
    * Tests that need exact batch parity pass None (NoTimeout).
    */
  def nearDupGate(docs: DataFrame, textCol: String, idCol: String,
                  shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                  stateTtlMs: Option[Long] = None): Dataset[BandHit] = {
    import docs.sparkSession.implicits._
    val banded = graft.llm.Dedup
      .perRowBands(docs, textCol, idCol, shingleN, k, bands)
      .select(col("band"), col("id").cast("long").as("doc_id"))
      .as[(String, Long)]
    val timeoutConf =
      if (stateTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded.groupByKey(_._1)
      .flatMapGroupsWithState[Long, BandHit](
        OutputMode.Append(), timeoutConf) {
        (band: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // TTL eviction: drop the bucket owner; the next arrival on
            // this band re-seeds a fresh bucket (see scaladoc contract)
            state.remove()
            Iterator.empty
          } else {
            val ids = rows.map(_._2).toArray.sorted
            val out = scala.collection.mutable.ArrayBuffer.empty[BandHit]
            var owner = state.getOption
            ids.foreach { id =>
              owner match {
                case None           => owner = Some(id)
                case Some(f) if f != id => out += BandHit(id, f, band)
                case _              => ()
              }
            }
            owner.foreach(state.update)
            // refresh the lease on every touch — TTL measures IDLE time
            stateTtlMs.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** Running KMV distinct-count gauge from [[kmvDistinctGauge]]. */
  case class KmvGauge(key: String, n_kept: Int, est: Long)

  /** STREAMING distinct-count gauge: per key, a running KMV sketch
    * (org.apache.spark.sql.graft.KmvSketch's exact offer/estimate logic)
    * folded across micro-batches in keyed state — the live "distinct users
    * per event type" / "distinct docs per source" ops dashboard number.
    *
    * The sketch is a pure function of the input multiset (order-independent
    * k-smallest-distinct), so after the last batch the gauge equals the
    * BATCH `kmv_sketch` aggregate over the whole history bit-for-bit —
    * StreamingSpec pins that parity. State per key is <= k longs, bounded
    * regardless of stream length or distinct cardinality; `hashCol` must be
    * the same 60-bit portable hash the batch side uses.
    */
  def kmvDistinctGauge(rows: DataFrame, keyCol: String, hashCol: String,
                       k: Int): Dataset[KmvGauge] = {
    import rows.sparkSession.implicits._
    // null hashes are skipped like the batch aggregate's update (a null in
    // the primitive Long encoder would otherwise kill the stream)
    val kv = rows.select(col(keyCol).cast("string"), col(hashCol).cast("long"))
      .filter(col(hashCol).isNotNull)
      .as[(String, Long)]
    kv.groupByKey(_._1)
      .mapGroupsWithState[Array[Long], KmvGauge](GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, Long)], state: GroupState[Array[Long]]) =>
          val buf = scala.collection.mutable.TreeSet.empty[Long] ++
            state.getOption.getOrElse(Array.empty[Long])
          it.foreach { case (_, h) =>
            org.apache.spark.sql.graft.KmvSketch.offer(buf, h, k) }
          state.update(buf.toArray)
          KmvGauge(key, buf.size,
            org.apache.spark.sql.graft.KmvSketch.estimate(buf, k))
      }
  }

  /** STREAMING ANN index maintenance — the live face of the q124 batch leg:
    * every micro-batch of new vectors is encoded against the FROZEN
    * coarse+PQ quantizers ([[graft.llm.ProductQuant.encodeBatch]]) and its
    * (vecId, sub, code, cell) rows appended to the resident index. The
    * model never moves inside the stream (retrain is an offline decision —
    * FAISS posture), so each batch costs |batch|·(m+1) slim appended rows
    * and never touches existing index data; the append is EXACT — after any
    * number of batches the index is row-identical to a wholesale re-encode
    * of the history under the same codebooks (StreamingSpec pins it).
    * `Trigger.AvailableNow` mirrors the CDC flagship's cron-shaped runs.
    *
    * IDEMPOTENT under epoch replay: foreachBatch offers at-least-once
    * delivery (a crash between the sink commit and the offset commit
    * re-runs the epoch), so a blind append would duplicate the batch's
    * rows. Each batch lands in its own `batch_id=<epoch>` partition via
    * DYNAMIC partition overwrite — a replayed epoch overwrites exactly its
    * own partition and nothing else. Readers see the extra `batch_id`
    * column; [[readAnnIndex]] drops it.
    */
  def annIndexAppend(vectors: DataFrame, coarse: DataFrame, codebook: DataFrame,
                     m: Int, dims: Int, indexPath: String, checkpoint: String,
                     vecId: String = "vec_id"): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendIndexBatch(batch, coarse, codebook, m, dims, indexPath, batchId, vecId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** One epoch's idempotent index write (the [[annIndexAppend]] sink body,
    * exposed so the replay contract is directly testable): encode against
    * the frozen model, overwrite ONLY this epoch's partition.
    */
  def appendIndexBatch(batch: DataFrame, coarse: DataFrame, codebook: DataFrame,
                       m: Int, dims: Int, indexPath: String, batchId: Long,
                       vecId: String = "vec_id"): Unit =
    graft.llm.ProductQuant.encodeBatch(batch, coarse, codebook, m, dims, vecId)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(indexPath)

  /** The resident index as the (vecId, sub, code, cell) relation the batch
    * pipelines produce — `batch_id` is write-side plumbing, dropped here.
    */
  def readAnnIndex(spark: org.apache.spark.sql.SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(indexPath).drop("batch_id")

  /** Convenience: run a streaming DataFrame to completion into an in-memory
    * table (tests / AvailableNow batch-over-stream runs).
    */
  def runToMemory(df: DataFrame, name: String, outputMode: OutputMode): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
  }
}
