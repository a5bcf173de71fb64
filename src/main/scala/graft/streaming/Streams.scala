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
