package graft.streaming

import java.util.concurrent.CopyOnWriteArrayList

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Supervision for long-running streams — the analogue of the reference's
  * `monitor.sh`, which restarts the CDC loop when it exits and sends an alert
  * on abnormal termination (reference: src/monitor.sh:15-24).
  *
  * Two pieces, composable:
  *   - [[Supervisor]]: a `StreamingQueryListener` that invokes an alert hook
  *     when a query terminates with an exception (the `sendalert` half);
  *   - [[superviseRun]]: a bounded restart driver that re-starts a failed
  *     query up to `maxRestarts` times (the `while true; do ...` half) —
  *     bounded because an unconditionally-restarting loop turns a
  *     deterministic failure into an infinite hot loop, the reference
  *     script's known weakness.
  */
object Supervise {

  /** Alert hook signature: (queryId, exceptionMessage). The id is
    * `QueryTerminatedEvent.id` — STABLE across checkpoint restarts of the
    * same logical query (unlike `runId`, which changes per run), so alert
    * consumers can correlate, dedup, and escalate repeated failures of one
    * query.
    */
  type Alert = (String, String) => Unit

  class Supervisor(alert: Alert) extends StreamingQueryListener {
    /** Terminations observed, for tests/ops: (queryId, Option(exception)). */
    val terminations = new CopyOnWriteArrayList[(String, Option[String])]()

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      val id = Option(e.id).map(_.toString).getOrElse("unknown")
      terminations.add((id, e.exception))
      e.exception.foreach(msg => alert(id, msg))
    }
  }

  /** Install a supervisor on the session; returns it so callers can remove it
    * (`spark.streams.removeListener`) and tests can inspect terminations.
    */
  def install(spark: SparkSession, alert: Alert): Supervisor = {
    val s = new Supervisor(alert)
    spark.streams.addListener(s)
    s
  }

  /** Run `start` to completion, restarting on failure up to `maxRestarts`
    * times. Streaming checkpoints make the restart safe: the replayed batch
    * re-merges idempotently. Returns the number of restarts consumed; throws
    * the last failure if the budget is exhausted.
    */
  def superviseRun(start: () => StreamingQuery, maxRestarts: Int = 3): Int = {
    var restarts = 0
    var done = false
    while (!done) {
      // start() INSIDE the try: a synchronous failure while (re)starting —
      // transient checkpoint-metadata or source-listing errors, exactly the
      // flaky-infrastructure class this driver absorbs — must consume the
      // restart budget, not escape the loop.
      try { start().awaitTermination(); done = true }
      catch { case e: Throwable =>
        if (restarts >= maxRestarts) throw e
        restarts += 1
      }
    }
    restarts
  }
}
