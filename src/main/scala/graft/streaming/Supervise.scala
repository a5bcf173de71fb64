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

  /** Pluggable OUT-OF-PROCESS alert transport — the reference's SNS publish
    * leg (reference: src/ingest_weather_data.py:21-31, src/monitor.sh:22-24)
    * as a seam: a deployment injects its topic client (SNS, PagerDuty,
    * webhook); offline the [[FileAlertSink]] stand-in makes delivery
    * observable and durable. `send` must not throw — the supervisor runs it
    * on the listener-bus thread, where an exception would silently kill
    * alerting itself.
    */
  trait AlertSink {
    def send(queryId: String, message: String): Unit
  }

  /** File-backed transport: one JSON line per alert appended to
    * `dir/alerts.jsonl` (driver-side file IO — alert volume is per-query-
    * failure, never per-row). Durable across JVM exit, tail-able by an
    * external watcher — the offline analogue of a topic publish.
    */
  class FileAlertSink(dir: String) extends AlertSink {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    private val path = java.nio.file.Paths.get(dir, "alerts.jsonl")
    override def send(queryId: String, message: String): Unit = synchronized {
      val esc = (s: String) => s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case '\r' => "\\r"; case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }
      val line = s"""{"query_id":"${esc(queryId)}","message":"${esc(message)}"}\n"""
      java.nio.file.Files.writeString(path, line,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
  }

  /** Install a supervisor whose alerts go to an [[AlertSink]] transport.
    * Delivery failures are swallowed after a stderr note: losing one alert
    * beats killing the listener bus (and with it all future alerts).
    */
  def installSink(spark: SparkSession, sink: AlertSink): Supervisor =
    install(spark, (id, msg) =>
      try sink.send(id, msg)
      catch { case e: Throwable =>
        System.err.println(s"[supervise] alert delivery failed for $id: ${e.getMessage}")
      })

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
