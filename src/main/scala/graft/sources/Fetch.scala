package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Per-partition remote client: `open` runs once per partition ON THE
  * EXECUTOR before the first fetch, `close` when the partition's iterator is
  * exhausted (registered as a task-completion listener, so it also fires on
  * task failure). `fetch` classifies each key as Right(payload) or
  * Left(error) — an exception would fail the whole Spark job for one flaky
  * key, so transport errors must come back as values.
  *
  * Implementations must be Serializable (shipped to executors); hold any
  * non-serializable connection state in a field initialized by `open`, not
  * the constructor.
  */
trait FetchClient extends Serializable {
  def open(): Unit = ()
  def fetch(key: String): Either[String, String]
  def close(): Unit = ()
}

/** Executor-side keyed fetch (S1): the reference's ingest leg calls a remote
  * weather API once per place key, retries the failures 3x, and banks what
  * still fails (reference: src/ingest_weather_data.py:58-84). The Spark-first
  * shape: keys are a DataFrame, each PARTITION opens one client (connection
  * cost amortized over its keys, |partitions| concurrent connections — the
  * knob a 1000-executor deployment tunes via repartition), and per-key
  * success/failure is a DATA column feeding the same shrinking-failure-set
  * retry + dead-letter legs the CDC path uses (cdc/Retry, Sinks.deadLetter).
  *
  * Offline there is no network, so the client is injected — tests drive the
  * machinery with deterministic fakes; a deployment supplies an HTTP client.
  */
object Fetch {

  /** One fetch pass: (key, payload, error) per input key, exactly one of
    * payload/error null. No shuffle — the fetch rides the keys' existing
    * partitioning.
    */
  def fetchKeyed(keys: DataFrame, keyCol: String, client: FetchClient): DataFrame = {
    val enc = Encoders.tuple(Encoders.STRING,
      Encoders.STRING, Encoders.STRING)
    keys.select(col(keyCol).cast("string")).as(Encoders.STRING)
      .mapPartitions { it =>
        client.open()
        Option(TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => client.close()))
        it.map { k =>
          client.fetch(k) match {
            case Right(p) => (k, p, null: String)
            case Left(e)  => (k, null: String, e)
          }
        }
      }(enc)
      .toDF("key", "payload", "error")
  }

  /** Bounded retry over a SHRINKING failure set, then dead-letter the
    * residue — the fetch-side twin of cdc.Retry.reprocess. `clientFor`
    * builds the attempt's client (attempt numbers start at 1), so a
    * deployment can vary backoff/credentials per attempt and tests can
    * script per-attempt behavior deterministically.
    *
    * Returns (fetched rows as (key, payload), final failure set as
    * (key, error)). Non-empty failures are banked to `deadLetterPath`.
    */
  def fetchWithRetry(keys: DataFrame, keyCol: String,
                     clientFor: Int => FetchClient,
                     deadLetterPath: String, runTs: java.sql.Timestamp,
                     maxAttempts: Int = 3, backoffMs: Long = 0L): (DataFrame, DataFrame) = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    val spark = keys.sparkSession
    var fetched = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.StringType))))
    var pending = keys.select(col(keyCol).cast("string").as("key"))
    var failures = pending.withColumn("error", lit(null).cast("string")).limit(0)
    var attempt = 0
    var exhausted = false
    val attemptCkpts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    while (!exhausted) {
      attempt += 1
      // localCheckpoint (eager): each attempt's classification is pinned to
      // materialized partitions, so no later action on `fetched` can ever
      // recompute the lineage and RE-INVOKE the client — a re-fetch against
      // a flaky remote would be both wasteful and nondeterministic
      val res = fetchKeyed(pending, "key", clientFor(attempt)).localCheckpoint()
      attemptCkpts += res
      fetched = fetched.unionByName(
        res.filter(col("error").isNull).select("key", "payload"))
      failures = res.filter(col("error").isNotNull).select("key", "error")
      pending = failures.select("key")
      exhausted = attempt >= maxAttempts || failures.isEmpty
      if (!exhausted && backoffMs > 0) Thread.sleep(backoffMs)
    }
    if (attemptCkpts.size == 1 && failures.isEmpty) {
      // Single-attempt clean pass (ADVICE r07): the one attempt's checkpoint
      // is already self-contained — a consolidation checkpoint would
      // re-materialize the entire payload set for nothing. Failures is
      // rebuilt as a lineage-free empty frame so releasing the result can
      // never strand it on the shared attempt blocks.
      failures = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], failures.schema)
    } else {
      // Consolidate: `fetched` unions EVERY attempt's checkpoint, so nothing
      // could be released inside the loop. One final eager checkpoint of the
      // union (reads the attempt blocks, never the client — their lineage is
      // truncated) makes the returned frames self-contained, then the
      // per-attempt block sets are freed (VERDICT r06 #2): steady-state cost
      // is one result-sized block set, not one per attempt.
      fetched = fetched.localCheckpoint()
      failures = failures.localCheckpoint()
      attemptCkpts.foreach(org.apache.spark.sql.graft.Checkpoints.release)
      if (!failures.isEmpty)
        Sinks.deadLetter(failures, deadLetterPath, runTs)
    }
    (fetched, failures)
  }
}
