package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.Upsert

/** ST6 in full: bounded retry over a SHRINKING failure set, then dead-letter
  * the residue — the reference retries failed fetches 3× with a 60 s backoff,
  * each pass re-attempting only what still fails, and banks the leftovers
  * (reference: src/ingest_weather_data.py:58-84). Round 2 had only the
  * dead-letter half; this is the re-drive half.
  *
  * Scale design: per-record success/failure is a CLASSIFICATION column, not an
  * exception — a thrown error fails the whole Spark job, so the reference's
  * per-item try/except becomes a validity predicate evaluated inside the one
  * scan the attempt already pays. The attempt loop is driver-side but bounded
  * (maxAttempts, default 3, mirroring the reference); each iteration's failure
  * set is persisted so lineage doesn't re-run prior attempts.
  */
object Retry {

  /** A CDC envelope is processable when its op is known and, for upsert ops,
    * the document parses with a non-null key. Exactly the conditions
    * [[Dispatch.applyBatch]] would raise_error on.
    */
  def envelopeValid(docSchema: StructType, rawKey: String): Column = {
    val doc = from_json(col("fullDocument"), docSchema)
    col("operationType").isNotNull &&
      col("operationType").isin(Dispatch.knownOps: _*) &&
      (col("operationType") === "delete" ||
        (doc.isNotNull && doc.getField(rawKey).isNotNull))
  }

  /** Drive `envelopes` into `target` with up to `maxAttempts` passes.
    *
    * Each attempt: classify with [[envelopeValid]], merge the valid subset via
    * [[Dispatch.applyBatch]] (cannot throw — pre-validated), and hand the
    * still-failing subset to `repair` before the next attempt (the reference's
    * analogue is simply waiting 60 s for the flaky API; offline, `repair` is
    * where an envelope-fixing transform plugs in — identity by default).
    * `backoffMs` sleeps between attempts like the reference's time.sleep(60).
    *
    * Returns (merged target, final failure set). Non-empty failures are banked
    * to `deadLetterPath` with the dense-indexed dead-letter sink.
    */
  def reprocess(target: DataFrame, envelopes: DataFrame, docSchema: StructType,
                promote: DataFrame => DataFrame, rawKey: String, mergeKey: String,
                tieCol: String, deadLetterPath: String, runTs: java.sql.Timestamp,
                repair: (DataFrame, Int) => DataFrame = (df, _) => df,
                maxAttempts: Int = 3,
                backoffMs: Long = 0L): (DataFrame, DataFrame) = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    val valid = envelopeValid(docSchema, rawKey)
    var tgt = target
    var failures = envelopes
    var attempt = 0
    var exhausted = false
    // prior attempt's pinned intermediates — provably dead once the next
    // attempt has materialized past them; unpersisting keeps the loop from
    // accumulating a cached target + envelope set per attempt
    var prevTried: Option[DataFrame] = None
    var prevTgt: Option[DataFrame] = None
    while (!exhausted) {
      attempt += 1
      val tried = (if (attempt == 1) failures else repair(failures, attempt))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val ok = tried.filter(valid)
      tgt = Dispatch.applyBatch(tgt, ok, docSchema, promote, rawKey, mergeKey, tieCol)
        // materialize: applyBatch's merge reads the envelopes; keeping the
        // lineage lazy across attempts would re-evaluate every prior attempt's
        // repair+merge per reference to tgt
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      tgt.count()
      prevTgt.foreach(_.unpersist())
      prevTried.foreach(_.unpersist())
      prevTgt = Some(tgt)
      failures = tried.filter(!valid)
      exhausted = attempt >= maxAttempts || failures.isEmpty
      // `failures` still reads `tried`, so the CURRENT attempt's cache must
      // outlive the loop when it's the last one
      prevTried = Some(tried)
      if (!exhausted && backoffMs > 0) Thread.sleep(backoffMs)
    }
    if (!failures.isEmpty)
      graft.sources.Sinks.deadLetter(failures, deadLetterPath, runTs)
    (tgt, failures)
  }
}
