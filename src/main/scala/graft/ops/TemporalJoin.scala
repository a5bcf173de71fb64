package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for, composed from existing
  * ops per the preference order in the build brief: union-tag + window for
  * as-of, bin-bucketed equi-join for range — both single-shuffle shapes that
  * survive 100 TB, instead of the O(n*m) broadcast-nested-loop Spark would
  * pick for a raw inequality join.
  */
object TemporalJoin {

  /** As-of join: for each left row, the LATEST right row with the same key
    * and `rightTs <= leftTs` (inner semantics — left rows with no prior
    * right row are dropped).
    *
    * Plan shape: pack each side into a struct, tag, union, and run ONE
    * window partitioned by key ordered by (ts, side) — right sorts before
    * left on equal timestamps so a right row AT the left timestamp matches —
    * with `last(_, ignoreNulls)` carrying the most recent right struct
    * forward. One shuffle on the key, no theta-join.
    *
    * `right` should be unique per (key, rightTs) — pre-collapse with
    * [[Upsert.lastWins]] otherwise (the winner among equal right timestamps
    * is undefined in every engine's as-of).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rPayload = right.columns.filter(_ != key).toSeq
    val clash = rPayload.toSet.intersect(lCols.toSet)
    require(clash.isEmpty,
      s"asOf would emit duplicate column names ${clash.mkString(", ")} — " +
        "rename the right side's payload columns first")
    val leftPart = left.select(col(key), col(leftTs).as("__ts"),
      lit(1).as("__side"), struct(lCols.map(col): _*).as("__l"))
    val rightPart = right.select(col(key), col(rightTs).as("__ts"),
      lit(0).as("__side"), struct(rPayload.map(col): _*).as("__r"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftPart.unionByName(rightPart, allowMissingColumns = true)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__r").isNotNull)
      .select(lCols.map(c => col(s"__l.$c")) ++ rPayload.map(c => col(s"__r.$c")): _*)
  }

  /** Range join: left rows paired with right rows whose `[startCol, endCol)`
    * interval contains `leftTs`. Implemented as a bin-bucketed equi-join:
    * each right interval explodes into the time bins it covers, the left
    * side computes its bin, and the bin equi-join bounds the verify set —
    * the standard interval-join decomposition. `binSeconds` should be on the
    * order of the typical interval length (too small multiplies the right
    * side's explode fan-out, too large inflates the verify set).
    */
  def range(left: DataFrame, right: DataFrame, leftTs: String,
            startCol: String, endCol: String, binSeconds: Long): DataFrame = {
    val lBinned = left.withColumn("__bin",
      floor(unix_timestamp(col(leftTs)) / binSeconds))
    val rBinned = right
      .filter(col(startCol) <= col(endCol)) // inverted intervals match nothing
      .withColumn("__bin", explode(sequence(
        floor(unix_timestamp(col(startCol)) / binSeconds),
        floor(unix_timestamp(col(endCol)) / binSeconds))))
    lBinned.join(rBinned, Seq("__bin"))
      .filter(col(leftTs) >= col(startCol) && col(leftTs) < col(endCol))
      .drop("__bin")
  }

  /** Sessionization: assign each (key, ts) event a session id such that
    * events within `gapSeconds` of the previous event share a session —
    * gaps-and-islands via one window pass (lag → new-session flag →
    * running sum), one shuffle on the key. Session ids are 1-based and
    * ordered by time within each key.
    */
  def sessionize(df: DataFrame, key: String, tsCol: String,
                 gapSeconds: Long, tieCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev", lag(col(tsCol), 1).over(byKey))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev")) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }

  /** Time-series GAP FILL: hourly counts per key with missing hours emitted
    * as zero rows — the resample step every downstream time-series consumer
    * (alerting, charting, forecasting) needs, since "no row" and "zero
    * events" are different facts.
    *
    * Scale shape: the hour SPINE is `sequence(min, max, 1 hour)` exploded
    * from a single global-bounds row — O(hours), tiny, and the spine×keys
    * frame is broadcast against the aggregated (not raw) counts, so the only
    * full-data cost is the one keyed aggregation the un-filled query already
    * pays.
    *
    * 100× caveat: the dense spine×keys frame is |keys|·|hours| rows BY
    * CONSTRUCTION — right when consumers want every key on one common axis
    * (dashboards over bounded key sets), but at a year of hours × tens of
    * millions of keys the fill frame dwarfs the data it fills. When each
    * key only needs ITS OWN activity window resampled, use
    * [[hourlyGapFillActive]], which is output-bounded and crossJoin-free.
    * `maxFrame` makes that caveat a loud error instead of a silent blow-up:
    * the |keys|·|hours| frame size is checked with one cheap aggregation of
    * the already-materialized hourly relation (the quantileNormalize
    * bucket-guard pattern) before the crossJoin is built.
    */
  def hourlyGapFill(df: DataFrame, tsCol: String, keyCol: String,
                    maxFrame: Long = 50000000L): DataFrame = {
    // bounds and keys both derive from this O(hours x keys) frame below;
    // localCheckpoint (not persist) keeps the raw input to ONE scan + keyed
    // aggregation without parking an entry in the session cache registry —
    // checkpoint blocks are released when the plan goes out of scope
    val hourly = df
      .groupBy(date_trunc("hour", col(tsCol)).as("hour"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val b = hourly.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"),
      count_distinct(col(keyCol)).as("nk")).head
    if (!b.isNullAt(0)) {
      val hours = (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) /
        3600000L + 1L
      val frame = hours * b.getLong(2)
      require(frame <= maxFrame,
        s"hourlyGapFill would build a dense $hours-hour x ${b.getLong(2)}-key " +
          s"frame ($frame rows > $maxFrame): use hourlyGapFillActive (per-key " +
          "activity windows, output-bounded) or raise maxFrame if the dense " +
          "common-axis frame is intended")
    }
    val spine = hourly.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("hour"))
    val keys = hourly.select(col(keyCol)).distinct()
    spine.crossJoin(keys)
      .join(hourly, Seq("hour", keyCol), "left")
      .select(col("hour"), col(keyCol), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** ACTIVE-WINDOW gap fill — the 100 TB form of [[hourlyGapFill]]: each
    * key resamples only its own [first-seen, last-seen] hour span. The
    * per-key spine explodes from the keyed bounds aggregation — no
    * crossJoin, no global frame — so the output is Σ_key(active hours):
    * a key alive for a day costs 24 rows no matter how long the corpus
    * runs, where the dense variant bills every key the full corpus span.
    * Same one-scan cost profile: bounds and counts both derive from the
    * single keyed hourly aggregation.
    */
  def hourlyGapFillActive(df: DataFrame, tsCol: String, keyCol: String): DataFrame = {
    val hourly = df
      .groupBy(date_trunc("hour", col(tsCol)).as("hour"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      // localCheckpoint, not persist: no session-cache entry to leak across
      // repeated invocations in a long-lived session (ADVICE r11)
      .localCheckpoint()
    val spine = hourly.groupBy(col(keyCol))
      .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
      .select(col(keyCol), explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("hour"))
    spine.join(hourly, Seq(keyCol, "hour"), "left")
      .select(col("hour"), col(keyCol), coalesce(col("n"), lit(0L)).as("n"))
  }
}
