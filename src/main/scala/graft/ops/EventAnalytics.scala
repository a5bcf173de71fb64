package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over the event stream: ordered funnels and
  * weekly cohort retention. Classic OLAP shapes a lake-side engine is
  * expected to serve directly off the raw events table.
  *
  * Scale design: everything here is keyed by the user column — per-stage
  * aggregates and stage-to-stage joins all shuffle on `user`, so AQE can
  * coalesce/skew-split them and nothing ever sees a global window or sort.
  * The per-user state is one row per user (the earliest qualifying
  * timestamp per reached stage), never the user's event list.
  */
object EventAnalytics {

  /** Ordered funnel: for each user, the earliest `stages(0)` event, then the
    * earliest `stages(1)` STRICTLY AFTER it, and so on — the standard
    * "signup → click → purchase, in order" conversion measure (an unordered
    * per-type min would overcount users who purchased before signing up).
    *
    * Returns one row per stage: `(stage_idx, stage, n_users,
    * total_lag_us)` where `n_users` counts users reaching the stage in
    * order and `total_lag_us` sums (µs) the lag from each user's stage-0
    * time — exact integers, so the relation replays bit-identically.
    *
    * One aggregate per stage plus one user-keyed join per later stage; at
    * any corpus size the joined state side is |users reaching stage k-1|
    * rows. Timestamps ride as `unix_micros` longs so stage columns compare
    * and subtract as integers.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val us = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      unix_micros(col(tsCol)).as("t"))
    // State after stage k: (u, t0, tk) — one row per user still in the
    // funnel. Each state is localCheckpointed: it feeds both the next
    // stage's join AND its own output branch, and un-truncated lineage
    // would recompute the whole prefix chain once per branch.
    val first = us.filter(col("et") === stages.head)
      .groupBy("u").agg(min(col("t")).as("t0"))
      .withColumn("tk", col("t0"))
      .localCheckpoint()
    val reached = stages.tail.foldLeft(Seq(first)) { (acc, stage) =>
      val prev = acc.last.select(col("u"), col("t0"), col("tk"))
      val next = us.filter(col("et") === stage)
        .join(prev, "u")
        .filter(col("t") > col("tk"))
        .groupBy("u", "t0").agg(min(col("t")).as("tk"))
        .localCheckpoint()
      acc :+ next
    }
    reached.zipWithIndex.map { case (st, i) =>
      st.agg(count(lit(1)).as("n_users"),
          coalesce(sum(col("tk") - col("t0")), lit(0L)).as("total_lag_us"))
        .select(lit(i).as("stage_idx"), lit(stages(i)).as("stage"),
          col("n_users"), col("total_lag_us"))
    }.reduce(_ unionByName _)
  }

  /** Behavioral path mining: the frequency of every length-`n` run of
    * CONSECUTIVE event types within a user's timeline (the Markov /
    * clickstream-path view; n = 2 is the transition matrix). Ordering is
    * pinned by `(ts, tie)` so runs are deterministic under equal
    * timestamps.
    *
    * Returns `(p0 … p{n-1}, n_paths)`. The window partitions by user —
    * each user's timeline sorts independently across the cluster, no
    * global sort — and the output cardinality is |event-type vocab|^n,
    * bounded regardless of corpus size.
    */
  def pathNgrams(events: DataFrame, userCol: String, tsCol: String,
                 tieCol: String, typeCol: String, n: Int): DataFrame = {
    require(n >= 2, "a path needs at least 2 steps")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val steps = (0 until n).map {
      case 0 => col(typeCol).as("p0")
      case i => lead(col(typeCol), i).over(w).as(s"p$i")
    }
    events.select(steps: _*)
      .filter((1 until n).map(i => col(s"p$i").isNotNull).reduce(_ && _))
      .groupBy((0 until n).map(i => col(s"p$i")): _*)
      .agg(count(lit(1)).as("n_paths"))
  }

  /** Weekly cohort retention: cohort = the ISO-Monday week of a user's
    * FIRST event, and for each later week offset the number of that
    * cohort's users active in it. Week index = `floor(days-since-Monday-
    * 1970-01-05 / 7)` — pure integer date arithmetic, no engine-specific
    * `date_trunc('week')` convention in sight.
    *
    * Two user-keyed aggregates (first-week, active-weeks) joined on the
    * user, then a coarse (cohort, offset) roll-up: the wide data collapses
    * to one row per (user, week) before anything joins.
    */
  def weeklyRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    // `div` (integer division) == DuckDB `//` on the non-negative day
    // counts here; a double divide + cast would hit the trunc-vs-round
    // cast divergence (q84 lesson).
    val uw = events.select(col(userCol).as("u"),
        datediff(col(tsCol).cast("date"), to_date(lit("1970-01-05"))).as("d"))
      .select(col("u"), expr("CAST(d div 7 AS BIGINT)").as("wk"))
      .distinct()
    val cohort = uw.groupBy("u").agg(min(col("wk")).as("cohort_wk"))
    uw.join(cohort, "u")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Half-life-decayed activity score per key: each event contributes
    * `2^-(Δ div halfLife)` where Δ is its age at the key's LAST event — the
    * recency-weighted engagement feature (exponential-decay counters,
    * half-life form) that a plain event count flattens.
    *
    * Cross-engine determinism by construction: the exponent is an INTEGER
    * bucket count (µs integer `div`, no float time math), `2^-k` is exact
    * in binary so both engines' `pow` agree bit-for-bit, each term is then
    * round6-quantized to an exact 6-decimal value, and the sum routes
    * through decimal(18,6) — fully order-independent, no transcendental in
    * sight (a τ-style `exp(-Δ/τ)` weight would hinge on two libms' last
    * ulp). Terms older than ~21 half-lives quantize to 0, which IS the
    * decay semantics. Two keyed hash aggregates + one keyed join; no
    * windows.
    */
  def halfLifeScore(events: DataFrame, userCol: String, tsCol: String,
                    halfLifeUs: Long): DataFrame = {
    require(halfLifeUs > 0, s"halfLifeUs must be positive, got $halfLifeUs")
    val e = events.filter(col(userCol).isNotNull)
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("tu"))
    val last = e.groupBy("u").agg(max(col("tu")).as("t1"))
    val term = graft.llm.Sampling.round6(
      pow(lit(0.5), expr(s"CAST((t1 - tu) div ${halfLifeUs}L AS DOUBLE)")))
    e.join(last, "u")
      .groupBy("u")
      .agg(count(lit(1)).as("n_events"),
        sum(term.cast("decimal(18,6)")).cast("double").as("decayed"))
      .select(col("u").as(userCol), col("n_events"), col("decayed"))
  }
}
