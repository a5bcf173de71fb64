package graft

import org.apache.spark.sql.functions._

import graft.ops.{Flatten, FuzzyJoin, Integrity, Upsert}

/** Operator semantics on tiny literal fixtures — SURVEY.md §5.2. */
class OpsSpec extends SparkSuite {

  private def keys(df: org.apache.spark.sql.DataFrame, c: String): Set[Long] = {
    import spark.implicits._
    df.select(col(c).cast("long")).as[Long].collect().toSet
  }

  test("J1 newRowsOnly keeps only keys absent from the target") {
    import spark.implicits._
    val incoming = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val target = Seq((2L, "old")).toDF("id", "v")
    assert(keys(Integrity.newRowsOnly(incoming, target, "id"), "id") == Set(1L, 3L))
  }

  test("J2 fkValid / fkViolations split facts by dimension membership") {
    import spark.implicits._
    val facts = Seq((1L, 10L), (2L, 20L), (3L, 99L)).toDF("id", "fk")
    val dim = Seq((10L, "x"), (20L, "y")).toDF("k", "name")
    assert(keys(Integrity.fkValid(facts, dim, "fk", "k"), "id") == Set(1L, 2L))
    assert(keys(Integrity.fkViolations(facts, dim, "fk", "k"), "id") == Set(3L))
    // valid ∪ violations == facts, always
    assert(Integrity.fkValid(facts, dim, "fk", "k").count() +
      Integrity.fkViolations(facts, dim, "fk", "k").count() == facts.count())
  }

  test("broadcastDim=true forces a broadcast plan for bounded dimensions") {
    import spark.implicits._
    val facts = (1L to 100L).map(i => (i, i % 5)).toDF("id", "fk")
    val dim = Seq((0L, "a"), (1L, "b")).toDF("k", "name")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // even with auto-broadcast off, the explicit hint wins
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Integrity.fkValid(facts, dim, "fk", "k", broadcastDim = true)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
      val planDefault = Integrity.fkValid(facts, dim, "fk", "k")
        .queryExecution.executedPlan.toString
      assert(!planDefault.contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("A2 dupAudit reports only keys with count > 1") {
    import spark.implicits._
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val got = Integrity.dupAudit(df, "k").as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 2L, 3L -> 3L))
  }

  test("J3 batchDedup: first-wins within batch by order column, then anti-join") {
    import spark.implicits._
    val batch = Seq((1L, 10L, "first"), (1L, 20L, "second"), (2L, 5L, "only"),
      (3L, 1L, "existing")).toDF("k", "ord", "v")
    val existing = Seq(3L).toDF("k")
    val got = Integrity.batchDedup(batch, existing, "k", "ord")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 10L, "first"), (2L, 5L, "only")))
  }

  test("ST4 merge: updates win, multi-version batches collapse last-wins") {
    import spark.implicits._
    val target = Seq((1L, 1L, "t1"), (2L, 1L, "t2")).toDF("k", "ver", "v")
    val updates = Seq((2L, 2L, "u2a"), (2L, 3L, "u2b"), (9L, 1L, "u9")).toDF("k", "ver", "v")
    val got = Upsert.merge(target, updates, "k", "ver", "v")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 1L, "t1"), (2L, 3L, "u2b"), (9L, 1L, "u9")))
    // no duplicate keys survive (the r01 advice bug)
    val merged = Upsert.merge(target, updates, "k", "ver", "v")
    assert(merged.groupBy("k").count().filter(col("count") > 1).isEmpty)
  }

  test("ST4 mergePartitionPruned only returns touched partitions") {
    import spark.implicits._
    // partition column p; partition 100 untouched -> absent from the delta
    val target = Seq((1L, 100L, "a"), (2L, 200L, "b"), (3L, 200L, "c")).toDF("k", "p", "v")
    val updates = Seq((3L, 200L, "c2"), (4L, 200L, "d")).toDF("k", "p", "v")
    val got = Upsert.mergePartitionPruned(target, updates, "k", "p")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((2L, 200L, "b"), (3L, 200L, "c2"), (4L, 200L, "d")))
  }

  test("lastWins is idempotent and deterministic under ties") {
    import spark.implicits._
    val df = Seq((1L, 5L, 1L), (1L, 5L, 2L), (1L, 4L, 9L)).toDF("k", "ver", "tie")
    val once = Upsert.lastWins(df, "k", "ver", "tie")
    assert(once.as[(Long, Long, Long)].collect().toSeq == Seq((1L, 5L, 2L)))
    val twice = Upsert.lastWins(once, "k", "ver", "tie")
    assert(twice.as[(Long, Long, Long)].collect().toSeq == Seq((1L, 5L, 2L)))
  }

  test("J4 top1 fuzzy join picks the argmax with pinned ties") {
    import spark.implicits._
    val left = Seq((1L, "cold widget"), (2L, "warm gear")).toDF("id", "name")
    val right = Seq("cold widgets", "warm gears", "cold widget x").toDF("cand")
    val got = FuzzyJoin.top1(left, right, "id",
        graft.functions.Fuzzy.ratioApprox(lower(col("name")), lower(col("cand"))),
        Seq(col("cand")))
      .select("id", "cand").as[(Long, String)].collect().toMap
    assert(got(1L) == "cold widgets") // 1-char edit beats 2-char suffix
    assert(got(2L) == "warm gears")
  }

  test("P1-P8 promoteWeather flattens, extracts, casts onto the DDL schema") {
    import spark.implicits._
    val raw = spark.sql("""SELECT
      '64f001' AS _id, 'p1' AS place_id,
      named_struct('name', 'Hanoi', 'lat', 21.0, 'lon', 105.8) AS location,
      named_struct(
        'last_updated', '2024-03-01 07:30', 'last_updated_epoch', 1709276400L,
        'temp_c', 25.5D, 'temp_f', 77.9D, 'is_day', 1L,
        'condition', named_struct('text', 'Sunny', 'icon', 'i', 'code', 1000L),
        'wind_mph', 5.0D, 'wind_kph', 8.0D, 'wind_degree', 90L, 'wind_dir', 'E',
        'pressure_mb', 1010.0D, 'pressure_in', 29.8D, 'precip_mm', 0.0D,
        'precip_in', 0.0D, 'humidity', 60L, 'cloud', 10L, 'feelslike_c', 26.0D,
        'feelslike_f', 78.8D, 'vis_km', 10.0D, 'vis_miles', 6.0D, 'uv', 7.0D,
        'gust_mph', 7.0D, 'gust_kph', 11.3D) AS current""")
    val flat = Flatten.promoteWeather(raw)
    // literal fixtures infer non-nullable; compare names+types, not nullability
    assert(flat.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Schemas.weatherFlat.fields.map(f => (f.name, f.dataType)).toSeq)
    val row = flat.head()
    assert(row.getAs[String]("id") == "64f001")
    assert(row.getAs[String]("condition") == "Sunny")
    assert(row.getAs[Boolean]("is_day"))
    assert(row.getAs[java.sql.Timestamp]("last_updated").toString == "2024-03-01 07:30:00.0")
    assert(row.getAs[Double]("temp_c") == 25.5)
  }

  test("P7 stripSuffixCast drops the hemisphere char like float(lat[:-1])") {
    import spark.implicits._
    val got = Seq("21.03N", "105.85E").toDF("lat")
      .select(Flatten.stripSuffixCast(col("lat"))).as[Double].collect()
    assert(got.toSeq == Seq(21.03, 105.85))
  }

  test("enumerate assigns dense 0-based indexes in sort order, no global window") {
    import spark.implicits._
    val df = Seq((30L, "c"), (10L, "a"), (20L, "b")).toDF("k", "v").repartition(3)
    val got = graft.ops.Enumerate.withIndex(df, Seq(col("k")))
      .select("k", "idx").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 0L), (20L, 1L), (30L, 2L)))
  }

  test("salted join equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // hot key 1 carries 90% of the facts
    val facts = ((1 to 90).map(i => (1L, i.toLong)) ++ Seq((2L, 500L), (3L, 600L)))
      .toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "warm"), (9L, "unmatched")).toDF("k", "name")
    val plain = facts.join(dim, Seq("k")).select("k", "v", "name")
      .as[(Long, Long, String)].collect().toSet
    val salted = graft.ops.Skew.saltedJoin(facts, dim, "k", 8)
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 91)
  }

  test("two-phase salted aggregation equals the direct aggregation") {
    import spark.implicits._
    val df = ((1 to 1000).map(i => (1L, i.toLong)) ++ Seq((2L, 7L))).toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
      max(col("v")).as("mx")).as[(Long, Long, Long, Long)].collect().toSet
    val salted = graft.ops.Skew.twoPhaseAgg(df, "k", 16, Map(
      "n" -> (count(lit(1)), sum(col("n"))),
      "s" -> (sum(col("v")), sum(col("s"))),
      "mx" -> (max(col("v")), max(col("mx")))))
      .select("k", "n", "s", "mx").as[(Long, Long, Long, Long)].collect().toSet
    assert(salted == direct)
  }

  test("asOf picks the latest right row at-or-before each left timestamp") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0)).toDF("k", "qts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "early"),   // after 10:00 quote
      (1L, ts("2024-01-01 11:00:00"), "attime"),  // exactly at 11:00 quote
      (2L, ts("2024-01-01 10:00:00"), "nomatch"), // before any quote -> drop
      (3L, ts("2024-01-01 12:00:00"), "nokey")).  // key absent -> drop
      toDF("k", "tts", "tag")
    val got = graft.ops.TemporalJoin.asOf(trades, quotes, "k", "tts", "qts")
      .select("tag", "px").as[(String, Double)].collect().toMap
    assert(got == Map("early" -> 100.0, "attime" -> 110.0))
  }

  test("range join respects [start, end) boundaries through the bin bucketing") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val points = Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:59:59")),
      (3L, ts("2024-01-01 12:00:00")), (4L, ts("2024-01-02 09:00:00")))
      .toDF("id", "pts")
    val ivals = Seq((10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("iv", "st", "en")
    val got = graft.ops.TemporalJoin.range(points, ivals, "pts", "st", "en", 3600L)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // start inclusive, end exclusive, far point excluded
  }

  test("sessionize splits on gaps strictly greater than the threshold") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 10:30:00")),  // within 1h -> session 1
      (3L, 7L, ts("2024-01-01 11:30:00")),  // exactly 1h  -> still session 1
      (4L, 7L, ts("2024-01-01 13:00:01")),  // > 1h gap    -> session 2
      (5L, 8L, ts("2024-01-01 10:00:00"))). // other key   -> its own session 1
      toDF("event_id", "user_id", "ts")
    val got = graft.ops.TemporalJoin.sessionize(ev, "user_id", "ts", 3600L, "event_id")
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("active gap fill resamples each key's own window only") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (7L, ts("2024-01-01 10:10:00")),
      (7L, ts("2024-01-01 13:20:00")),   // key 7 active 10:00-13:00 -> 4 rows
      (8L, ts("2024-01-01 23:05:00"))).  // key 8 active one hour -> 1 row
      toDF("user_id", "ts")
    val got = graft.ops.TemporalJoin.hourlyGapFillActive(ev, "ts", "user_id")
      .select(col("user_id"), col("hour"), col("n"))
      .as[(Long, java.sql.Timestamp, Long)].collect().sortBy(r => (r._1, r._2.getTime))
    // key 7: its own 4-hour span with 11:00/12:00 zero-filled; key 8 gets
    // NO rows for 10:00-22:00 (the dense variant would bill it all 14)
    assert(got.map(r => (r._1, r._2.toString, r._3)).toSeq == Seq(
      (7L, "2024-01-01 10:00:00.0", 1L),
      (7L, "2024-01-01 11:00:00.0", 0L),
      (7L, "2024-01-01 12:00:00.0", 0L),
      (7L, "2024-01-01 13:00:00.0", 1L),
      (8L, "2024-01-01 23:00:00.0", 1L)))
  }

  test("approx sketches stay within tolerance of exact answers") {
    import spark.implicits._
    // HLL++ and quantile sketches are the 100 TB answer to distinct counts
    // and percentiles: mergeable partial sketches, one keyed shuffle of
    // sketch bytes instead of a global sort / distinct expansion. They're
    // engine-specific (not DuckDB-oracle-able); the contract asserted here
    // is the error bound vs the exact forms.
    val df = (1L to 50000L).map(i => (i % 7919, (i % 1000).toDouble))
      .toDF("k", "v")
    val exact = df.select(countDistinct(col("k"))).head().getLong(0)
    val approx = df.select(approx_count_distinct(col("k"), 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"HLL said $approx, exact $exact")
    val Array(median) = df.stat.approxQuantile("v", Array(0.5), 0.01)
    assert(math.abs(median - 499.5) < 25, s"approx median $median")
  }

  test("P13/P14 hour truncation and GMT+7 render are explicit shifts") {
    import spark.implicits._
    val df = Seq("2024-03-01 23:45:10").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
    val hour = df.select(Flatten.truncHourShifted(col("ts"), 7).cast("string"))
      .as[String].head()
    assert(hour == "2024-03-02 06:00:00") // +7h crosses midnight, then trunc
    val rendered = df.select(Flatten.renderShifted(col("ts"), 7)).as[String].head()
    assert(rendered == "2024-03-02 06:45:10")
    val fname = df.select(Flatten.fileSafe(Flatten.renderShifted(col("ts"), 7)))
      .as[String].head()
    assert(fname == "20240302064510")
  }

  test("pageRank: symmetric cycle stays uniform at any damping") {
    import spark.implicits._
    // 3-cycle: the uniform vector is the exact fixed point, so every round
    // must reproduce 1e12 div 3 units per node regardless of damping
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = graft.ops.LinkGraph.pageRank(e, iters = 4, dampingPct = 85)
      .select("node", "rank")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-8, s"rank $v"))
  }

  test("pageRank: dangling mass is redistributed, total rank conserved") {
    import spark.implicits._
    // a -> b, b dangling. One round from the uniform start (units of 1e-12):
    //   contribs(b) = 0.5; dangling mass = 0.5 redistributed over n=2
    //   rank(a) = 0.15/2 + 0.85*(0   + 0.25) = 0.2875 — exact in units
    //   rank(b) = 0.15/2 + 0.85*(0.5 + 0.25) = 0.7125
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val r = graft.ops.LinkGraph.pageRank(e, iters = 1)
      .select("node", "rank_units")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 287500000000L, s"a=${r(1L)}")
    assert(r(2L) == 712500000000L, s"b=${r(2L)}")
    // conservation holds over more rounds too (teleport + dangling refill;
    // floor drift is bounded by (|V|+|E|)·1e-12 per round)
    val r5 = graft.ops.LinkGraph.pageRank(e, iters = 5)
      .agg(sum(col("rank"))).head().getDouble(0)
    assert(math.abs(r5 - 1.0) < 1e-7, s"total $r5")
  }

  test("pageRank: in-link-rich node outranks peers") {
    import spark.implicits._
    // star into node 9 plus a back-edge so 9 isn't dangling. The graph is
    // near-bipartite (mass sloshes 9 <-> 1 with period 2), so the 9-vs-1
    // ordering is iteration-parity-dependent — assert only the
    // parity-independent facts: both hubs dominate the leaves, and the
    // leaves (identical in-link structure) tie exactly.
    val e = (1L to 8L).map(i => (i, 9L)).toDF("src", "dst")
      .union(Seq((9L, 1L)).toDF("src", "dst"))
    val r = graft.ops.LinkGraph.pageRank(e, iters = 10)
      .select("node", "rank")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(9L) > 2 * r(2L) && r(1L) > 2 * r(2L), s"$r")
    (2L to 8L).foreach(i => assert(r(i) == r(2L))) // identical in-link
    // structure -> identical UNITS, exactly (integer arithmetic)
  }

  test("IncrementalAgg: maintained state == from-scratch; only touched buckets rewrite") {
    import spark.implicits._
    import graft.ops.IncrementalAgg
    val root = java.nio.file.Files.createTempDirectory("incagg").toString + "/t"
    val b1 = (1L to 100L).map(i => (i, i * 0.5)).toDF("k", "v")
    val b2 = (50L to 150L).map(i => (i, i * 0.25)).toDF("k", "v")
    val b3 = Seq((7L, 99.0)).toDF("k", "v")
    IncrementalAgg.applyBatch(spark, root, b1, "k", "v", nBuckets = 8)
    IncrementalAgg.applyBatch(spark, root, b2, "k", "v", nBuckets = 8)
    val v3 = IncrementalAgg.applyBatch(spark, root, b3, "k", "v", nBuckets = 8)
    assert(v3 == 3L)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("key"), col("n"), col("s").cast("double"),
          col("mn"), col("mx"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSet
    val maintained = canon(graft.sources.ManifestTable.read(spark, root,
      IncrementalAgg.stateSchema))
    val scratch = canon(IncrementalAgg.aggregateDelta(
      b1.unionByName(b2).unionByName(b3), "k", "v", nBuckets = 8))
    assert(maintained == scratch && maintained.size == 150)
    // the single-key batch rewrote exactly ONE bucket partition
    val v3dirs = new java.io.File(s"$root/v00000003").listFiles()
      .count(_.getName.startsWith("bucket="))
    assert(v3dirs == 1, s"v3dirs=$v3dirs")
  }

  test("corrMatrix: linear pairs hit ±1 exactly; result invariant to partitioning") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i.toDouble, 2.0 * i + 3, 500.0 - i))
      .toDF("x", "y", "z")
    val r = graft.ops.Stats.corrMatrix(df, Seq("x", "y", "z"))
      .collect().map(q => (q.getString(0), q.getString(1)) -> q.getDouble(2)).toMap
    assert(r(("x", "y")) == 1.0 && r(("x", "z")) == -1.0 && r(("y", "z")) == -1.0)
    // decimal routing: same bits no matter how the rows are partitioned
    val r1 = graft.ops.Stats.corrMatrix(df.repartition(7), Seq("x", "y", "z"))
      .collect().map(q => (q.getString(0), q.getString(1)) -> q.getDouble(2)).toMap
    assert(r1 == r)
  }

  test("histogram: equi-width buckets, closed top edge, constant column degenerates") {
    import spark.implicits._
    val df = (0 until 16).map(_.toDouble).toDF("v")
    val h = graft.ops.Stats.histogram(df, "v", 4)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(h.keySet == Set(0, 1, 2, 3))
    // v=15 (the max) closes into bucket 3, so the last bucket holds 4 too
    assert(h.values.map(_._3).toSeq.sorted == Seq(4L, 4L, 4L, 4L))
    assert(h(0)._1 == 0.0 && h(3)._2 == 15.0)
    val const = graft.ops.Stats.histogram(Seq(7.0, 7.0, 7.0).toDF("v"), "v", 4)
      .collect()
    assert(const.length == 1 && const.head.getInt(0) == 0 && const.head.getLong(3) == 3L)
  }

  test("snapshotDiff classifies added/removed/changed and hides unchanged") {
    import spark.implicits._
    val oldV = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("id", "t", "src")
    val newV = Seq((1L, "a", "x"), (2L, "B", "y"), (4L, "d", "w"))
      .toDF("id", "t", "src")
    val d = graft.ops.Diff.snapshotDiff(oldV, newV, "id", Seq("t", "src"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    val sum = graft.ops.Diff.snapshotDiffSummary(oldV, newV, "id", Seq("t", "src"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L,
      "unchanged" -> 1L))
  }

  test("snapshotDiff payload framing: NULL vs concatenation cannot collide") {
    import spark.implicits._
    // ("ab", null) vs ("a", "b"): naive concat would hash both to "ab"
    val oldV = Seq((1L, Some("ab"), None: Option[String])).toDF("id", "t", "src")
    val newV = Seq((1L, Some("a"), Some("b"))).toDF("id", "t", "src")
    val d = graft.ops.Diff.snapshotDiff(oldV, newV, "id", Seq("t", "src"))
      .collect()
    assert(d.length == 1 && d.head.getString(1) == "changed")
  }

  test("funnel enforces stage ORDER: purchase before click does not convert") {
    import spark.implicits._
    def ts(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val events = Seq(
      // user 1: signup(10) -> click(20) -> purchase(30): full conversion
      (1L, ts(10), "signup"), (1L, ts(20), "click"), (1L, ts(30), "purchase"),
      // user 2: purchase BEFORE click: stops at click stage
      (2L, ts(10), "signup"), (2L, ts(15), "purchase"), (2L, ts(20), "click"),
      // user 3: click only, never signed up: reaches nothing
      (3L, ts(5), "click"),
      // user 4: signup only
      (4L, ts(40), "signup")
    ).toDF("user_id", "ts", "event_type")
    val r = graft.ops.EventAnalytics.funnel(events, "user_id", "ts",
        "event_type", Seq("signup", "click", "purchase"))
      .collect().map(x => x.getString(1) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r("signup") == ((3L, 0L)))
    assert(r("click") == ((2L, (10L + 10L) * 1000000L)))
    assert(r("purchase") == ((1L, 20L * 1000000L)))
  }

  test("funnel ties: an event at EXACTLY the prior stage time does not count") {
    import spark.implicits._
    def ts(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val events = Seq(
      (1L, ts(10), "signup"), (1L, ts(10), "click"), // simultaneous: strict >
      (2L, ts(10), "signup"), (2L, ts(11), "click")
    ).toDF("user_id", "ts", "event_type")
    val r = graft.ops.EventAnalytics.funnel(events, "user_id", "ts",
        "event_type", Seq("signup", "click"))
      .collect().map(x => x.getString(1) -> x.getLong(2)).toMap
    assert(r("signup") == 2L && r("click") == 1L)
  }

  test("pathNgrams counts consecutive runs per user, tie-pinned at equal ts") {
    import spark.implicits._
    def ts(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val events = Seq(
      (1L, ts(1), 100L, "a"), (1L, ts(2), 101L, "b"), (1L, ts(3), 102L, "c"),
      // user 2 has a,b at the SAME ts: event_id order decides (b first)
      (2L, ts(1), 201L, "b"), (2L, ts(1), 202L, "a"), (2L, ts(2), 203L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val bi = graft.ops.EventAnalytics.pathNgrams(events, "user_id", "ts",
        "event_id", "event_type", 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi == Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("b", "a") -> 1L,
      ("a", "c") -> 1L))
    val tri = graft.ops.EventAnalytics.pathNgrams(events, "user_id", "ts",
        "event_id", "event_type", 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(tri == Map(("a", "b", "c") -> 1L, ("b", "a", "c") -> 1L))
  }

  test("weeklyRetention: cohort by first week, offsets count distinct users") {
    import spark.implicits._
    def day(d: String) = // instant-based: immune to the JVM default TZ
      java.sql.Timestamp.from(java.time.Instant.parse(d + "T12:00:00Z"))
    val events = Seq(
      // 2024-01-01 is a Monday -> week boundary alignment is exact
      (1L, day("2024-01-01")), (1L, day("2024-01-07")), // same week twice
      (1L, day("2024-01-08")),                          // next week
      (2L, day("2024-01-01")),                          // week 0 only
      (3L, day("2024-01-10"))                           // cohort = week 1
    ).toDF("user_id", "ts")
    val r = graft.ops.EventAnalytics.weeklyRetention(events, "user_id", "ts")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    val w0 = r.keys.map(_._1).min
    assert(r((w0, 0L)) == 2L)      // users 1,2 in their cohort week
    assert(r((w0, 1L)) == 1L)      // only user 1 returned
    assert(r((w0 + 1, 0L)) == 1L)  // user 3's own cohort
    assert(r.values.sum == 4L)
  }

  test("robustOutliers: exact medians, MAD gate, even/odd groups") {
    import spark.implicits._
    // g=a (odd n=5): med 11, devs {0,1,1,2,99} -> mad 1, outlier 110 only
    // g=b (even n=4): med (4+6)/2=5, devs {3,1,1,3} -> mad (1+3)/2=2
    val df = Seq(("a", 9.0), ("a", 10.0), ("a", 11.0), ("a", 12.0), ("a", 110.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0), ("b", 8.0)).toDF("g", "v")
    val r = graft.ops.Stats.robustOutliers(df, "g", "v")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3), x.getLong(4))).toMap
    assert(r("a") == (5L, 11.0, 1.0, 1L)) // 110: dev 99 > 3*1.4826*1
    assert(r("b") == (4L, 5.0, 2.0, 0L))  // max dev 3 < 3*1.4826*2
  }

  test("halfLifeScore: fresh events count 1, each half-life halves, old decay to 0") {
    import spark.implicits._
    val h = 3600000000L // 1h half-life
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val events = Seq(
      (1L, ts(10L * h)),             // the last event: age 0 -> 1.0
      (1L, ts(9L * h)),              // one half-life -> 0.5
      (1L, ts(8L * h + 1000000L)),   // 1.99h old -> bucket 1 -> 0.5
      (1L, ts(7L * h)),              // 3 half-lives -> 0.125
      (2L, ts(100L * h)), (2L, ts(5L * h)) // 95 half-lives -> quantizes to 0
    ).toDF("user_id", "ts")
    val r = graft.ops.EventAnalytics.halfLifeScore(events, "user_id", "ts", h)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r(1L) == (4L, 2.125))
    assert(r(2L) == (2L, 1.0))
  }

  test("IncrementalAgg distinct view: split-batch merge == one-shot sketch") {
    import spark.implicits._
    import graft.ops.IncrementalAgg
    val rnd = new scala.util.Random(9)
    val rows = (0 until 500).map(i => (i.toLong, s"k${i % 3}", s"u${rnd.nextInt(120)}"))
    val df = rows.toDF("id", "k", "u")
    val hv = conv(substring(md5(col("u")), 1, 15), 16, 10).cast("long")
    val k = 16
    val oneShot = IncrementalAgg.aggregateDistinctDelta(df, "k", hv, k, 4)
    val merged = IncrementalAgg.mergeDistinctStates(
      IncrementalAgg.aggregateDistinctDelta(df.filter(col("id") % 2 === 0), "k", hv, k, 4),
      IncrementalAgg.aggregateDistinctDelta(df.filter(col("id") % 2 === 1), "k", hv, k, 4), k)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getSeq[Long](2).toList)).toMap
    assert(canon(merged.select("key", "bucket", "kmv"))
      == canon(oneShot.select("key", "bucket", "kmv")))
    // estimates: below-k keys exact, at-k keys carry the kth hash
    val est = IncrementalAgg.distinctEstimate(oneShot, k).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(3))).toMap
    val exact = rows.groupBy(_._2).map { case (kk, rs) => kk -> rs.map(_._3).distinct.size }
    est.foreach { case (kk, (nKept, e)) =>
      if (exact(kk) < k) assert(nKept == exact(kk) && e == exact(kk).toLong)
      else assert(nKept == k && e > 0L)
    }
  }

  test("LinkGraph.triangleStats: K4 plus pendant edge") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every node in 3 triangles) + pendant 4-5 (no triangle)
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L)).toDF("a", "b")
    val r = graft.ops.LinkGraph.triangleStats(e)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) == (3L, 3L) && r(2L) == (3L, 3L) && r(3L) == (3L, 3L))
    assert(r(4L) == (4L, 3L))
    assert(r(5L) == (1L, 0L))
    assert(r.values.map(_._2).sum == 12L) // 4 triangles x 3 corners
  }

  test("Scd.type2: run collapse, half-open intervals, same-grain tie pin") {
    import spark.implicits._
    val log = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"),          // one run despite 2 obs
      (1L, 30L, 5L, "C"), (1L, 30L, 9L, "B"),          // tie: orderkey 9 wins
      (1L, 40L, 3L, "A"),                              // A returns = NEW run
      (2L, 10L, 1L, "X")
    ).toDF("k", "ts", "tie", "a")
    val dim = graft.ops.Scd.type2(log, "k", "ts", Seq("a"), "tie")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSet
    assert(dim == Set(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(40L), false),
      (1L, "A", 40L, None, true),
      (2L, "X", 10L, None, true)))
  }

  test("Scd.type2Apply on time-split batches == full rebuild") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // sparse 20-key × 30-day change log with duplicate (key, day) grains
    val rows = for {
      k <- 0L until 20L; day <- 0L until 30L
      if rnd.nextInt(7) != 0
      dup <- 0 until (1 + rnd.nextInt(2))
    } yield (k, day, day * 100 + k * 3 + dup, s"s${rnd.nextInt(3)}")
    val log = rows.toDF("k", "ts", "tie", "a")
    val full = graft.ops.Scd.type2(log, "k", "ts", Seq("a"), "tie")
    val applied = Seq(10L, 20L, 31L).foldLeft[(Option[org.apache.spark.sql.DataFrame], Long)]((None, 0L)) {
      case ((dim, lo), hi) =>
        val batch = log.filter(col("ts") >= lo && col("ts") < hi)
        val next = dim match {
          case None => graft.ops.Scd.type2(batch, "k", "ts", Seq("a"), "tie")
          case Some(dm) => graft.ops.Scd.type2Apply(dm, batch, "k", "ts", Seq("a"), "tie")
        }
        (Some(next), hi)
    }._1.get
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSet
    assert(canon(applied) == canon(full))
    assert(full.count() == canon(full).size.toLong) // no dup intervals
  }
}
