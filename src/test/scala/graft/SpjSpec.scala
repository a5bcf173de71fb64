package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.GraftCatalog

/** Storage-partitioned joins (r20): two graft tables declared
  * `PARTITIONED BY (bucket(n, k))` join on `k` with ZERO Exchange when
  * Spark's V2 bucketing switch is on — the scan reports
  * `KeyGroupedPartitioning(bucket(n, k))` and plans one key-grouped input
  * partition per bucket; composite `(days(ts), bucket(n, k))` tables join
  * on the bucket key alone under Spark's subset-join-keys switches, with
  * asymmetric day coverage padded by pushPartValues. Results are asserted
  * IDENTICAL to the ordinary shuffling plan (the q167 result-invisibility
  * pattern), and every irregular shape (switch off, deletion vector,
  * evolved layout) falls back to the V1 scan.
  */
class SpjSpec extends SparkSuite {

  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-spj-wh").toString
    spark.conf.set("spark.sql.catalog.gspj", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspj.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gspj.db")
    dir
  }

  /** Run `f` with SPJ on/off AND auto-broadcast disabled: at fixture scale
    * the scan statistics (correctly) broadcast the small side, which hides
    * the co-partitioning this suite asserts — at the fact–fact scale SPJ
    * exists for, neither side broadcasts.
    */
  private def withSpj[T](on: Boolean)(f: => T): T = {
    val kv = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> on.toString,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    p.split("== Initial Plan ==").head // AQE: judge the FINAL section only
  }

  private def mkTables(): Unit = {
    wh
    spark.sql("DROP TABLE IF EXISTS gspj.db.fact_a")
    spark.sql("DROP TABLE IF EXISTS gspj.db.fact_b")
    spark.sql("""CREATE TABLE gspj.db.fact_a (k BIGINT, va STRING)
      PARTITIONED BY (bucket(4, k))""")
    spark.sql("""CREATE TABLE gspj.db.fact_b (k BIGINT, vb STRING)
      PARTITIONED BY (bucket(4, k))""")
    (0L until 500L).map(i => (i, s"a$i")).toDF("k", "va")
      .createOrReplaceTempView("spj_a")
    // overlapping but not identical key range; some keys repeat
    (250L until 750L).flatMap(i => Seq((i, s"b$i"), (i, s"b${i}x")))
      .toDF("k", "vb").createOrReplaceTempView("spj_b")
    spark.sql("INSERT INTO gspj.db.fact_a SELECT * FROM spj_a")
    spark.sql("INSERT INTO gspj.db.fact_b SELECT * FROM spj_b")
  }

  private def joined(): DataFrame =
    spark.table("gspj.db.fact_a").join(spark.table("gspj.db.fact_b"), "k")
      .select($"k", $"va", $"vb")

  test("bucketed-bucketed equi-join plans with zero Exchange; results unchanged") {
    mkTables()
    val expected = withSpj(on = false) {
      val df = joined()
      val p = finalPlan(df)
      assert(p.contains("Exchange"), s"control plan must shuffle:\n$p")
      df.as[(Long, String, String)].collect().toSet
    }
    withSpj(on = true) {
      val df = joined()
      val p = finalPlan(df)
      assert(!p.contains("Exchange"), s"SPJ plan must not shuffle:\n$p")
      assert(p.contains("SortMergeJoin"), p)
      assert(df.as[(Long, String, String)].collect().toSet == expected)
    }
  }

  test("appends keep the layout key-grouped; filters still prune inside SPJ") {
    mkTables()
    // a second commit per table: multiple data versions per bucket dir
    spark.sql("INSERT INTO gspj.db.fact_a SELECT k + 1000, va FROM spj_a")
    spark.sql("INSERT INTO gspj.db.fact_b SELECT k + 1000, vb FROM spj_b")
    val expected = withSpj(on = false) {
      joined().filter($"k" >= 1200L).as[(Long, String, String)].collect().toSet
    }
    withSpj(on = true) {
      val df = joined().filter($"k" >= 1200L)
      val p = finalPlan(df)
      assert(!p.contains("Exchange"), s"SPJ plan must not shuffle:\n$p")
      assert(df.as[(Long, String, String)].collect().toSet == expected)
      assert(expected.nonEmpty)
    }
  }

  test("a deletion vector falls back to the shuffling scan — correct, never resurrect") {
    mkTables()
    spark.sql("DELETE FROM gspj.db.fact_b WHERE k < 300")
    val expected = withSpj(on = false) {
      joined().as[(Long, String, String)].collect().toSet
    }
    withSpj(on = true) {
      val df = joined()
      val p = finalPlan(df)
      assert(p.contains("Exchange"), s"DV snapshot must fall back:\n$p")
      assert(df.as[(Long, String, String)].collect().toSet == expected)
      assert(expected.forall(_._1 >= 300L))
    }
  }

  test("one-side shuffle: an unbucketed frame shuffles INTO the table's layout") {
    mkTables()
    // an ad-hoc frame (a staged micro-batch, a lookup set) joining a
    // bucketed fact: with storage-partitioned shuffle enabled, Spark
    // EVALUATES the catalog's bucket function to re-partition ONLY the
    // frame side into the table's existing layout — the fact side moves
    // zero bytes. This is the proof the V2 bucket function is genuinely
    // evaluable (produceResult replays pmod(xxhash64, n) exactly): a
    // mismatched replay would route rows to the wrong bucket and DROP
    // join matches silently — the result assertion below would fail.
    val adhoc = (200L until 600L).map(i => (i, s"x$i")).toDF("k", "vx")
    adhoc.createOrReplaceTempView("spj_adhoc")
    def joined3(): DataFrame =
      spark.table("gspj.db.fact_a").join(spark.table("spj_adhoc"), "k")
        .select($"k", $"va", $"vx")
    val expected = withSpj(on = false) {
      joined3().as[(Long, String, String)].collect().toSet
    }
    assert(expected.size == 300)
    val key = "spark.sql.sources.v2.bucketing.shuffle.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try withSpj(on = true) {
      val df = joined3()
      val p = finalPlan(df)
      // exactly ONE exchange (the ad-hoc side), keyed by the table's
      // bucket function — the fact scan stays exchange-free
      assert("Exchange".r.findAllIn(p).size == 1, s"one shuffle, frame side only:\n$p")
      assert(p.contains("KeyGroupedPartitioning") || p.contains("keygroupedpartitioning"),
        s"the frame must shuffle INTO the key-grouped layout:\n$p")
      assert(df.as[(Long, String, String)].collect().toSet == expected)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("composite (days + bucket) tables join on the bucket key with zero Exchange") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspj.db.ca")
    spark.sql("DROP TABLE IF EXISTS gspj.db.cb")
    spark.sql("""CREATE TABLE gspj.db.ca (k BIGINT, ts TIMESTAMP, va STRING)
      PARTITIONED BY (days(ts), bucket(4, k))""")
    spark.sql("""CREATE TABLE gspj.db.cb (k BIGINT, ts TIMESTAMP, vb STRING)
      PARTITIONED BY (days(ts), bucket(4, k))""")
    // DIFFERENT day coverage per side: side B misses day 0 and adds day 5 —
    // pushPartValues must pad the asymmetric partition-value sets
    (0L until 400L).map(i =>
        (i, java.sql.Timestamp.valueOf(s"2024-01-0${1 + (i % 4)} 10:00:00"), s"a$i"))
      .toDF("k", "ts", "va").createOrReplaceTempView("cspj_a")
    (100L until 500L).map(i =>
        (i, java.sql.Timestamp.valueOf(s"2024-01-0${2 + (i % 4)} 11:00:00"), s"b$i"))
      .toDF("k", "ts", "vb").createOrReplaceTempView("cspj_b")
    spark.sql("INSERT INTO gspj.db.ca SELECT * FROM cspj_a")
    spark.sql("INSERT INTO gspj.db.cb SELECT * FROM cspj_b")
    // The partition-source column (ts) must stay in scope through the
    // join: Spark's alias-aware projection degrades KeyGroupedPartitioning
    // to Unknown when a pruning Project drops a transform's source column
    // (probed r20) — an inherent SPJ constraint, same as Iceberg's.
    def joined2(): DataFrame =
      spark.table("gspj.db.ca").as("a")
        .join(spark.table("gspj.db.cb").as("b"), $"a.k" === $"b.k")
        .select($"a.k", $"a.ts", $"b.ts".as("ts_b"), $"a.va", $"b.vb")
    val expected = withSpj(on = false) {
      joined2().as[(Long, java.sql.Timestamp, java.sql.Timestamp, String, String)]
        .collect().toSet
    }
    assert(expected.nonEmpty)
    // Spark's own composite-SPJ switches (same set Iceberg documents):
    // pad the asymmetric day sets, allow join keys ⊂ partition keys, and
    // drop the exact-cluster-keys co-partition requirement
    val extra = Seq(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.allowJoinKeysSubsetOfPartitionKeys.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false")
    val prev = extra.map { case (key, _) => key -> spark.conf.getOption(key) }
    extra.foreach { case (key, v) => spark.conf.set(key, v) }
    try withSpj(on = true) {
      val df = joined2()
      val p = finalPlan(df)
      assert(!p.contains("Exchange"), s"composite SPJ must not shuffle:\n$p")
      assert(df.as[(Long, java.sql.Timestamp, java.sql.Timestamp, String, String)]
        .collect().toSet == expected)
    } finally prev.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None) => spark.conf.unset(key)
    }
  }

  test("group-by on the bucket key aggregates without an Exchange") {
    mkTables()
    val expected = withSpj(on = false) {
      spark.table("gspj.db.fact_b").groupBy($"k").agg(count(lit(1)).as("c"))
        .as[(Long, Long)].collect().toSet
    }
    withSpj(on = true) {
      val df = spark.table("gspj.db.fact_b").groupBy($"k")
        .agg(count(lit(1)).as("c"))
      val p = finalPlan(df)
      assert(!p.contains("Exchange"), s"bucket-keyed agg must not shuffle:\n$p")
      assert(df.as[(Long, Long)].collect().toSet == expected)
    }
  }
}
