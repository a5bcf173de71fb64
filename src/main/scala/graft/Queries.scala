package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Fuzzy
import graft.llm.{Dedup, Multimodal, Retrieval, SimSearch, TextStats}
import graft.ops.{Flatten, FuzzyJoin, Integrity, Upsert}

/** The oracle-checked query registry — one entry per implemented operator
  * from SURVEY.md §2 plus the LLM-pipeline operators. Each Spark query is
  * paired with ANSI SQL the driver runs on DuckDB over the same parquet;
  * results must match on rows, schema, and value hash.
  *
  * Cross-engine determinism rules used throughout:
  *   - double SUMs go through `decimal(18,6)` (exact, order-independent) and
  *     back to double, because naive double summation is accumulation-order-
  *     dependent and Spark/DuckDB would differ in the last bits;
  *   - every top-1/top-k is pinned by explicit tie-break columns;
  *   - timestamps are µs in both engines (oracle CASTs DuckDB's ns reads).
  */
object Queries {

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    Tables(s, d, name)

  /** Fresh catalog-name suffix per invocation for queries that mix
    * catalog SQL with DIRECT warehouse paths (q201): Spark caches catalog
    * instances BY NAME, so a re-run's new temp warehouse conf is ignored
    * by the cached instance while the query's path-side reads point at
    * the new directory — a bench warm+timed pair would silently diverge.
    * Pure-SQL catalog queries (q187/q195-q200) are immune: the cached
    * catalog keeps resolving everything inside its original warehouse.
    */
  private val catSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Exact cross-engine double aggregation (see object scaladoc). */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")
  private def dsumSql(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE)"

  /** DuckDB reads the ns-typed events.ts as TIMESTAMP_NS; Spark truncates to
    * µs on read. The data carries no sub-µs digits, but the CAST keeps the
    * oracle's output type aligned.
    */
  private val tsUs = "CAST(ts AS TIMESTAMP)"
  private val eventCols = s"event_id, user_id, $tsUs AS ts, event_type, value, props"

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // ================= scans / projections / classic OLAP =================

    ("q01_pricing_agg", (s: SparkSession, d: String) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("n_rows"))
    }, Some(s"""SELECT l_returnflag, l_linestatus,
      ${dsumSql("l_quantity")} AS sum_qty,
      ${dsumSql("l_extendedprice")} AS sum_base_price,
      ${dsumSql("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS sum_disc_price,
      count(*) AS n_rows
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus""")),

    ("q02_mkt_join_agg", (s: SparkSession, d: String) => {
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
    }, Some(s"""SELECT c_mktsegment, count(*) AS n_orders,
      ${dsumSql("o_totalprice")} AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment""")),

    ("q03_top_orders", (s: SparkSession, d: String) => {
      t(s, d, "lineitem")
        .join(t(s, d, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }, Some(s"""SELECT l_orderkey,
      ${dsumSql("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // S5: projected scan — filter + 2-column projection both reach the
    // parquet reader (PushedFilters / ReadSchema in .explain).
    ("q05_scan_project", (s: SparkSession, d: String) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice")
    }, Some("""SELECT l_orderkey, l_extendedprice FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'""")),

    // S6: point lookup by key — a pushed equality predicate.
    ("q06_point_lookup", (s: SparkSession, d: String) => {
      t(s, d, "events").filter(col("event_id") === 500)
    }, Some(s"SELECT $eventCols FROM events WHERE event_id = 500")),

    // Multi-level aggregation: ROLLUP over (status, priority) — subtotals
    // and grand total in one pass (Expand + hash aggregate).
    ("q49_rollup", (s: SparkSession, d: String) => {
      t(s, d, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
    }, Some(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      ${dsumSql("o_totalprice")} AS revenue
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""")),

    // CUBE: all grouping-set combinations in one Expand pass.
    ("q52_cube", (s: SparkSession, d: String) => {
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
    }, Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // MapType surface: parse props as a JSON map and explode to
    // (event_id, key, value) rows.
    ("q53_props_map", (s: SparkSession, d: String) => {
      t(s, d, "events").select(col("event_id"),
          explode(from_json(col("props"),
            MapType(StringType, LongType))).as(Seq("key", "value")))
    }, Some("""WITH k AS (SELECT event_id, props, unnest(json_keys(props)) AS key FROM events)
      SELECT event_id, key, CAST(json_extract_string(props, key) AS BIGINT) AS value FROM k""")),

    // Interpolated percentiles — Spark's percentile() and DuckDB's
    // quantile_cont share the linear-interpolation definition.
    ("q50_percentiles", (s: SparkSession, d: String) => {
      t(s, d, "orders").groupBy("o_orderstatus").agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"))
    }, Some("""SELECT o_orderstatus,
      round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      round(quantile_cont(o_totalprice, 0.95), 4) AS p95
      FROM orders GROUP BY o_orderstatus""")),

    // ======================= the flagship pipeline ========================

    // SURVEY §7.2 minimum slice: hour-truncate, FK-validate, dedup — the
    // reference's lake→warehouse promotion restated on the events table.
    ("q04_flatten_validate", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events").withColumn("hour", date_trunc("hour", col("ts")))
      Integrity.fkValid(ev, t(s, d, "customer"), "user_id", "c_custkey")
        .dropDuplicates("event_id")
    }, Some(s"""SELECT $eventCols,
      CAST(date_trunc('hour', $tsUs) AS TIMESTAMP) AS hour
      FROM events e WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)""")),

    // ====================== integrity joins (J1-J3, A2-A4) ================

    ("q07_new_rows_anti", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
      Integrity.newRowsOnly(ev, ev.filter(col("event_id") % 3 === 0), "event_id")
    }, Some(s"SELECT $eventCols FROM events WHERE event_id % 3 <> 0")),

    ("q08_fk_valid", (s: SparkSession, d: String) => {
      Integrity.fkValid(t(s, d, "orders"), t(s, d, "customer"), "o_custkey", "c_custkey")
    }, Some("""SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
      CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
      FROM orders o WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""")),

    ("q09_fk_violations", (s: SparkSession, d: String) => {
      Integrity.fkViolations(t(s, d, "events"),
        t(s, d, "customer").filter(col("c_custkey") >= 50), "user_id", "c_custkey")
    }, Some(s"""SELECT user_id, event_id, $tsUs AS ts, event_type, value, props
      FROM events e WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id AND c.c_custkey >= 50)""")),

    ("q10_dup_audit", (s: SparkSession, d: String) => {
      Integrity.dupAudit(t(s, d, "orders"), "o_custkey")
    }, Some("SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey HAVING count(*) > 1")),

    ("q11_batch_dedup", (s: SparkSession, d: String) => {
      Integrity.batchDedup(
        t(s, d, "events"),
        t(s, d, "customer").filter(col("c_custkey") % 2 === 0)
          .select(col("c_custkey").as("user_id")),
        "user_id", "event_id")
    }, Some("""WITH f AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn FROM events)
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value, props FROM f
      WHERE rn = 1 AND NOT EXISTS
      (SELECT 1 FROM customer WHERE c_custkey = user_id AND c_custkey % 2 = 0)""")),

    // ================== windows / argmax / set ops (W1, A1, SET1) =========

    ("q12_window_top1", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders").withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    }, Some("""WITH w AS (SELECT o_custkey, o_orderkey, o_totalprice,
      row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
      SELECT o_custkey, o_orderkey, o_totalprice FROM w WHERE rn = 1""")),

    ("q13_argmax", (s: SparkSession, d: String) => {
      t(s, d, "customer").groupBy("c_nationkey").agg(
        max_by(col("c_name"), struct(col("c_acctbal"), (-col("c_custkey")).as("nk"))).as("best_name"),
        max(col("c_acctbal")).as("best_acctbal"))
    }, Some("""WITH w AS (SELECT c_nationkey, c_name, c_acctbal,
      row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn FROM customer)
      SELECT c_nationkey, c_name AS best_name, c_acctbal AS best_acctbal FROM w WHERE rn = 1""")),

    ("q14_except_keys", (s: SparkSession, d: String) => {
      t(s, d, "customer").select("c_custkey")
        .join(t(s, d, "events").select(col("user_id").as("c_custkey")).distinct(),
          Seq("c_custkey"), "left_anti")
    }, Some("""SELECT c_custkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)""")),

    ("q15_distinct_users", (s: SparkSession, d: String) => {
      t(s, d, "events").select("user_id").distinct()
    }, Some("SELECT DISTINCT user_id FROM events")),

    ("q16_count_gate", (s: SparkSession, d: String) => {
      t(s, d, "events").agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
    }, Some("SELECT count(*) AS n_events, count(DISTINCT user_id) AS n_users FROM events")),

    // ===================== scalar-function surface ========================

    ("q17_json_props", (s: SparkSession, d: String) => {
      t(s, d, "events").select(
        col("event_id"),
        from_json(col("props"), Schemas.eventProps).getField("k").as("prop_k"))
    }, Some("SELECT event_id, CAST(props->>'k' AS BIGINT) AS prop_k FROM events")),

    ("q33_trunc_hour", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .groupBy(Flatten.truncHourShifted(col("ts"), 7).as("hour7"))
        .agg(count(lit(1)).as("n"))
    }, Some(s"""SELECT CAST(date_trunc('hour', $tsUs + INTERVAL 7 HOUR) AS TIMESTAMP) AS hour7,
      count(*) AS n FROM events GROUP BY 1""")),

    ("q34_render_shift", (s: SparkSession, d: String) => {
      t(s, d, "events").filter(col("event_id") < 100).select(
        col("event_id"),
        Flatten.renderShifted(col("ts"), 7).as("rendered"),
        Flatten.fileSafe(Flatten.renderShifted(col("ts"), 7)).as("fname"))
    }, Some(s"""SELECT event_id,
      strftime($tsUs + INTERVAL 7 HOUR, '%Y-%m-%d %H:%M:%S') AS rendered,
      regexp_replace(strftime($tsUs + INTERVAL 7 HOUR, '%Y-%m-%d %H:%M:%S'), '[-\\s:]', '', 'g') AS fname
      FROM events WHERE event_id < 100""")),

    ("q35_strip_suffix", (s: SparkSession, d: String) => {
      val latStr = concat(col("c_acctbal").cast("string"), lit("N"))
      t(s, d, "customer").select(
        col("c_custkey"), latStr.as("lat_str"), Flatten.stripSuffixCast(latStr).as("lat"))
    }, Some("""SELECT c_custkey, CAST(c_acctbal AS VARCHAR) || 'N' AS lat_str,
      CAST(substr(CAST(c_acctbal AS VARCHAR) || 'N', 1,
                  length(CAST(c_acctbal AS VARCHAR) || 'N') - 1) AS DOUBLE) AS lat
      FROM customer""")),

    // The reference's whole process_document flatten/cast pipeline (P1-P8)
    // over a nested document constructed from events, landed on the declared
    // warehouse schema — then verified field-by-field by the oracle.
    ("q36_flatten_weather", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
      val raw = ev.select(
        col("event_id").cast("string").as("_id"),
        col("user_id").cast("string").as("place_id"),
        struct(col("event_type").as("name"), col("value").as("lat"), col("value").as("lon")).as("location"),
        struct(
          date_format(col("ts"), "yyyy-MM-dd HH:mm").as("last_updated"),
          unix_seconds(col("ts")).as("last_updated_epoch"),
          col("value").as("temp_c"),
          (col("value") * lit(1.8) + lit(32.0)).as("temp_f"),
          (col("event_id") % 2).as("is_day"),
          struct(col("event_type").as("text"), lit("i").as("icon"), lit(0L).as("code")).as("condition"),
          col("value").as("wind_mph"),
          (col("value") * lit(1.609344)).as("wind_kph"),
          (col("event_id") % 360).as("wind_degree"),
          col("event_type").as("wind_dir"),
          col("value").as("pressure_mb"),
          col("value").as("pressure_in"),
          col("value").as("precip_mm"),
          col("value").as("precip_in"),
          (col("event_id") % 100).as("humidity"),
          (col("event_id") % 100).as("cloud"),
          col("value").as("feelslike_c"),
          col("value").as("feelslike_f"),
          col("value").as("vis_km"),
          col("value").as("vis_miles"),
          col("value").as("uv"),
          col("value").as("gust_mph"),
          col("value").as("gust_kph")).as("current"))
      Flatten.promoteWeather(raw)
    }, Some(s"""SELECT CAST(event_id AS VARCHAR) AS id, CAST(user_id AS VARCHAR) AS place_id,
      CAST(date_trunc('minute', $tsUs) AS TIMESTAMP) AS last_updated,
      epoch_us($tsUs) // 1000000 AS last_updated_epoch,
      value AS temp_c, value * CAST(1.8 AS DOUBLE) + CAST(32.0 AS DOUBLE) AS temp_f,
      (event_id % 2 = 1) AS is_day, event_type AS condition,
      value AS wind_mph, value * CAST(1.609344 AS DOUBLE) AS wind_kph,
      event_id % 360 AS wind_degree, event_type AS wind_dir,
      value AS pressure_mb, value AS pressure_in, value AS precip_mm, value AS precip_in,
      event_id % 100 AS humidity, event_id % 100 AS cloud,
      value AS feelslike_c, value AS feelslike_f, value AS vis_km, value AS vis_miles,
      value AS uv, value AS gust_mph, value AS gust_kph FROM events""")),

    // ====================== fuzzy matching (J4/A1/F1) =====================

    ("q21_fuzzy_top1", (s: SparkSession, d: String) => {
      val left = t(s, d, "part").filter(col("p_partkey") < 50).select("p_partkey", "p_name")
      val right = t(s, d, "part").filter(col("p_partkey") >= 100)
        .select(col("p_name").as("cand_name")).distinct()
      FuzzyJoin.top1(left, right, "p_partkey",
          Fuzzy.ratioApprox(lower(col("p_name")), lower(col("cand_name"))),
          Seq(col("cand_name")))
        .select("p_partkey", "p_name", "cand_name", "score")
    }, Some("""WITH l AS (SELECT p_partkey, p_name FROM part WHERE p_partkey < 50),
      r AS (SELECT DISTINCT p_name AS cand_name FROM part WHERE p_partkey >= 100),
      sc AS (SELECT l.p_partkey, l.p_name, r.cand_name,
        CAST(100 - CEIL(100.0 * levenshtein(lower(l.p_name), lower(r.cand_name))
             / GREATEST(length(l.p_name) + length(r.cand_name), 1)) AS INTEGER) AS score
        FROM l CROSS JOIN r),
      w AS (SELECT *, row_number() OVER (PARTITION BY p_partkey ORDER BY score DESC, cand_name) AS rn FROM sc)
      SELECT p_partkey, p_name, cand_name, score FROM w WHERE rn = 1""")),

    // Exact fuzz.ratio (native codegen'd expression). The oracle replays the
    // indel-weighted ratio in pure SQL: LCS via a nested list_reduce DP
    // (list-typed accumulators), then `round(200*lcs/(|a|+|b|))` with
    // Python-style half-to-even rounding — bit-exact against FuzzRatio.
    ("q22_fuzz_native", (s: SparkSession, d: String) => {
      val left = t(s, d, "part").filter(col("p_partkey") < 20).select("p_partkey", "p_name")
      val right = t(s, d, "part").filter(col("p_partkey") >= 100)
        .select(col("p_name").as("cand_name")).distinct()
      left.crossJoin(broadcast(right)).select(
        col("p_partkey"), col("cand_name"),
        Fuzzy.fuzzRatio(lower(col("p_name")), lower(col("cand_name"))).as("fuzz"))
    }, Some("""WITH l AS (SELECT p_partkey, lower(p_name) AS a FROM part WHERE p_partkey < 20),
      r AS (SELECT DISTINCT p_name AS cand_name FROM part WHERE p_partkey >= 100),
      cp AS (SELECT l.p_partkey, r.cand_name, l.a, lower(r.cand_name) AS b FROM l CROSS JOIN r),
      lc AS (SELECT p_partkey, cand_name, length(a) + length(b) AS lab,
        list_reduce(
          list_concat(
            [list_transform(range(0, length(b) + 1), x -> 0)],
            list_transform(range(1, length(a) + 1), i -> [i])),
          (prev, e) -> CASE WHEN len(e) = 1 THEN
            list_reduce(
              list_concat([[0]], list_transform(range(1, length(b) + 1), j -> [j])),
              (rr, je) -> CASE WHEN len(je) = 1 THEN
                list_append(rr, CASE WHEN substr(a, e[1], 1) = substr(b, je[1], 1)
                  THEN prev[je[1]] + 1
                  ELSE greatest(prev[je[1] + 1], rr[len(rr)]) END)
              ELSE je END)
          ELSE e END) AS row
        FROM cp),
      v AS (SELECT p_partkey, cand_name,
        CASE WHEN lab = 0 THEN 100.0 ELSE (200.0 * row[len(row)]) / lab END AS val
        FROM lc)
      SELECT p_partkey, cand_name,
        CAST(CASE WHEN val - floor(val) > 0.5 THEN floor(val) + 1
                  WHEN val - floor(val) < 0.5 THEN floor(val)
                  WHEN CAST(floor(val) AS BIGINT) % 2 = 0 THEN floor(val)
                  ELSE floor(val) + 1 END AS INTEGER) AS fuzz
      FROM v""")),

    // ========================= upsert / CDC (ST1-ST7) =====================

    ("q19_upsert_merge", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
      Upsert.merge(ev.filter(col("event_id") % 3 === 0), ev.filter(col("event_id") % 2 === 0),
        "event_id", "ts", "event_id")
    }, Some(s"""SELECT $eventCols FROM events WHERE event_id % 3 = 0 AND event_id % 2 <> 0
      UNION ALL SELECT $eventCols FROM events WHERE event_id % 2 = 0""")),

    ("q20_upsert_pruned", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
      Upsert.mergePartitionPruned(ev.filter(col("event_id") % 3 === 0),
        ev.filter(col("event_id") % 2 === 0), "event_id", "user_id")
    }, Some(s"""WITH u AS (SELECT * FROM events WHERE event_id % 2 = 0),
      tg AS (SELECT * FROM events WHERE event_id % 3 = 0)
      SELECT $eventCols FROM tg t WHERE t.user_id IN (SELECT DISTINCT user_id FROM u)
        AND NOT EXISTS (SELECT 1 FROM u WHERE u.event_id = t.event_id)
      UNION ALL SELECT $eventCols FROM u""")),

    // The CDC flagship in batch form: events become insert/update/delete
    // envelopes (fullDocument as JSON), dispatched, deletes dropped (ST5),
    // last-wins per key by clusterTime (ST3/ST4), merged into an empty target.
    ("q18_cdc_batch", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
      val docSchema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("ts_us", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      val env = ev.select(
        when(col("event_id") % 10 === 0, "delete")
          .when(col("event_id") % 3 === 0, "update")
          .otherwise("insert").as("operationType"),
        col("user_id").cast("string").as("documentKey"),
        to_json(struct(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))).as("fullDocument"),
        col("ts").as("clusterTime"))
      val empty = s.createDataFrame(s.sparkContext.emptyRDD[Row], docSchema)
      graft.cdc.Dispatch.applyBatch(empty, env, docSchema, identity,
        rawKey = "user_id", mergeKey = "user_id", tieCol = "event_id")
    }, Some(s"""WITH nv AS (SELECT event_id, user_id, epoch_us($tsUs) AS ts_us, event_type, value, ts AS ct
        FROM events WHERE event_id % 10 <> 0),
      r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ct DESC, event_id DESC) AS rn FROM nv)
      SELECT event_id, user_id, ts_us, event_type, value FROM r WHERE rn = 1""")),

    // As-of join (no native Spark operator): each event picks the latest
    // prior order of its user. Implemented union-tag + window (one shuffle);
    // the oracle is DuckDB's NATIVE ASOF JOIN — two independent
    // implementations of the semantics must agree.
    ("q45_asof_join", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val ords = t(s, d, "orders")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey").as("user_id"), col("o_orderdate"),
          col("o_orderkey"), col("o_totalprice"))
      graft.ops.TemporalJoin.asOf(
        t(s, d, "events").select("event_id", "user_id", "ts", "value"),
        ords, "user_id", "ts", "o_orderdate")
    }, Some("""WITH ords AS (SELECT * FROM (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1)
      SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts, e.value,
        CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate, o.o_orderkey, o.o_totalprice
      FROM events e ASOF JOIN ords o
        ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) >= o.o_orderdate""")),

    // Range (interval-containment) join, bin-bucketed — the equi-join
    // decomposition of what would otherwise plan as a nested loop.
    ("q46_range_join", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
      val wins = ev.filter(col("event_id") % 50 === 0)
        .select(col("event_id").as("win_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
      graft.ops.TemporalJoin.range(
        ev.select("event_id", "user_id", "ts"), wins, "ts", "w_start", "w_end", 7200L)
        .select("event_id", "user_id", "ts", "win_id", "w_start", "w_end")
    }, Some("""WITH wins AS (SELECT event_id AS win_id, CAST(ts AS TIMESTAMP) AS w_start,
        CAST(ts AS TIMESTAMP) + INTERVAL 2 HOUR AS w_end
        FROM events WHERE event_id % 50 = 0)
      SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        w.win_id, w.w_start, w.w_end
      FROM events e JOIN wins w
        ON CAST(e.ts AS TIMESTAMP) >= w.w_start AND CAST(e.ts AS TIMESTAMP) < w.w_end""")),

    // Sessionization: gaps-and-islands in one window pass; 1h inactivity gap.
    ("q47_sessionize", (s: SparkSession, d: String) => {
      graft.ops.TemporalJoin.sessionize(
        t(s, d, "events").select("event_id", "user_id", "ts"),
        "user_id", "ts", 3600L, "event_id")
    }, Some("""WITH s AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        FROM events)
      SELECT event_id, user_id, ts,
        CAST(sum(CASE WHEN prev IS NULL
                 OR epoch_us(ts) // 1000000 - epoch_us(prev) // 1000000 > 3600
                 THEN 1 ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
          AS BIGINT) AS session_id
      FROM s""")),

    // Sliding event-time windows (1h length, 15m slide): each event lands in
    // 4 overlapping windows. The oracle expands each event into its covering
    // window starts — same expansion Spark's window() generator performs.
    ("q51_sliding_window", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"))
    }, Some(s"""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      x AS (SELECT event_type,
        unnest(list_transform(range(0, 4), i ->
          make_timestamp(((epoch_us(ts) // 1000000 // 900 - i) * 900) * 1000000))) AS w_start,
        ts FROM e)
      SELECT w_start, event_type, count(*) AS n
      FROM x WHERE ts >= w_start AND ts < w_start + INTERVAL 1 HOUR
      GROUP BY 1, 2""")),

    ("q37_stream_hourly", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
    }, Some(s"""SELECT CAST(date_trunc('hour', $tsUs) AS TIMESTAMP) AS hour, event_type,
      count(*) AS n, ${dsumSql("value")} AS sum_value FROM events GROUP BY 1, 2""")),

    // ===================== LLM-pipeline: dedup ============================

    ("q24_exact_dedup", (s: SparkSession, d: String) => {
      Dedup.exact(t(s, d, "documents"), "text", "doc_id")
    }, Some("""SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
      min(doc_id) AS doc_id, count(*) AS n_dups FROM documents GROUP BY 1""")),

    ("q25_ngram_jaccard", (s: SparkSession, d: String) => {
      Dedup.bruteForceJaccardPairs(
        t(s, d, "documents").filter(col("doc_id") < 100), "text", "doc_id", 3, 0.02)
    }, Some("""WITH dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents WHERE doc_id < 100),
      sh AS (SELECT doc_id, CASE WHEN len(w) >= 3
          THEN list_distinct(list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))
          ELSE [coalesce(array_to_string(w, ' '), '')] END AS sh FROM dd),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        round(CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
        FROM sh a CROSS JOIN sh b WHERE a.doc_id < b.doc_id)
      SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.02""")),

    // MinHash+LSH over a corpus with planted near-duplicates (the raw docs
    // carry none). The md5-based signature is deterministic, so the oracle
    // replays the ENTIRE pipeline — shingle, sign, band, join, verify — in
    // DuckDB SQL and must match exactly.
    ("q27_minhash_pairs", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val planted = docs.select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" extra token")).as("text"))
      Dedup.minhashPairs(docs.unionByName(planted), "text", "doc_id",
        shingleN = 3, k = 16, bands = 4, threshold = 0.5)
    }, Some("""WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 10000 AS doc_id, text || ' extra token' AS text FROM documents),
      dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w FROM corpus),
      sh AS (SELECT doc_id, CASE WHEN len(w) >= 3
          THEN list_distinct(list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))
          ELSE [coalesce(array_to_string(w, ' '), '')] END AS sh FROM dd),
      hv AS (SELECT doc_id, sh,
        list_transform(sh, x -> ('0x' || substr(md5(x), 1, 14))::BIGINT) AS h1,
        list_transform(sh, x -> ('0x' || substr(md5(x), 17, 14))::BIGINT) AS h2
        FROM sh),
      sig AS (SELECT doc_id, sh,
        list_transform(range(1, 17), i -> list_min(
          list_transform(range(1, len(h1) + 1), j -> (h1[j] + i * h2[j]) % 1000000007))) AS sig
        FROM hv),
      band AS (SELECT doc_id, sh,
        unnest(list_transform(range(0, 4), b -> CAST(b AS VARCHAR) || '|' ||
          array_to_string(list_transform(sig[b*4+1:b*4+4], x -> CAST(x AS VARCHAR)), ','))) AS band
        FROM sig),
      pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
        FROM band a JOIN band b ON a.band = b.band AND a.doc_id < b.doc_id)
      SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5""")),

    // SimHash near-dup pairs. The native simhash64 expression (FNV-1a per
    // token + bitwise majority vote) is replayed EXACTLY in the oracle via
    // HUGEINT mod-2^64 arithmetic — every dedup variant is hash-checked.
    ("q26_simhash_pairs", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val planted = docs.select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" extra token")).as("text"))
      Dedup.simhashPairs(docs.unionByName(planted), "text", "doc_id",
        prefixBits = 8, maxHamming = 6)
    }, Some("""WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 10000 AS doc_id, text || ' extra token' AS text FROM documents),
      tok AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '), x -> x <> '') AS toks
        FROM corpus),
      th AS (SELECT doc_id,
        list_transform(toks, t ->
          list_reduce(
            list_concat([14695981039346656037::HUGEINT],
              list_transform(range(1, octet_length(encode(t)) + 1),
                i -> (('0x' || substr(hex(encode(t)), 2 * CAST(i AS INTEGER) - 1, 2))::BIGINT)::HUGEINT)),
            (a, b) -> (xor(a, b) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)) AS hs
        FROM tok),
      shh AS (SELECT doc_id,
        list_reduce(list_transform(range(0, 64), b ->
          CASE WHEN 2 * len(list_filter(hs, h -> ((h >> CAST(b AS INTEGER)) % 2) = 1)) > len(hs)
               THEN (1::HUGEINT << CAST(b AS INTEGER)) ELSE 0::HUGEINT END),
          (a, b) -> a + b) AS u
        FROM th),
      sgn AS (SELECT doc_id,
        CASE WHEN u >= 9223372036854775808::HUGEINT
             THEN CAST(u - 18446744073709551616::HUGEINT AS BIGINT) ELSE CAST(u AS BIGINT) END AS sh,
        CAST(u >> 56 AS BIGINT) AS bucket
        FROM shh)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
      FROM sgn a JOIN sgn b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sh, b.sh)) <= 6""")),

    ("q28_embedding_pairs", (s: SparkSession, d: String) => {
      Dedup.embeddingPairs(t(s, d, "embeddings"), "embedding", "vec_id",
        signBits = 4, threshold = 0.3)
    }, Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      b AS (SELECT vec_id, v,
        list_sum(list_transform(range(1, 5), i -> CASE WHEN v[i] > 0 THEN CAST(power(2, 4 - i) AS BIGINT) ELSE 0 END)) AS bucket
        FROM e)
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
        round(list_cosine_similarity(a.v, b2.v), 6) AS cosine
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
      WHERE round(list_cosine_similarity(a.v, b2.v), 6) >= 0.3""")),

    // Native expressions through the SQL front door: cosine_similarity is a
    // registered function, so the whole top-k is plain SQL text.
    ("q43_sql_cosine", (s: SparkSession, d: String) => {
      org.apache.spark.sql.graft.GraftFunctions.registerAll(s)
      t(s, d, "embeddings").createOrReplaceTempView("v_embeddings")
      s.sql("""
        WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM v_embeddings WHERE vec_id < 4),
        sc AS (SELECT query_id, e.vec_id,
          round(cosine_similarity(q_emb, e.embedding), 6) AS cosine
          FROM v_embeddings e CROSS JOIN q),
        w AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank FROM sc)
        SELECT query_id, vec_id, cosine, rank FROM w WHERE rank <= 3""")
    }, Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 4),
      c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
      sc AS (SELECT query_id, vec_id, round(list_cosine_similarity(qv, cv), 6) AS cosine
        FROM c CROSS JOIN q),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk FROM sc)
      SELECT query_id, vec_id, cosine, CAST(rnk AS INTEGER) AS rank FROM w WHERE rnk <= 3""")),

    // ===================== LLM-pipeline: similarity search ================

    ("q23_cosine_topk", (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      SimSearch.bruteForceTopK(
        emb.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"), col("embedding")),
        emb, 5, "query_id", "vec_id")
    }, Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
      c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
      sc AS (SELECT query_id, vec_id, round(list_cosine_similarity(qv, cv), 6) AS cosine
        FROM c CROSS JOIN q),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk FROM sc)
      SELECT query_id, vec_id, cosine, CAST(rnk AS INTEGER) AS rank FROM w WHERE rnk <= 5""")),

    // Same top-k, via the custom bounded-heap TypedImperativeAggregate —
    // map-side partial top-k (|queries|*k shuffle rows, not |corpus|). Same
    // oracle as the window form: two Spark implementations and DuckDB agree.
    ("q48_topk_agg", (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      SimSearch.bruteForceTopKAgg(
        emb.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"), col("embedding")),
        emb, 5, "query_id", "vec_id")
    }, Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
      c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
      sc AS (SELECT query_id, vec_id, round(list_cosine_similarity(qv, cv), 6) AS cosine
        FROM c CROSS JOIN q),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk FROM sc)
      SELECT query_id, vec_id, cosine, CAST(rnk AS INTEGER) AS rank FROM w WHERE rnk <= 5""")),

    // ===================== LLM-pipeline: text analysis ====================

    ("q29_text_stats", (s: SparkSession, d: String) => {
      t(s, d, "documents")
        .select(col("doc_id"), col("text"), TextStats.tokens(col("text")).as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_tokens"),
          TextStats.bpeIshTokenCount(col("text")).as("n_bpeish"),
          TextStats.punctCount(col("text")).as("n_punct"),
          TextStats.qualityScoreFromTokens(col("text"), col("toks")).as("quality"))
    }, Some("""WITH b AS (SELECT doc_id, text,
        list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
      c AS (SELECT doc_id,
        CAST(len(toks) AS INTEGER) AS n_tokens,
        CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS n_bpeish,
        CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS INTEGER) AS n_punct,
        CAST(len(toks) AS DOUBLE) AS ntok,
        CAST(length(text) AS DOUBLE) AS nchar,
        CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) AS npunct,
        CAST(len(list_distinct(toks)) AS DOUBLE) AS ndist
        FROM b)
      SELECT doc_id, n_tokens, n_bpeish, n_punct,
        round((least(ntok / 100.0, 1.0)
               + (1.0 - least(npunct / greatest(nchar, 1.0) * 10.0, 1.0))
               + ndist / greatest(ntok, 1.0)) / 3.0, 4) AS quality
      FROM c""")),

    // Production path is the native one-pass lang_id expression; the
    // pure-builtin langIdFromTokens is the specification (FunctionsSpec
    // asserts they agree; the oracle replays the specification in SQL).
    ("q30_lang_id", (s: SparkSession, d: String) => {
      t(s, d, "documents")
        .select(col("doc_id"), TextStats.tokens(lower(col("text"))).as("toks"))
        .select(col("doc_id"), TextStats.langIdNative(col("toks")).as("lang"))
    }, Some("""WITH b AS (SELECT doc_id,
        list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks FROM documents),
      h AS (SELECT doc_id,
        len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','mit','ein','ich','zu'))) AS h_de,
        len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it','you','that'))) AS h_en,
        len(list_filter(toks, x -> x IN ('el','la','que','los','y','en','un','ser','se','no'))) AS h_es,
        len(list_filter(toks, x -> x IN ('le','les','des','et','dans','en','un','du','une','est'))) AS h_fr,
        len(list_filter(toks, x -> x IN ('的','一','是','不','了','人','我','在','有','他'))) AS h_zh
        FROM b)
      SELECT doc_id, CASE
        WHEN h_en IS NULL THEN 'und'
        WHEN h_de = 0 AND h_en = 0 AND h_es = 0 AND h_fr = 0 AND h_zh = 0 THEN 'und'
        WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
        WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
        WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
        WHEN h_fr >= h_zh THEN 'fr'
        ELSE 'zh' END AS lang FROM h""")),

    ("q31_fingerprint", (s: SparkSession, d: String) => {
      t(s, d, "documents").select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
    }, Some("""SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
      FROM documents""")),

    // Winnowing fingerprints with a true ROLLING hash (Karp–Rabin Horner
    // fold, the Schleimer et al. choice): O(1) per position where the r2
    // md5-per-gram formulation paid a full digest each — measured >3x
    // faster on this, the round-2 bench's heaviest query. The oracle
    // replays the mod-2^64 polynomial per byte window in HUGEINT math.
    // Any shared substring of >= w+k-1 bytes still shares a fingerprint.
    ("q41_winnow", (s: SparkSession, d: String) => {
      TextStats.winnowFingerprintsRolling(t(s, d, "documents"), "doc_id", "text", 8, 16)
    }, Some("""WITH g AS (SELECT doc_id, hex(encode(text)) AS hx,
        octet_length(encode(text)) AS len FROM documents),
      hh AS (SELECT doc_id,
        list_transform(range(1, greatest(len - 7, 1) + 1), i ->
          list_reduce(
            list_concat([0::HUGEINT],
              list_transform(range(0, least(8, len - CAST(i AS INTEGER) + 1)),
                j -> (('0x' || substr(hx, 2 * (CAST(i AS INTEGER) + CAST(j AS INTEGER)) - 1, 2))::BIGINT)::HUGEINT)),
            (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT)) AS gh
        FROM g),
      sgn AS (SELECT doc_id,
        list_transform(gh, u -> CASE WHEN u >= 9223372036854775808::HUGEINT
          THEN CAST(u - 18446744073709551616::HUGEINT AS BIGINT)
          ELSE CAST(u AS BIGINT) END) AS gh
        FROM hh),
      wm AS (SELECT doc_id,
        list_distinct(list_transform(range(1, greatest(len(gh) - 15, 1) + 1),
          j -> list_min(gh[j:j+15]))) AS fps FROM sgn)
      SELECT doc_id, unnest(fps) AS fp FROM wm""")),

    // IVF approximate-nearest-neighbor: two-level centroid index, nprobe=2 —
    // the oracle replays the exact same assignment/probe/rank pipeline.
    // IVF over k-means-TRAINED centroids (VERDICT r03 #3): two Lloyd rounds
    // from the stride seed, unrolled verbatim in the oracle (a1/c1, a2/c2
    // CTEs). Per-cell means route through decimal(18,6) in BOTH engines so
    // the trained state is bit-identical; assignments round cosine to 6 and
    // tie-break on cent_id (the standing determinism rules).
    ("q42_ivf_topk", (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      SimSearch.ivfTopKTrained(
        emb.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"), col("embedding")),
        emb, 5, centroidStride = 64, trainIters = 2, nprobe = 2, "query_id", "vec_id")
    }, Some("""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      c0 AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cent
        FROM embeddings WHERE vec_id % 64 = 0),
      a1 AS (SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, t.cent_id AS cell,
          row_number() OVER (PARTITION BY c.vec_id
            ORDER BY round(list_cosine_similarity(c.v, t.cent), 6) DESC, t.cent_id) AS rn
        FROM corp c CROSS JOIN c0 t) WHERE rn = 1),
      c1 AS (SELECT cell AS cent_id, list(m ORDER BY dim) AS cent FROM (
          SELECT cell, dim, floor(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS m
          FROM (SELECT cell, unnest(range(len(v))) AS dim, unnest(v) AS x FROM a1)
          GROUP BY cell, dim) GROUP BY cell),
      a2 AS (SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, t.cent_id AS cell,
          row_number() OVER (PARTITION BY c.vec_id
            ORDER BY round(list_cosine_similarity(c.v, t.cent), 6) DESC, t.cent_id) AS rn
        FROM corp c CROSS JOIN c1 t) WHERE rn = 1),
      c2 AS (SELECT cell AS cent_id, list(m ORDER BY dim) AS cent FROM (
          SELECT cell, dim, floor(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS m
          FROM (SELECT cell, unnest(range(len(v))) AS dim, unnest(v) AS x FROM a2)
          GROUP BY cell, dim) GROUP BY cell),
      ca AS (SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, t.cent_id AS cell,
          row_number() OVER (PARTITION BY c.vec_id
            ORDER BY round(list_cosine_similarity(c.v, t.cent), 6) DESC, t.cent_id) AS rn
        FROM corp c CROSS JOIN c2 t) WHERE rn = 1),
      q AS (SELECT vec_id AS query_id, v AS qv FROM corp WHERE vec_id < 8),
      qa AS (SELECT query_id, qv, cell FROM (
        SELECT q.query_id, q.qv, t.cent_id AS cell,
          row_number() OVER (PARTITION BY q.query_id
            ORDER BY round(list_cosine_similarity(q.qv, t.cent), 6) DESC, t.cent_id) AS rn
        FROM q CROSS JOIN c2 t) WHERE rn <= 2),
      sc AS (SELECT qa.query_id, ca.vec_id, round(list_cosine_similarity(qa.qv, ca.v), 6) AS cosine
        FROM ca JOIN qa ON ca.cell = qa.cell),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk FROM sc)
      SELECT query_id, vec_id, cosine, CAST(rnk AS INTEGER) AS rank FROM w WHERE rnk <= 5""")),

    // The composite curation pipeline — the engine's headline use case:
    // language-gate, quality-gate, exact-dedup, and per-source accounting in
    // one plan. Catalyst fuses the scalar gates into the scan; the only
    // shuffles are the dedup and final aggregations.
    ("q44_curation", (s: SparkSession, d: String) => {
      val scored = t(s, d, "documents")
        .select(col("doc_id"), col("text"), col("source"),
          TextStats.tokens(lower(col("text"))).as("ltoks"),
          TextStats.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("text"), col("source"),
          TextStats.langIdNative(col("ltoks")).as("lang"),
          TextStats.qualityScoreFromTokens(col("text"), col("toks")).as("quality"))
      val gated = scored.filter(col("lang") === "en" && col("quality") >= 0.5)
      Dedup.exactApply(gated, "text", "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          dsum(col("quality")).as("sum_quality"))
    }, Some("""WITH b AS (SELECT doc_id, text, source,
        list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS ltoks,
        list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        FROM documents),
      h AS (SELECT doc_id, text, source, toks,
        len(list_filter(ltoks, x -> x IN ('der','die','das','und','ist','nicht','mit','ein','ich','zu'))) AS h_de,
        len(list_filter(ltoks, x -> x IN ('the','and','of','to','a','in','is','it','you','that'))) AS h_en,
        len(list_filter(ltoks, x -> x IN ('el','la','que','los','y','en','un','ser','se','no'))) AS h_es,
        len(list_filter(ltoks, x -> x IN ('le','les','des','et','dans','en','un','du','une','est'))) AS h_fr,
        len(list_filter(ltoks, x -> x IN ('的','一','是','不','了','人','我','在','有','他'))) AS h_zh
        FROM b),
      sc AS (SELECT doc_id, text, source,
        CASE WHEN h_de = 0 AND h_en = 0 AND h_es = 0 AND h_fr = 0 AND h_zh = 0 THEN 'und'
             WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
             WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
             WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
             WHEN h_fr >= h_zh THEN 'fr' ELSE 'zh' END AS lang,
        round((least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
          + (1.0 - least(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
              / greatest(CAST(length(text) AS DOUBLE), 1.0) * 10.0, 1.0))
          + CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(CAST(len(toks) AS DOUBLE), 1.0)) / 3.0, 4) AS quality
        FROM h),
      gated AS (SELECT * FROM sc WHERE lang = 'en' AND quality >= 0.5),
      surv AS (SELECT min(doc_id) AS doc_id FROM gated
        GROUP BY md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')))
      SELECT source, count(*) AS n_docs,
        CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) AS sum_quality
      FROM gated WHERE doc_id IN (SELECT doc_id FROM surv)
      GROUP BY source""")),

    // ===================== LLM-pipeline: multimodal =======================

    // P10/P12: string-equality predicate + deterministic row enumeration
    // (the reference's enumerate-the-failed-batch, pinned by a total order so
    // the oracle can replay it). Scalable zipWithIndex form — a global
    // row_number window would single-reducer the whole table.
    ("q38_enumerate", (s: SparkSession, d: String) => {
      graft.ops.Enumerate.withIndex(
        t(s, d, "events").filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("value")),
        Seq(col("event_id")))
    }, Some("""SELECT event_id, user_id, value,
      row_number() OVER (ORDER BY event_id) - 1 AS idx
      FROM events WHERE event_type = 'purchase'""")),

    // The SQL entry point (spark.sql over registered views) — same engine,
    // text-plan front door; exercises S15-style catalog registration.
    ("q39_sql_api", (s: SparkSession, d: String) => {
      t(s, d, "orders").createOrReplaceTempView("v_orders")
      t(s, d, "customer").createOrReplaceTempView("v_customer")
      s.sql("""SELECT c_nationkey, count(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM v_orders JOIN v_customer ON o_custkey = c_custkey
        GROUP BY c_nationkey""")
    }, Some(s"""SELECT c_nationkey, count(*) AS n, ${dsumSql("o_totalprice")} AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_nationkey""")),

    // Dedup applied end-to-end: keep one surviving row per normalized text
    // (min doc_id wins), returning full surviving documents.
    ("q40_dedup_apply", (s: SparkSession, d: String) => {
      Dedup.exactApply(t(s, d, "documents"), "text", "doc_id")
    }, Some("""SELECT * FROM documents WHERE doc_id IN (
      SELECT min(doc_id) FROM documents
      GROUP BY md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')))""")),

    ("q32_multimodal_meta", (s: SparkSession, d: String) => {
      Multimodal.decodeMeta(Multimodal.withPayload(t(s, d, "documents"), "text", "doc_id"))
        .select("doc_id", "n_bytes", "width", "height", "channels")
    }, Some("""SELECT doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
      CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INTEGER) AS height,
      CAST(3 AS INTEGER) AS channels FROM documents""")),

    // Full-recall swept SimHash: blocks=7 windows guarantee (pigeonhole) that
    // every pair with hamming <= 6 collides in some window — so the oracle is
    // BRUTE-FORCE all-pairs hamming, a true differential check of the
    // bucketed path (the single-prefix q26 can only be checked against its
    // own bucketing).
    ("q54_simhash_swept", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val planted = docs.select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" extra token")).as("text"))
      Dedup.simhashPairsSwept(docs.unionByName(planted), "text", "doc_id",
        blocks = 7, maxHamming = 6)
    }, Some("""WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 10000 AS doc_id, text || ' extra token' AS text FROM documents),
      tok AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '), x -> x <> '') AS toks
        FROM corpus),
      th AS (SELECT doc_id,
        list_transform(toks, t ->
          list_reduce(
            list_concat([14695981039346656037::HUGEINT],
              list_transform(range(1, octet_length(encode(t)) + 1),
                i -> (('0x' || substr(hex(encode(t)), 2 * CAST(i AS INTEGER) - 1, 2))::BIGINT)::HUGEINT)),
            (a, b) -> (xor(a, b) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)) AS hs
        FROM tok),
      shh AS (SELECT doc_id,
        list_reduce(list_transform(range(0, 64), b ->
          CASE WHEN 2 * len(list_filter(hs, h -> ((h >> CAST(b AS INTEGER)) % 2) = 1)) > len(hs)
               THEN (1::HUGEINT << CAST(b AS INTEGER)) ELSE 0::HUGEINT END),
          (a, b) -> a + b) AS u
        FROM th),
      sgn AS (SELECT doc_id,
        CASE WHEN u >= 9223372036854775808::HUGEINT
             THEN CAST(u - 18446744073709551616::HUGEINT AS BIGINT) ELSE CAST(u AS BIGINT) END AS sh
        FROM shh)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
      FROM sgn a JOIN sgn b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sh, b.sh)) <= 6""")),

    // ===================== skew toolkit (oracled) =========================

    // Salted equi-join must be value-identical to the plain join: the salt
    // spreads a hot fact key over saltFactor reducers and is dropped on
    // output. Oracle = the unsalted join.
    ("q55_salted_join", (s: SparkSession, d: String) => {
      val facts = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey").as("k"), col("l_quantity"))
      val dim = t(s, d, "part").select(col("p_partkey").as("k"), col("p_name"))
      graft.ops.Skew.saltedJoin(facts, dim, "k", saltFactor = 8)
        .select("l_orderkey", "l_linenumber", "k", "l_quantity", "p_name")
    }, Some("""SELECT l_orderkey, l_linenumber, p_partkey AS k, l_quantity, p_name
      FROM lineitem JOIN part ON l_partkey = p_partkey""")),

    // Two-phase (salted) aggregation must equal the one-shot aggregate:
    // phase 1 reduces per (key, salt), phase 2 combines partials per key.
    ("q56_two_phase_agg", (s: SparkSession, d: String) => {
      graft.ops.Skew.twoPhaseAgg(
        t(s, d, "lineitem").select("l_returnflag", "l_quantity"),
        "l_returnflag", saltFactor = 16,
        Map(
          "n" -> (count(lit(1)), sum(col("n"))),
          "sum_qty" -> (sum(col("l_quantity").cast("decimal(18,6)")), sum(col("sum_qty")))))
        .select(col("l_returnflag"), col("n"), col("sum_qty").cast("double").as("sum_qty"))
    }, Some(s"""SELECT l_returnflag, count(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY l_returnflag""")),

    // LSH-bucketed ANN top-k (recall < 1 by construction): the oracle replays
    // the same sign-bucket + per-bucket rank pipeline.
    ("q57_bucketed_topk", (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      SimSearch.bucketedTopK(
        emb.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"), col("embedding")),
        emb, 5, signBits = 4, "query_id", "vec_id")
    }, Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      b AS (SELECT vec_id, v,
        list_sum(list_transform(range(1, 5), i -> CASE WHEN v[i] > 0 THEN CAST(power(2, 4 - i) AS BIGINT) ELSE 0 END)) AS bucket
        FROM e),
      q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 8),
      sc AS (SELECT q.query_id, c.vec_id, round(list_cosine_similarity(q.qv, c.v), 6) AS cosine
        FROM b c JOIN q ON c.bucket = q.bucket
        WHERE NOT isnan(list_cosine_similarity(q.qv, c.v))),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk FROM sc)
      SELECT query_id, vec_id, cosine, CAST(rnk AS INTEGER) AS rank FROM w WHERE rnk <= 5""")),

    // ================ places backfill (J4 chain, end-to-end) ==============

    // The reference's full get_places -> country-filtered fuzzy match ->
    // dedup -> landed insert chain (reference:
    // src/ingest_places_data.py:49-67,113-115), replayed on harness tables:
    // customers are the unmatched names, suppliers the candidate places,
    // nationkey the country filter. Blocked join (no crossJoin), ratioApprox
    // scoring, tie-pinned top-1, then one landed row per matched candidate.
    ("q58_places_backfill", (s: SparkSession, d: String) => {
      val names = t(s, d, "customer").filter(col("c_custkey") < 200)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey").as("nk"))
      val cands = t(s, d, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey").as("nk"))
      val matched = FuzzyJoin.top1Blocked(names, cands, "c_custkey", "nk",
        Fuzzy.ratioApprox(lower(col("c_name")), lower(col("s_name"))),
        Seq(col("s_name"), col("s_suppkey")))
      val landed = matched.select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        col("s_suppkey").as("matched_id"), col("s_name").as("matched_name"),
        col("score"))
      val w = Window.partitionBy(col("matched_id")).orderBy(col("id"))
      landed.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }, Some("""WITH l AS (SELECT c_custkey, c_name, c_nationkey AS nk FROM customer WHERE c_custkey < 200),
      r AS (SELECT s_suppkey, s_name, s_nationkey AS nk FROM supplier),
      sc AS (SELECT l.c_custkey, l.c_name, r.s_suppkey, r.s_name,
        CAST(100 - CEIL(100.0 * levenshtein(lower(l.c_name), lower(r.s_name))
             / GREATEST(length(l.c_name) + length(r.s_name), 1)) AS INTEGER) AS score
        FROM l JOIN r ON l.nk = r.nk),
      w AS (SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY score DESC, s_name, s_suppkey) AS rn FROM sc),
      t1 AS (SELECT c_custkey AS id, c_name AS name, s_suppkey AS matched_id,
        s_name AS matched_name, score FROM w WHERE rn = 1),
      dd AS (SELECT *, row_number() OVER (PARTITION BY matched_id ORDER BY id) AS rn2 FROM t1)
      SELECT id, name, matched_id, matched_name, score FROM dd WHERE rn2 = 1""")),

    // Prefix-filtered set-similarity join (PPJoin-style): exact recall by the
    // prefix-filtering theorem, exact precision by the verify — so the oracle
    // is BRUTE-FORCE all-pairs Jaccard, differential-checking the whole
    // candidate-generation machinery (the scalable upgrade of q25, which is
    // honest about being all-pairs-only).
    ("q59_jaccard_prefix", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 60).select("doc_id", "text")
      val planted = docs.select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" extra token")).as("text"))
      Dedup.jaccardPairsPrefix(docs.unionByName(planted), "text", "doc_id",
        shingleN = 3, threshold = 0.5)
    }, Some("""WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 60
        UNION ALL SELECT doc_id + 10000 AS doc_id, text || ' extra token' AS text
        FROM documents WHERE doc_id < 60),
      dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w FROM corpus),
      sh AS (SELECT doc_id, CASE WHEN len(w) >= 3
          THEN list_distinct(list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))
          ELSE [coalesce(array_to_string(w, ' '), '')] END AS sh FROM dd),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        round(CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
        FROM sh a CROSS JOIN sh b WHERE a.doc_id < b.doc_id)
      SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5""")),

    // Connected components over near-dup pairs: pairs -> clusters, comp = min
    // id of each component (A~B, B~C collapse without an explicit A~C edge).
    // Spark runs min-label propagation (one join + keyed agg per round); the
    // oracle replays it as a recursive transitive-closure CTE — two
    // independent formulations of the same fixpoint must agree.
    ("q60_components", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 60).select("doc_id", "text")
      val corpus = docs.unionByName(docs.select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" extra token")).as("text")))
      val pairs = Dedup.jaccardPairsPrefix(corpus, "text", "doc_id",
        shingleN = 3, threshold = 0.5)
      Dedup.connectedComponents(pairs, corpus.select("doc_id"), "doc_id")
    }, Some("""WITH RECURSIVE corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 60
        UNION ALL SELECT doc_id + 10000 AS doc_id, text || ' extra token' AS text
        FROM documents WHERE doc_id < 60),
      dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w FROM corpus),
      sh AS (SELECT doc_id, CASE WHEN len(w) >= 3
          THEN list_distinct(list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))
          ELSE [coalesce(array_to_string(w, ' '), '')] END AS sh FROM dd),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a CROSS JOIN sh b WHERE a.doc_id < b.doc_id
          AND CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.5),
      e AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
      tc AS (SELECT u, v FROM e
        UNION SELECT tc.u, e.v FROM tc JOIN e ON tc.v = e.u)
      SELECT c.doc_id, least(c.doc_id, coalesce(min(tc.v), c.doc_id)) AS comp
      FROM corpus c LEFT JOIN tc ON tc.u = c.doc_id GROUP BY c.doc_id""")),

    // Deterministic stratified sampling: a pure hash-threshold predicate
    // (md5-derived uniform [0,1)) with a per-stratum rate — replayable across
    // runs AND engines, which rand()-based sampling is not. The rate here is
    // derived from the stratum value so the oracle needs no side table.
    ("q61_stratified_sample", (s: SparkSession, d: String) => {
      val frac = ((length(col("source")) % 3 + 1) * lit(0.2))
      graft.llm.Sampling.deterministicSample(
        t(s, d, "documents").select("doc_id", "source", "text"),
        col("doc_id"), frac)
        .select("doc_id", "source")
    }, Some("""SELECT doc_id, source FROM documents
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
            / 4294967296.0 < (length(source) % 3 + 1) * CAST(0.2 AS DOUBLE)""")),

    // Per-source percentile gate: keep docs at or above the 75th percent-rank
    // of token count within their source (ties pinned by doc_id) — the
    // "top X% per source" curation step as one window per stratum.
    ("q62_percentile_gate", (s: SparkSession, d: String) => {
      val base = t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          size(TextStats.tokens(col("text"))).as("n_tokens"))
      graft.llm.Sampling.percentileGate(base, "source",
        col("n_tokens"), col("doc_id"), 0.75)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          round(col("pr"), 6).as("pr"))
    }, Some("""WITH b AS (SELECT doc_id, source,
        CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS INTEGER) AS n_tokens
        FROM documents),
      r AS (SELECT doc_id, source, n_tokens,
        percent_rank() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS pr
        FROM b)
      SELECT doc_id, source, n_tokens, round(pr, 6) AS pr FROM r WHERE pr >= 0.75""")),

    // Multi-probe sign-LSH near-dup pairs: probing every distance-1 bucket is
    // EXACTLY "bucket Hamming <= 1", so the oracle is the all-pairs filter on
    // that predicate — a closed-form differential check of the probe
    // machinery (q28 is the single-bucket = distance-0 special case).
    ("q63_multiprobe_pairs", (s: SparkSession, d: String) => {
      Dedup.embeddingPairsMultiProbe(t(s, d, "embeddings"), "embedding", "vec_id",
        signBits = 4, threshold = 0.3)
    }, Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      b AS (SELECT vec_id, v,
        list_sum(list_transform(range(1, 5), i -> CASE WHEN v[i] > 0 THEN CAST(power(2, 4 - i) AS BIGINT) ELSE 0 END)) AS bucket
        FROM e)
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
        round(list_cosine_similarity(a.v, b2.v), 6) AS cosine
      FROM b a JOIN b b2 ON a.vec_id < b2.vec_id
        AND bit_count(xor(a.bucket, b2.bucket)) <= 1
      WHERE round(list_cosine_similarity(a.v, b2.v), 6) >= 0.3""")),

    // PIVOT: long -> wide with explicit pivot values (explicit so the output
    // schema is static — a dynamic pivot would need a pre-scan). The oracle
    // is the engine-neutral CASE-sum formulation.
    ("q64_pivot", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnsRenamed(Map("click" -> "n_click", "view" -> "n_view",
          "purchase" -> "n_purchase"))
    }, Some("""SELECT user_id,
      count(*) FILTER (WHERE event_type = 'click') AS n_click,
      count(*) FILTER (WHERE event_type = 'view') AS n_view,
      count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
      FROM events GROUP BY user_id""")),

    // UNPIVOT: wide -> long (Dataset.unpivot / melt); oracle is UNION ALL.
    ("q65_unpivot", (s: SparkSession, d: String) => {
      t(s, d, "lineitem").filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")
    }, Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
        FROM lineitem WHERE l_orderkey < 100
      UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        FROM lineitem WHERE l_orderkey < 100
      UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem WHERE l_orderkey < 100""")),

    // Window-function suite: lag/lead/ntile/cume_dist/running first+last in
    // one pass over each user's event-time order.
    ("q66_window_suite", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, d, "events").select(
        col("event_id"), col("user_id"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        ntile(4).over(w).as("quartile"),
        round(cume_dist().over(w), 6).as("cd"),
        first(col("event_id")).over(w).as("first_event"),
        last(col("event_id")).over(w).as("last_event"))
    }, Some(s"""SELECT event_id, user_id,
      lag(value, 1) OVER w AS prev_value,
      lead(value, 1) OVER w AS next_value,
      CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      round(cume_dist() OVER w, 6) AS cd,
      first_value(event_id) OVER w AS first_event,
      last_value(event_id) OVER w AS last_event
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY $tsUs, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")),

    // Time-series gap fill: hour spine x keys, missing hours as zero rows
    // ("no row" and "zero events" are different facts). The spine is
    // sequence-exploded from one bounds row; only the aggregated counts join
    // against it.
    ("q67_gap_fill", (s: SparkSession, d: String) => {
      graft.ops.TemporalJoin.hourlyGapFill(
        t(s, d, "events").filter(col("user_id") < 5), "ts", "event_type")
    }, Some("""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM events WHERE user_id < 5),
      hourly AS (SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
        FROM e GROUP BY 1, 2),
      spine AS (SELECT unnest(generate_series(
          (SELECT date_trunc('hour', min(ts)) FROM e),
          (SELECT date_trunc('hour', max(ts)) FROM e),
          INTERVAL 1 HOUR)) AS hour),
      keys AS (SELECT DISTINCT event_type FROM e)
      SELECT s.hour, k.event_type, coalesce(h.n, 0) AS n
      FROM spine s CROSS JOIN keys k
      LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = k.event_type""")),

    // Explicit GROUPING SETS (the general form rollup/cube specialize):
    // disjoint per-dimension totals + grand total in one Expand pass. Both
    // grouping columns are non-null in the data, so NULL markers are
    // unambiguous.
    ("q68_grouping_sets", (s: SparkSession, d: String) => {
      t(s, d, "orders").createOrReplaceTempView("v_orders_gs")
      s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
    }, Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")),

    // Date/time function suite: weekday (aligned to Spark's 1=Sunday),
    // quarter, ISO week, day diff, month-end, clamped month addition.
    ("q69_date_funcs", (s: SparkSession, d: String) => {
      t(s, d, "orders").filter(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"),
          dayofweek(col("o_orderdate")).as("dow"),
          quarter(col("o_orderdate")).as("qtr"),
          weekofyear(col("o_orderdate")).as("woy"),
          datediff(lit("1998-12-31").cast("date"), col("o_orderdate")).as("days_to_end"),
          // DATE results go out as timestamps: the dump/compare pipeline is
          // µs-timestamp-canonical (pandas reads parquet DATE as object)
          last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
          add_months(col("o_orderdate"), 3).cast("timestamp").as("plus3m"))
    }, Some("""SELECT o_orderkey,
      CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
      CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
      CAST(weekofyear(o_orderdate) AS INTEGER) AS woy,
      CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INTEGER) AS days_to_end,
      CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
      CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP) AS plus3m
      FROM orders WHERE o_orderkey < 2000""")),

    // RANGE window frame over event-time seconds: each event's trailing
    // 1-hour running aggregate per user — value-based frames are what ROWS
    // frames can't express when event spacing is irregular.
    ("q70_range_frame", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_timestamp(col("ts")))
        .rangeBetween(-3600L, 0L)
      t(s, d, "events").filter(col("user_id") < 20)
        .select(col("event_id"), col("user_id"), col("ts"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast("decimal(18,6)")).over(w)
            .cast("double").as("sum_1h"))
    }, Some(s"""SELECT event_id, user_id, $tsUs AS ts,
      count(*) OVER w AS n_1h,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
      FROM events WHERE user_id < 20
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us($tsUs) // 1000000
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""")),

    // Higher-order array functions as a surfaced operator: transform /
    // filter / aggregate / zip_with / sort over the token array, mirrored by
    // DuckDB's list_* family.
    ("q71_array_hof", (s: SparkSession, d: String) => {
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
        .select(
          col("doc_id"),
          transform(col("toks"), t => length(t)).as("lens"),
          size(filter(col("toks"), t => length(t) > 5)).as("n_long"),
          aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).as("total_chars"),
          array_join(slice(array_sort(col("toks")), 1, 3), ",").as("first3_sorted"))
        .select(col("doc_id"),
          aggregate(col("lens"), lit(0L), (a, x) => a + x).as("len_sum"),
          col("n_long"), col("total_chars"), col("first3_sorted"))
    }, Some("""WITH b AS (SELECT doc_id,
        list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        FROM documents WHERE doc_id < 200)
      SELECT doc_id,
        CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS len_sum,
        CAST(len(list_filter(toks, t -> length(t) > 5)) AS INTEGER) AS n_long,
        CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS total_chars,
        array_to_string(list_sort(toks)[1:3], ',') AS first3_sorted
      FROM b""")),

    // BM25 keyword retrieval on an INVERTED-INDEX join: candidates come from
    // the postings-equi-join on term (|postings of query terms|, never
    // |corpus|), corpus stats ride a broadcast one-row aggregate. The oracle
    // replays postings, df, dl, and the exact scoring expression tree; the
    // idf is rounded at source (ln is the one libm kernel), the rest is
    // correctly-rounded IEEE arithmetic identical in both engines.
    ("q72_bm25", (s: SparkSession, d: String) => {
      import s.implicits._
      val qs = Retrieval.sampleQueries.toDF("query_id", "qtext")
      Retrieval.bm25TopK(t(s, d, "documents"), "doc_id", "text",
        qs, "query_id", "qtext", k = 10)
    }, Some(s"""WITH $bm25CoreSql,
      rk AS (SELECT query_id, doc_id, score,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id) AS INTEGER) AS rank
        FROM pd)
      SELECT query_id, doc_id, score, rank FROM rk WHERE rank <= 10""")),

    // Full-row set operations (SURVEY §2.6): INTERSECT / EXCEPT / UNION
    // DISTINCT over two overlapping projections, tagged per branch.
    ("q73_set_ops", (s: SparkSession, d: String) => {
      val base = t(s, d, "orders").select("o_orderkey", "o_orderstatus")
      val a = base.filter(col("o_orderkey") < 2000)
      val b = base.filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 3000)
      a.intersect(b).withColumn("op", lit("intersect"))
        .unionByName(a.except(b).withColumn("op", lit("except")))
        .unionByName(a.union(b).distinct().withColumn("op", lit("union")))
    }, Some("""WITH a AS (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey < 2000),
      b AS (SELECT o_orderkey, o_orderstatus FROM orders
        WHERE o_orderkey >= 1000 AND o_orderkey < 3000)
      SELECT o_orderkey, o_orderstatus, 'intersect' AS op FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      UNION ALL
      SELECT o_orderkey, o_orderstatus, 'except' AS op FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      UNION ALL
      SELECT o_orderkey, o_orderstatus, 'union' AS op FROM (SELECT * FROM a UNION SELECT * FROM b)""")),

    // String function suite (§2.7 surface): pad/translate/split/position/
    // reverse/repeat/concat_ws/substring/trim, DuckDB-mirrored with the
    // BIGINT->INTEGER casts the compare requires.
    ("q74_string_funcs", (s: SparkSession, d: String) => {
      t(s, d, "part").filter(col("p_partkey") <= 500)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lpad(col("p_brand"), 12, "*").as("lp"),
          rpad(col("p_brand"), 12, "#").as("rp"),
          translate(col("p_type"), "aeiou", "AEIOU").as("tr"),
          regexp_replace(col("p_name"), " ", "_").as("und"),
          instr(col("p_name"), "o").as("pos_o"),
          element_at(split(col("p_name"), " "), 1).as("first_word"),
          reverse(col("p_brand")).as("rev"),
          expr("repeat('x', p_size % 5)").as("rep"),
          length(col("p_name")).as("len_n"),
          ascii(col("p_type")).as("asc"),
          concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
          substring(col("p_name"), 3, 8).as("sub"),
          ltrim(rtrim(concat(lit("  "), col("p_name"), lit("  ")))).as("trimmed"))
    }, Some("""SELECT p_partkey,
      upper(p_name) AS up,
      lpad(p_brand, 12, '*') AS lp,
      rpad(p_brand, 12, '#') AS rp,
      translate(p_type, 'aeiou', 'AEIOU') AS tr,
      regexp_replace(p_name, ' ', '_', 'g') AS und,
      CAST(instr(p_name, 'o') AS INTEGER) AS pos_o,
      string_split(p_name, ' ')[1] AS first_word,
      reverse(p_brand) AS rev,
      repeat('x', p_size % 5) AS rep,
      CAST(length(p_name) AS INTEGER) AS len_n,
      CAST(ascii(p_type) AS INTEGER) AS asc,
      concat_ws('|', p_brand, p_type) AS cw,
      substring(p_name, 3, 8) AS sub,
      ltrim(rtrim('  ' || p_name || '  ')) AS trimmed
      FROM part WHERE p_partkey <= 500""")),

    // Math / bit function suite (§2.7): only IEEE-correctly-rounded kernels
    // (abs, sqrt, integer pow, mod, bit ops) — no libm-boundary functions,
    // and no round() on data-dependent doubles (half-up vs binary-value
    // rounding differs exactly at representation boundaries).
    ("q75_math_funcs", (s: SparkSession, d: String) => {
      t(s, d, "lineitem").filter(col("l_orderkey") < 500)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - lit(0.05)).as("ad"),
          ceil(col("l_extendedprice")).as("ce"),
          floor(col("l_extendedprice")).as("fl"),
          signum(col("l_discount") - lit(0.05)).as("sg"),
          sqrt(col("l_quantity")).as("sq"),
          pmod(col("l_orderkey"), lit(7)).as("md"),
          col("l_orderkey").bitwiseAND(lit(255L)).as("ba"),
          col("l_orderkey").bitwiseXOR(col("l_partkey")).as("bx"),
          shiftleft(col("l_linenumber"), 3).as("sl"),
          pow(col("l_linenumber"), 2).as("pw"),
          greatest(col("l_tax"), col("l_discount")).as("gr"),
          least(col("l_tax"), col("l_discount")).as("le"))
    }, Some("""SELECT l_orderkey, l_linenumber,
      abs(l_discount - 0.05) AS ad,
      CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
      CAST(floor(l_extendedprice) AS BIGINT) AS fl,
      CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
      sqrt(l_quantity) AS sq,
      l_orderkey % 7 AS md,
      l_orderkey & 255 AS ba,
      xor(l_orderkey, l_partkey) AS bx,
      l_linenumber << 3 AS sl,
      power(l_linenumber, 2) AS pw,
      greatest(l_tax, l_discount) AS gr,
      least(l_tax, l_discount) AS le
      FROM lineitem WHERE l_orderkey < 500""")),

    // Join-type suite: inner / left / full outer / semi / anti over the
    // same key-overlapping pair (each side keeps rows the other lacks),
    // outputs normalized to one schema and tagged per type.
    ("q76_join_types", (s: SparkSession, d: String) => {
      val a = t(s, d, "customer").filter(col("c_custkey") < 1000)
        .select(col("c_custkey").as("k"), col("c_name"))
      val b = t(s, d, "orders")
        .filter(col("o_custkey") >= 500 && col("o_custkey") < 1500)
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_orders"))
      val inner = a.join(b, Seq("k")).withColumn("jt", lit("inner"))
      val left = a.join(b, Seq("k"), "left").withColumn("jt", lit("left"))
      val full = a.join(b, Seq("k"), "full").withColumn("jt", lit("full"))
      val semi = a.join(b, Seq("k"), "left_semi")
        .withColumn("n_orders", lit(null).cast("long")).withColumn("jt", lit("semi"))
      val anti = a.join(b, Seq("k"), "left_anti")
        .withColumn("n_orders", lit(null).cast("long")).withColumn("jt", lit("anti"))
      inner.unionByName(left).unionByName(full).unionByName(semi).unionByName(anti)
        .select("k", "c_name", "n_orders", "jt")
    }, Some("""WITH a AS (SELECT c_custkey AS k, c_name FROM customer WHERE c_custkey < 1000),
      b AS (SELECT o_custkey AS k, count(*) AS n_orders FROM orders
        WHERE o_custkey >= 500 AND o_custkey < 1500 GROUP BY o_custkey)
      SELECT a.k, c_name, n_orders, 'inner' AS jt FROM a JOIN b USING (k)
      UNION ALL SELECT a.k, c_name, n_orders, 'left' AS jt FROM a LEFT JOIN b USING (k)
      UNION ALL SELECT COALESCE(a.k, b.k) AS k, c_name, n_orders, 'full' AS jt
        FROM a FULL OUTER JOIN b USING (k)
      UNION ALL SELECT k, c_name, NULL::BIGINT AS n_orders, 'semi' AS jt
        FROM a WHERE k IN (SELECT k FROM b)
      UNION ALL SELECT k, c_name, NULL::BIGINT AS n_orders, 'anti' AS jt
        FROM a WHERE k NOT IN (SELECT k FROM b)""")),

    // Null-handling suite: nullif / coalesce / null-safe equality /
    // three-valued IS NULL, over nulls manufactured in-query (the TPC-H
    // fixtures carry none).
    ("q77_null_funcs", (s: SparkSession, d: String) => {
      t(s, d, "orders").filter(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("ns"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("co"),
          nullif(col("o_orderstatus"), lit("O"))
            .eqNullSafe(nullif(col("o_orderpriority"), lit("1-URGENT"))).as("nse"),
          nullif(col("o_orderstatus"), lit("O")).isNull.as("is_n"),
          when(col("o_orderstatus") === "F", col("o_totalprice")).as("price_f"))
    }, Some("""SELECT o_orderkey,
      nullif(o_orderstatus, 'O') AS ns,
      coalesce(nullif(o_orderstatus, 'O'), 'open') AS co,
      nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM nullif(o_orderpriority, '1-URGENT') AS nse,
      nullif(o_orderstatus, 'O') IS NULL AS is_n,
      CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS price_f
      FROM orders WHERE o_orderkey < 2000""")),

    // Approximate-distinct sketch gated within tolerance: HLL++ is
    // deterministic given the data (no RNG), but its estimate is engine-
    // specific — so the ORACLED value is the tolerance gate, not the
    // estimate. Default rsd 5%; gate at 15% (3 sigma).
    ("q78_sketch_gate", (s: SparkSession, d: String) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey")).as("approx"),
          countDistinct(col("l_orderkey")).as("exact"))
        .select(col("l_returnflag"),
          (abs(col("approx") - col("exact")).cast("double") / col("exact") <= 0.15)
            .as("within_tol"))
    }, Some("""SELECT l_returnflag, true AS within_tol
      FROM lineitem GROUP BY l_returnflag""")),

    // Training-data text cleaning: PII/URL redaction + whitespace collapse,
    // pure per-row regex fused into the scan (zero shuffle — the 100 TB
    // shape for scrubbing). PII is manufactured in-query: the fixture
    // corpus carries none. Patterns are RE2-safe so Java and DuckDB agree.
    ("q79_clean_text", (s: SparkSession, d: String) => {
      t(s, d, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id"),
          concat(lit("Contact: user"), col("doc_id"),
            lit("@example.com visit https://ex.com/p?q=1 or call 555-0100  "),
            col("text")).as("raw"))
        .select(col("doc_id"),
          regexp_count(col("raw"), lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))
            .as("n_emails"),
          regexp_replace(trim(regexp_replace(regexp_replace(regexp_replace(col("raw"),
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
            "https?://\\S+", "<URL>"),
            "\\b[0-9]{3}-[0-9]{4}\\b", "<PHONE>")), "\\s+", " ").as("clean"))
    }, Some("""SELECT doc_id,
      CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
      regexp_replace(trim(regexp_replace(regexp_replace(regexp_replace(raw,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        'https?://\S+', '<URL>', 'g'),
        '\b[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g')), '\s+', ' ', 'g') AS clean
      FROM (SELECT doc_id,
        'Contact: user' || doc_id || '@example.com visit https://ex.com/p?q=1 or call 555-0100  ' || text AS raw
        FROM documents WHERE doc_id < 1000)""")),

    // Train/eval contamination check: per eval doc, the fraction of its
    // distinct word 3-grams present anywhere in the train split. Candidate
    // generation is a keyed LEFT join on the gram — |eval grams| probe rows
    // against a distinct train-gram set, never |eval|x|train|.
    ("q80_contamination", (s: SparkSession, d: String) => {
      // The minhash shingle-base pattern: tokens materialized in their OWN
      // projection (the wordShingles one-shot form re-tokenizes per lambda
      // element — measured 5.7s vs 0.6s on this query), then persisted at
      // the array stage so both splits read one materialization and
      // CollapseProject can't re-inline the tokenizer into the lambda.
      val sh = t(s, d, "documents")
        .select(col("doc_id"),
          graft.llm.TextStats.tokens(Dedup.normalize(col("text"))).as("w"))
        .select(col("doc_id"), Dedup.shinglesFromTokens(col("w"), 3).as("gs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        .select(col("doc_id"), explode(col("gs")).as("g"))
      val evalSh = sh.filter(col("doc_id") % 20 === 0)
      val trainG = sh.filter(col("doc_id") % 20 =!= 0).select("g").distinct()
      evalSh.join(trainG.withColumn("hit", lit(1)), Seq("g"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
        .select(col("doc_id"), col("n_grams"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_grams"), 6).as("contamination"))
    }, Some("""WITH dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w FROM documents),
      sh AS (SELECT doc_id, CASE WHEN len(w) >= 3
          THEN list_distinct(list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))
          ELSE [coalesce(array_to_string(w, ' '), '')] END AS g FROM dd),
      ex AS (SELECT doc_id, unnest(g) AS g FROM sh WHERE doc_id % 20 = 0),
      tr AS (SELECT DISTINCT unnest(g) AS g FROM sh WHERE doc_id % 20 <> 0),
      j AS (SELECT ex.doc_id, tr.g AS hit FROM ex LEFT JOIN tr ON ex.g = tr.g)
      SELECT doc_id, count(*) AS n_grams, count(hit) AS n_hit,
        round(CAST(count(hit) AS DOUBLE) / count(*), 6) AS contamination
      FROM j GROUP BY doc_id""")),

    // Gopher/C4-style repetition + quality signals, all per-row expressions
    // fused into the scan (zero shuffle — the right shape for corpus-wide
    // filtering). Ratios are int/int double divisions: correctly-rounded
    // IEEE, bit-identical cross-engine, no rounding needed.
    ("q81_rep_signals", (s: SparkSession, d: String) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          TextStats.tokens(Dedup.normalize(col("text"))).as("w"))
        .select(col("doc_id"), col("w"),
          Dedup.shinglesFromTokens(col("w"), 2).as("sh2"),
          size(col("w")).as("n"))
        .select(
          col("doc_id"), col("n"),
          (lit(1.0) - size(array_distinct(col("w"))).cast("double")
            / greatest(col("n"), lit(1))).as("dup_word_frac"),
          when(col("n") >= 2,
            lit(1.0) - size(col("sh2")).cast("double") / (col("n") - 1))
            .otherwise(lit(0.0)).as("dup_2gram_frac"),
          array_max(transform(col("w"), t => length(t))).as("max_word_len"),
          (size(filter(col("w"),
            t => t.isin(TextStats.stopwords("en"): _*))).cast("double")
            / greatest(col("n"), lit(1))).as("stop_frac"))
        .withColumn("keep",
          col("n") >= 20 && col("dup_2gram_frac") <= 0.5 &&
            col("max_word_len") <= 20 && col("stop_frac") >= 0.01)
    }, Some("""WITH b AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w FROM documents),
      c AS (SELECT doc_id, w, CAST(len(w) AS INTEGER) AS n,
        CASE WHEN len(w) >= 2
          THEN list_distinct(list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' ')))
          ELSE [coalesce(array_to_string(w, ' '), '')] END AS sh2
        FROM b),
      sig AS (SELECT doc_id, n,
        1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / greatest(n, 1) AS dup_word_frac,
        CASE WHEN n >= 2 THEN 1.0 - CAST(len(sh2) AS DOUBLE) / (n - 1) ELSE 0.0 END AS dup_2gram_frac,
        CAST(list_max(list_transform(w, t -> length(t))) AS INTEGER) AS max_word_len,
        CAST(len(list_filter(w, t -> t IN ('the','and','of','to','a','in','is','it','you','that'))) AS DOUBLE)
          / greatest(n, 1) AS stop_frac
        FROM c)
      SELECT doc_id, n, dup_word_frac, dup_2gram_frac, max_word_len, stop_frac,
        (n >= 20 AND dup_2gram_frac <= 0.5 AND max_word_len <= 20
          AND stop_frac >= 0.01) AS keep
      FROM sig""")),

    // Mixture sampling to a per-source token budget (the "data mixing"
    // stage): rates derived from corpus stats (one broadcast row per
    // source), applied via the deterministic md5-threshold predicate — no
    // RNG state, same sample on every engine and every run.
    ("q82_mixture_sample", (s: SparkSession, d: String) => {
      // the tokenized projection feeds BOTH the rates aggregation and the
      // probe side — persisted so the whitespace tokenization runs once
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          TextStats.tokenCount(col("text")).as("n_tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val rates = docs.groupBy("source").agg(sum(col("n_tok")).as("tot"))
        .select(col("source"), least(lit(1.0), lit(3000.0) / col("tot")).as("rate"))
      graft.llm.Sampling.deterministicSample(
          docs.join(broadcast(rates), Seq("source")), col("doc_id"), col("rate"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    }, Some("""WITH dc AS (SELECT doc_id, source,
        CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS INTEGER) AS n_tok
        FROM documents),
      rates AS (SELECT source,
        least(CAST(1.0 AS DOUBLE), CAST(3000.0 AS DOUBLE) / CAST(sum(n_tok) AS BIGINT)) AS rate
        FROM dc GROUP BY source),
      sampled AS (SELECT dc.* FROM dc JOIN rates USING (source)
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
              / 4294967296.0 < rate)
      SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM sampled GROUP BY source""")),

    // Data profiling (the lake-side "what is in this table" pass): per-column
    // non-null count, exact distinct count, min/max — long format, one row
    // per profiled column. min/max stringified only for types whose string
    // form is engine-identical (integers and strings; doubles/timestamps
    // format differently across engines).
    ("q83_profile", (s: SparkSession, d: String) => {
      // One aggregate branch PER COLUMN, unioned. Counter-intuitively this
      // beats a fused single aggregate: parquet column pruning makes each
      // branch scan exactly one column (4 one-column scans = the bytes of
      // one 4-column scan), while N countDistinct in one agg forces an
      // N-way Expand of every row before the shuffle (measured 2.3s vs
      // 0.9s at sf0.1).
      val o = t(s, d, "orders")
      def statsFor(c: String) = o.agg(
        count(col(c)).as("n_nonnull"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_v"),
        max(col(c)).cast("string").as("max_v"))
        .select(lit(c).as("col_name"), col("n_nonnull"), col("n_distinct"),
          col("min_v"), col("max_v"))
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        .map(statsFor).reduce(_ unionByName _)
    }, Some("""SELECT 'o_orderkey' AS col_name, count(o_orderkey) AS n_nonnull,
        count(DISTINCT o_orderkey) AS n_distinct,
        CAST(min(o_orderkey) AS VARCHAR) AS min_v, CAST(max(o_orderkey) AS VARCHAR) AS max_v
      FROM orders
      UNION ALL SELECT 'o_custkey', count(o_custkey), count(DISTINCT o_custkey),
        CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders
      UNION ALL SELECT 'o_orderstatus', count(o_orderstatus), count(DISTINCT o_orderstatus),
        min(o_orderstatus), max(o_orderstatus) FROM orders
      UNION ALL SELECT 'o_orderpriority', count(o_orderpriority), count(DISTINCT o_orderpriority),
        min(o_orderpriority), max(o_orderpriority) FROM orders""")),

    // Typed Aggregator (Dataset-API custom aggregation; see
    // functions.LongSummary): exact integer state, so the udaf column equals
    // plain count/sum/min/max in any engine.
    ("q84_typed_agg", (s: SparkSession, d: String) => {
      val summary = udaf(graft.functions.LongSummary)
      t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
        .groupBy("l_returnflag")
        .agg(summary(col("q")).as("s"))
        .select(col("l_returnflag"), col("s.n").as("n"), col("s.sum").as("sum_q"),
          col("s.mn").as("min_q"), col("s.mx").as("max_q"))
    }, Some("""SELECT l_returnflag, count(*) AS n,
      CAST(sum(CAST(trunc(l_quantity) AS BIGINT)) AS BIGINT) AS sum_q,
      CAST(min(CAST(trunc(l_quantity) AS BIGINT)) AS BIGINT) AS min_q,
      CAST(max(CAST(trunc(l_quantity) AS BIGINT)) AS BIGINT) AS max_q
      FROM lineitem GROUP BY l_returnflag""")),

    // Sequence packing (llm/Packing): per-group first-fit-decreasing, with
    // the group id md5-derived so the pass is engine-portable — the oracle
    // replays the ENTIRE pack assignment (not just invariants) via
    // list_reduce with a list-of-bins accumulator (the q22 LCS pattern).
    // list_position on the fits-mask returns 0 (not NULL) on no-fit; reduce
    // is seeded by mapping every doc to its own singleton bin list.
    // Output is exploded to (doc_id, pack) rows so the comparison pins every
    // doc's pack membership, not just pack summaries.
    ("q85_packing", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), TextStats.tokenCount(col("text")).as("n_tok"))
      graft.llm.Packing.packGreedy(docs, "doc_id", "n_tok",
          maxTokens = 512, partitions = 4)
        .select(col("pack_id"), explode(col("doc_ids")).as("doc_id"),
          col("n_docs"), col("total_tokens"))
    }, Some("""WITH d AS (SELECT doc_id AS id,
        CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4 AS pid
        FROM documents),
      g AS (SELECT pid, list({'id': id, 'n': n} ORDER BY n DESC, id) AS xs
        FROM d GROUP BY pid),
      p AS (SELECT pid, list_reduce(
        list_transform(xs, e -> [{'ids': [e.id], 'tot': e.n}]),
        (acc, e) -> CASE WHEN list_position(list_transform(acc, b -> b.tot + e[1].tot <= 512), true) = 0
          THEN list_append(acc, e[1])
          ELSE list_transform(range(1, len(acc) + 1), i ->
            CASE WHEN i = list_position(list_transform(acc, b -> b.tot + e[1].tot <= 512), true)
              THEN {'ids': list_append(acc[i].ids, e[1].ids[1]), 'tot': acc[i].tot + e[1].tot}
              ELSE acc[i] END)
          END) AS bins FROM g),
      bn AS (SELECT pid, UNNEST(list_transform(range(1, len(bins) + 1), i ->
          {'idx': i - 1, 'ids': bins[i].ids, 'tot': bins[i].tot})) AS bin FROM p)
      SELECT pid * 1099511627776 + bin.idx AS pack_id,
        UNNEST(bin.ids) AS doc_id,
        CAST(len(bin.ids) AS INTEGER) AS n_docs,
        bin.tot AS total_tokens
      FROM bn""")),

    // The k-means ASSIGNMENT step in isolation (VERDICT r03 #3 "assignment
    // step oracled"): every corpus vector's trained cell, not just the ones
    // surfacing in q42's top-k — a cell flip anywhere in the index fails
    // this row even when the flipped vector never ranks.
    // NaN convention: assignTo EXCLUDES zero-norm vectors (NaN cosine vs
    // every centroid) rather than letting NaN-ordering pick a cell; the
    // fixture has none, and if one ever appears the oracle diverges as a
    // loud row-count mismatch instead of a silent tie-break dependency.
    ("q86_kmeans_assign", (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      SimSearch.assignCells(emb, SimSearch.trainCentroids(emb, 64, 2), "vec_id")
    }, Some("""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      c0 AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cent
        FROM embeddings WHERE vec_id % 64 = 0),
      a1 AS (SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, t.cent_id AS cell,
          row_number() OVER (PARTITION BY c.vec_id
            ORDER BY round(list_cosine_similarity(c.v, t.cent), 6) DESC, t.cent_id) AS rn
        FROM corp c CROSS JOIN c0 t) WHERE rn = 1),
      c1 AS (SELECT cell AS cent_id, list(m ORDER BY dim) AS cent FROM (
          SELECT cell, dim, floor(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS m
          FROM (SELECT cell, unnest(range(len(v))) AS dim, unnest(v) AS x FROM a1)
          GROUP BY cell, dim) GROUP BY cell),
      a2 AS (SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, t.cent_id AS cell,
          row_number() OVER (PARTITION BY c.vec_id
            ORDER BY round(list_cosine_similarity(c.v, t.cent), 6) DESC, t.cent_id) AS rn
        FROM corp c CROSS JOIN c1 t) WHERE rn = 1),
      c2 AS (SELECT cell AS cent_id, list(m ORDER BY dim) AS cent FROM (
          SELECT cell, dim, floor(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS m
          FROM (SELECT cell, unnest(range(len(v))) AS dim, unnest(v) AS x FROM a2)
          GROUP BY cell, dim) GROUP BY cell)
      SELECT vec_id, cell FROM (
        SELECT c.vec_id, t.cent_id AS cell,
          row_number() OVER (PARTITION BY c.vec_id
            ORDER BY round(list_cosine_similarity(c.v, t.cent), 6) DESC, t.cent_id) AS rn
        FROM corp c CROSS JOIN c2 t) WHERE rn = 1""")),

    // Connected components via alternating large-star/small-star (the
    // O(log diameter) 100 TB path) on the same corpus/pairs as q60, PLUS a
    // planted phantom bridge 0 -- 99999 -- 1 whose middle id is absent from
    // the node set: the contract (matching min-label) is that phantom
    // endpoints neither bridge components nor label them, so the oracle is
    // q60's recursive closure WITHOUT the phantom edges — if the semi-join
    // guard regresses, docs 0 and 1 merge and the hash fails.
    ("q87_components_star", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 60).select("doc_id", "text")
      val corpus = docs.unionByName(docs.select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" extra token")).as("text")))
      val pairs = Dedup.jaccardPairsPrefix(corpus, "text", "doc_id",
        shingleN = 3, threshold = 0.5).select("id_a", "id_b")
      val phantom = s.range(1)
        .select(lit(0L).as("id_a"), lit(99999L).as("id_b"))
        .unionByName(s.range(1).select(lit(99999L).as("id_a"), lit(1L).as("id_b")))
      Dedup.connectedComponentsStar(pairs.unionByName(phantom),
        corpus.select("doc_id"), "doc_id")
    }, Some("""WITH RECURSIVE corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 60
        UNION ALL SELECT doc_id + 10000 AS doc_id, text || ' extra token' AS text
        FROM documents WHERE doc_id < 60),
      dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w FROM corpus),
      sh AS (SELECT doc_id, CASE WHEN len(w) >= 3
          THEN list_distinct(list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))
          ELSE [coalesce(array_to_string(w, ' '), '')] END AS sh FROM dd),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a CROSS JOIN sh b WHERE a.doc_id < b.doc_id
          AND CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.5),
      e AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
      tc AS (SELECT u, v FROM e
        UNION SELECT tc.u, e.v FROM tc JOIN e ON tc.v = e.u)
      SELECT c.doc_id, least(c.doc_id, coalesce(min(tc.v), c.doc_id)) AS comp
      FROM corpus c LEFT JOIN tc ON tc.u = c.doc_id GROUP BY c.doc_id""")),

    // The WHOLE training-data pipeline oracled end to end (VERDICT r05 #7):
    // token gate -> prefix-filtered jaccard pairs -> connected-components
    // dedup (canonical survivors) -> deterministic 80% sample -> FFD
    // sequence packing, on the bounded q60 corpus. The oracle chains the
    // proven q60 (recursive TC), q61 (md5 threshold), and q85 (list_reduce
    // bin packing) fragments — every doc's pack membership is pinned, so a
    // drift ANYWHERE in the chain fails the hash.
    ("q88_pipeline", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 60)
        .select("doc_id", "source", "text")
      val corpus = docs.unionByName(docs.select((col("doc_id") + 10000).as("doc_id"),
        col("source"), concat(col("text"), lit(" extra token")).as("text")))
      val gated = corpus
        .withColumn("n_tokens", TextStats.tokenCount(col("text")))
        .filter(col("n_tokens") >= 5)
      val pairs = Dedup.jaccardPairsPrefix(gated, "text", "doc_id",
        shingleN = 3, threshold = 0.5)
      val surviving = Dedup.nearDupApply(gated, pairs, "doc_id")
      val sampled = graft.llm.Sampling.deterministicSample(surviving, col("doc_id"), lit(0.8))
      graft.llm.Packing.packGreedy(sampled, "doc_id", "n_tokens",
          maxTokens = 512, partitions = 4)
        .select(col("pack_id"), explode(col("doc_ids")).as("doc_id"),
          col("n_docs"), col("total_tokens"))
    }, Some("""WITH RECURSIVE corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 60
        UNION ALL SELECT doc_id + 10000 AS doc_id, text || ' extra token' AS text
        FROM documents WHERE doc_id < 60),
      g AS (SELECT doc_id, text,
        CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n
        FROM corpus
        WHERE len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) >= 5),
      dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w FROM g),
      sh AS (SELECT doc_id, CASE WHEN len(w) >= 3
          THEN list_distinct(list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))
          ELSE [coalesce(array_to_string(w, ' '), '')] END AS sh FROM dd),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a CROSS JOIN sh b WHERE a.doc_id < b.doc_id
          AND CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.5),
      e AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
      tc AS (SELECT u, v FROM e
        UNION SELECT tc.u, e.v FROM tc JOIN e ON tc.v = e.u),
      comp AS (SELECT g.doc_id, least(g.doc_id, coalesce(min(tc.v), g.doc_id)) AS comp
        FROM g LEFT JOIN tc ON tc.u = g.doc_id GROUP BY g.doc_id),
      samp AS (SELECT g.doc_id, g.n FROM g
        JOIN comp ON comp.doc_id = g.doc_id AND comp.doc_id = comp.comp
        WHERE CAST(('0x' || substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
              / 4294967296.0 < CAST(0.8 AS DOUBLE)),
      d AS (SELECT doc_id AS id, n,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4 AS pid
        FROM samp),
      gb AS (SELECT pid, list({'id': id, 'n': n} ORDER BY n DESC, id) AS xs
        FROM d GROUP BY pid),
      pk AS (SELECT pid, list_reduce(
        list_transform(xs, e2 -> [{'ids': [e2.id], 'tot': e2.n}]),
        (acc, e2) -> CASE WHEN list_position(list_transform(acc, b -> b.tot + e2[1].tot <= 512), true) = 0
          THEN list_append(acc, e2[1])
          ELSE list_transform(range(1, len(acc) + 1), i ->
            CASE WHEN i = list_position(list_transform(acc, b -> b.tot + e2[1].tot <= 512), true)
              THEN {'ids': list_append(acc[i].ids, e2[1].ids[1]), 'tot': acc[i].tot + e2[1].tot}
              ELSE acc[i] END)
          END) AS bins FROM gb),
      bn AS (SELECT pid, UNNEST(list_transform(range(1, len(bins) + 1), i ->
          {'idx': i - 1, 'ids': bins[i].ids, 'tot': bins[i].tot})) AS bin FROM pk)
      SELECT pid * 1099511627776 + bin.idx AS pack_id,
        UNNEST(bin.ids) AS doc_id,
        CAST(len(bin.ids) AS INTEGER) AS n_docs,
        bin.tot AS total_tokens
      FROM bn""")),

    // Cross-document boilerplate: trigram document frequency over md5-derived
    // 56-bit gram hashes (slim shuffle rows, engine-portable — the q41/q27
    // hash convention); a gram in >= 3 distinct docs is boilerplate, and each
    // doc reports the position-weighted fraction covered. The curation signal
    // CCNet/RefinedWeb compute over duplicated lines, at shingle granularity.
    ("q89_boilerplate", (s: SparkSession, d: String) => {
      graft.llm.Boilerplate.boilerplateFraction(
        t(s, d, "documents"), "text", "doc_id", n = 3, minDf = 3L)
    }, Some("""WITH dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      b AS (SELECT doc_id, greatest(len(w) - 2, 0) AS ng, w FROM dd),
      g AS (SELECT doc_id,
          ('0x' || substr(md5(array_to_string(w[i:i+2], ' ')), 1, 14))::BIGINT AS gh
        FROM (SELECT doc_id, w, unnest(range(1, ng + 1)) AS i FROM b WHERE ng > 0)),
      dfq AS (SELECT gh FROM (SELECT gh, count(DISTINCT doc_id) AS df FROM g GROUP BY gh)
        WHERE df >= 3),
      fl AS (SELECT g.doc_id, count(*) AS nb FROM g JOIN dfq ON g.gh = dfq.gh
        GROUP BY g.doc_id)
      SELECT b.doc_id, CAST(b.ng AS BIGINT) AS n_grams,
        CAST(coalesce(fl.nb, 0) AS BIGINT) AS n_boiler,
        round(CAST(coalesce(fl.nb, 0) AS DOUBLE) / greatest(b.ng, 1), 6) AS boiler_frac
      FROM b LEFT JOIN fl ON fl.doc_id = b.doc_id""")),

    // Semantic dedup (the SemDeDup recipe): nearest-centroid cells block the
    // candidate pairs, cosine verifies, connected components merge — every
    // vector gets a component label (singletons map to themselves). Centroids
    // here are the stride-64 seed (training itself is oracled by q42/q86);
    // the oracle replays assignment, within-cell pairs, and a recursive
    // transitive closure.
    ("q90_semantic_dedup", (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      Dedup.semanticComponents(emb, SimSearch.seedCentroids(emb, 64),
        "embedding", "vec_id", threshold = 0.25)
    }, Some("""WITH RECURSIVE corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      c0 AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cent
        FROM embeddings WHERE vec_id % 64 = 0),
      asg AS (SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, t.cent_id AS cell,
          row_number() OVER (PARTITION BY c.vec_id
            ORDER BY round(list_cosine_similarity(c.v, t.cent), 6) DESC, t.cent_id) AS rn
        FROM corp c CROSS JOIN c0 t) WHERE rn = 1),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE NOT isnan(list_cosine_similarity(a.v, b.v))
          AND round(list_cosine_similarity(a.v, b.v), 6) >= CAST(0.25 AS DOUBLE)),
      e AS (SELECT id_a AS u, id_b AS v2 FROM p UNION SELECT id_b, id_a FROM p),
      tc AS (SELECT u, v2 FROM e
        UNION SELECT tc.u, e.v2 FROM tc JOIN e ON tc.v2 = e.u)
      SELECT c.vec_id, least(c.vec_id, coalesce(min(tc.v2), c.vec_id)) AS comp
      FROM corp c LEFT JOIN tc ON tc.u = c.vec_id GROUP BY c.vec_id""")),

    // Deterministic shard export: md5-windowed shard assignment (independent
    // bits from the sampling threshold) + full-digest order within the shard
    // — a replayable global shuffle, pinned per doc.
    ("q91_shard_export", (s: SparkSession, d: String) => {
      graft.llm.Shard.assignShards(
        t(s, d, "documents").select("doc_id", "source"), "doc_id", 8)
        .select("doc_id", "source", "shard", "seq")
    }, Some("""WITH h AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS hx
        FROM documents),
      s AS (SELECT doc_id, source, hx,
        ('0x' || substr(hx, 9, 8))::BIGINT % 8 AS shard FROM h)
      SELECT doc_id, source, shard,
        CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) AS BIGINT) AS seq
      FROM s""")),

    // Incremental exact dedup — batch-vs-corpus via the corpus FINGERPRINT
    // table only (the ingest never rescans corpus text). The batch replants
    // 100 corpus texts under new ids; survivors are first-in-batch per fp
    // and absent from the corpus.
    ("q92_incremental_dedup", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val corpusFps = Dedup.exact(docs.filter(col("doc_id") < 300), "text", "doc_id")
        .select("fp")
      val batch = docs.filter(col("doc_id") >= 300).select("doc_id", "text")
        .unionByName(docs.filter(col("doc_id") < 100)
          .select((col("doc_id") + 20000).as("doc_id"), col("text")))
      Dedup.exactIncremental(corpusFps, batch, "text", "doc_id")
    }, Some("""WITH nf AS (SELECT doc_id, text,
        md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp FROM documents),
      corpus AS (SELECT DISTINCT fp FROM nf WHERE doc_id < 300),
      b AS (SELECT doc_id, text, fp FROM nf WHERE doc_id >= 300
            UNION ALL SELECT doc_id + 20000, text, fp FROM nf WHERE doc_id < 100),
      f AS (SELECT doc_id, text, fp,
        row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM b)
      SELECT doc_id, text FROM f
      WHERE rn = 1 AND fp NOT IN (SELECT fp FROM corpus)""")),

    // Feature-based quality classifier: linear model + RATIONAL logistic
    // link (0.5*(1+z/(1+|z|)) — exp() is a libm transcendental whose last
    // ulp differs across engines, a rational link replays bit-identically).
    // Same decision boundary (z=0 -> 0.5) as the true sigmoid.
    ("q93_quality_model", (s: SparkSession, d: String) => {
      val base = t(s, d, "documents").select(col("doc_id"), col("text"),
        TextStats.tokens(lower(col("text"))).as("toks"))
      base.select(col("doc_id"),
          graft.llm.QualityModel.scoreFromTokens(col("text"), col("toks")).as("q_score"))
        .withColumn("keep", col("q_score") >= 0.5)
    }, Some("""WITH tk AS (SELECT doc_id, text,
        list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS w
        FROM documents),
      f AS (SELECT doc_id,
        least(CAST(len(w) AS DOUBLE) / 100.0, 1.0) AS len_score,
        CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
          / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
        CAST(len(list_distinct(w)) AS DOUBLE)
          / greatest(CAST(len(w) AS DOUBLE), 1.0) AS ttr,
        CAST(len(list_filter(w, x -> x IN ('the','and','of','to','a','in','is','it','you','that'))) AS DOUBLE)
          / greatest(CAST(len(w) AS DOUBLE), 1.0) AS stop_ratio
        FROM tk),
      z AS (SELECT doc_id,
        -1.5 + 2.0 * len_score - 3.0 * punct_ratio + 1.5 * ttr + 1.0 * stop_ratio AS z
        FROM f),
      sc AS (SELECT doc_id, round((1.0 + z / (1.0 + abs(z))) * 0.5, 6) AS q_score FROM z)
      SELECT doc_id, q_score, q_score >= CAST(0.5 AS DOUBLE) AS keep FROM sc""")),

    // Cross-corpus MinHash — the near-dup leg of incremental ingest: the
    // batch replants every corpus text (+" extra token") under +10000 ids;
    // candidates are band collisions ACROSS sides only. Same signature CTEs
    // as q27's full replay; the join predicate encodes side membership
    // (disjoint id ranges) instead of id order.
    ("q94_minhash_cross", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val batch = docs.select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" extra token")).as("text"))
      Dedup.minhashPairsCross(docs, batch, "text", "doc_id",
        shingleN = 3, k = 16, bands = 4, threshold = 0.5)
    }, Some("""WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 10000 AS doc_id, text || ' extra token' AS text FROM documents),
      dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w FROM corpus),
      sh AS (SELECT doc_id, CASE WHEN len(w) >= 3
          THEN list_distinct(list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')))
          ELSE [coalesce(array_to_string(w, ' '), '')] END AS sh FROM dd),
      hv AS (SELECT doc_id, sh,
        list_transform(sh, x -> ('0x' || substr(md5(x), 1, 14))::BIGINT) AS h1,
        list_transform(sh, x -> ('0x' || substr(md5(x), 17, 14))::BIGINT) AS h2
        FROM sh),
      sig AS (SELECT doc_id, sh,
        list_transform(range(1, 17), i -> list_min(
          list_transform(range(1, len(h1) + 1), j -> (h1[j] + i * h2[j]) % 1000000007))) AS sig
        FROM hv),
      band AS (SELECT doc_id, sh,
        unnest(list_transform(range(0, 4), b -> CAST(b AS VARCHAR) || '|' ||
          array_to_string(list_transform(sig[b*4+1:b*4+4], x -> CAST(x AS VARCHAR)), ','))) AS band
        FROM sig),
      pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
        FROM band a JOIN band b ON a.band = b.band AND a.doc_id < 10000 AND b.doc_id >= 10000)
      SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5""")),

    // Exact duplicated-substring spans (Lee et al. ACL'22, relationally):
    // every maximal token span covered by 3-grams occurring >= 2 times
    // corpus-wide. The oracle replays the portable gram hash, the
    // occurrence-count filter, and the gaps-and-islands span merge.
    ("q95_substring_spans", (s: SparkSession, d: String) => {
      graft.llm.SubstringDedup.duplicatedSpans(
        t(s, d, "documents"), "text", "doc_id", k = 3, minCount = 2L)
    }, Some("""WITH dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      b AS (SELECT doc_id, w, len(w) - 2 AS ng FROM dd),
      g AS (SELECT doc_id, i, ('0x' || substr(md5(array_to_string(w[i:i+2], ' ')), 1, 14))::BIGINT AS gh
        FROM (SELECT doc_id, w, unnest(range(1, ng + 1)) AS i FROM b WHERE ng > 0)),
      dup AS (SELECT gh FROM (SELECT gh, count(*) AS c FROM g GROUP BY gh) WHERE c >= 2),
      cov AS (SELECT g.doc_id, g.i, g.i + 2 AS e FROM g JOIN dup ON g.gh = dup.gh),
      pe AS (SELECT doc_id, i, e,
          max(e) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        FROM cov),
      isl AS (SELECT doc_id, i, e,
          sum(CASE WHEN prev_end IS NULL OR i > prev_end + 1 THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS isle
        FROM pe)
      SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start, CAST(max(e) AS BIGINT) AS span_end,
        CAST(max(e) - min(i) + 1 AS BIGINT) AS span_tokens
      FROM isl GROUP BY doc_id, isle""")),

    // Per-doc duplication profile over the q95 span set — every doc with its
    // duplicated-token count and fraction, the number curation thresholds on.
    ("q96_dup_profile", (s: SparkSession, d: String) => {
      graft.llm.SubstringDedup.duplicationProfile(
        t(s, d, "documents"), "text", "doc_id", k = 3, minCount = 2L)
    }, Some("""WITH dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      b AS (SELECT doc_id, w, len(w) - 2 AS ng FROM dd),
      g AS (SELECT doc_id, i, ('0x' || substr(md5(array_to_string(w[i:i+2], ' ')), 1, 14))::BIGINT AS gh
        FROM (SELECT doc_id, w, unnest(range(1, ng + 1)) AS i FROM b WHERE ng > 0)),
      dup AS (SELECT gh FROM (SELECT gh, count(*) AS c FROM g GROUP BY gh) WHERE c >= 2),
      cov AS (SELECT g.doc_id, g.i, g.i + 2 AS e FROM g JOIN dup ON g.gh = dup.gh),
      pe AS (SELECT doc_id, i, e,
          max(e) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        FROM cov),
      isl AS (SELECT doc_id, i, e,
          sum(CASE WHEN prev_end IS NULL OR i > prev_end + 1 THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS isle
        FROM pe),
      sp AS (SELECT doc_id, max(e) - min(i) + 1 AS span_tokens FROM isl GROUP BY doc_id, isle),
      dt AS (SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS dup_tokens FROM sp GROUP BY doc_id)
      SELECT dd.doc_id, CAST(len(dd.w) AS BIGINT) AS n_tokens,
        CAST(coalesce(dt.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        round(CAST(coalesce(dt.dup_tokens, 0) AS DOUBLE) / greatest(len(dd.w), 1), 6) AS dup_frac
      FROM dd LEFT JOIN dt ON dd.doc_id = dt.doc_id""")),

    // Unigram-LM scoring (CCNet-style quality leg): add-one-smoothed corpus
    // LM, per-doc average negative log-likelihood. ln rounded to 6 at the
    // source (the q72 convention), decimal-routed sum, round(.,4) average.
    ("q97_lm_score", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val lm = graft.llm.LangModel.unigramLm(docs, "doc_id", "text")
      graft.llm.LangModel.scoreDocs(docs, "doc_id", "text", lm, floorLogp = 0.0)
    }, Some("""WITH dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      tok AS (SELECT doc_id, unnest(w) AS term FROM dd),
      cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
      st AS (SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS n_vocab FROM cnt),
      lm AS (SELECT term,
          round(ln(CAST(c + 1 AS DOUBLE) / CAST(n_total + n_vocab AS DOUBLE)), 6) AS logp
        FROM cnt, st)
      SELECT tok.doc_id, count(*) AS n_tokens,
        floor(CAST(sum(CAST(-lm.logp AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS avg_nll
      FROM tok JOIN lm ON tok.term = lm.term GROUP BY tok.doc_id""")),

    // Sliding-window token chunking (RAG primitive): 32-token windows,
    // stride 24, trailing remainder kept, suffix-only starts dropped.
    ("q98_chunks", (s: SparkSession, d: String) => {
      graft.llm.Chunk.slidingWindow(
        t(s, d, "documents"), "doc_id", "text", chunkSize = 32, stride = 24)
    }, Some("""WITH dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      b AS (SELECT doc_id, w, len(w) AS n FROM dd WHERE len(w) > 0),
      st AS (SELECT doc_id, w, n, unnest(range(1, n + 1, 24)) AS s FROM b)
      SELECT doc_id,
        CAST((s - 1) // 24 AS BIGINT) AS chunk_idx,
        CAST(s AS BIGINT) AS start_tok,
        CAST(least(32, n - s + 1) AS BIGINT) AS n_tok,
        array_to_string(w[s:s+31], ' ') AS chunk_text
      FROM st WHERE s = 1 OR s - 24 + 31 < n""")),

    // Top-200 vocabulary (count desc, term asc — tie-pinned) and per-doc
    // out-of-vocabulary rate over token positions, the fastText-style filter.
    ("q99_oov_profile", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val vb = graft.llm.LangModel.vocab(docs, "doc_id", "text", 200)
      graft.llm.LangModel.oovProfile(docs, "doc_id", "text", vb)
    }, Some("""WITH dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      tok AS (SELECT doc_id, unnest(w) AS term FROM dd),
      cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
      vb AS (SELECT term FROM (
          SELECT term, row_number() OVER (ORDER BY c DESC, term) AS r FROM cnt)
        WHERE r <= 200),
      tot AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY doc_id),
      ov AS (SELECT doc_id, count(*) AS n_oov FROM tok
        WHERE term NOT IN (SELECT term FROM vb) GROUP BY doc_id)
      SELECT tot.doc_id, tot.n_tokens,
        CAST(coalesce(ov.n_oov, 0) AS BIGINT) AS n_oov,
        round(CAST(coalesce(ov.n_oov, 0) AS DOUBLE) / CAST(tot.n_tokens AS DOUBLE), 6) AS oov_frac
      FROM tot LEFT JOIN ov ON tot.doc_id = ov.doc_id""")),

    // =============== link-graph centrality (corpus weighting) =============

    // PageRank over a lineitem-derived directed graph (order bucket -> part
    // bucket; src mod 800 vs dst mod 1000 leaves nodes 800..999 with no
    // out-edges, so dangling-mass redistribution is exercised ON the oracled
    // data, not just in specs). 5 rounds, damping 85%; FIXED-POINT integer
    // arithmetic throughout (see the LinkGraph scaladoc — float rounding
    // lands on exact half-way boundaries at power-of-two degrees and the
    // engines split). The oracle unrolls the iteration as (contribs,
    // dangling, rank) CTE triples. Curation use: Common Crawl-style host
    // centrality as a quality weight.
    ("q100_pagerank", (s: SparkSession, d: String) => {
      val e = t(s, d, "lineitem")
        .filter(col("l_linenumber") === 1) // one edge per order: a sparser,
        // saner-degree graph; the filter reaches the parquet scan
        .select((col("l_orderkey") % 800).as("src"), (col("l_partkey") % 1000).as("dst"))
        .distinct()
      graft.ops.LinkGraph.pageRank(e, iters = 5)
        .select(col("node"), col("rank_units"), col("rank").as("pr"))
    }, Some(pageRankSql(5))),

    // DSIR importance weights (Xie et al. 2023): per-doc log importance of
    // a target slice (sources src0..src4) over the raw corpus, word-bigram
    // occurrences hashed into 1024 buckets (portable md5 56-bit halves).
    // ln rounded to 6 at the source, decimal-routed per-doc sums — see the
    // Importance scaladoc for the broadcast/two-pass scale shape.
    ("q101_dsir_weights", (s: SparkSession, d: String) => {
      graft.llm.Importance.importanceWeights(
        t(s, d, "documents"), "doc_id", "text",
        isTarget = col("source").isin("src0", "src1", "src2", "src3", "src4"),
        nBuckets = 1024, shingleN = 2)
    }, Some("""WITH dd AS (SELECT doc_id, source,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      gr AS (SELECT doc_id, source, unnest(CASE WHEN len(w) >= 2
          THEN list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))
          ELSE [coalesce(array_to_string(w, ' '), '')] END) AS g FROM dd),
      gb AS (SELECT doc_id, source,
          ('0x' || substr(md5(g), 1, 14))::BIGINT % 1024 AS b FROM gr),
      raw AS (SELECT b, count(*) AS cr FROM gb GROUP BY b),
      tgt AS (SELECT b, count(*) AS ct FROM gb
        WHERE source IN ('src0','src1','src2','src3','src4') GROUP BY b),
      nr AS (SELECT count(*) AS n_raw FROM gb),
      nt AS (SELECT count(*) AS n_tgt FROM gb
        WHERE source IN ('src0','src1','src2','src3','src4')),
      lw AS (SELECT raw.b,
          round(ln(CAST(coalesce(tgt.ct, 0) + 1 AS DOUBLE) / CAST(n_tgt + 1024 AS DOUBLE)), 6)
        - round(ln(CAST(raw.cr + 1 AS DOUBLE) / CAST(n_raw + 1024 AS DOUBLE)), 6) AS lw
        FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN nr CROSS JOIN nt)
      SELECT gb.doc_id, count(*) AS n_grams,
        CAST(sum(CAST(lw.lw AS DECIMAL(18,6))) AS DOUBLE) AS logw
      FROM gb JOIN lw ON gb.b = lw.b GROUP BY gb.doc_id""")),

    // BPE tokenizer training, the oracled inner round: adjacent char-pair
    // counts over the DISTINCT word relation weighted by word frequency
    // (the Zipf-bounded shape — corpus size only affects the one
    // tokenize+count pass), top-100 merge candidates tie-pinned
    // (count desc, pair asc). The iterative trainer (BpeTrain.train) is
    // spec-covered; this pins its pair-statistics kernel cross-engine.
    ("q102_bpe_pairs", (s: SparkSession, d: String) => {
      val wf = graft.llm.BpeTrain.wordFreqs(t(s, d, "documents"), "text")
      graft.llm.BpeTrain.topMerges(
        graft.llm.BpeTrain.pairCounts(graft.llm.BpeTrain.charSymbols(wf)), 100)
    }, Some("""WITH dd AS (SELECT
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      tok AS (SELECT unnest(w) AS word FROM dd),
      wf AS (SELECT word, count(*) AS f FROM tok GROUP BY word),
      pr AS (SELECT f, unnest(list_transform(range(1, length(word)),
          i -> substr(word, CAST(i AS INTEGER), 1) || ' ' || substr(word, CAST(i AS INTEGER) + 1, 1))) AS pair
        FROM wf WHERE length(word) >= 2),
      pc AS (SELECT pair, CAST(sum(f) AS BIGINT) AS c FROM pr GROUP BY pair),
      tm AS (SELECT pair, c, row_number() OVER (ORDER BY c DESC, pair) AS rnk FROM pc)
      SELECT pair, c, rnk FROM tm WHERE rnk <= 100""")),

    // Shannon character entropy per doc (Gopher-family low-information
    // filter). Determinism per the charEntropyProfile scaladoc: round-6 ln
    // at source, round-12 terms, decimal(28,12) sums.
    ("q103_char_entropy", (s: SparkSession, d: String) => {
      graft.llm.TextStats.charEntropyProfile(t(s, d, "documents"), "doc_id", "text")
    }, Some("""WITH nd AS (SELECT doc_id,
        regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
      ch AS (SELECT doc_id, unnest(regexp_extract_all(t, '.')) AS ch FROM nd),
      cnt AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch),
      tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY doc_id),
      tm AS (SELECT cnt.doc_id, tot.n,
          round((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
            -round(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6), 12) AS term
        FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id)
      SELECT doc_id, max(n) AS n_chars, count(*) AS n_distinct,
        round(CAST(sum(CAST(term AS DECIMAL(28,12))) AS DOUBLE), 6) AS entropy
      FROM tm GROUP BY doc_id""")),

    // Fill-in-the-middle rewrite (Bavarian et al. 2022) at 50% rate: apply
    // decision and both token-boundary cuts from disjoint md5(doc_id)
    // windows (the q61 uniform-hash convention) — per-row, zero-shuffle,
    // reproducible across engines and reruns.
    ("q104_fim", (s: SparkSession, d: String) => {
      graft.llm.Fim.fimTransform(t(s, d, "documents"), "doc_id", "text", rate = 0.5)
    }, Some("""WITH dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      b AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE) / 4294967296.0 AS u1,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT AS DOUBLE) / 4294967296.0 AS u2,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 8))::BIGINT AS DOUBLE) / 4294967296.0 AS u3
        FROM dd),
      c AS (SELECT doc_id, w, n, u1 < CAST(0.5 AS DOUBLE) AS applied,
          CAST(floor(u2 * CAST(n + 1 AS DOUBLE)) AS BIGINT) AS c1,
          CAST(floor(u3 * CAST(n + 1 AS DOUBLE)) AS BIGINT) AS c2 FROM b),
      sp AS (SELECT doc_id, w, n, applied,
          least(c1, c2) AS lo, greatest(c1, c2) AS hi FROM c)
      SELECT doc_id, applied,
        CASE WHEN applied THEN lo ELSE n END AS n_prefix,
        CASE WHEN applied THEN hi - lo ELSE CAST(0 AS BIGINT) END AS n_middle,
        CASE WHEN applied THEN n - hi ELSE CAST(0 AS BIGINT) END AS n_suffix,
        CASE WHEN applied THEN
          '<PRE>' || coalesce(array_to_string(w[1:lo], ' '), '') ||
          '<SUF>' || coalesce(array_to_string(w[hi+1:n], ' '), '') ||
          '<MID>' || coalesce(array_to_string(w[lo+1:hi], ' '), '')
        ELSE coalesce(array_to_string(w, ' '), '') END AS text_fim
      FROM sp""")),

    // Positional phrase search: consecutive-token matches via per-length
    // positioned m-grams equi-joined against the broadcast phrase table —
    // the exact-slice twin of q72's BM25 (see phraseMatches scaladoc).
    ("q105_phrase_search", (s: SparkSession, d: String) => {
      import s.implicits._
      val ph = Retrieval.samplePhrases.toDF("phrase_id", "ptext")
      Retrieval.phraseMatches(t(s, d, "documents"), "doc_id", "text",
        ph, "phrase_id", "ptext")
    }, Some("""WITH ph(phrase_id, p_text, m) AS (VALUES
        ('p0', 'table table', 2), ('p1', 'scan slow', 2),
        ('p2', 'fast sort key', 3), ('p3', 'window stream sort query', 4)),
      dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      lm AS (SELECT DISTINCT m FROM ph),
      g AS (SELECT doc_id,
          unnest(list_transform(range(1, len(w) - m + 2),
            i -> {'pos': i, 'gram': array_to_string(w[i:i+m-1], ' ')})) AS pg
        FROM dd CROSS JOIN lm WHERE len(w) >= m),
      g2 AS (SELECT doc_id, pg.pos AS pos, pg.gram AS gram FROM g),
      h AS (SELECT ph.phrase_id, g2.doc_id, g2.pos
        FROM g2 JOIN ph ON g2.gram = ph.p_text)
      SELECT phrase_id, doc_id, count(*) AS n_matches,
        CAST(min(pos) AS BIGINT) AS first_pos
      FROM h GROUP BY phrase_id, doc_id""")),

    // Chunk-and-pack block layout (the zero-padding packing scheme, vs
    // q85's no-split FFD bins): 8 deterministic shards, docs concatenated
    // in shard/seq order at n_tokens+1 slots (EOD), sliced into 256-token
    // blocks; output is each doc's token/block placement.
    ("q106_block_layout", (s: SparkSession, d: String) => {
      val sharded = graft.llm.Shard.assignShards(
        t(s, d, "documents")
          .select(col("doc_id"), TextStats.tokenCount(col("text")).as("n_tok")),
        "doc_id", 8)
      graft.llm.Packing.contiguousBlocks(sharded, "doc_id", "n_tok",
        blockSize = 256, eodTokens = 1)
    }, Some("""WITH h AS (SELECT doc_id,
        CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) + 1 AS slots,
        md5(CAST(doc_id AS VARCHAR)) AS hx
        FROM documents),
      sh AS (SELECT doc_id, slots,
        ('0x' || substr(hx, 9, 8))::BIGINT % 8 AS shard,
        CAST(row_number() OVER (PARTITION BY ('0x' || substr(hx, 9, 8))::BIGINT % 8
          ORDER BY hx, doc_id) AS BIGINT) AS seq
        FROM h),
      cm AS (SELECT doc_id, shard, seq, slots,
        sum(slots) OVER (PARTITION BY shard ORDER BY seq) AS cum FROM sh)
      SELECT doc_id, shard, seq,
        CAST(cum - slots AS BIGINT) AS tok_start,
        CAST(cum - 1 AS BIGINT) AS tok_end,
        CAST((cum - slots) // 256 AS BIGINT) AS blk_start,
        CAST((cum - 1) // 256 AS BIGINT) AS blk_end
      FROM cm""")),

    // Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    // 5 docs per source, weight = n_chars, ranked by round(ln(u),6)/w with
    // u = (md5 h32 + 0.5)/2^32 — pow-free, engine-portable, tie-pinned.
    ("q107_weighted_sample", (s: SparkSession, d: String) => {
      graft.llm.Sampling.weightedSampleK(
        t(s, d, "documents").select("doc_id", "source", "n_chars"),
        "source", col("doc_id"), col("n_chars"), k = 5)
        .select("doc_id", "source", "n_chars", "sel_key", "draw")
    }, Some("""WITH b AS (SELECT doc_id, source, n_chars,
        round(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
                  + CAST(0.5 AS DOUBLE)) / 4294967296.0), 6)
          / CAST(n_chars AS DOUBLE) AS sel_key
        FROM documents WHERE n_chars > 0),
      r AS (SELECT doc_id, source, n_chars, sel_key,
        CAST(row_number() OVER (PARTITION BY source ORDER BY sel_key DESC, doc_id) AS BIGINT) AS draw
        FROM b)
      SELECT doc_id, source, n_chars, sel_key, draw FROM r WHERE draw <= 5""")),

    // Image preprocessing plan: aspect-preserving resize + centered
    // letterbox onto 224x224 in PURE integer arithmetic (round-half-up via
    // (2·short·t + long) div (2·long)) — the decode stays the q32 fake, the
    // resize math is the real thing and fuses into the scan (zero shuffle).
    ("q108_resize_plan", (s: SparkSession, d: String) => {
      Multimodal.resizePlan(
        Multimodal.decodeMeta(Multimodal.withPayload(t(s, d, "documents"), "text", "doc_id")),
        target = 224)
        .select("doc_id", "width", "height", "out_w", "out_h", "pad_x", "pad_y")
    }, Some("""WITH m AS (SELECT doc_id,
        CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
        CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS height
        FROM documents),
      r AS (SELECT doc_id, width, height,
        CASE WHEN width >= height THEN 224
             ELSE greatest(1, (2 * width * 224 + height) // (2 * height)) END AS out_w,
        CASE WHEN width >= height THEN greatest(1, (2 * height * 224 + width) // (2 * width))
             ELSE 224 END AS out_h
        FROM m)
      SELECT doc_id,
        CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
        CAST(out_w AS BIGINT) AS out_w, CAST(out_h AS BIGINT) AS out_h,
        CAST((224 - out_w) // 2 AS BIGINT) AS pad_x,
        CAST((224 - out_h) // 2 AS BIGINT) AS pad_y
      FROM r""")),

    // Cross-source quantile normalization (score calibration): each row's
    // within-source percent-rank mapped through the global inverse CDF —
    // calib = G^-1(F_source(score)) — so one threshold gates every source
    // at the same stringency. percentileGate's two-pass pr decomposition +
    // a broadcast distinct-score CDF lookup.
    ("q109_quantile_norm", (s: SparkSession, d: String) => {
      // explicit maxBuckets: the score is a document CHAR LENGTH, whose
      // distinct-value count is bounded by the longest document (~2^21 even
      // at 100 TB), not by corpus size — the default 64k guard would trip
      // on a scale-up of this genuinely bounded score (ADVICE r07)
      graft.llm.Sampling.quantileNormalize(
        t(s, d, "documents").select("doc_id", "source", "n_chars"),
        "source", col("n_chars"), col("doc_id"), maxBuckets = 1L << 21)
    }, Some("""WITH b AS (SELECT doc_id, source, n_chars FROM documents),
      pr AS (SELECT doc_id, source, n_chars,
          CASE WHEN count(*) OVER (PARTITION BY source) = 1 THEN CAST(0 AS DOUBLE)
               ELSE percent_rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id) END AS pr
        FROM b),
      g AS (SELECT n_chars AS calib, count(*) AS cnt FROM b GROUP BY n_chars),
      gi AS (SELECT calib,
          CAST(sum(cnt) OVER (ORDER BY calib) AS DOUBLE) / (SELECT count(*) FROM b) AS cdf
        FROM g)
      SELECT pr.doc_id, pr.source, pr.n_chars, pr.pr, min(gi.calib) AS calib
      FROM pr JOIN gi ON pr.pr <= gi.cdf
      GROUP BY pr.doc_id, pr.source, pr.n_chars, pr.pr""")),

    // Temperature-flattened mixture (alpha = 0.5): keep-rates proportional
    // to sqrt(n_s), applied via the deterministic md5 threshold; output is
    // the per-source audit (rate + realized sample). sqrt is IEEE-exact so
    // only the denominator sum needs the round-6/decimal convention.
    ("q110_temp_mixture", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").select("doc_id", "source")
      val rates = graft.llm.Sampling.temperatureRatesSqrt(docs, "source", targetRows = 100L)
      graft.llm.Sampling.deterministicSample(
          docs.join(broadcast(rates), Seq("source")), col("doc_id"), col("rate"))
        .groupBy("source")
        .agg(max(col("n_s")).as("n_s"), max(col("rate")).as("rate"),
          count(lit(1)).as("n_sampled"))
    }, Some("""WITH c AS (SELECT source, count(*) AS n_s,
        round(sqrt(CAST(count(*) AS DOUBLE)), 6) AS sq
        FROM documents GROUP BY source),
      dn AS (SELECT CAST(sum(CAST(sq AS DECIMAL(18,6))) AS DOUBLE) AS denom FROM c),
      r AS (SELECT source, n_s,
        least(CAST(1.0 AS DOUBLE), 100 * (sq / denom) / CAST(n_s AS DOUBLE)) AS rate
        FROM c CROSS JOIN dn),
      kept AS (SELECT d.doc_id, d.source, r.n_s, r.rate
        FROM documents d JOIN r ON d.source = r.source
        WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
              / 4294967296.0 < r.rate)
      SELECT source, CAST(max(n_s) AS BIGINT) AS n_s, max(rate) AS rate,
        count(*) AS n_sampled
      FROM kept GROUP BY source""")),

    // S15 write-time NOT NULL enforcement (reference: src/create_tables.sql:
    // 2-41): the violations relation a BigQuery insert would reject, tagged
    // with the violated columns — planted nulls over an events-derived batch
    // audited against the warehouse DDL's NOT NULL set (id, place_id,
    // last_updated). Pure per-row predicate; no shuffle.
    ("q113_null_audit", (s: SparkSession, d: String) => {
      val batch = t(s, d, "events").select(
        when(col("event_id") % 97 =!= 0, col("event_id").cast("string")).as("id"),
        when(col("user_id") % 89 =!= 0,
          concat(lit("p"), col("user_id").cast("string"))).as("place_id"),
        when(col("event_id") % 101 =!= 0, col("ts")).as("last_updated"),
        col("value").as("temp_c"))
      val (_, bad) = Integrity.nullAudit(batch, Schemas.weatherFlat)
      bad.withColumn("null_violations", concat_ws(",", col("null_violations")))
    }, Some(s"""WITH b AS (SELECT
        CASE WHEN event_id % 97 <> 0 THEN CAST(event_id AS VARCHAR) END AS id,
        CASE WHEN user_id % 89 <> 0 THEN 'p' || CAST(user_id AS VARCHAR) END AS place_id,
        CASE WHEN event_id % 101 <> 0 THEN $tsUs END AS last_updated,
        value AS temp_c FROM events)
      SELECT id, place_id, last_updated, temp_c,
        concat_ws(',',
          CASE WHEN id IS NULL THEN 'id' END,
          CASE WHEN place_id IS NULL THEN 'place_id' END,
          CASE WHEN last_updated IS NULL THEN 'last_updated' END) AS null_violations
      FROM b WHERE id IS NULL OR place_id IS NULL OR last_updated IS NULL""")),

    // PER-SOURCE quantile normalization onto the cross-source MEAN
    // distribution (Bolstad-style): calib(row) = avg over sources of their
    // inverse CDFs at the row's within-source percent-rank — shifted sources
    // land on one common scale, no pooled-global reference. Per-source CDF
    // windows are source-partitioned (fine-grained); the mean sums through
    // decimal(18,6).
    ("q112_quantile_norm_mean", (s: SparkSession, d: String) => {
      graft.llm.Sampling.quantileNormalizeMean(
        t(s, d, "documents").select("doc_id", "source", "n_chars"),
        "source", col("n_chars"), col("doc_id"), maxBuckets = 1L << 21)
    }, Some("""WITH b AS (SELECT doc_id, source, n_chars FROM documents),
      pr AS (SELECT doc_id, source, n_chars,
          CASE WHEN count(*) OVER (PARTITION BY source) = 1 THEN CAST(0 AS DOUBLE)
               ELSE percent_rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id) END AS pr
        FROM b),
      g AS (SELECT source AS bst, n_chars AS bv, count(*) AS cnt
        FROM b GROUP BY source, n_chars),
      gi AS (SELECT bst, bv,
          CAST(sum(cnt) OVER (PARTITION BY bst ORDER BY bv) AS DOUBLE)
            / CAST(sum(cnt) OVER (PARTITION BY bst) AS DOUBLE) AS cdf
        FROM g),
      vs AS (SELECT pr.doc_id, pr.source, pr.n_chars, pr.pr, gi.bst, min(gi.bv) AS v
        FROM pr JOIN gi ON pr.pr <= gi.cdf
        GROUP BY pr.doc_id, pr.source, pr.n_chars, pr.pr, gi.bst)
      SELECT doc_id, source, n_chars, pr,
        CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS calib
      FROM vs GROUP BY doc_id, source, n_chars, pr""")),

    // BPE ENCODE (the other half of the q102 tokenizer story): train 8
    // merges on the corpus, then tokenize the corpus with the ranked merge
    // list — the fold runs per DISTINCT word and broadcast-joins back to the
    // exploded tokens, so corpus-sized data never sees the merge lambda. The
    // oracle replays train AND encode (unrolled rounds + list_reduce fold).
    ("q111_bpe_encode", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val (merges, _) = graft.llm.BpeTrain.train(docs, "text", rounds = 8)
      graft.llm.BpeTrain.encodeCorpus(docs, "text", "doc_id", merges)
    }, Some(bpeEncodeSql(8))),

    // S15 lake→warehouse SCHEMA-DRIFT audit (VERDICT r08 missing #2): the
    // reference's lake stores raw API JSON schemalessly (reference:
    // README.md:9, src/ingest_weather_data.py:63-66), so an upstream API
    // change surfaces only at promote time — unknown fields silently drop in
    // the flatten, missing ones become nulls. shapeAudit inspects the raw
    // document's key paths against the declared StructType BEFORE from_json
    // erases the evidence. Fixture: deterministic JSON docs built from
    // events with planted drift (extra top-level field, extra nested field,
    // omitted scalar, omitted struct) — identical string construction on
    // both engines, pure per-row audit, zero shuffle.
    ("q114_shape_audit", (s: SparkSession, d: String) => {
      val probe = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("temp_c",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("meta",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("src",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("seq",
              org.apache.spark.sql.types.LongType))))))
      val ev = t(s, d, "events").select(col("event_id"))
      val doc = concat(
        lit("{\"id\":\""), col("event_id").cast("string"), lit("\""),
        when(col("event_id") % 11 =!= 0, lit(",\"temp_c\":1.5")).otherwise(lit("")),
        when(col("event_id") % 19 =!= 0, concat(
          lit(",\"meta\":{\"src\":\"api\""),
          when(col("event_id") % 17 =!= 0,
            concat(lit(",\"seq\":"), col("event_id").cast("string"))).otherwise(lit("")),
          when(col("event_id") % 13 === 0, lit(",\"rogue\":1")).otherwise(lit("")),
          lit("}"))).otherwise(lit("")),
        when(col("event_id") % 7 === 0, lit(",\"uv_index\":9")).otherwise(lit("")),
        lit("}"))
      val (_, drifted) = Integrity.shapeAudit(ev.withColumn("doc", doc), "doc", probe)
      drifted.select(col("event_id"),
        concat_ws(",", array_sort(col("unknown_fields"))).as("unknown_fields"),
        concat_ws(",", array_sort(col("missing_fields"))).as("missing_fields"))
    }, Some("""WITH b AS (SELECT event_id,
        '{"id":"' || CAST(event_id AS VARCHAR) || '"'
        || CASE WHEN event_id % 11 <> 0 THEN ',"temp_c":1.5' ELSE '' END
        || CASE WHEN event_id % 19 <> 0 THEN ',"meta":{"src":"api"'
             || CASE WHEN event_id % 17 <> 0 THEN ',"seq":' || CAST(event_id AS VARCHAR) ELSE '' END
             || CASE WHEN event_id % 13 = 0 THEN ',"rogue":1' ELSE '' END
             || '}' ELSE '' END
        || CASE WHEN event_id % 7 = 0 THEN ',"uv_index":9' ELSE '' END
        || '}' AS doc FROM events),
      a AS (SELECT event_id, list_concat(
          COALESCE(json_keys(doc), []),
          COALESCE([('meta.' || x) FOR x IN json_keys(doc, '$.meta')], [])) AS actual
        FROM b),
      x AS (SELECT event_id,
          list_sort(list_filter(actual,
            x -> NOT list_contains(['id','temp_c','meta','meta.src','meta.seq'], x))) AS unknown,
          list_sort(list_filter(['id','temp_c','meta','meta.src','meta.seq'],
            x -> NOT list_contains(actual, x))) AS missing
        FROM a)
      SELECT event_id,
        COALESCE(array_to_string(unknown, ','), '') AS unknown_fields,
        COALESCE(array_to_string(missing, ','), '') AS missing_fields
      FROM x WHERE len(unknown) > 0 OR len(missing) > 0""")),

    // Corpus-wide duplicate-paragraph removal (Dolma/C4 curation step): keep
    // ONE occurrence of each distinct paragraph, rewrite docs with the
    // survivors. The fixture corpus has no paragraph structure (single-line
    // token streams), so paragraphs are manufactured in-query (the q79
    // convention): each doc = its first 8 words + a shared boilerplate
    // footer (7 distinct footers across the corpus — the repeated-banner
    // case) + its next 8 words, '\n\n'-joined identically on both engines.
    // Exact-duplicate docs in the fixture also exercise the all-paragraphs-
    // lost reassembly leg (clean_text = '').
    ("q115_para_dedup", (s: SparkSession, d: String) => {
      val ws = split(col("text"), " ")
      val built = t(s, d, "documents").select(col("doc_id"),
        concat_ws("\n\n",
          array_join(slice(ws, 1, 8), " "),
          concat(lit("footer boilerplate "), pmod(col("doc_id"), lit(7))),
          array_join(slice(ws, 9, 8), " ")).as("text"))
      graft.llm.ParagraphDedup.dedup(built, "doc_id", "text")
    }, Some("""WITH built AS (SELECT doc_id,
        coalesce(array_to_string(string_split(text, ' ')[1:8], ' '), '') || chr(10) || chr(10)
        || 'footer boilerplate ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) || chr(10)
        || coalesce(array_to_string(string_split(text, ' ')[9:16], ' '), '') AS text
        FROM documents),
      p0 AS (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps FROM built),
      pf AS (SELECT doc_id, pos, para FROM (
          SELECT doc_id, unnest(ps) AS para,
            unnest(range(0, len(ps))) AS pos FROM p0)
        WHERE len(trim(para)) > 0),
      kept AS (SELECT doc_id, pos, para FROM (
          SELECT doc_id, pos, para,
            row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
          FROM pf) WHERE rn = 1),
      tot AS (SELECT doc_id, count(*) AS n_paras FROM pf GROUP BY doc_id),
      ka AS (SELECT doc_id, count(*) AS n_kept,
          array_to_string(list(para ORDER BY pos), chr(10) || chr(10)) AS clean_text
        FROM kept GROUP BY doc_id)
      SELECT tot.doc_id,
        COALESCE(ka.clean_text, '') AS clean_text,
        CAST(tot.n_paras AS BIGINT) AS n_paras,
        CAST(COALESCE(ka.n_kept, 0) AS BIGINT) AS n_kept,
        CAST(tot.n_paras - COALESCE(ka.n_kept, 0) AS BIGINT) AS n_dropped
      FROM tot LEFT JOIN ka ON tot.doc_id = ka.doc_id""")),

    // Mergeable KMV distinct-count sketch (native TypedImperativeAggregate):
    // per-type distinct-user estimate whose state is the k smallest 60-bit
    // portable hashes — unlike q78's HLL tolerance band, the estimate itself
    // is cross-engine EXACT (DuckDB re-derives the k-th smallest hash and
    // the floor'd (k-1)*2^60/kth quotient bit-for-bit). Below k distinct the
    // sketch degrades to the exact count (kth null) — sf0.001 exercises that
    // leg, sf0.01+ the estimator leg.
    ("q116_kmv_distinct", (s: SparkSession, d: String) => {
      val hv = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
      // null users dropped BEFORE grouping (mirrors the oracle's WHERE): a
      // type whose users are all null should be absent, not an empty sketch
      t(s, d, "events").filter(col("user_id").isNotNull)
        .groupBy("event_type")
        .agg(org.apache.spark.sql.graft.KmvColumns.kmvSketch(hv, 64).as("s"))
        .select(col("event_type"), col("s.n_kept").as("n_kept"),
          col("s.kth").as("kth"), col("s.est").as("est"))
    }, Some("""WITH h AS (SELECT DISTINCT event_type,
        ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        FROM events WHERE user_id IS NOT NULL),
      r AS (SELECT event_type, hv,
          row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn FROM h),
      a AS (SELECT event_type, count(*) AS nd FROM h GROUP BY event_type),
      kt AS (SELECT event_type, hv AS kth FROM r WHERE rn = 64)
      SELECT a.event_type,
        CAST(least(a.nd, 64) AS INTEGER) AS n_kept,
        kt.kth AS kth,
        CAST(CASE WHEN a.nd >= 64
          THEN floor(63 * pow(2::DOUBLE, 60) / CAST(kt.kth AS DOUBLE))
          ELSE a.nd END AS BIGINT) AS est
      FROM a LEFT JOIN kt ON a.event_type = kt.event_type""")),

    // Product-quantization ANN (Jégou et al., TPAMI 2011): 8 subspaces × 8
    // dims, per-subspace codebooks (FIXED 16 entries — capped seed, so
    // training is linear in the corpus at any scale) k-means-trained 2
    // Lloyd rounds from the stride-32 seed, corpus stored as 8
    // codes/vector, queries ranked by the ADC distance-table sum. Fully replayed in SQL with `sub` as a
    // DATA column (no per-subspace unroll — one keyed Lloyd pass covers all
    // eight codebooks); sq-L2 is a sequential fold both engines replay,
    // ADC sums route through decimal(18,6) (the dsum rule).
    ("q117_pq_topk", (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      graft.llm.ProductQuant.pqTopK(
        emb.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"), col("embedding")),
        emb, 5, m = 8, dims = 8, centroidStride = 32, trainIters = 2, ks = 16,
        trainSample = 4096)
    }, Some(s"""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      sv AS (SELECT vec_id, s.sub,
          v[CAST(8 * s.sub + 1 AS INTEGER):CAST(8 * s.sub + 8 AS INTEGER)] AS sv
        FROM corp, (SELECT unnest(range(0, 8)) AS sub) s)${pqChainSql("sv")},
      dt AS (SELECT q.vec_id AS query_id, c.sub, c.cid AS code,
          round(${sqSql("q.sv", "c.cv", 8)}, 6) AS d
        FROM (SELECT * FROM sv WHERE vec_id < 8) q JOIN cb2 c ON q.sub = c.sub),
      sc AS (SELECT dt.query_id, e.vec_id,
          CAST(sum(CAST(dt.d AS DECIMAL(18,6))) AS DOUBLE) AS adc
        FROM enc e JOIN dt ON e.sub = dt.sub AND e.code = dt.code
        GROUP BY dt.query_id, e.vec_id),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY adc, vec_id) AS rnk FROM sc)
      SELECT query_id, vec_id, adc, CAST(rnk AS INTEGER) AS rank
      FROM w WHERE rnk <= 5""")),

    // IVF+PQ composite (FAISS IVFPQ, by_residual=false): the q117 code
    // relation pruned by a coarse whole-vector quantizer — 8 cells, queries
    // probe their 2 nearest, ADC scores only probed cells' candidates. The
    // billion-scale resident layout: (cell, 8 codes) per vector, zero raw
    // vectors at query time.
    ("q118_ivfpq_topk", (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      graft.llm.ProductQuant.ivfPqTopK(
        emb.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"), col("embedding")),
        emb, 5, m = 8, dims = 8, centroidStride = 32, trainIters = 2,
        ks = 16, coarseKs = 8, nprobe = 2, trainSample = 4096)
    }, Some(s"""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)${coarseChainSql()},
      sv AS (SELECT vec_id, s.sub,
          v[CAST(8 * s.sub + 1 AS INTEGER):CAST(8 * s.sub + 8 AS INTEGER)] AS sv
        FROM corp, (SELECT unnest(range(0, 8)) AS sub) s)${pqChainSql("sv")},
      dt AS (SELECT q.vec_id AS query_id, c.sub, c.cid AS code,
          round(${sqSql("q.sv", "c.cv", 8)}, 6) AS d
        FROM (SELECT * FROM sv WHERE vec_id < 8) q JOIN cb2 c ON q.sub = c.sub),
      sc AS (SELECT dt.query_id, e.vec_id,
          CAST(sum(CAST(dt.d AS DECIMAL(18,6))) AS DOUBLE) AS adc
        FROM enc e
        JOIN cellasg ce ON e.vec_id = ce.vec_id
        JOIN probe p ON p.cell = ce.cell
        JOIN dt ON e.sub = dt.sub AND e.code = dt.code AND dt.query_id = p.query_id
        GROUP BY dt.query_id, e.vec_id),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY adc, vec_id) AS rnk FROM sc)
      SELECT query_id, vec_id, adc, CAST(rnk AS INTEGER) AS rank
      FROM w WHERE rnk <= 5""")),

    // Interpolated bigram LM scoring (KenLM-lite; the CCNet perplexity leg
    // upgraded from q97's unigram): p(w|v) = 0.75·c(v,w)/c(v·) + 0.25·p_uni,
    // first token by unigram. Fixed weights keep it a pure function of the
    // corpus; all ln's round at the source, sums decimal-route (q97/q72).
    ("q119_bigram_lm", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val (uni, bi) = graft.llm.LangModel.bigramLm(docs, "doc_id", "text")
      graft.llm.LangModel.scoreDocsBigram(docs, "doc_id", "text", uni, bi,
        floorLogp = 0.0)
    }, Some("""WITH dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      tok AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos, unnest(w) AS term FROM dd),
      cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
      st AS (SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS n_vocab FROM cnt),
      u AS (SELECT term,
          round(ln(CAST(c + 1 AS DOUBLE) / CAST(n_total + n_vocab AS DOUBLE)), 6) AS logp_uni,
          round(ln(0.25 * (CAST(c + 1 AS DOUBLE) / CAST(n_total + n_vocab AS DOUBLE))), 6) AS logp_bo
        FROM cnt, st),
      big AS (SELECT doc_id, w[CAST(pos - 1 AS INTEGER)] AS prev,
          w[CAST(pos AS INTEGER)] AS term
        FROM (SELECT doc_id, w, unnest(range(2, len(w) + 1)) AS pos FROM dd)),
      cb AS (SELECT prev, term, count(*) AS cb FROM big GROUP BY prev, term),
      cp AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cp FROM cb GROUP BY prev),
      b AS (SELECT cb.prev, cb.term,
          round(ln(0.75 * (CAST(cb.cb AS DOUBLE) / CAST(cp.cp AS DOUBLE))
            + 0.25 * (CAST(cnt.c + 1 AS DOUBLE) / CAST(st.n_total + st.n_vocab AS DOUBLE))), 6) AS logp_bi
        FROM cb JOIN cp ON cb.prev = cp.prev JOIN cnt ON cb.term = cnt.term, st),
      fr AS (SELECT t.doc_id, -u.logp_uni AS nll
        FROM tok t JOIN u ON t.term = u.term WHERE t.pos = 1),
      br AS (SELECT g.doc_id, -coalesce(b.logp_bi, u.logp_bo) AS nll
        FROM big g LEFT JOIN b ON g.prev = b.prev AND g.term = b.term
        JOIN u ON g.term = u.term),
      allr AS (SELECT * FROM fr UNION ALL SELECT * FROM br)
      SELECT doc_id, count(*) AS n_tokens,
        floor(CAST(sum(CAST(nll AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS avg_nll
      FROM allr GROUP BY doc_id""")),

    // Fixed-budget uniform frame sampling (video-LM preprocessing: 16 frames
    // per clip regardless of length — q32's every-Nth form is unbounded on
    // long clips). total_frames manufactured from the payload (mod 241:
    // exercises the zero-frame, short-clip, and uniform legs); slot i maps
    // to (i·(total-1)) div 15 in pure integer math.
    ("q120_frame_plan", (s: SparkSession, d: String) => {
      val m = Multimodal.decodeMeta(
        Multimodal.withPayload(t(s, d, "documents"), "text", "doc_id"))
        .withColumn("total_frames", pmod(col("n_bytes"), lit(241)))
      Multimodal.uniformFramePlan(m, n = 16, "total_frames")
    }, Some("""WITH m AS (SELECT doc_id,
        CAST(octet_length(encode(text)) % 241 AS BIGINT) AS total FROM documents),
      s AS (SELECT doc_id, total, unnest(range(0, least(total, 16))) AS slot
        FROM m WHERE total > 0)
      SELECT doc_id, CAST(slot AS BIGINT) AS slot,
        CAST(CASE WHEN total <= 16 THEN slot
          ELSE (slot * (total - 1)) // 15 END AS BIGINT) AS frame_idx
      FROM s""")),

    // Count-Min sketch frequency store (Cormode/Muthukrishnan 2005): a 4×1024
    // counter matrix — FIXED size at any corpus scale, merges by addition —
    // point-queried for the exact top-50 terms beside their true counts
    // (c_est >= c_exact always; the overestimate property is the check the
    // test pins). All-integer md5-bucket arithmetic: the oracle replays the
    // entire matrix, no tolerance band.
    ("q121_cms_freq", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val tok = docs.select(explode(
        TextStats.tokens(Dedup.normalize(col("text")))).as("term"))
      val mat = graft.llm.Sketches.cmsMatrix(tok, "term", d = 4, w = 1024)
      val top = graft.llm.LangModel.vocab(docs, "doc_id", "text", 50)
        .select(col("term"), col("c").as("c_exact"))
      top.join(graft.llm.Sketches.cmsEstimate(top.select("term"), mat, "term",
          d = 4, w = 1024), Seq("term"))
        .select(col("term"), col("c_exact"), col("c_est"))
    }, Some("""WITH dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      tok AS (SELECT unnest(w) AS term FROM dd),
      cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
      top AS (SELECT term, c FROM cnt ORDER BY c DESC, term LIMIT 50),
      rr AS (SELECT unnest(range(0, 4)) AS r),
      cells AS (SELECT ('0x' || substr(md5(term), CAST(1 + 8 * rr.r AS INTEGER), 8))::BIGINT % 1024 AS bucket,
          rr.r FROM tok, rr),
      mat AS (SELECT r, bucket, count(*) AS c FROM cells GROUP BY r, bucket),
      cand AS (SELECT t.term, rr.r,
          ('0x' || substr(md5(t.term), CAST(1 + 8 * rr.r AS INTEGER), 8))::BIGINT % 1024 AS bucket
        FROM top t, rr),
      est AS (SELECT cand.term, CAST(min(m.c) AS BIGINT) AS c_est
        FROM cand JOIN mat m ON cand.r = m.r AND cand.bucket = m.bucket
        GROUP BY cand.term)
      SELECT t.term, CAST(t.c AS BIGINT) AS c_exact, e.c_est
      FROM top t JOIN est e ON t.term = e.term""")),

    // Residual-encoded IVFPQ (FAISS default, by_residual=true): PQ trained
    // on (vector − coarse centroid) residuals — finer quantization from the
    // same ks entries; distance tables become per-(query, probed cell).
    // Same coarse CTEs as q118; the PQ leg runs over the residual relation
    // and the ADC join adds the cell key.
    ("q122_ivfpq_residual", (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      graft.llm.ProductQuant.ivfPqResidualTopK(
        emb.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"), col("embedding")),
        emb, 5, m = 8, dims = 8, centroidStride = 32, trainIters = 2,
        ks = 16, coarseKs = 8, nprobe = 2, trainSample = 4096)
    }, Some(s"""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)${coarseChainSql()},
      resid AS (SELECT c.vec_id, a.cell,
          [c.v[CAST(i AS INTEGER)] - t.ccv[CAST(i AS INTEGER)] FOR i IN range(1, 65)] AS rv
        FROM corp c JOIN cellasg a ON c.vec_id = a.vec_id JOIN cc2 t ON a.cell = t.ccid),
      rsv AS (SELECT vec_id, s.sub,
          rv[CAST(8 * s.sub + 1 AS INTEGER):CAST(8 * s.sub + 8 AS INTEGER)] AS sv
        FROM resid, (SELECT unnest(range(0, 8)) AS sub) s)${pqChainSql("rsv")},
      qresid AS (SELECT q.vec_id AS query_id, p.cell,
          [q.v[CAST(i AS INTEGER)] - t.ccv[CAST(i AS INTEGER)] FOR i IN range(1, 65)] AS rv
        FROM (SELECT * FROM corp WHERE vec_id < 8) q
        JOIN probe p ON p.query_id = q.vec_id JOIN cc2 t ON p.cell = t.ccid),
      qrsv AS (SELECT query_id, cell, s.sub,
          rv[CAST(8 * s.sub + 1 AS INTEGER):CAST(8 * s.sub + 8 AS INTEGER)] AS sv
        FROM qresid, (SELECT unnest(range(0, 8)) AS sub) s),
      dt AS (SELECT q.query_id, q.cell, c.sub, c.cid AS code,
          round(${sqSql("q.sv", "c.cv", 8)}, 6) AS d
        FROM qrsv q JOIN cb2 c ON q.sub = c.sub),
      sc AS (SELECT dt.query_id, e.vec_id,
          CAST(sum(CAST(dt.d AS DECIMAL(18,6))) AS DOUBLE) AS adc
        FROM enc e
        JOIN cellasg ce ON e.vec_id = ce.vec_id
        JOIN dt ON dt.cell = ce.cell AND e.sub = dt.sub AND e.code = dt.code
        GROUP BY dt.query_id, e.vec_id),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY adc, vec_id) AS rnk FROM sc)
      SELECT query_id, vec_id, adc, CAST(rnk AS INTEGER) AS rank
      FROM w WHERE rnk <= 5""")),

    // DPR-style hard-negative mining (Karpukhin et al. 2020): gold = the
    // BM25 top-1 passage (the weakly-supervised positive), negatives = the
    // next 8 after excluding the gold and every exact duplicate of its
    // normalized text (the false-negative filter). Exclusion BEFORE the
    // top-k cut; shares the q72 scoring replay via bm25CoreSql.
    ("q123_hard_negatives", (s: SparkSession, d: String) => {
      import s.implicits._
      val qs = Retrieval.sampleQueries.toDF("query_id", "qtext")
      Retrieval.hardNegativesTop1(t(s, d, "documents"), "doc_id", "text",
        qs, "query_id", "qtext", k = 8)
    }, Some(s"""WITH $bm25CoreSql,
      rk0 AS (SELECT query_id, doc_id, score,
          row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id) AS rk FROM pd),
      gold AS (SELECT query_id, doc_id AS gold_id FROM rk0 WHERE rk = 1),
      fp AS (SELECT doc_id,
          md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents),
      gfp AS (SELECT g.query_id, g.gold_id, f.fp AS gold_fp
        FROM gold g JOIN fp f ON g.gold_id = f.doc_id),
      neg AS (SELECT p.query_id, gfp.gold_id, p.doc_id, p.score
        FROM pd p JOIN gfp ON p.query_id = gfp.query_id
        JOIN fp ON p.doc_id = fp.doc_id
        WHERE p.doc_id <> gfp.gold_id AND fp.fp <> gfp.gold_fp),
      rk AS (SELECT query_id, gold_id, doc_id, score,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id) AS INTEGER) AS rank
        FROM neg)
      SELECT query_id, gold_id, doc_id, score, rank FROM rk WHERE rank <= 8""")),

    // Incremental ANN index maintenance (the CDC leg): quantizers FROZEN
    // after training on the base corpus (vec_id % 5 < 4); the new batch
    // (% 5 = 4) is encoded against them and appended to the (cell, codes)
    // index — no retrain, existing rows untouched (mirror of q92's
    // incremental exact dedup). Search is the ordinary IVFPQ query leg over
    // the union; queries are base-resident so the oracle reuses the q118
    // coarse/PQ chains with corp = the base relation.
    ("q124_incremental_ann", (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      val base = emb.filter(col("vec_id") % 5 < 4)
      val batch = emb.filter(col("vec_id") % 5 === 4)
      graft.llm.ProductQuant.ivfPqIncrementalTopK(
        base.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"), col("embedding")),
        base, batch, 5, m = 8, dims = 8, centroidStride = 32, trainIters = 2,
        ks = 16, coarseKs = 8, nprobe = 2, trainSample = 4096)
    }, Some(incrementalAnnSql)),

    // Unigram-LM (SentencePiece-style) tokenizer training (Kudo 2018):
    // substring seed → top-64 multi-char pieces by count·len (+ all chars)
    // → 2 Viterbi-EM rounds over the Zipf-bounded distinct-word relation.
    // Counts stay exact integers (hard Viterbi counts, not forward-backward
    // floats) so the EM replay is exact; the DP adds round-6 logs in one
    // fixed order with ties pinned to the earliest split start.
    ("q125_unigram_vocab", (s: SparkSession, d: String) => {
      graft.llm.UnigramLm.train(t(s, d, "documents"), "text",
        vocabSize = 64, maxPieceLen = 4, iters = 2)
    }, Some(s"""WITH toks AS (SELECT unnest(list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), ' '), x -> x <> '')) AS word FROM documents),
      ${unigramChainSql}
      SELECT piece, c AS cnt,
        round(ln(CAST(c AS DOUBLE) / (SELECT CAST(sum(c) AS DOUBLE) FROM c2)), 6) AS logp
      FROM c2""")),

    // Active-window gap fill (the 100 TB form of q67): each key resamples
    // only its own [first, last] active hours — per-key spine from the
    // keyed bounds agg, no crossJoin, output bounded by actual activity
    // spans instead of |keys|x|corpus hours|.
    ("q126_gap_fill_active", (s: SparkSession, d: String) => {
      graft.ops.TemporalJoin.hourlyGapFillActive(
        t(s, d, "events").filter(col("user_id") < 40), "ts", "user_id")
    }, Some("""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id
        FROM events WHERE user_id < 40),
      hourly AS (SELECT date_trunc('hour', ts) AS hour, user_id, count(*) AS n
        FROM e GROUP BY 1, 2),
      b AS (SELECT user_id, min(hour) AS lo, max(hour) AS hi
        FROM hourly GROUP BY user_id),
      spine AS (SELECT user_id, unnest(generate_series(lo, hi,
          INTERVAL 1 HOUR)) AS hour FROM b)
      SELECT s.hour, s.user_id, coalesce(h.n, 0) AS n
      FROM spine s
      LEFT JOIN hourly h ON h.hour = s.hour AND h.user_id = s.user_id""")),

    // CCNet-style perplexity bucketing (Wenzek et al. 2020): head/middle/
    // tail per source by unigram-LM avg_nll percent-rank — the q97 score
    // through the q62 two-pass pr decomposition (no per-stratum global
    // sort); the oracle uses the native window percent_rank, which q62
    // proved the decomposition matches bit-for-bit.
    ("q127_ccnet_buckets", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val lm = graft.llm.LangModel.unigramLm(docs, "doc_id", "text")
      val scored = graft.llm.LangModel.scoreDocs(docs, "doc_id", "text", lm, floorLogp = 0.0)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      graft.llm.Sampling.ccnetBuckets(scored, "doc_id", "source", col("avg_nll"))
        .select(col("doc_id"), col("source"), col("n_tokens"), col("avg_nll"),
          col("pr"), col("bucket"))
    }, Some("""WITH dd AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      tok AS (SELECT doc_id, unnest(w) AS term FROM dd),
      cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
      st AS (SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS n_vocab FROM cnt),
      lm AS (SELECT term,
          round(ln(CAST(c + 1 AS DOUBLE) / CAST(n_total + n_vocab AS DOUBLE)), 6) AS logp
        FROM cnt, st),
      sc AS (SELECT tok.doc_id, count(*) AS n_tokens,
          floor(CAST(sum(CAST(-lm.logp AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS avg_nll
        FROM tok JOIN lm ON tok.term = lm.term GROUP BY tok.doc_id),
      j AS (SELECT sc.doc_id, d.source, sc.n_tokens, sc.avg_nll
        FROM sc JOIN documents d ON sc.doc_id = d.doc_id),
      p AS (SELECT *, percent_rank() OVER (PARTITION BY source
          ORDER BY avg_nll, doc_id) AS pr FROM j)
      SELECT doc_id, source, n_tokens, avg_nll, pr,
        CASE WHEN pr < 1.0/3.0 THEN 'head'
             WHEN pr < 2.0/3.0 THEN 'middle' ELSE 'tail' END AS bucket
      FROM p""")),

    // Corpus tokenization under the TRAINED unigram model (the q111 shape
    // for the SentencePiece side): per-doc word/piece counts, DP run once
    // per DISTINCT word under the final vocab and equi-joined back. The
    // oracle extends q125's replay with a third DP pass under the final
    // model's log-probs.
    ("q128_unigram_encode", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val model = graft.llm.UnigramLm.train(docs, "text",
        vocabSize = 64, maxPieceLen = 4, iters = 2)
      graft.llm.UnigramLm.encodeCorpus(docs, "doc_id", "text", model)
    }, Some(s"""WITH toks AS (SELECT doc_id, unnest(list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), ' '), x -> x <> '')) AS word FROM documents),
      ${unigramChainSql},
      lp2 AS (SELECT piece, round(ln(CAST(c AS DOUBLE) / (SELECT CAST(sum(c) AS DOUBLE) FROM c2)), 6) AS lp FROM c2),
      m2 AS (SELECT map(list(piece), list(lp)) AS m FROM lp2),
      segE AS (SELECT w.word, ${unigramDpSql("w.word", "m2.m")} AS seg FROM w CROSS JOIN m2)
      SELECT t.doc_id, count(*) AS n_words,
        CAST(sum(CASE WHEN len(e.seg) = 0 THEN length(t.word)
                      ELSE len(e.seg) END) AS BIGINT) AS n_tokens
      FROM toks t JOIN segE e ON t.word = e.word
      GROUP BY t.doc_id""")),

    // Scalar quantization (FAISS SQ8): per-dim [min,max] affine uint8
    // codes — 4x compression with near-exact recall, the flat-scan
    // counterpart of the PQ family. Train = ONE agg to a d-entry stats
    // row (broadcast everywhere); encode = pure per-row projection;
    // search reconstructs inside a fixed-order fold. All ops exact-order
    // IEEE both engines; ties pin on vec_id.
    ("q129_sq8_topk", (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      graft.llm.ScalarQuant.sq8TopK(
        emb.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"), col("embedding")),
        emb, 5)
    }, Some(s"""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)${sq8ChainSql()},
      q AS (SELECT vec_id AS query_id, v AS qv FROM corp WHERE vec_id < 8),
      sc AS (SELECT q.query_id, c.vec_id, round(${sq8DistSql("q.qv", "c.codes")}, 6) AS d
        FROM codes c CROSS JOIN sarr s CROSS JOIN q),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY d, vec_id) AS rnk FROM sc)
      SELECT query_id, vec_id, d AS dist, CAST(rnk AS INTEGER) AS rank
      FROM w WHERE rnk <= 5""")),

    // IVF + SQ8 composite (FAISS IVF,SQ8): the q118 coarse quantizer prunes
    // WHICH vectors are scored, the q129 scalar quantizer shrinks WHAT is
    // resident — retiring the flat SQ8 scan as the only SQ8 search path.
    // Stats stay GLOBAL (per-dim min/max over the whole corpus, the FAISS
    // IndexIVFScalarQuantizer default), so codes are cell-independent and
    // the oracle composes the two replays unchanged: candidates = codes
    // whose cell is probed by the query, distance = the q129 recon fold.
    ("q130_ivfsq8_topk", (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      graft.llm.ScalarQuant.ivfSq8TopK(
        emb.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"), col("embedding")),
        emb, 5, d = 64, centroidStride = 32, trainIters = 2, coarseKs = 8,
        nprobe = 2, trainSample = 4096)
    }, Some(s"""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)${coarseChainSql()}${sq8ChainSql()},
      q AS (SELECT vec_id AS query_id, v AS qv FROM corp WHERE vec_id < 8),
      sc AS (SELECT p.query_id, c.vec_id, round(${sq8DistSql("q.qv", "c.codes")}, 6) AS d
        FROM codes c
        JOIN cellasg a ON c.vec_id = a.vec_id
        JOIN probe p ON a.cell = p.cell
        JOIN q ON q.query_id = p.query_id
        CROSS JOIN sarr s),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY d, vec_id) AS rnk FROM sc)
      SELECT query_id, vec_id, d AS dist, CAST(rnk AS INTEGER) AS rank
      FROM w WHERE rnk <= 5""")),

    // ANN recall@k scoreboard: every quantized index (q117 PQ, q118 IVFPQ,
    // q122 residual IVFPQ, q129 SQ8, q130 IVF+SQ8) graded against the exact
    // squared-L2 brute-force top-5 — the recall claim each index ships
    // with, as an oracled relation. Both sides are deterministic (fixed
    // seeds, round-6 folds, vec_id tie pins), so the oracle replays every
    // chain and the recall integers exactly; missing queries surface as
    // recall 0 rows, never dropped rows.
    ("q131_ann_recall", (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      import graft.llm._
      // SHARED MODEL STORE: one coarse book, one PQ codebook, one SQ8 stats
      // row serve all five indexes — exactly what the oracle replays (its
      // cc2/cb2/sarr CTEs are shared across the method legs), and the
      // production shape: a corpus trains its quantizers once and every
      // index composes them. Trains once instead of once per index.
      val frac = ProductQuant.trainFracFor(emb, 4096)
      val sample = ProductQuant.sampleFor(emb, frac)
      val coarse = ProductQuant.trainCodebooks(emb, 1, 64, 32, 2, 8, "vec_id",
        frac, sample)
      val cb = ProductQuant.trainCodebooks(emb, 8, 8, 32, 2, 16, "vec_id",
        frac, sample)
      // each encode relation feeds TWO search legs below — pin each to one
      // corpus pass (localCheckpoint; the Verify/Bench harness sweeps them)
      val cells = ProductQuant.encode(emb, coarse, 1, 64)
        .select(col("vec_id"), col("code").as("cell"))
        .localCheckpoint()
      val codes = ProductQuant.encode(emb, cb, 8, 8).localCheckpoint()
      val stats = ScalarQuant.trainStats(emb)
      val sq8codes = ScalarQuant.encode(emb, stats).localCheckpoint()
      val results = Seq(
        "pq" -> ProductQuant.adcTopK(qs, codes, cb, 5, 8, 8),
        "ivfpq" -> ProductQuant.ivfPqSearch(qs, codes.join(cells, Seq("vec_id")),
          coarse, cb, 5, 8, 8, 2),
        "ivfpq_res" -> ProductQuant.ivfPqResidualTopKWith(qs, emb, coarse, 5,
          m = 8, dims = 8, centroidStride = 32, trainIters = 2, ks = 16,
          nprobe = 2, trainFrac = frac, trainRel = sample),
        "sq8" -> ScalarQuant.topK(qs, sq8codes, stats, 5),
        "ivfsq8" -> ScalarQuant.ivfSq8Search(qs, sq8codes.join(cells, Seq("vec_id")),
          coarse, stats, 5, 64, 2))
      ProductQuant.releaseSample(sample) // all trainings are materialized
      SimSearch.annRecall(qs, emb, 5, results)
    }, Some(s"""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)${coarseChainSql()},
      sv AS (SELECT vec_id, s.sub,
          v[CAST(8 * s.sub + 1 AS INTEGER):CAST(8 * s.sub + 8 AS INTEGER)] AS sv
        FROM corp, (SELECT unnest(range(0, 8)) AS sub) s)${pqChainSql("sv")},
      resid AS (SELECT c.vec_id, a.cell,
          [c.v[CAST(i AS INTEGER)] - t.ccv[CAST(i AS INTEGER)] FOR i IN range(1, 65)] AS rv
        FROM corp c JOIN cellasg a ON c.vec_id = a.vec_id JOIN cc2 t ON a.cell = t.ccid),
      rsv AS (SELECT vec_id, s.sub,
          rv[CAST(8 * s.sub + 1 AS INTEGER):CAST(8 * s.sub + 8 AS INTEGER)] AS sv
        FROM resid, (SELECT unnest(range(0, 8)) AS sub) s)${pqChainSql("rsv", p = "r")}${sq8ChainSql()},
      q AS (SELECT vec_id AS query_id, v AS qv FROM corp WHERE vec_id < 8),
      truth AS (SELECT query_id, vec_id FROM (
          SELECT q.query_id, c.vec_id, row_number() OVER (PARTITION BY q.query_id
            ORDER BY round(${sqSql("q.qv", "c.v", 64)}, 6), c.vec_id) AS rnk
          FROM corp c CROSS JOIN q) WHERE rnk <= 5),
      dt1 AS (SELECT v.vec_id AS query_id, c.sub, c.cid AS code,
          round(${sqSql("v.sv", "c.cv", 8)}, 6) AS d
        FROM (SELECT * FROM sv WHERE vec_id < 8) v JOIN cb2 c ON v.sub = c.sub),
      scpq AS (SELECT dt1.query_id, e.vec_id,
          CAST(sum(CAST(dt1.d AS DECIMAL(18,6))) AS DOUBLE) AS adc
        FROM enc e JOIN dt1 ON e.sub = dt1.sub AND e.code = dt1.code
        GROUP BY dt1.query_id, e.vec_id),
      tpq AS (SELECT query_id, vec_id FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY adc, vec_id) AS rnk FROM scpq) WHERE rnk <= 5),
      scivf AS (SELECT dt1.query_id, e.vec_id,
          CAST(sum(CAST(dt1.d AS DECIMAL(18,6))) AS DOUBLE) AS adc
        FROM enc e
        JOIN cellasg ce ON e.vec_id = ce.vec_id
        JOIN probe p ON p.cell = ce.cell
        JOIN dt1 ON e.sub = dt1.sub AND e.code = dt1.code AND dt1.query_id = p.query_id
        GROUP BY dt1.query_id, e.vec_id),
      tivf AS (SELECT query_id, vec_id FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY adc, vec_id) AS rnk FROM scivf) WHERE rnk <= 5),
      qresid AS (SELECT v.vec_id AS query_id, p.cell,
          [v.v[CAST(i AS INTEGER)] - t.ccv[CAST(i AS INTEGER)] FOR i IN range(1, 65)] AS rv
        FROM (SELECT * FROM corp WHERE vec_id < 8) v
        JOIN probe p ON p.query_id = v.vec_id JOIN cc2 t ON p.cell = t.ccid),
      qrsv AS (SELECT query_id, cell, s.sub,
          rv[CAST(8 * s.sub + 1 AS INTEGER):CAST(8 * s.sub + 8 AS INTEGER)] AS sv
        FROM qresid, (SELECT unnest(range(0, 8)) AS sub) s),
      dt2 AS (SELECT v.query_id, v.cell, c.sub, c.cid AS code,
          round(${sqSql("v.sv", "c.cv", 8)}, 6) AS d
        FROM qrsv v JOIN rcb2 c ON v.sub = c.sub),
      scres AS (SELECT dt2.query_id, e.vec_id,
          CAST(sum(CAST(dt2.d AS DECIMAL(18,6))) AS DOUBLE) AS adc
        FROM renc e
        JOIN cellasg ce ON e.vec_id = ce.vec_id
        JOIN dt2 ON dt2.cell = ce.cell AND e.sub = dt2.sub AND e.code = dt2.code
        GROUP BY dt2.query_id, e.vec_id),
      tres AS (SELECT query_id, vec_id FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY adc, vec_id) AS rnk FROM scres) WHERE rnk <= 5),
      scsq8 AS (SELECT q.query_id, c.vec_id, round(${sq8DistSql("q.qv", "c.codes")}, 6) AS d
        FROM codes c CROSS JOIN sarr s CROSS JOIN q),
      tsq8 AS (SELECT query_id, vec_id FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY d, vec_id) AS rnk FROM scsq8) WHERE rnk <= 5),
      scivfs AS (SELECT p.query_id, c.vec_id, round(${sq8DistSql("q.qv", "c.codes")}, 6) AS d
        FROM codes c
        JOIN cellasg a ON c.vec_id = a.vec_id
        JOIN probe p ON a.cell = p.cell
        JOIN q ON q.query_id = p.query_id
        CROSS JOIN sarr s),
      tivfs AS (SELECT query_id, vec_id FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY d, vec_id) AS rnk FROM scivfs) WHERE rnk <= 5),
      allres AS (
        SELECT 'pq' AS method, query_id, vec_id FROM tpq
        UNION ALL SELECT 'ivfpq', query_id, vec_id FROM tivf
        UNION ALL SELECT 'ivfpq_res', query_id, vec_id FROM tres
        UNION ALL SELECT 'sq8', query_id, vec_id FROM tsq8
        UNION ALL SELECT 'ivfsq8', query_id, vec_id FROM tivfs),
      hits AS (SELECT a.method, a.query_id, count(*) AS n_hits
        FROM allres a JOIN truth t ON a.query_id = t.query_id AND a.vec_id = t.vec_id
        GROUP BY a.method, a.query_id),
      m(method) AS (VALUES ('pq'), ('ivfpq'), ('ivfpq_res'), ('sq8'), ('ivfsq8'))
      SELECT g.method, g.query_id,
        CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 5.0 AS recall
      FROM (SELECT m.method, q.query_id FROM m CROSS JOIN q) g
      LEFT JOIN hits h ON g.method = h.method AND g.query_id = h.query_id""")),

    // q124's incremental index, END-TO-END through the streaming leg: the
    // base is batch-encoded into the on-disk index store, the delta ARRIVES
    // AS A STREAM (file source -> Streams.annIndexAppend foreachBatch ->
    // epoch-partitioned idempotent append), and the search runs over
    // readAnnIndex's view of the store. Output is equal by construction to
    // q124 (same frozen models, same code rows), so the two queries share
    // one oracle — which is the point: the streaming path is now held to
    // the same oracle as the batch path, not just to its unit tests.
    ("q132_streaming_ann", (s: SparkSession, d: String) => {
      import graft.llm.ProductQuant
      val emb = t(s, d, "embeddings")
      val base = emb.filter(col("vec_id") % 5 < 4)
      val newb = emb.filter(col("vec_id") % 5 === 4)
      val frac = ProductQuant.trainFracFor(base, 4096)
      val sample = ProductQuant.sampleFor(base, frac)
      val coarse = ProductQuant.trainCodebooks(base, 1, 64, 32, 2, 8, "vec_id",
        frac, sample)
      val cb = ProductQuant.trainCodebooks(base, 8, 8, 32, 2, 16, "vec_id",
        frac, sample)
      ProductQuant.releaseSample(sample)
      val root = java.nio.file.Files.createTempDirectory("q132-ann").toString
      // base index built batch-side (epoch -1: reserved below the streaming
      // epoch counter, so a replayed stream epoch can never collide with it)
      graft.streaming.Streams.appendIndexBatch(base, coarse, cb, 8, 8,
        s"$root/index", batchId = -1L)
      // the delta arrives as a stream: file source over the staged vectors,
      // appended through the foreachBatch leg (AvailableNow = one drain)
      newb.write.parquet(s"$root/stage")
      graft.streaming.Streams.annIndexAppend(
        s.readStream.schema(newb.schema).parquet(s"$root/stage"),
        coarse, cb, 8, 8, s"$root/index", s"$root/ckpt")
        .awaitTermination()
      val index = graft.streaming.Streams.readAnnIndex(s, s"$root/index")
      ProductQuant.ivfPqSearch(
        base.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"), col("embedding")),
        index, coarse, cb, 5, 8, 8, 2)
    }, Some(incrementalAnnSql)),

    // PII scrubbing (the Dolma privacy pass): emails -> <EMAIL>, dotted-quad
    // IPs -> <IP>, phone-shaped digit runs -> <PHONE>, three passes in one
    // fixed order with counts taken on the text each pass sees. The fixture
    // plants one of each per doc (derived from doc_id — both engines build
    // the identical augmented text); patterns use explicit character classes
    // only, the Java/RE2 common subset.
    ("q133_pii_scrub", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val aug = docs.select(col("doc_id"),
        concat(col("text"),
          lit(" contact u"), col("doc_id").cast("string"),
          lit("@mail.example.com from 10."),
          pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".0.1 or call +1 555-01"),
          lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0")).as("text"))
      graft.llm.Scrub.piiScrub(aug, "doc_id", "text")
    }, Some("""WITH aug AS (SELECT doc_id, text || ' contact u' || doc_id
          || '@mail.example.com from 10.' || (doc_id % 256)
          || '.0.1 or call +1 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS text
        FROM documents),
      p1 AS (SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
          regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        FROM aug),
      p2 AS (SELECT doc_id, n_emails,
          CAST(len(regexp_extract_all(t1, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
          regexp_replace(t1, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS t2
        FROM p1),
      p3 AS (SELECT doc_id, n_emails, n_ips,
          CAST(len(regexp_extract_all(t2, '\+?[0-9][0-9()\-. ]{6,}[0-9]')) AS BIGINT) AS n_phones,
          regexp_replace(t2, '\+?[0-9][0-9()\-. ]{6,}[0-9]', '<PHONE>', 'g') AS clean
        FROM p2)
      SELECT doc_id, n_emails, n_ips, n_phones, clean FROM p3""")),

    // URL domain blocklist (the C4 provenance filter): hosts extracted from
    // in-text URLs, probed against a broadcast blocklist, keep = no blocked
    // host. Fixture plants two URLs per doc (one rotating over 7 hosts, two
    // of which are blocked) so both the kept and dropped legs carry rows.
    ("q134_url_blocklist", (s: SparkSession, d: String) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val aug = docs.select(col("doc_id"),
        concat(col("text"),
          lit(" see https://site"), pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".example.org/p/"), col("doc_id").cast("string"),
          lit(" and http://news.example.com/x")).as("text"))
      val block = Seq("site0.example.org", "site3.example.org", "spam.example.net")
        .toDF("domain")
      graft.llm.Scrub.urlBlocklistFlags(aug, "doc_id", "text", block)
    }, Some("""WITH aug AS (SELECT doc_id, text || ' see https://site' || (doc_id % 7)
          || '.example.org/p/' || doc_id || ' and http://news.example.com/x' AS text
        FROM documents),
      u AS (SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[^ "]+')) AS url FROM aug),
      h AS (SELECT doc_id, lower(regexp_extract(url, '^https?://([^/: "]+)', 1)) AS domain FROM u),
      b(domain) AS (VALUES ('site0.example.org'), ('site3.example.org'), ('spam.example.net')),
      pd AS (SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_urls,
          CAST(sum(CASE WHEN b.domain IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
        FROM h LEFT JOIN b ON h.domain = b.domain GROUP BY h.doc_id)
      SELECT d.doc_id, CAST(coalesce(pd.n_urls, 0) AS BIGINT) AS n_urls,
        CAST(coalesce(pd.n_blocked, 0) AS BIGINT) AS n_blocked,
        coalesce(pd.n_blocked, 0) = 0 AS keep
      FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id""")),

    // ANN refine re-rank (FAISS `IVFPQ,RFlat`): the q118 IVFPQ searched at
    // k' = 4k candidates, then re-ranked by EXACT squared L2 against the raw
    // vectors — quantization error decides only WHICH 20 candidates surface,
    // never their final order. The oracle replays the q118 chain to rnk<=20,
    // then rescores those rows with the brute-force fold. Exact distances
    // touch |Q|·k' raw rows, not the corpus.
    ("q135_ann_refine", (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val approx = graft.llm.ProductQuant.ivfPqTopK(qs, emb, 20,
        m = 8, dims = 8, centroidStride = 32, trainIters = 2,
        ks = 16, coarseKs = 8, nprobe = 2, trainSample = 4096)
      graft.llm.SimSearch.refineTopK(qs, emb, approx, 5)
    }, Some(s"""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)${coarseChainSql()},
      sv AS (SELECT vec_id, s.sub,
          v[CAST(8 * s.sub + 1 AS INTEGER):CAST(8 * s.sub + 8 AS INTEGER)] AS sv
        FROM corp, (SELECT unnest(range(0, 8)) AS sub) s)${pqChainSql("sv")},
      dt AS (SELECT q.vec_id AS query_id, c.sub, c.cid AS code,
          round(${sqSql("q.sv", "c.cv", 8)}, 6) AS d
        FROM (SELECT * FROM sv WHERE vec_id < 8) q JOIN cb2 c ON q.sub = c.sub),
      sc AS (SELECT dt.query_id, e.vec_id,
          CAST(sum(CAST(dt.d AS DECIMAL(18,6))) AS DOUBLE) AS adc
        FROM enc e
        JOIN cellasg ce ON e.vec_id = ce.vec_id
        JOIN probe p ON p.cell = ce.cell
        JOIN dt ON e.sub = dt.sub AND e.code = dt.code AND dt.query_id = p.query_id
        GROUP BY dt.query_id, e.vec_id),
      cand AS (SELECT query_id, vec_id FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY adc, vec_id) AS rnk FROM sc) WHERE rnk <= 20),
      q AS (SELECT vec_id AS query_id, v AS qv FROM corp WHERE vec_id < 8),
      ex AS (SELECT c.query_id, c.vec_id,
          round(${sqSql("q.qv", "cv.v", 64)}, 6) AS d
        FROM cand c JOIN corp cv ON c.vec_id = cv.vec_id
        JOIN q ON q.query_id = c.query_id),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY d, vec_id) AS rnk FROM ex)
      SELECT query_id, vec_id, d AS dist, CAST(rnk AS INTEGER) AS rank
      FROM w WHERE rnk <= 5""")),

    // Trained quality classifier (CCNet/GPT-3 target-domain filter): hashed
    // bag-of-words logistic regression, 3 full-batch GD rounds, weak labels
    // = "doc is English". The whole training loop is fixed-point BIGINT
    // (q100 discipline) with the sigmoid quantized at the source, so the
    // oracle unrolls all three rounds and replays the weights exactly.
    // NOTE the fixture shares ONE vocabulary across languages, so this
    // label is information-theoretically unlearnable here — the oracle
    // verifies the distributed GD MECHANISM bit-for-bit; LlmSpec proves the
    // same trainer separates a learnable task, and q137's NB filter is the
    // fixture-learnable demo. Oracle rounds stay at 3: each unrolled round
    // references the previous weights CTE twice, and DuckDB's CTE inlining
    // makes deep chains exponential (20 rounds did not return).
    ("q136_quality_clf", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
        .withColumn("is_en", (col("lang") === "en").cast("int"))
      graft.llm.Classifier.qualityClassifier(docs, "doc_id", "text", "is_en",
        buckets = 64, rounds = 3, lrDenom = 4096L)
    }, Some(s"""WITH tokd AS (SELECT doc_id,
          unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')) AS term
        FROM documents),
      featt AS (SELECT doc_id, ('0x' || substr(md5(term), 1, 14))::BIGINT % 64 AS b,
          CAST(count(*) AS BIGINT) AS x
        FROM tokd GROUP BY doc_id, b),
      feat AS (SELECT * FROM featt
        UNION ALL SELECT doc_id, CAST(64 AS BIGINT), CAST(1 AS BIGINT) FROM documents),
      lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
      w0 AS (SELECT unnest(range(0, 65)) AS b, CAST(0 AS BIGINT) AS wm),
      ${logRegRoundSql(1, 4096L)},
      ${logRegRoundSql(2, 4096L)},
      ${logRegRoundSql(3, 4096L)},
      mf AS (SELECT f.doc_id, CAST(sum(w.wm * f.x) AS BIGINT) AS mm
        FROM feat f JOIN w3 w ON f.b = w.b GROUP BY f.doc_id),
      pf AS (SELECT m.doc_id, lab.y,
          CAST(floor(1.0 / (1.0 + exp(-(CAST(m.mm AS DOUBLE) / 1000000.0))) * 1000000.0 + 0.5) AS BIGINT) AS pm
        FROM mf m JOIN lab ON m.doc_id = lab.doc_id)
      SELECT doc_id, CAST(y AS BIGINT) AS label,
        CAST(pm AS DOUBLE) / 1000000.0 AS score,
        pm >= 500000 AS predicted
      FROM pf""")),

    // One-pass multinomial Naive Bayes filter (the trained classifier that
    // CONVERGES by construction — vs q136's GD mechanism): weak label =
    // "mentions the target term", Laplace-smoothed hashed-bucket
    // likelihoods, scores = exact BIGINT micro sums of source-quantized
    // ln's. Training is one bucket-keyed aggregate; the 64-row model
    // broadcasts into the scoring join.
    ("q137_nb_clf", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
        .withColumn("is_pos", lower(col("text")).contains("window").cast("int"))
      graft.llm.Classifier.naiveBayes(docs, "doc_id", "text", "is_pos",
        buckets = 64)
    }, Some(s"""WITH tokd AS (SELECT doc_id,
          unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')) AS term
        FROM documents),
      featt AS (SELECT doc_id, ('0x' || substr(md5(term), 1, 14))::BIGINT % 64 AS b,
          CAST(count(*) AS BIGINT) AS x
        FROM tokd GROUP BY doc_id, b),
      lab AS (SELECT doc_id, CASE WHEN lower(text) LIKE '%window%' THEN 1 ELSE 0 END AS y
        FROM documents),
      cyb AS (SELECT f.b,
          CAST(sum(CASE WHEN l.y = 1 THEN f.x ELSE 0 END) AS BIGINT) AS c1,
          CAST(sum(CASE WHEN l.y = 0 THEN f.x ELSE 0 END) AS BIGINT) AS c0
        FROM featt f JOIN lab l ON f.doc_id = l.doc_id GROUP BY f.b),
      tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t1, CAST(sum(c0) AS BIGINT) AS t0 FROM cyb),
      nn AS (SELECT CAST(sum(y) AS BIGINT) AS n1,
          CAST(count(*) - sum(y) AS BIGINT) AS n0,
          CAST(count(*) AS BIGINT) AS n FROM lab),
      model AS (SELECT b,
          CAST(floor(ln(CAST(c1 + 1 AS DOUBLE) / CAST(t1 + 64 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
          - CAST(floor(ln(CAST(c0 + 1 AS DOUBLE) / CAST(t0 + 64 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS llr
        FROM cyb, tot),
      pri AS (SELECT
          CAST(floor(ln(CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
          - CAST(floor(ln(CAST(n0 AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS p
        FROM nn),
      sc AS (SELECT f.doc_id, CAST(sum(f.x * m.llr) AS BIGINT) AS s
        FROM featt f JOIN model m ON f.b = m.b GROUP BY f.doc_id)
      SELECT l.doc_id, CAST(l.y AS BIGINT) AS label,
        CAST(coalesce(sc.s, 0) + pri.p AS DOUBLE) / 1000000.0 AS score,
        coalesce(sc.s, 0) + pri.p >= 0 AS predicted
      FROM lab l LEFT JOIN sc ON l.doc_id = sc.doc_id CROSS JOIN pri""")),

    // TF-IDF more-like-this (q23's similar-doc search FROM RAW TEXT, no
    // embeddings): cosine over exact BIGINT-micro tf·idf weights, dot
    // products via the postings equi-join on term — the inverted-index
    // probe, never a |Q|×|C| fan-out. idf quantizes at the source
    // (lnMicro); the cosine is one fixed double op sequence over exact
    // integer dot/norms, round-6, doc-id tie pins.
    ("q138_tfidf_similar", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      graft.llm.Retrieval.tfIdfSimilar(docs, "doc_id", "text",
        docs.filter(col("doc_id") < 4).select("doc_id"), 5)
    }, Some("""WITH d AS (SELECT doc_id,
          list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
        FROM documents),
      post AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM d) GROUP BY doc_id, term),
      nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      idf AS (SELECT term,
          CAST(floor(ln(CAST(n AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS im
        FROM post, nd GROUP BY term, n),
      wv AS (SELECT p.doc_id, p.term, CAST(p.tf * i.im AS BIGINT) AS wm
        FROM post p JOIN idf i ON p.term = i.term),
      nrm AS (SELECT doc_id, CAST(sum(wm * wm) AS BIGINT) AS n2 FROM wv GROUP BY doc_id),
      qv AS (SELECT doc_id AS query_id, term, wm AS qwm FROM wv WHERE doc_id < 4),
      dot AS (SELECT q.query_id, c.doc_id, CAST(sum(q.qwm * c.wm) AS BIGINT) AS dp
        FROM wv c JOIN qv q ON c.term = q.term AND c.doc_id <> q.query_id
        GROUP BY q.query_id, c.doc_id),
      sc AS (SELECT dot.query_id, dot.doc_id,
          round(CAST(dot.dp AS DOUBLE) /
            (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))), 6) AS cosine
        FROM dot JOIN nrm nq ON nq.doc_id = dot.query_id
        JOIN nrm nc ON nc.doc_id = dot.doc_id),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, doc_id) AS rnk FROM sc)
      SELECT query_id, doc_id, cosine, CAST(rnk AS INTEGER) AS rank
      FROM w WHERE rnk <= 5""")),

    // Multimodal interleaved sequence packing (LLaVA/Flamingo batch prep):
    // a doc's context budget = text tokens + n_images·64 ViT-patch
    // placeholder slots (images per doc from the payload meta, the q120
    // convention), FFD-packed into 1024-slot contexts through the oracled
    // q85 machinery — image-heavy docs pack alongside text-heavy ones by
    // TOTAL slot budget, which is exactly what the training batcher sees.
    ("q139_mm_pack", (s: SparkSession, d: String) => {
      val m = Multimodal.decodeMeta(
        Multimodal.withPayload(t(s, d, "documents"), "text", "doc_id"))
      val docs = m.select(col("doc_id"),
        (TextStats.tokenCount(col("payload").cast("string")).cast("long")
          + pmod(col("n_bytes"), lit(4)) * lit(64L)).as("n_slots"),
        pmod(col("n_bytes"), lit(4)).as("n_images"))
      graft.llm.Packing.packGreedy(docs, "doc_id", "n_slots",
          maxTokens = 1024, partitions = 4)
        .select(col("pack_id"), explode(col("doc_ids")).as("doc_id"),
          col("n_docs"), col("total_tokens").as("total_slots"))
        .join(docs.select(col("doc_id"), col("n_images")), Seq("doc_id"))
        .select("pack_id", "doc_id", "n_docs", "total_slots", "n_images")
    }, Some("""WITH d AS (SELECT doc_id AS id,
        CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))
          + (octet_length(encode(text)) % 4) * 64 AS BIGINT) AS n,
        CAST(octet_length(encode(text)) % 4 AS BIGINT) AS n_images,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4 AS pid
        FROM documents),
      g AS (SELECT pid, list({'id': id, 'n': n} ORDER BY n DESC, id) AS xs
        FROM d GROUP BY pid),
      p AS (SELECT pid, list_reduce(
        list_transform(xs, e -> [{'ids': [e.id], 'tot': e.n}]),
        (acc, e) -> CASE WHEN list_position(list_transform(acc, b -> b.tot + e[1].tot <= 1024), true) = 0
          THEN list_append(acc, e[1])
          ELSE list_transform(range(1, len(acc) + 1), i ->
            CASE WHEN i = list_position(list_transform(acc, b -> b.tot + e[1].tot <= 1024), true)
              THEN {'ids': list_append(acc[i].ids, e[1].ids[1]), 'tot': acc[i].tot + e[1].tot}
              ELSE acc[i] END)
          END) AS bins FROM g),
      bn AS (SELECT pid, UNNEST(list_transform(range(1, len(bins) + 1), i ->
          {'idx': i - 1, 'ids': bins[i].ids, 'tot': bins[i].tot})) AS bin FROM p),
      f AS (SELECT pid * 1099511627776 + bin.idx AS pack_id,
          UNNEST(bin.ids) AS doc_id,
          CAST(len(bin.ids) AS INTEGER) AS n_docs,
          bin.tot AS total_slots
        FROM bn)
      SELECT f.pack_id, f.doc_id, f.n_docs, f.total_slots, d.n_images
      FROM f JOIN d ON f.doc_id = d.id""")),

    // Contamination-safe splitting: train/val cut on a hash of the CONTENT
    // fingerprint vs the naive doc-id hash, with the leaked cross-split
    // exact-dup pair count for both — fingerprint policy is structurally
    // zero (dup groups share a fingerprint, hence a side). This fixture has
    // no exact dups, so both counts read 0 here; CurationSpec's dup-heavy
    // fixture shows the id policy leaking while by_fp stays at its
    // structural zero. Pair counts are per-group tallies (tr·va), never a
    // self-join.
    ("q140_split_guard", (s: SparkSession, d: String) => {
      graft.llm.Split.leakageReport(t(s, d, "documents"), "doc_id", "text",
        valFrac = 0.2)
    }, Some("""WITH a AS (SELECT doc_id,
          md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        FROM documents),
      b AS (SELECT doc_id, fp,
          CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            / 4294967296.0 < 0.2 THEN 'val' ELSE 'train' END AS split_by_id,
          CASE WHEN ('0x' || substr(md5(fp), 1, 8))::BIGINT
            / 4294967296.0 < 0.2 THEN 'val' ELSE 'train' END AS split_by_fp
        FROM a),
      long AS (SELECT fp, 'by_id' AS policy, split_by_id AS split FROM b
        UNION ALL SELECT fp, 'by_fp', split_by_fp FROM b),
      g AS (SELECT policy, fp,
          CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS tr,
          CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS va
        FROM long GROUP BY policy, fp)
      SELECT policy, CAST(sum(tr) AS BIGINT) AS n_train,
        CAST(sum(va) AS BIGINT) AS n_val,
        CAST(sum(tr * va) AS BIGINT) AS cross_dup_pairs
      FROM g GROUP BY policy""")),

    // Per-source curation funnel (the run report of a C4/Dolma-style
    // cleaning pass): docs in → length gate → repetition gate → exact-dedup
    // winner, gates nested in sequence. All-integer decisions; one
    // (doc, term) aggregate + one fingerprint aggregate + the per-source
    // rollup — no corpus-wide window, no wide join.
    ("q141_curation_funnel", (s: SparkSession, d: String) => {
      graft.llm.QualityModel.curationFunnel(t(s, d, "documents"),
        "doc_id", "text", "source", minTokens = 30, maxRepPct = 20)
    }, Some("""WITH post AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(list_filter(
            string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS term
          FROM documents) GROUP BY doc_id, term),
      rep AS (SELECT doc_id, CAST(max(tf) AS BIGINT) AS max_tf,
          CAST(sum(tf) AS BIGINT) AS n_tok FROM post GROUP BY doc_id),
      fp AS (SELECT doc_id, source,
          md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        FROM documents),
      win AS (SELECT fp, min(doc_id) AS w FROM fp GROUP BY fp),
      fl AS (SELECT f.source,
          coalesce(r.n_tok, 0) >= 30 AS k_len,
          coalesce(r.max_tf, 0) * 100 <= coalesce(r.n_tok, 0) * 20 AS k_rep,
          f.doc_id = win.w AS k_dup
        FROM fp f LEFT JOIN rep r ON f.doc_id = r.doc_id
        JOIN win ON f.fp = win.fp)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN k_len THEN 1 ELSE 0 END) AS BIGINT) AS n_after_len,
        CAST(sum(CASE WHEN k_len AND k_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_after_rep,
        CAST(sum(CASE WHEN k_len AND k_rep AND k_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_after_dedup
      FROM fl GROUP BY source""")),

    // Hashed text embeddings end-to-end (the feature-hashing trick): every
    // doc gets a 64-dim dense vector from md5-carved term components
    // weighted by exact tf·idf micro — no model artifact — and the exact
    // ANN leg searches them. Components are integer sums on both engines;
    // self-matches surface at distance 0/rank 1 (bruteForceTopKL2
    // semantics). The bridge that lets a text-only corpus use the whole
    // quantized-index stack.
    ("q142_hash_embed", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val emb = graft.llm.HashEmbed.docEmbeddings(docs, "doc_id", "text", 64)
        .localCheckpoint() // feeds the query AND corpus sides below once
      graft.llm.SimSearch.bruteForceTopKL2(
        emb.filter(col("doc_id") < 4)
          .select(col("doc_id").as("query_id"), col("embedding")),
        emb, 5, vecId = "doc_id")
    }, Some(s"""WITH post AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(list_filter(
            string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')) AS term
          FROM documents) GROUP BY doc_id, term),
      nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      idf AS (SELECT term,
          CAST(floor(ln(CAST(n AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS im
        FROM post, nd GROUP BY term, n),
      wv AS (SELECT p.doc_id, p.term, CAST(p.tf * i.im AS BIGINT) AS wm
        FROM post p JOIN idf i ON p.term = i.term),
      td AS (SELECT DISTINCT term FROM post),
      ch AS (SELECT term, blk, md5(term || '#' || blk) AS h
        FROM td, (SELECT unnest(range(0, 8)) AS blk)),
      cd AS (SELECT term, blk * 8 + j AS dim,
          ('0x' || substr(h, CAST(4 * j + 1 AS INTEGER), 4))::BIGINT - 32768 AS c
        FROM ch, (SELECT unnest(range(0, 8)) AS j)),
      ev AS (SELECT w.doc_id, c.dim, CAST(sum(w.wm * c.c) AS BIGINT) AS v
        FROM wv w JOIN cd c ON w.term = c.term GROUP BY w.doc_id, c.dim),
      emb AS (SELECT doc_id, list(CAST(v AS DOUBLE) / 1e12 ORDER BY dim) AS e
        FROM ev GROUP BY doc_id),
      q AS (SELECT doc_id AS query_id, e AS qe FROM emb WHERE doc_id < 4),
      sc AS (SELECT q.query_id, c.doc_id,
          round(${sqSql("q.qe", "c.e", 64)}, 6) AS d
        FROM emb c CROSS JOIN q),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY d, doc_id) AS rnk FROM sc)
      SELECT query_id, doc_id, d AS dist, CAST(rnk AS INTEGER) AS rank
      FROM w WHERE rnk <= 5""")),

    // Mergeable deterministic quantile sketch (bottom-k hash sampling — the
    // order-independent alternative to GK/KLL, same union-law as the KMV
    // distinct sketch): per return flag, the 64 smallest-hash lineitems
    // estimate five price quantiles by nearest rank. The fixture has
    // duplicate (orderkey, linenumber) keys — the sketch's per-copy
    // disambiguation (md5(key#i) off ONE pre-aggregate) makes the sample a
    // pure function of the row multiset anyway. 13-hex hashes are 52-bit,
    // exact as the bounded heap's double score; values ride the heap as
    // fixed-point micro longs, so there is no value join-back at all.
    ("q143_quantile_sketch", (s: SparkSession, d: String) => {
      val l = t(s, d, "lineitem")
      graft.llm.Sketches.bottomKQuantiles(l, "l_returnflag",
        col("l_orderkey") * 10 + col("l_linenumber"), col("l_extendedprice"),
        k = 64, probes = Seq(0.1, 0.25, 0.5, 0.75, 0.9))
    }, Some("""WITH b AS (SELECT l_returnflag AS g,
          CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) AS key,
          CAST(floor(l_extendedprice * 1000000.0 + 0.5) AS BIGINT) AS vq
        FROM lineitem),
      dd AS (SELECT g, key, vq, count(*) AS c FROM b GROUP BY g, key, vq),
      e AS (SELECT g, vq,
          ('0x' || substr(md5(key || '#' || i), 1, 13))::BIGINT AS hv
        FROM dd, UNNEST(range(0, c)) AS t(i)),
      n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY g),
      r AS (SELECT g, vq, row_number() OVER (PARTITION BY g ORDER BY hv, vq) AS rn FROM e),
      s AS (SELECT g, list(vq ORDER BY vq) AS sv FROM r WHERE rn <= 64 GROUP BY g),
      pr AS (SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS p)
      SELECT s.g AS l_returnflag, n.n AS n, pr.p AS p,
        CAST(sv[CAST(floor(p * (len(sv) - 1) + 0.5) AS INTEGER) + 1] AS DOUBLE) / 1000000.0 AS est
      FROM s JOIN n ON s.g = n.g CROSS JOIN pr""")),

    // Raw text to quantized index, END TO END: q142's hashed embeddings feed
    // the q118 IVFPQ build+search unchanged — a text-only corpus gets the
    // billion-scale resident layout (cell + 8 codes per doc, zero raw
    // vectors at query time) with the WHOLE pipeline replayed in one SQL:
    // postings → idf → components → vectors → coarse chain → PQ chain →
    // probe-pruned ADC. The chains are corpus-agnostic (len(v)-driven), so
    // they compose onto the derived corp CTE as-is.
    ("q144_text_ann", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val emb = graft.llm.HashEmbed.docEmbeddings(docs, "doc_id", "text", 64)
        .select(col("doc_id").as("vec_id"), col("embedding"))
        .localCheckpoint() // one embed pass feeds training, encode and queries
      graft.llm.ProductQuant.ivfPqTopK(
        emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding")),
        emb, 5, m = 8, dims = 8, centroidStride = 32, trainIters = 2,
        ks = 16, coarseKs = 8, nprobe = 2, trainSample = 4096)
    }, Some(s"""WITH post AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(list_filter(
            string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')) AS term
          FROM documents) GROUP BY doc_id, term),
      nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      idf AS (SELECT term,
          CAST(floor(ln(CAST(n AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS im
        FROM post, nd GROUP BY term, n),
      wv AS (SELECT p.doc_id, p.term, CAST(p.tf * i.im AS BIGINT) AS wm
        FROM post p JOIN idf i ON p.term = i.term),
      td AS (SELECT DISTINCT term FROM post),
      ch AS (SELECT term, blk, md5(term || '#' || blk) AS h
        FROM td, (SELECT unnest(range(0, 8)) AS blk)),
      cd AS (SELECT term, blk * 8 + j AS dim,
          ('0x' || substr(h, CAST(4 * j + 1 AS INTEGER), 4))::BIGINT - 32768 AS c
        FROM ch, (SELECT unnest(range(0, 8)) AS j)),
      ev AS (SELECT w.doc_id, c.dim, CAST(sum(w.wm * c.c) AS BIGINT) AS v
        FROM wv w JOIN cd c ON w.term = c.term GROUP BY w.doc_id, c.dim),
      emb AS (SELECT doc_id, list(CAST(v AS DOUBLE) / 1e12 ORDER BY dim) AS e
        FROM ev GROUP BY doc_id),
      corp AS (SELECT doc_id AS vec_id, e AS v FROM emb)${coarseChainSql()},
      sv AS (SELECT vec_id, s.sub,
          v[CAST(8 * s.sub + 1 AS INTEGER):CAST(8 * s.sub + 8 AS INTEGER)] AS sv
        FROM corp, (SELECT unnest(range(0, 8)) AS sub) s)${pqChainSql("sv")},
      dt AS (SELECT q.vec_id AS query_id, c.sub, c.cid AS code,
          round(${sqSql("q.sv", "c.cv", 8)}, 6) AS d
        FROM (SELECT * FROM sv WHERE vec_id < 8) q JOIN cb2 c ON q.sub = c.sub),
      sc AS (SELECT dt.query_id, e.vec_id,
          CAST(sum(CAST(dt.d AS DECIMAL(18,6))) AS DOUBLE) AS adc
        FROM enc e
        JOIN cellasg ce ON e.vec_id = ce.vec_id
        JOIN probe p ON p.cell = ce.cell
        JOIN dt ON e.sub = dt.sub AND e.code = dt.code AND dt.query_id = p.query_id
        GROUP BY dt.query_id, e.vec_id),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY adc, vec_id) AS rnk FROM sc)
      SELECT query_id, vec_id, adc, CAST(rnk AS INTEGER) AS rank
      FROM w WHERE rnk <= 5""")),

    // Corpus snapshot diff: which keys were added / removed / changed
    // between two table versions (the audit that licenses the incremental
    // dedup/index passes q92/q124 to treat the old corpus as frozen). Each
    // side collapses to (key, payload-md5) before the single full-outer
    // hash join — the shuffle never carries text. Versions are carved from
    // the one fixture: old = id%7≠0, new = id%5≠0 with id%11==0 docs
    // revised, so all three statuses appear.
    ("q145_snapshot_diff", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val oldV = docs.filter(col("doc_id") % 7 =!= 0)
      val newV = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
      graft.ops.Diff.snapshotDiff(oldV, newV, "doc_id", Seq("text", "source"))
    }, Some("""WITH o AS (SELECT doc_id, md5(text || chr(31) || source) AS ofp
        FROM documents WHERE doc_id % 7 <> 0),
      n AS (SELECT doc_id, md5(CASE WHEN doc_id % 11 = 0
            THEN text || ' [rev2]' ELSE text END || chr(31) || source) AS nfp
        FROM documents WHERE doc_id % 5 <> 0),
      j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, ofp, nfp
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
      SELECT doc_id, CASE WHEN ofp IS NULL THEN 'added'
          WHEN nfp IS NULL THEN 'removed'
          WHEN ofp <> nfp THEN 'changed' ELSE 'unchanged' END AS status
      FROM j WHERE ofp IS NULL OR nfp IS NULL OR ofp <> nfp""")),

    // Ordered conversion funnel signup → click → purchase: per user the
    // earliest signup, the earliest click STRICTLY AFTER it, the earliest
    // purchase after that — the in-order semantics an unordered per-type
    // min would get wrong. One user-keyed aggregate per stage plus one
    // user-keyed join per later stage; lags ride as exact unix-micros
    // integers so the replay is bit-identical.
    ("q146_funnel", (s: SparkSession, d: String) => {
      graft.ops.EventAnalytics.funnel(t(s, d, "events"),
        "user_id", "ts", "event_type", Seq("signup", "click", "purchase"))
    }, Some(s"""WITH e AS (SELECT user_id AS u, event_type AS et,
          epoch_us($tsUs) AS t FROM events),
      s0 AS (SELECT u, min(t) AS t0 FROM e WHERE et = 'signup' GROUP BY u),
      s1 AS (SELECT e.u, s0.t0, min(e.t) AS tk FROM e
        JOIN s0 ON e.u = s0.u WHERE e.et = 'click' AND e.t > s0.t0
        GROUP BY e.u, s0.t0),
      s2 AS (SELECT e.u, s1.t0, min(e.t) AS tk FROM e
        JOIN s1 ON e.u = s1.u WHERE e.et = 'purchase' AND e.t > s1.tk
        GROUP BY e.u, s1.t0)
      SELECT CAST(0 AS INTEGER) AS stage_idx, 'signup' AS stage,
        CAST(count(*) AS BIGINT) AS n_users, CAST(0 AS BIGINT) AS total_lag_us
      FROM s0
      UNION ALL SELECT CAST(1 AS INTEGER), 'click', CAST(count(*) AS BIGINT),
        CAST(coalesce(sum(tk - t0), 0) AS BIGINT) FROM s1
      UNION ALL SELECT CAST(2 AS INTEGER), 'purchase', CAST(count(*) AS BIGINT),
        CAST(coalesce(sum(tk - t0), 0) AS BIGINT) FROM s2""")),

    // Weekly cohort retention: cohort = the Monday-aligned week index of a
    // user's first event; one output row per (cohort, week offset) with the
    // active-user count. Week index is pure integer day arithmetic
    // (days-since-1970-01-05 div 7) — no engine-specific date_trunc('week')
    // convention — and the events table collapses to one row per
    // (user, week) before anything joins.
    ("q147_retention", (s: SparkSession, d: String) => {
      graft.ops.EventAnalytics.weeklyRetention(t(s, d, "events"),
        "user_id", "ts")
    }, Some(s"""WITH uw AS (SELECT DISTINCT user_id AS u,
          CAST(date_diff('day', DATE '1970-01-05', CAST($tsUs AS DATE)) // 7 AS BIGINT) AS wk
        FROM events),
      c AS (SELECT u, min(wk) AS cohort_wk FROM uw GROUP BY u)
      SELECT c.cohort_wk, uw.wk - c.cohort_wk AS week_offset,
        CAST(count(*) AS BIGINT) AS n_users
      FROM uw JOIN c ON uw.u = c.u GROUP BY 1, 2""")),

    // Epoch-aware data mixing: per-source rates from a fixed token budget,
    // where sources UNDER budget get weight > 1 and are deterministically
    // REPLICATED (floor(w) copies + a hash-gated fractional copy) — the
    // "wiki ×2.5" multi-epoch recipe q82's keep-only sampling cannot
    // express. The 1400-token budget straddles w = 1 on this fixture, so
    // both the replication and the downsample leg are exercised. Explode is
    // fused into the scan: no shuffle until the final per-source roll-up.
    ("q148_epoch_mix", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          TextStats.tokenCount(col("text")).as("n_tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val rates = docs.groupBy("source").agg(sum(col("n_tok")).as("tot"))
        .select(col("source"), (lit(1400.0) / col("tot")).as("w"))
      graft.llm.Sampling.epochMixture(
          docs.join(broadcast(rates), Seq("source")), col("doc_id"), col("w"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"))
    }, Some("""WITH dc AS (SELECT doc_id, source,
        CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS INTEGER) AS n_tok
        FROM documents),
      rates AS (SELECT source,
        CAST(1400.0 AS DOUBLE) / CAST(sum(n_tok) AS BIGINT) AS w
        FROM dc GROUP BY source),
      m AS (SELECT doc_id, source, n_tok,
          CAST(floor(w) AS BIGINT) + CASE WHEN
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#e'), 1, 8))::BIGINT AS DOUBLE)
              / 4294967296.0 < w - floor(w) THEN 1 ELSE 0 END AS n
        FROM dc JOIN rates USING (source)),
      x AS (SELECT doc_id, source, n_tok FROM m, UNNEST(range(0, n)) AS t(i))
      SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM x GROUP BY source""")),

    // Clickstream path mining: the 10 most common CONSECUTIVE event-type
    // triples across user timelines (n=3 path n-grams; n=2 is the Markov
    // transition matrix). The window partitions by user — every timeline
    // sorts independently — and the aggregate lands on the bounded
    // |vocab|³ path space, so the final tie-pinned top-10 ranks ≤125 rows
    // no matter the corpus size.
    ("q149_event_paths", (s: SparkSession, d: String) => {
      val paths = graft.ops.EventAnalytics.pathNgrams(t(s, d, "events"),
        "user_id", "ts", "event_id", "event_type", 3)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n_paths").desc, col("p0"), col("p1"), col("p2"))
      paths.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 10)
    }, Some(s"""WITH l AS (SELECT user_id, event_type AS p0,
          lead(event_type, 1) OVER w AS p1, lead(event_type, 2) OVER w AS p2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY $tsUs, event_id)),
      g AS (SELECT p0, p1, p2, CAST(count(*) AS BIGINT) AS n_paths FROM l
        WHERE p1 IS NOT NULL AND p2 IS NOT NULL GROUP BY p0, p1, p2),
      r AS (SELECT *, row_number() OVER (ORDER BY n_paths DESC, p0, p1, p2)
          AS rnk FROM g)
      SELECT p0, p1, p2, n_paths, CAST(rnk AS INTEGER) AS rank
      FROM r WHERE rnk <= 10""")),

    // Exact Pearson correlation matrix in ONE pass: the aggregate collects
    // n/Σx/Σx²/Σxy through decimal routing, so the matrix is a pure
    // function of the row multiset — built-in corr() is accumulation-order
    // dependent and can't be oracled. One fixed-size model row; the pairs
    // explode out of it without a second scan.
    ("q150_corr_matrix", (s: SparkSession, d: String) => {
      graft.ops.Stats.corrMatrix(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
    }, Some("""WITH a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s_q,
        CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS ss_q,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS s_p,
        CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS ss_p,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS s_d,
        CAST(SUM(CAST(l_discount*l_discount AS DECIMAL(18,6))) AS DOUBLE) AS ss_d,
        CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sp_qp,
        CAST(SUM(CAST(l_quantity*l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sp_qd,
        CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sp_pd
        FROM lineitem)
      SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
        floor((n*sp_qp - s_q*s_p)
          / (sqrt(n*ss_q - s_q*s_q) * sqrt(n*ss_p - s_p*s_p))
          * 1000000.0 + 0.5) / 1000000.0 AS corr FROM a
      UNION ALL SELECT 'l_quantity', 'l_discount',
        floor((n*sp_qd - s_q*s_d)
          / (sqrt(n*ss_q - s_q*s_q) * sqrt(n*ss_d - s_d*s_d))
          * 1000000.0 + 0.5) / 1000000.0 FROM a
      UNION ALL SELECT 'l_extendedprice', 'l_discount',
        floor((n*sp_pd - s_p*s_d)
          / (sqrt(n*ss_p - s_p*s_p) * sqrt(n*ss_d - s_d*s_d))
          * 1000000.0 + 0.5) / 1000000.0 FROM a""")),

    // Equi-width histogram (the profiling companion to q83): one min/max
    // aggregate broadcast into the scan, one bounded k-row count — the top
    // edge closes into the last bucket, bounds derived from the SAME stats
    // row so they replay bit-identically.
    ("q151_histogram", (s: SparkSession, d: String) => {
      graft.ops.Stats.histogram(t(s, d, "orders"), "o_totalprice", 16)
    }, Some("""WITH st AS (SELECT min(CAST(o_totalprice AS DOUBLE)) AS m,
          max(CAST(o_totalprice AS DOUBLE)) AS mx FROM orders),
      b AS (SELECT CASE WHEN mx = m THEN 0
          ELSE least(15, CAST(floor((CAST(o_totalprice AS DOUBLE) - m)
            / (mx - m) * 16) AS INTEGER)) END AS bucket, m, mx
        FROM orders, st),
      g AS (SELECT bucket, m, mx, CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY bucket, m, mx)
      SELECT bucket, m + bucket * (mx - m) / 16 AS lo,
        m + (bucket + 1) * (mx - m) / 16 AS hi, n FROM g""")),

    // Incremental aggregate-view maintenance, REPLAYED END TO END: three
    // delta batches (lineitem carved by orderkey mod 3) fold into a
    // hash-bucketed ManifestTable state via merge(old, agg(delta)) — each
    // batch rewrites only touched buckets — and the maintained table must
    // equal the ONE-SHOT global aggregate, which is exactly what the
    // oracle computes. Decimal-routed sums make that equality exact under
    // any batch order; the lakehouse machinery (manifest commits, bucket
    // pruning, carry-forward) all sits on the verified path.
    ("q152_incremental_agg", (s: SparkSession, d: String) => {
      val l = t(s, d, "lineitem")
      val root = java.nio.file.Files.createTempDirectory("q152-agg")
        .toString + "/state"
      Seq(0, 1, 2).foreach { b =>
        graft.ops.IncrementalAgg.applyBatch(s, root,
          l.filter(pmod(col("l_orderkey"), lit(3)) === b),
          "l_partkey", "l_extendedprice", nBuckets = 16)
      }
      graft.sources.ManifestTable.read(s, root,
          graft.ops.IncrementalAgg.stateSchema)
        .select(col("key"), col("n"), col("s").cast("double").as("s"),
          col("mn"), col("mx"))
    }, Some("""SELECT CAST(l_partkey AS VARCHAR) AS key,
        CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS s,
        min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
      FROM lineitem GROUP BY l_partkey""")),

    // DELETE as merge-on-read deletion vectors, REPLAYED END TO END: orders
    // becomes a partitioned ManifestTable, two DELETE WHERE commits mask
    // rows positionally (no data file rewritten — O(matched rows) I/O, the
    // GDPR-erase shape at 100 TB), then OPTIMIZE materializes the deletes
    // into a clean rewrite. The SAME aggregate over the DV-masked read and
    // the compacted read must equal the oracle's plain filtered aggregate —
    // deleted-set algebra: survivors of delete₁ then delete₂ == NOT p₁ AND
    // NOT p₂ over the source.
    ("q153_delete_vectors", (s: SparkSession, d: String) => {
      val cols = Seq("o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice")
      val o = t(s, d, "orders").select(cols.map(col): _*)
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_orderpriority", StringType),
        StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType)))
      val root = java.nio.file.Files.createTempDirectory("q153-dv")
        .toString + "/t"
      import graft.sources.ManifestTable
      ManifestTable.commit(o, root, Some("o_orderpriority"))
      ManifestTable.deleteWhere(s, root, schema, col("o_totalprice") > 300000.0)
      ManifestTable.deleteWhere(s, root, schema,
        col("o_orderstatus") === "F" && col("o_totalprice") < 50000.0)
      def agg(df: DataFrame, stage: String) =
        df.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("s"))
          .withColumn("stage", lit(stage))
      val masked = agg(ManifestTable.read(s, root, schema), "dv")
      ManifestTable.compact(s, root, schema, Some("o_orderpriority"))
      val compacted = agg(ManifestTable.read(s, root, schema), "compacted")
      masked.unionByName(compacted)
        .select(col("stage"), col("o_orderpriority"), col("n"), col("s"))
    }, Some(s"""WITH kept AS (SELECT o_orderpriority, o_totalprice FROM orders
        WHERE NOT (o_totalprice > 300000.0)
          AND NOT (o_orderstatus = 'F' AND o_totalprice < 50000.0)),
      g AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
          ${dsumSql("o_totalprice")} AS s
        FROM kept GROUP BY o_orderpriority)
      SELECT 'dv' AS stage, o_orderpriority, n, s FROM g
      UNION ALL SELECT 'compacted', o_orderpriority, n, s FROM g""")),

    // CHANGE DATA FEED: three commits (full load → one-partition rewrite
    // with updates/deletes/inserts → a deletion-vector delete in a second
    // partition), then changes(v1, v3) must emit exactly the Delta-CDF
    // tagged rows the oracle derives from the source algebraically. The
    // feed reads ONLY the two touched partitions on both sides (manifest
    // entry diff + DV-delta paths) — the incremental-consumer shape whose
    // I/O is proportional to the change, not the table (pruning itself is
    // asserted in SourcesSpec by deleting an untouched partition's files).
    ("q154_change_feed", (s: SparkSession, d: String) => {
      val cols = Seq("o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice")
      val o = t(s, d, "orders").select(cols.map(col): _*)
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_orderpriority", StringType),
        StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType)))
      val root = java.nio.file.Files.createTempDirectory("q154-cdf")
        .toString + "/t"
      import graft.sources.ManifestTable
      ManifestTable.commit(o, root, Some("o_orderpriority"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      val rewritten = urgent.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(3)) === 0, col("o_totalprice") + lit(1.0))
            .otherwise(col("o_totalprice")))
      val inserts = urgent.filter(pmod(col("o_orderkey"), lit(11)) === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
      ManifestTable.commit(rewritten.unionByName(inserts), root, Some("o_orderpriority"))
      ManifestTable.deleteWhere(s, root, schema,
        col("o_orderpriority") === "2-HIGH" && col("o_orderstatus") === "F")
      ManifestTable.changes(s, root, schema, "o_orderkey", 1L, 3L)
    }, Some("""WITH u AS (SELECT o_orderkey, o_orderpriority, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderpriority = '1-URGENT'),
      del1 AS (SELECT * FROM u WHERE o_orderkey % 7 = 0),
      upd AS (SELECT * FROM u WHERE o_orderkey % 3 = 0 AND o_orderkey % 7 <> 0),
      ins AS (SELECT o_orderkey + 100000000 AS o_orderkey, o_orderpriority,
          o_orderstatus, o_totalprice FROM u WHERE o_orderkey % 11 = 0),
      del2 AS (SELECT o_orderkey, o_orderpriority, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderpriority = '2-HIGH' AND o_orderstatus = 'F')
      SELECT 'insert' AS _change_type, * FROM ins
      UNION ALL SELECT 'delete', * FROM del1
      UNION ALL SELECT 'delete', * FROM del2
      UNION ALL SELECT 'update_preimage', * FROM upd
      UNION ALL SELECT 'update_postimage', o_orderkey, o_orderpriority,
        o_orderstatus, o_totalprice + 1.0 FROM upd""")),

    // SCD Type 2: the orders stream read as a per-customer change log
    // ((status, priority) observed at each order date, last-writer-by-
    // orderkey within a date grain) collapses into validity intervals —
    // gaps-and-islands per key, one hash shuffle, no global window. The
    // oracle replays the identical lag→run→min(ts)→lead pipeline.
    ("q155_scd2", (s: SparkSession, d: String) => {
      graft.ops.Scd.type2(
        t(s, d, "orders").withColumn("o_orderdate",
          col("o_orderdate").cast("timestamp")), // q69 DATE rule: pin the type
        "o_custkey", "o_orderdate",
        Seq("o_orderstatus", "o_orderpriority"), "o_orderkey")
    }, Some("""WITH pick AS (SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ts,
          o_orderstatus, o_orderpriority,
          row_number() OVER (PARTITION BY o_custkey, o_orderdate
            ORDER BY o_orderkey DESC) AS rn
        FROM orders),
      lg AS (SELECT o_custkey, ts, o_orderstatus, o_orderpriority
        FROM pick WHERE rn = 1),
      rr AS (SELECT *, CASE WHEN lag(o_orderstatus) OVER w IS DISTINCT FROM o_orderstatus
            OR lag(o_orderpriority) OVER w IS DISTINCT FROM o_orderpriority
          THEN 1 ELSE 0 END AS nw FROM lg
        WINDOW w AS (PARTITION BY o_custkey ORDER BY ts)),
      rid AS (SELECT *, sum(nw) OVER (PARTITION BY o_custkey ORDER BY ts
          ROWS UNBOUNDED PRECEDING) AS run FROM rr),
      iv0 AS (SELECT o_custkey, run, o_orderstatus, o_orderpriority,
          min(ts) AS valid_from
        FROM rid GROUP BY o_custkey, run, o_orderstatus, o_orderpriority),
      iv AS (SELECT o_custkey, o_orderstatus, o_orderpriority, valid_from,
          lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from)
            AS valid_to FROM iv0)
      SELECT o_custkey, o_orderstatus, o_orderpriority, valid_from, valid_to,
        (valid_to IS NULL) AS is_current FROM iv""")),

    // Triangle counting + local clustering coefficient on the part
    // co-occurrence graph (parts bought together in one order = an edge) —
    // degree-ordered edge iterator, so wedge volume is O(m^1.5) and a hub
    // part cannot explode the join. Top-20 by triangle count, tri >= 1 so
    // the coefficient divisor is never zero; the total rides along as
    // sum(tri) div 3 (each triangle counted once per corner).
    ("q156_triangles", (s: SparkSession, d: String) => {
      // edge build: ONE groupBy shuffle + in-row pair explosion instead of
      // a self-join (which shuffles lineitem twice and joins) — per-order
      // part sets are tiny (TPC-H <= 7 lineitems/order), so the quadratic
      // pair expansion is in-row and cheap; sort_array + i<j slices emit
      // each pair once in (a < b) orientation, identical to the join's
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.groupBy("o").agg(sort_array(collect_set(col("p"))).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> " +
            "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"))
          .as("ab"))
        .select(col("ab.a").as("a"), col("ab.b").as("b")).distinct()
      val stats = graft.ops.LinkGraph.triangleStats(e)
      val tot = stats.agg(expr("sum(tri) div 3").as("total_triangles"))
      stats.filter(col("tri") >= 1)
        .withColumn("coeff",
          (col("tri") * 2).cast("double") / (col("deg") * (col("deg") - 1)))
        .crossJoin(broadcast(tot))
        .orderBy(col("tri").desc, col("node"))
        .limit(20)
    }, Some("""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      e AS (SELECT DISTINCT x.p AS a, y.p AS b
        FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
      dg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v),
      ed AS (SELECT
          CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b) THEN a ELSE b END AS u,
          CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b) THEN b ELSE a END AS w,
          CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b) THEN db.deg ELSE da.deg END AS dw
        FROM e JOIN dg da ON e.a = da.v JOIN dg db ON e.b = db.v),
      tr AS (SELECT x.u, x.w AS p, y.w AS q
        FROM ed x JOIN ed y ON x.u = y.u
          AND (x.dw < y.dw OR (x.dw = y.dw AND x.w < y.w))
        JOIN ed z ON z.u = x.w AND z.w = y.w),
      tn AS (SELECT v, CAST(count(*) AS BIGINT) AS tri FROM
        (SELECT u AS v FROM tr UNION ALL SELECT p FROM tr UNION ALL SELECT q FROM tr)
        GROUP BY v),
      r AS (SELECT dg.v AS node, dg.deg, tn.tri FROM dg JOIN tn ON dg.v = tn.v
        WHERE tn.tri >= 1),
      tot AS (SELECT CAST(CAST(sum(tri) AS BIGINT) // 3 AS BIGINT)
          AS total_triangles FROM tn)
      SELECT node, deg, tri,
        CAST(tri * 2 AS DOUBLE) / (deg * (deg - 1)) AS coeff, total_triangles
      FROM r CROSS JOIN tot
      ORDER BY tri DESC, node LIMIT 20""")),

    // Incrementally-maintained COUNT(DISTINCT) view: the one aggregate the
    // q152 (n, sum, min, max) state can't carry — maintained as per-key KMV
    // bottom-64 hash arrays in a bucket-pruned ManifestTable, folded over
    // three delta batches. KMV union is exact set-union-truncate, so the
    // maintained sketch equals the one-shot sketch under ANY batch split —
    // which is exactly what the oracle computes (the q116 estimator over
    // the whole table at once).
    ("q157_incremental_distinct", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events").filter(col("user_id").isNotNull)
      val hv = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
      val root = java.nio.file.Files.createTempDirectory("q157-kmv")
        .toString + "/state"
      Seq(0, 1, 2).foreach { b =>
        graft.ops.IncrementalAgg.applyDistinctBatch(s, root,
          ev.filter(pmod(col("event_id"), lit(3)) === b),
          "event_type", hv, k = 64, nBuckets = 8)
      }
      graft.ops.IncrementalAgg.distinctEstimate(
          graft.sources.ManifestTable.read(s, root,
            graft.ops.IncrementalAgg.distinctStateSchema), 64)
        .withColumnRenamed("key", "event_type")
    }, Some("""WITH h AS (SELECT DISTINCT event_type,
        ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        FROM events WHERE user_id IS NOT NULL),
      r AS (SELECT event_type, hv,
          row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn FROM h),
      a AS (SELECT event_type, count(*) AS nd FROM h GROUP BY event_type),
      kt AS (SELECT event_type, hv AS kth FROM r WHERE rn = 64)
      SELECT a.event_type,
        CAST(least(a.nd, 64) AS INTEGER) AS n_kept,
        kt.kth AS kth,
        CAST(CASE WHEN a.nd >= 64
          THEN floor(63 * pow(2::DOUBLE, 60) / CAST(kt.kth AS DOUBLE))
          ELSE a.nd END AS BIGINT) AS est
      FROM a LEFT JOIN kt ON a.event_type = kt.event_type""")),

    // Point-in-time-correct feature join: every order looks up the
    // customer's SCD2 state AS OF 30 days before the order — the
    // leakage-free feature-store join (training features must reflect what
    // was knowable THEN, not the current row). Spark side is the q155
    // dimension fed through the union-tag as-of window (one shuffle, no
    // theta join); the oracle exploits that contiguous intervals make
    // as-of == interval containment.
    ("q158_asof_scd2", (s: SparkSession, d: String) => {
      val orders = t(s, d, "orders").withColumn("o_orderdate",
        col("o_orderdate").cast("timestamp")) // q69 DATE rule
      val dim = graft.ops.Scd.type2(orders, "o_custkey",
          "o_orderdate", Seq("o_orderstatus", "o_orderpriority"), "o_orderkey")
        .select(col("o_custkey"), col("o_orderstatus").as("st"),
          col("o_orderpriority").as("pr"), col("valid_from"))
      val facts = orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"),
        (col("o_orderdate") - expr("INTERVAL 30 DAYS")).as("ts30"))
      graft.ops.TemporalJoin.asOf(facts, dim, "o_custkey", "ts30", "valid_from")
        .groupBy("st", "pr")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("s"))
    }, Some("""WITH pick AS (SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ts,
          o_orderstatus, o_orderpriority,
          row_number() OVER (PARTITION BY o_custkey, o_orderdate
            ORDER BY o_orderkey DESC) AS rn
        FROM orders),
      lg AS (SELECT o_custkey, ts, o_orderstatus, o_orderpriority
        FROM pick WHERE rn = 1),
      rr AS (SELECT *, CASE WHEN lag(o_orderstatus) OVER w IS DISTINCT FROM o_orderstatus
            OR lag(o_orderpriority) OVER w IS DISTINCT FROM o_orderpriority
          THEN 1 ELSE 0 END AS nw FROM lg
        WINDOW w AS (PARTITION BY o_custkey ORDER BY ts)),
      rid AS (SELECT *, sum(nw) OVER (PARTITION BY o_custkey ORDER BY ts
          ROWS UNBOUNDED PRECEDING) AS run FROM rr),
      iv0 AS (SELECT o_custkey, run, o_orderstatus AS st, o_orderpriority AS pr,
          min(ts) AS valid_from
        FROM rid GROUP BY o_custkey, run, o_orderstatus, o_orderpriority),
      iv AS (SELECT o_custkey, st, pr, valid_from,
          lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from)
            AS valid_to FROM iv0),
      f AS (SELECT o_orderkey, o_custkey, o_totalprice,
          CAST(o_orderdate AS TIMESTAMP) - INTERVAL 30 DAY AS ts30 FROM orders)
      SELECT iv.st, iv.pr, CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(CAST(f.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS s
      FROM f JOIN iv ON f.o_custkey = iv.o_custkey
        AND iv.valid_from <= f.ts30
        AND (iv.valid_to IS NULL OR iv.valid_to > f.ts30)
      GROUP BY iv.st, iv.pr""")),

    // Data-skipping layers on the ORACLE path: lineitem committed with zone
    // maps + Bloom sidecars, then (a) a range predicate through the
    // zone-map-pruned read and (b) a point lookup through the Bloom-pruned
    // read must aggregate identically to plain filters over the source —
    // file skipping returns a superset, the exact predicate sits on top, so
    // any wrongly-skipped file shows up as a row-count/hash diff here.
    ("q159_pruned_scan", (s: SparkSession, d: String) => {
      val cols = Seq("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      val l = t(s, d, "lineitem").select(cols.map(col): _*)
      val schema = StructType(Seq(
        StructField("l_orderkey", LongType), StructField("l_returnflag", StringType),
        StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType)))
      val root = java.nio.file.Files.createTempDirectory("q159-prune")
        .toString + "/t"
      import graft.sources.ManifestTable
      // pre-split so every partition dir holds several files to skip over
      ManifestTable.commit(l.repartitionByRange(8, col("l_orderkey")),
        root, Some("l_returnflag"),
        statsCols = Seq("l_orderkey", "l_quantity"), bloomCols = Seq("l_orderkey"))
      val ranged = ManifestTable.readPruned(s, root, schema,
          Seq(ManifestTable.ColRange("l_orderkey", 100L, 5000L)))
        .filter(col("l_orderkey").between(100L, 5000L))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("s"))
        .withColumn("stage", lit("range"))
      // the point leg goes through readAuto: the Bloom probe + degenerate
      // range are EXTRACTED from the predicate itself (write-once filters)
      val point = ManifestTable.readAuto(s, root, schema, col("l_orderkey") === 1L)
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("s"))
        .withColumn("stage", lit("point"))
      ranged.unionByName(point).select("stage", "n", "s")
    }, Some(s"""SELECT 'range' AS stage, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("l_extendedprice")} AS s
      FROM lineitem WHERE l_orderkey BETWEEN 100 AND 5000
      UNION ALL SELECT 'point', CAST(count(*) AS BIGINT),
        ${dsumSql("l_extendedprice")}
      FROM lineitem WHERE l_orderkey = 1""")),

    // Record linkage by Jaro-Winkler: dirty probes (every ~101st customer
    // name with its 10th character deleted) re-linked to the customer table
    // by best JW score — the scorer is a native codegen'd expression whose
    // semantics are pinned to DuckDB's INDEPENDENT jaro_winkler_similarity
    // implementation, so the oracle is a true cross-implementation check.
    // Bounded probe set broadcasts (the q21 contract); scores route through
    // round6 on both engines; top-1 pinned by (sim desc, c_custkey).
    ("q160_jaro_link", (s: SparkSession, d: String) => {
      val cust = t(s, d, "customer").select(col("c_custkey"), col("c_name"))
      val probes = cust.filter(pmod(col("c_custkey"), lit(101)) === 0)
        .select(col("c_custkey").as("probe_id"),
          concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 11, 64))
            .as("probe"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("probe_id")).orderBy(col("sim").desc, col("c_custkey"))
      // |cust|×|probes| jaro-winkler scores ran in ONE task (single-row-group
      // scan) — fan the corpus side out before the broadcast fan-out
      Tables.fanOut(cust, col("c_custkey")).crossJoin(broadcast(probes))
        .withColumn("sim", graft.llm.Sampling.round6(
          graft.functions.Fuzzy.jaroWinkler(col("c_name"), col("probe"))))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select("probe_id", "probe", "c_custkey", "c_name", "sim")
    }, Some("""WITH probes AS (SELECT c_custkey AS probe_id,
          substr(c_name, 1, 9) || substr(c_name, 11) AS probe
        FROM customer WHERE c_custkey % 101 = 0),
      sc AS (SELECT p.probe_id, p.probe, c.c_custkey, c.c_name,
          floor(jaro_winkler_similarity(c.c_name, p.probe) * 1000000.0 + 0.5)
            / 1000000.0 AS sim
        FROM customer c CROSS JOIN probes p),
      r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
          ORDER BY sim DESC, c_custkey) AS rn FROM sc)
      SELECT probe_id, probe, c_custkey, c_name, sim FROM r WHERE rn = 1""")),

    // STREAMING delivery of the q152 incremental aggregate view: the three
    // delta carves arrive as a parquet file stream (maxFilesPerTrigger=1 →
    // three micro-batches under AvailableNow) and fold into the bucket-
    // pruned ManifestTable state via foreachBatch — the streaming
    // materialized-view maintenance loop, held to the same one-shot oracle
    // as the batch path. KMV-style order independence comes free: decimal-
    // routed sums make the maintained state a pure function of the row
    // multiset, whatever order the file source lists the batches.
    ("q161_streaming_inc_agg", (s: SparkSession, d: String) => {
      val l = t(s, d, "lineitem")
        .select("l_orderkey", "l_partkey", "l_extendedprice")
      val root = java.nio.file.Files.createTempDirectory("q161-sagg").toString
      // two staged files = two micro-batches: one seeds the state table,
      // one proves the INCREMENT (merge into existing buckets) — a third
      // round re-proved the same leg for ~1 s of pure fixed cost (r17)
      Seq(0, 1).foreach { b =>
        l.filter(pmod(col("l_orderkey"), lit(2)) === b)
          .coalesce(1).write.mode("append").parquet(s"$root/stage")
      }
      val stream = s.readStream
        .schema(StructType(Seq(
          StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
          StructField("l_extendedprice", DoubleType))))
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$root/stage")
      stream.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          graft.ops.IncrementalAgg.applyBatch(s, s"$root/state", batch,
            "l_partkey", "l_extendedprice", nBuckets = 16)
          ()
        }
        .start().awaitTermination()
      graft.sources.ManifestTable.read(s, s"$root/state",
          graft.ops.IncrementalAgg.stateSchema)
        .select(col("key"), col("n"), col("s").cast("double").as("s"),
          col("mn"), col("mx"))
    }, Some("""SELECT CAST(l_partkey AS VARCHAR) AS key,
        CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS s,
        min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
      FROM lineitem GROUP BY l_partkey""")),

    // Sliding (hop) event-time windows — Spark's native `window()` bucketing
    // (1h width, 15min slide: every event lands in 4 epoch-aligned buckets,
    // fused into the scan as a generate, then ONE hash aggregate). The
    // oracle replays the bucket math in exact µs integers: k ranges over
    // (floor((t-size)/slide), floor(t/slide)], start = k·slide — boundary
    // events (t exactly on a slide) exercise the half-open [start, end).
    ("q162_hop_windows", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("nu"))
        .select(col("w.start").as("ws"), col("w.end").as("we"),
          col("event_type"), col("n"), col("nu"))
    }, Some(s"""WITH e AS (SELECT epoch_us($tsUs) AS tu, event_type, user_id
        FROM events),
      b AS (SELECT tu, event_type, user_id,
          unnest(range(CAST(floor((tu - 3600000000) / 900000000) AS BIGINT) + 1,
                       CAST(floor(tu / 900000000) AS BIGINT) + 1)) AS k
        FROM e)
      SELECT TIMESTAMP '1970-01-01' + k * INTERVAL 900 SECOND AS ws,
        TIMESTAMP '1970-01-01' + (k + 4) * INTERVAL 900 SECOND AS we,
        event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(count(DISTINCT user_id) AS BIGINT) AS nu
      FROM b GROUP BY k, event_type""")),

    // Half-life-decayed activity score (6h half-life): recency-weighted
    // engagement per user — 2^-(age div halfLife) per event at the user's
    // last event. Integer bucket exponents + exact binary 2^-k + per-term
    // round6 + decimal-routed sum = order-independent and engine-exact
    // with NO transcendental (an exp(-Δ/τ) weight would hinge on libm ulps).
    ("q163_decay_score", (s: SparkSession, d: String) => {
      graft.ops.EventAnalytics.halfLifeScore(t(s, d, "events"),
        "user_id", "ts", 21600000000L)
    }, Some(s"""WITH e AS (SELECT user_id, epoch_us($tsUs) AS tu
        FROM events WHERE user_id IS NOT NULL),
      m AS (SELECT user_id, max(tu) AS t1 FROM e GROUP BY user_id),
      t AS (SELECT e.user_id,
          floor(power(0.5, CAST((m.t1 - e.tu) // 21600000000 AS DOUBLE))
            * 1000000.0 + 0.5) / 1000000.0 AS term
        FROM e JOIN m USING (user_id))
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        CAST(SUM(CAST(term AS DECIMAL(18,6))) AS DOUBLE) AS decayed
      FROM t GROUP BY user_id""")),

    // Robust outlier gate (median/MAD): |x − med| > 3·1.4826·MAD per
    // return-flag group — the robust z-score that survives the outliers it
    // hunts. Medians are exact textbook even/odd selections ((min+max)/2
    // over the two middle positions), so every derived number — including
    // the per-row FLAGS, not just the summaries — is a fixed IEEE op
    // sequence both engines replay; no rounding anywhere.
    ("q164_robust_outliers", (s: SparkSession, d: String) => {
      graft.ops.Stats.robustOutliers(t(s, d, "lineitem"),
        "l_returnflag", "l_extendedprice")
    }, Some("""WITH b AS (SELECT l_returnflag AS g,
          CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        WHERE l_extendedprice IS NOT NULL),
      r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
          count(*) OVER (PARTITION BY g) AS n FROM b),
      med AS (SELECT g, (min(v) + max(v)) / 2 AS med FROM r
        WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY g),
      dv AS (SELECT b.g, b.v, abs(b.v - med.med) AS dev, med.med AS med
        FROM b JOIN med USING (g)),
      r2 AS (SELECT g, dev, row_number() OVER (PARTITION BY g ORDER BY dev) AS rn,
          count(*) OVER (PARTITION BY g) AS n FROM dv),
      mad AS (SELECT g, (min(dev) + max(dev)) / 2 AS mad FROM r2
        WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY g)
      SELECT dv.g AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
        min(dv.med) AS med, min(mad.mad) AS mad,
        CAST(SUM(CASE WHEN dv.dev > 3.0 * 1.4826 * mad.mad THEN 1 ELSE 0 END)
          AS BIGINT) AS n_outliers
      FROM dv JOIN mad USING (g) GROUP BY dv.g""")),

    // Cross-system table checksum: per return-flag n + sum of 60-bit row
    // hashes over the NULL-framed key/flag tuple — a pure function of the
    // row multiset (order/partitioning-free), so replicas reconcile by
    // comparing 3 rows instead of re-reading each other. The oracle IS the
    // use case: DuckDB independently checksums the same parquet and must
    // land on the same strings.
    ("q165_table_checksum", (s: SparkSession, d: String) => {
      graft.ops.Integrity.tableChecksum(t(s, d, "lineitem"),
        Seq("l_returnflag"),
        Seq("l_orderkey", "l_partkey", "l_linenumber", "l_returnflag", "l_linestatus"))
    }, Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(('0x' || substr(md5(concat_ws(chr(31),
            coalesce(CAST(l_orderkey AS VARCHAR), chr(30)),
            coalesce(CAST(l_partkey AS VARCHAR), chr(30)),
            coalesce(CAST(l_linenumber AS VARCHAR), chr(30)),
            coalesce(l_returnflag, chr(30)),
            coalesce(l_linestatus, chr(30)))), 1, 15))::BIGINT)
          AS VARCHAR) AS checksum
      FROM lineitem GROUP BY l_returnflag""")),

    // Preference-pair construction (DPO/reward-model training data): per
    // query, chosen = highest-BM25 retrieved doc, rejected = lowest-scoring
    // retrieved doc, margin alongside — ranking-derived weak supervision.
    // Rides the shared postings probe; two windows over one query
    // partition; single-doc retrieval sets emit no pair.
    ("q166_dpo_pairs", (s: SparkSession, d: String) => {
      import s.implicits._
      val qs = graft.llm.Retrieval.sampleQueries.toDF("query_id", "qtext")
      graft.llm.Retrieval.preferencePairs(t(s, d, "documents"),
        "doc_id", "text", qs, "query_id", "qtext")
    }, Some(s"""WITH $bm25CoreSql,
      ch AS (SELECT query_id, doc_id AS chosen_doc, score AS chosen_score,
          row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id) AS r FROM pd),
      rj AS (SELECT query_id, doc_id AS rejected_doc, score AS rejected_score,
          row_number() OVER (PARTITION BY query_id
            ORDER BY score ASC, doc_id DESC) AS r FROM pd)
      SELECT c.query_id, c.chosen_doc, c.chosen_score,
        r.rejected_doc, r.rejected_score,
        c.chosen_score - r.rejected_score AS margin
      FROM ch c JOIN rj r ON c.query_id = r.query_id
      WHERE c.r = 1 AND r.r = 1 AND c.chosen_doc <> r.rejected_doc""")),

    // Salted equi-join == plain equi-join: the hot-key mitigation must be
    // result-invisible (salting only redistributes reducer load), so its
    // oracle IS the unsalted join — any row duplicated or dropped by the
    // salt plumbing breaks the hash. Aggregated per brand to keep the dump
    // bounded.
    ("q167_salted_join", (s: SparkSession, d: String) => {
      val facts = t(s, d, "lineitem")
        .select(col("l_partkey").as("k"), col("l_quantity"), col("l_extendedprice"))
      val dim = t(s, d, "part")
        .select(col("p_partkey").as("k"), col("p_brand"))
      graft.ops.Skew.saltedJoin(facts, dim, "k", saltFactor = 8)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("s"))
    }, Some(s"""SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("l.l_extendedprice")} AS s
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand""")),

    // Two-phase salted aggregation == one-phase aggregation: phase-1
    // partials on (key, salt) recombine exactly (decimal sums are
    // associative, min/max idempotent), so the skew-proof plan must hash
    // identically to the direct GROUP BY the oracle runs.
    ("q168_two_phase_agg", (s: SparkSession, d: String) => {
      graft.ops.Skew.twoPhaseAgg(
          t(s, d, "lineitem").select("l_suppkey", "l_extendedprice"),
          "l_suppkey", saltFactor = 8,
          Map(
            "n" -> (count(lit(1)), sum(col("n"))),
            "s" -> (sum(col("l_extendedprice").cast("decimal(18,6)")), sum(col("s"))),
            "mn" -> (min(col("l_extendedprice")), min(col("mn"))),
            "mx" -> (max(col("l_extendedprice")), max(col("mx")))))
        .select(col("l_suppkey"), col("n"), col("s").cast("double").as("s"),
          col("mn"), col("mx"))
    }, Some("""SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS s,
        min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
      FROM lineitem GROUP BY l_suppkey""")),

    // mongoexport round trip on the ORACLE path: a relaxed-extended-JSON
    // dump is SYNTHESIZED from orders ($oid/$numberDecimal/$numberLong
    // wrappers), written as NDJSON, decoded back through the shared
    // stripExtended passes + from_json, and aggregated — the oracle
    // recomputes directly from orders, so any wrapper the decoder mangles
    // (or value the text round trip corrupts) breaks the hash.
    ("q169_mongo_dump", (s: SparkSession, d: String) => {
      val o = t(s, d, "orders").filter(pmod(col("o_orderkey"), lit(50)) === 0)
      val line = concat(
        lit("{\"_id\": {\"$oid\": \""),
        lpad(lower(conv(col("o_orderkey").cast("string"), 10, 16)), 24, "0"),
        lit("\"}, \"status\": \""), col("o_orderstatus"),
        lit("\", \"total\": {\"$numberDecimal\": \""),
        col("o_totalprice").cast("string"),
        lit("\"}, \"okey\": {\"$numberLong\": \""),
        col("o_orderkey").cast("string"), lit("\"}}"))
      val root = java.nio.file.Files.createTempDirectory("q169-dump").toString
      o.select(line.as("value")).coalesce(1).write.text(s"$root/dump")
      val schema = StructType(Seq(
        StructField("_id", StringType), StructField("status", StringType),
        StructField("total", DoubleType), StructField("okey", LongType)))
      graft.sources.Sources.mongoExportFile(s, s"$root/dump", schema)
        .filter(!col("_malformed"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"), dsum(col("total")).as("tot"),
          sum(col("okey")).as("ok_sum"), min(col("_id")).as("min_id"))
    }, Some(s"""SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("o_totalprice")} AS tot,
        CAST(CAST(sum(o_orderkey) AS BIGINT) AS BIGINT) AS ok_sum,
        min(lpad(to_hex(o_orderkey), 24, '0')) AS min_id
      FROM orders WHERE o_orderkey % 50 = 0 GROUP BY o_orderstatus""")),

    // DML rendering on the ORACLE path: the reference's typed-literal
    // INSERT surface (P17) rendered for an orders slice must equal the
    // byte-identical statements DuckDB assembles with its own string ops —
    // quoting, escaping, numeric text forms, and the TIMESTAMP() rendering
    // all cross-checked textually.
    ("q170_dml_render", (s: SparkSession, d: String) => {
      val o = t(s, d, "orders").filter(pmod(col("o_orderkey"), lit(97)) === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate").cast("timestamp").as("o_orderdate"))
      graft.sources.Sinks.renderInserts(o, "wh.orders")
    }, Some("""SELECT 'INSERT INTO wh.orders (o_orderkey, o_orderstatus, '
        || 'o_totalprice, o_orderdate) VALUES ('
        || CAST(o_orderkey AS VARCHAR) || ', '''
        || replace(o_orderstatus, '''', '''''') || ''', '
        || CAST(o_totalprice AS VARCHAR) || ', TIMESTAMP('''
        || strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f')
        || '''))' AS stmt
      FROM orders WHERE o_orderkey % 97 = 0""")),

    // DV-backed MERGE on the ORACLE path (VERDICT r12 #1): two merge-on-read
    // rounds against a partitioned ManifestTable — round 1 updates + inserts,
    // round 2 updates a subset INCLUDING round-1 appends (the DV must mask
    // appended rows too) — must equal the oracle's sequential MERGE
    // (anti-join + union) semantics. Write cost is O(batch + matched
    // positions) per round, never a partition rewrite; the equivalence to
    // copy-on-write at byte level is asserted in SourcesSpec/CdcSpec.
    ("q171_dv_merge", (s: SparkSession, d: String) => {
      import graft.sources.ManifestTable
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType)))
      val root = java.nio.file.Files.createTempDirectory("q171-dvm").toString + "/t"
      ManifestTable.commit(o, root, Some("o_orderstatus"))
      val b1 = o.filter(pmod(col("o_orderkey"), lit(37)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .unionByName(o.filter(pmod(col("o_orderkey"), lit(97)) === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
          .withColumn("o_totalprice", col("o_totalprice") + 1))
      ManifestTable.mergeDv(b1, root, schema, "o_orderkey", Some("o_orderstatus"))
      val b2 = ManifestTable.read(s, root, schema)
        .filter(pmod(col("o_orderkey"), lit(111)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 10)
      ManifestTable.mergeDv(b2, root, schema, "o_orderkey", Some("o_orderstatus"))
      ManifestTable.read(s, root, schema)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("s"),
          sum(col("o_orderkey")).as("ok_sum"))
    }, Some(s"""WITH t AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders),
      b1 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
          o_totalprice * 2 AS o_totalprice FROM t WHERE o_orderkey % 37 = 0
        UNION ALL SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
          o_totalprice + 1 FROM t WHERE o_orderkey % 97 = 0),
      m1 AS (SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b1)
        UNION ALL SELECT * FROM b1),
      b2 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
          o_totalprice + 10 AS o_totalprice FROM m1 WHERE o_orderkey % 111 = 0),
      m2 AS (SELECT * FROM m1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
        UNION ALL SELECT * FROM b2)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("o_totalprice")} AS s,
        CAST(CAST(sum(o_orderkey) AS BIGINT) AS BIGINT) AS ok_sum
      FROM m2 GROUP BY o_orderstatus"""))
  ) ++ Seq[(String, (SparkSession, String) => DataFrame, Option[String])](

    // The SQL FRONT DOOR (VERDICT r12 #4): the q159 skipping aggregates
    // expressed through `spark.sql` over a `graft`-format temp view — the
    // WHERE clauses travel Spark → V1 relation PushedFilters → zone-map
    // ranges + Bloom point probes, the pruned file set is scanned, and
    // Spark applies the exact predicates on top. Results must equal plain
    // filters over the source, so a wrongly-skipped file diffs here.
    ("q172_sql_front_door", (s: SparkSession, d: String) => {
      val cols = Seq("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      val l = t(s, d, "lineitem").select(cols.map(col): _*)
      val root = java.nio.file.Files.createTempDirectory("q172-sql").toString + "/t"
      l.repartitionByRange(8, col("l_orderkey"))
        .write.format("graft").option("partitionBy", "l_returnflag")
        .option("statsCols", "l_orderkey,l_quantity")
        .option("bloomCols", "l_orderkey")
        .mode("overwrite").save(root)
      s.read.format("graft").load(root).createOrReplaceTempView("graft_lineitem")
      s.sql(s"""
        SELECT 'range' AS stage, count(1) AS n,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS s
        FROM graft_lineitem WHERE l_orderkey BETWEEN 100 AND 5000
        UNION ALL
        SELECT 'point', count(1),
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        FROM graft_lineitem WHERE l_orderkey = 1""")
    }, Some(s"""SELECT 'range' AS stage, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("l_extendedprice")} AS s
      FROM lineitem WHERE l_orderkey BETWEEN 100 AND 5000
      UNION ALL SELECT 'point', CAST(count(*) AS BIGINT),
        ${dsumSql("l_extendedprice")}
      FROM lineitem WHERE l_orderkey = 1""")),

    // FULL MERGE semantics in ONE merge-on-read commit (Delta's WHEN
    // MATCHED UPDATE / NOT MATCHED INSERT / MATCHED DELETE): the upsert
    // batch appends + masks its keys' old positions, the delete leg masks
    // its keys with no append — all behind one manifest rename. A key in
    // BOTH legs keeps the upserted copy (delete masks only pre-merge
    // positions), which the oracle replays as delete-then-upsert.
    ("q173_dv_merge_full", (s: SparkSession, d: String) => {
      import graft.sources.ManifestTable
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType)))
      val root = java.nio.file.Files.createTempDirectory("q173-dvf").toString + "/t"
      ManifestTable.commit(o, root, Some("o_orderstatus"))
      val b = o.filter(pmod(col("o_orderkey"), lit(41)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 3)
      val dels = o.filter(pmod(col("o_orderkey"), lit(53)) === 0)
        .select("o_orderkey")
      ManifestTable.mergeDv(b, root, schema, "o_orderkey", Some("o_orderstatus"),
        deleteKeys = Some(dels))
      ManifestTable.read(s, root, schema)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("s"),
          sum(col("o_orderkey")).as("ok_sum"))
    }, Some(s"""WITH t AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders),
      b AS (SELECT o_orderkey, o_custkey, o_orderstatus,
          o_totalprice * 3 AS o_totalprice FROM t WHERE o_orderkey % 41 = 0),
      m AS (SELECT * FROM t WHERE o_orderkey % 53 <> 0
          AND o_orderkey NOT IN (SELECT o_orderkey FROM b)
        UNION ALL SELECT * FROM b)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("o_totalprice")} AS s,
        CAST(CAST(sum(o_orderkey) AS BIGINT) AS BIGINT) AS ok_sum
      FROM m GROUP BY o_orderstatus""")),

    // Matryoshka (MRL) two-stage retrieval: top-20 candidates by exact L2
    // over the 16-dim embedding PREFIX (the nested-representation property
    // — at 100 TB the prefix is its own pruned parquet column, 1/4 of the
    // vector bytes), exact full-dim re-rank to the final top-5. Truncation
    // error confined to candidate selection, the q135 refine contract.
    ("q174_matryoshka", (s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      graft.llm.SimSearch.matryoshkaTopK(
        emb.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"), col("embedding")),
        emb, k = 5, kPrime = 20, prefixDims = 16)
    }, Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 8),
      c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
      sc AS (SELECT query_id, c.vec_id,
          round(${sqSql("(qv[1:16])", "(cv[1:16])", 16)}, 6) AS d
        FROM c CROSS JOIN q),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY d, vec_id) AS rnk FROM sc),
      cand AS (SELECT query_id, vec_id FROM w WHERE rnk <= 20),
      re AS (SELECT cand.query_id, cand.vec_id,
          round(${sqSql("qv", "cv", 64)}, 6) AS dist
        FROM cand JOIN c ON cand.vec_id = c.vec_id
        JOIN q ON cand.query_id = q.query_id),
      w2 AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY dist, vec_id) AS rnk FROM re)
      SELECT query_id, vec_id, dist, CAST(rnk AS INTEGER) AS rank
      FROM w2 WHERE rnk <= 5""")),

    // TABLE REPLICATION over the change feed — the reference's whole
    // purpose (Mongo -> BigQuery sync) as lakehouse machinery: three
    // source commits (seed, partition-pruned update merge, DV delete)
    // replay into a replica one mergeDv per version, O(changed rows) each;
    // the replica's aggregate must equal the oracle's sequential
    // merge/delete replay of the same steps.
    ("q175_cdf_replicate", (s: SparkSession, d: String) => {
      import graft.sources.ManifestTable
      // half of orders: the query measures the poll-replication PROTOCOL
      // (seed snapshot + per-version replay of a rewrite merge and a DV
      // delete); the scale curves live in StressBench cdf_stream (r17)
      val o = t(s, d, "orders").filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType)))
      val base = java.nio.file.Files.createTempDirectory("q175-rep").toString
      val src = s"$base/src"; val dst = s"$base/dst"
      ManifestTable.commit(o, src, Some("o_orderstatus")) // v1
      // first call SEEDS the replica from v1's snapshot ...
      ManifestTable.replicate(s, src, dst, schema, "o_orderkey", Some("o_orderstatus"))
      val upd = o.filter(pmod(col("o_orderkey"), lit(43)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 100)
      ManifestTable.commit(
        graft.ops.Upsert.mergePartitionPruned(
          ManifestTable.read(s, src, schema), upd, "o_orderkey", "o_orderstatus"),
        src, Some("o_orderstatus")) // v2: rewrite merge
      ManifestTable.deleteWhere(s, src, schema,
        pmod(col("o_orderkey"), lit(59)) === 0) // v3: DV delete
      // ... second call replays v2 and v3 as O(changed rows) merge commits
      ManifestTable.replicate(s, src, dst, schema, "o_orderkey", Some("o_orderstatus"))
      ManifestTable.read(s, dst, schema)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("s"),
          sum(col("o_orderkey")).as("ok_sum"))
    }, Some(s"""WITH t AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0),
      m1 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderkey % 43 = 0 THEN o_totalprice + 100
               ELSE o_totalprice END AS o_totalprice FROM t),
      m2 AS (SELECT * FROM m1 WHERE o_orderkey % 59 <> 0)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("o_totalprice")} AS s,
        CAST(CAST(sum(o_orderkey) AS BIGINT) AS BIGINT) AS ok_sum
      FROM m2 GROUP BY o_orderstatus""")),

    // Token-budget data selection: take documents by (quality desc, id)
    // while the running token cost fits a fixed budget — the "fill a
    // 10B-token training budget with the best docs" curation op. The
    // Spark side is the two-pass bucket decomposition (NO corpus-wide
    // single-partition sort); the oracle is the naive global take-while
    // cumsum, which the decomposition must equal row for row. Duplicate
    // n_chars values make score TIES routine, exercising the boundary
    // bucket's id-ordered partial take.
    ("q176_token_budget", (s: SparkSession, d: String) => {
      val base = t(s, d, "documents").select(col("doc_id"),
        round(log(col("n_chars") + 1), 6).as("q"),
        TextStats.tokenCount(col("text")).as("ntok"))
      graft.llm.Sampling.tokenBudgetSelect(base, "doc_id", col("q"),
        col("ntok"), budget = 50000L)
    }, Some("""WITH b AS (SELECT doc_id, round(ln(1 + n_chars), 6) AS q,
        CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
          x -> x <> '')) AS BIGINT) AS ntok
      FROM documents),
      w AS (SELECT *, sum(ntok) OVER (ORDER BY q DESC, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM b)
      SELECT doc_id, q AS score, ntok AS cost FROM w WHERE cum <= 50000""")),

    // CONTINUOUS replication: the q175 pipeline under Structured Streaming
    // (VERDICT r13 #2) — `spark.readStream.format("graft")` turns the
    // manifest change feed into per-version micro-batches (seed snapshot,
    // then net diffs), and a foreachBatch folds each into the replica with
    // one mergeDv; the reference's change-stream loop
    // (src/process_insert_update_weather_data.py:168) as a trigger-driven
    // stream instead of a poll. The replica's aggregate must equal the
    // oracle's sequential merge/delete replay.
    ("q177_cdf_stream", (s: SparkSession, d: String) => {
      import graft.sources.ManifestTable
      val o = t(s, d, "orders").filter(pmod(col("o_orderkey"), lit(3)) === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType)))
      val base = java.nio.file.Files.createTempDirectory("q177-str").toString
      val src = s"$base/src"; val dst = s"$base/dst"
      ManifestTable.commit(o, src, Some("o_orderstatus")) // v1: seed
      // v2: upserts + deletes share ONE merge-on-read commit (the q178
      // delete-then-upsert contract: an upserted key survives its own
      // delete leg) — r17 folded the former separate deleteWhere round in,
      // halving the stream's diff micro-batches while both change legs
      // still flow through the feed in the one batch
      ManifestTable.mergeDv(
        o.filter(pmod(col("o_orderkey"), lit(47)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 200),
        src, schema, "o_orderkey", Some("o_orderstatus"),
        deleteKeys = Some(o.filter(pmod(col("o_orderkey"), lit(61)) === 0)
          .select("o_orderkey", "o_orderstatus")))
      val q = s.readStream.format("graft").schema(schema)
        .option("key", "o_orderkey").load(src)
        .writeStream.foreachBatch {
          (b0: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val b = b0.localCheckpoint()
            try {
              val ups = b.filter(col("_change_type").isin("insert", "update_postimage"))
                .drop("_change_type")
              val dels = b.filter(col("_change_type") === "delete")
                .select("o_orderkey", "o_orderstatus")
              if (!ManifestTable.exists(s, dst))
                ManifestTable.commit(ups, dst, Some("o_orderstatus"))
              else if (ups.count() + dels.count() > 0)
                ManifestTable.mergeDv(ups, dst, schema, "o_orderkey",
                  Some("o_orderstatus"), deleteKeys = Some(dels))
            } finally org.apache.spark.sql.graft.Checkpoints.release(b)
            ()
        }.option("checkpointLocation", s"$base/ckpt").start()
      try q.processAllAvailable() finally q.stop()
      ManifestTable.read(s, dst, schema)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("s"),
          sum(col("o_orderkey")).as("ok_sum"))
    }, Some(s"""WITH t AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 = 0),
      m1 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderkey % 47 = 0 THEN o_totalprice + 200
               ELSE o_totalprice END AS o_totalprice FROM t),
      m2 AS (SELECT * FROM m1 WHERE o_orderkey % 61 <> 0 OR o_orderkey % 47 = 0)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("o_totalprice")} AS s,
        CAST(CAST(sum(o_orderkey) AS BIGINT) AS BIGINT) AS ok_sum
      FROM m2 GROUP BY o_orderstatus""")),

    // COMPOSITE merge keys (VERDICT r13 #3) on the fixture whose natural
    // key famously repeats: lineitem keyed (l_orderkey, l_linenumber) —
    // the raw table carries duplicate composite keys with different
    // payloads, so the base dedupes per key first (independent per-column
    // maxes: deterministic on both engines), then two merge-on-read
    // rounds: upserts+inserts, then upserts+deletes sharing one commit
    // (delete-then-upsert replay, the q173 contract).
    ("q178_composite_merge", (s: SparkSession, d: String) => {
      import graft.sources.ManifestTable
      // half of lineitem: the composite-key + duplicate-payload semantics
      // are unchanged at half data (dups repeat per key, not per half);
      // merge write-amplification curves live in StressBench dv_merge (r17)
      val base = t(s, d, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(2)) === 0)
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(max(col("l_returnflag")).as("rf"), max(col("l_quantity")).as("qty"),
          max(col("l_extendedprice")).as("price"))
      val schema = StructType(Seq(
        StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
        StructField("rf", StringType), StructField("qty", DoubleType),
        StructField("price", DoubleType)))
      val keys = Seq("l_orderkey", "l_linenumber")
      val root = java.nio.file.Files.createTempDirectory("q178-ck").toString + "/t"
      ManifestTable.commit(base, root, Some("rf"))
      val b1 = base.filter(pmod(col("l_orderkey") * 7 + col("l_linenumber"), lit(37)) === 0)
        .withColumn("qty", col("qty") * 2)
        .unionByName(base
          .filter(pmod(col("l_orderkey") * 5 + col("l_linenumber"), lit(97)) === 0)
          .withColumn("l_orderkey", col("l_orderkey") + lit(10000000L))
          .withColumn("price", col("price") + 1))
      ManifestTable.mergeDv(b1, root, schema, keys, Some("rf"), Nil, Nil, None, None)
      val cur = ManifestTable.read(s, root, schema)
      val b2 = cur.filter(pmod(col("l_orderkey") + col("l_linenumber"), lit(53)) === 0)
        .withColumn("price", col("price") + 10)
      val dels = cur
        .filter(pmod(col("l_orderkey") * 3 + col("l_linenumber"), lit(71)) === 0)
        .select((keys :+ "rf").map(col): _*)
      ManifestTable.mergeDv(b2, root, schema, keys, Some("rf"), Nil, Nil,
        Some(dels), None)
      ManifestTable.read(s, root, schema)
        .groupBy("rf")
        .agg(count(lit(1)).as("n"), dsum(col("qty")).as("sq"),
          dsum(col("price")).as("sp"),
          sum(col("l_orderkey") + col("l_linenumber")).as("ck"))
    }, Some(s"""WITH t AS (SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
          max(l_returnflag) AS rf, max(l_quantity) AS qty,
          max(l_extendedprice) AS price
        FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY 1, 2),
      b1 AS (SELECT l_orderkey, l_linenumber, rf, qty * 2 AS qty, price FROM t
          WHERE (l_orderkey * 7 + l_linenumber) % 37 = 0
        UNION ALL SELECT l_orderkey + 10000000, l_linenumber, rf, qty, price + 1
          FROM t WHERE (l_orderkey * 5 + l_linenumber) % 97 = 0),
      m1 AS (SELECT * FROM t WHERE NOT EXISTS (SELECT 1 FROM b1
            WHERE b1.l_orderkey = t.l_orderkey AND b1.l_linenumber = t.l_linenumber)
        UNION ALL SELECT * FROM b1),
      b2 AS (SELECT l_orderkey, l_linenumber, rf, qty, price + 10 AS price
        FROM m1 WHERE (l_orderkey + l_linenumber) % 53 = 0),
      m2 AS (SELECT * FROM m1 WHERE (l_orderkey * 3 + l_linenumber) % 71 <> 0
          AND NOT EXISTS (SELECT 1 FROM b2
            WHERE b2.l_orderkey = m1.l_orderkey AND b2.l_linenumber = m1.l_linenumber)
        UNION ALL SELECT * FROM b2)
      SELECT rf, CAST(count(*) AS BIGINT) AS n, ${dsumSql("qty")} AS sq,
        ${dsumSql("price")} AS sp,
        CAST(CAST(sum(l_orderkey + l_linenumber) AS BIGINT) AS BIGINT) AS ck
      FROM m2 GROUP BY rf""")),

    // SQL WRITE on the front door (VERDICT r13 #4): `INSERT INTO` a
    // graft-format temp view commits a blind append through
    // InsertableRelation — the reference's write surface IS SQL DML
    // (src/create_tables.sql; process_insert_update_weather_data.py:110-162),
    // so the lake table accepts the same verb. The insert's SELECT reads
    // the very table being appended (snapshot isolation: the scan binds to
    // the pre-append version). Partitioning is recovered from the
    // manifest, so appended rows land hive-partitioned like the base.
    ("q179_sql_insert", (s: SparkSession, d: String) => {
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderstatus"))
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
        StructField("o_totalprice", DoubleType), StructField("o_orderstatus", StringType)))
      val root = java.nio.file.Files.createTempDirectory("q179-ins").toString + "/t"
      o.write.format("graft").option("partitionBy", "o_orderstatus")
        .mode("overwrite").save(root)
      s.read.format("graft").schema(schema).load(root)
        .createOrReplaceTempView("graft_orders_ins")
      s.sql("""INSERT INTO graft_orders_ins
        SELECT o_orderkey + 20000000, o_custkey, o_totalprice + 5, o_orderstatus
        FROM graft_orders_ins WHERE o_orderkey % 101 = 0""")
      s.read.format("graft").schema(schema).load(root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("s"),
          sum(col("o_orderkey")).as("ok_sum"))
    }, Some(s"""WITH t AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        FROM orders),
      m AS (SELECT * FROM t
        UNION ALL SELECT o_orderkey + 20000000, o_custkey, o_totalprice + 5,
          o_orderstatus FROM t WHERE o_orderkey % 101 = 0)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("o_totalprice")} AS s,
        CAST(CAST(sum(o_orderkey) AS BIGINT) AS BIGINT) AS ok_sum
      FROM m GROUP BY o_orderstatus""")),

    // DISK-RESIDENT ANN index (VERDICT r13 #5): the q118 IVFPQ code
    // relation committed as a graft table CLUSTERED on `cell`
    // (range-repartitioned + zone-mapped + Bloom'd), and the search reads
    // it back through readAuto with the query batch's probed-cell IN-list
    // — so probes prune index FILES before a byte is scanned, the
    // composition that makes the billion-scale layout disk-resident (a
    // query touches nprobe/|cells| of the index files, zero raw vectors).
    // Must be row-identical to q118 (same frozen model, same search).
    ("q180_ann_disk_index", (s: SparkSession, d: String) => {
      import graft.sources.ManifestTable
      import graft.llm.ProductQuant
      val emb = t(s, d, "embeddings")
      val (m, dims, dTot) = (8, 8, 64)
      val frac = ProductQuant.trainFracFor(emb, 4096)
      val sample = ProductQuant.sampleFor(emb, frac, "vec_id")
      val coarse = ProductQuant.trainCodebooks(emb, 1, dTot, 32, 2, 8, "vec_id",
        frac, sample)
      val cb = ProductQuant.trainCodebooks(emb, m, dims, 32, 2, 16, "vec_id",
        frac, sample)
      ProductQuant.releaseSample(sample)
      val codes = ProductQuant.encodeBatch(emb, coarse, cb, m, dims, "vec_id")
      val root = java.nio.file.Files.createTempDirectory("q180-idx").toString + "/t"
      val idxSchema = StructType(Seq(
        StructField("vec_id", LongType), StructField("sub", IntegerType),
        StructField("code", LongType), StructField("cell", LongType)))
      ManifestTable.commit(
        codes.select(idxSchema.fieldNames.map(col): _*)
          .repartitionByRange(8, col("cell"), col("vec_id")),
        root, None, statsCols = Seq("cell"), bloomCols = Seq("cell"))
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      // the query batch's probed cells — bounded by coarseKs, driver-side
      val probed = ProductQuant.coarseProbes(q, coarse, dTot, 2, "query_id")
        .select("cell").distinct().collect().map(_.getLong(0)).sorted
      val stored = ManifestTable.readAuto(s, root, idxSchema,
        col("cell").isin(probed.toIndexedSeq: _*))
      ProductQuant.ivfPqSearch(q, stored, coarse, cb, 5, m, dims, nprobe = 2)
    }, Some(s"""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)${coarseChainSql()},
      sv AS (SELECT vec_id, s.sub,
          v[CAST(8 * s.sub + 1 AS INTEGER):CAST(8 * s.sub + 8 AS INTEGER)] AS sv
        FROM corp, (SELECT unnest(range(0, 8)) AS sub) s)${pqChainSql("sv")},
      dt AS (SELECT q.vec_id AS query_id, c.sub, c.cid AS code,
          round(${sqSql("q.sv", "c.cv", 8)}, 6) AS d
        FROM (SELECT * FROM sv WHERE vec_id < 8) q JOIN cb2 c ON q.sub = c.sub),
      sc AS (SELECT dt.query_id, e.vec_id,
          CAST(sum(CAST(dt.d AS DECIMAL(18,6))) AS DOUBLE) AS adc
        FROM enc e
        JOIN cellasg ce ON e.vec_id = ce.vec_id
        JOIN probe p ON p.cell = ce.cell
        JOIN dt ON e.sub = dt.sub AND e.code = dt.code AND dt.query_id = p.query_id
        GROUP BY dt.query_id, e.vec_id),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY adc, vec_id) AS rnk FROM sc)
      SELECT query_id, vec_id, adc, CAST(rnk AS INTEGER) AS rank
      FROM w WHERE rnk <= 5""")),

    // ZERO-DRIVER-CODE continuous replication: readStream(graft) →
    // writeStream(graft, cdf) — the change feed folds into the replica
    // through the sink's own mergeDv leg, no foreachBatch in the middle
    // (q177's driver lambda eliminated; the whole reference pipeline is
    // now one declarative statement). Exactly-once via the sink's
    // batch-id marker; the replica must equal the oracle's sequential
    // merge/delete replay.
    ("q181_stream_pipeline", (s: SparkSession, d: String) => {
      import graft.sources.ManifestTable
      val o = t(s, d, "orders").filter(pmod(col("o_orderkey"), lit(3)) === 1)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType)))
      val base = java.nio.file.Files.createTempDirectory("q181-pipe").toString
      val src = s"$base/src"; val dst = s"$base/dst"
      ManifestTable.commit(o, src, Some("o_orderstatus")) // v1: seed
      // v2: one folded upsert+delete merge commit (r17, the q177/q178
      // contract — upsert wins on an overlapping key), so the declarative
      // sink drains one diff batch instead of two
      ManifestTable.mergeDv(
        o.filter(pmod(col("o_orderkey"), lit(67)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 300),
        src, schema, "o_orderkey", Some("o_orderstatus"),
        deleteKeys = Some(o.filter(pmod(col("o_orderkey"), lit(73)) === 0)
          .select("o_orderkey", "o_orderstatus")))
      val q = s.readStream.format("graft").schema(schema)
        .option("key", "o_orderkey").load(src)
        .writeStream.format("graft")
        .option("partitionBy", "o_orderstatus")
        .option("mergeKey", "o_orderkey").option("cdf", "true")
        .option("checkpointLocation", s"$base/ckpt").start(dst)
      try q.processAllAvailable() finally q.stop()
      ManifestTable.read(s, dst, schema)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("s"),
          sum(col("o_orderkey")).as("ok_sum"))
    }, Some(s"""WITH t AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 3 = 1),
      m1 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderkey % 67 = 0 THEN o_totalprice + 300
               ELSE o_totalprice END AS o_totalprice FROM t),
      m2 AS (SELECT * FROM m1 WHERE o_orderkey % 73 <> 0 OR o_orderkey % 67 = 0)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("o_totalprice")} AS s,
        CAST(CAST(sum(o_orderkey) AS BIGINT) AS BIGINT) AS ok_sum
      FROM m2 GROUP BY o_orderstatus""")),

    // mongoexport EXTENDED-JSON rendering — the reverse wire leg of q169's
    // dump reader: a relational slice rendered as mongoimport-compatible
    // relaxed extended JSON ($oid synthetic id, $numberLong integral
    // wrappers, $date ISO millis), byte-identical to DuckDB's own string
    // assembly of the same lines. Round-trip through the q169 reader is
    // asserted in SourcesSpec; this oracles the exact wire bytes.
    ("q182_mongo_render", (s: SparkSession, d: String) => {
      val o = t(s, d, "orders").filter(pmod(col("o_orderkey"), lit(89)) === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate").cast("timestamp").as("o_orderdate"))
      graft.sources.Sinks.renderMongoExport(o, "o_orderkey")
    }, Some("""SELECT '{"_id":{"$oid":"' || lpad(lower(to_hex(o_orderkey)), 24, '0')
        || '"},"o_orderkey":{"$numberLong":"' || CAST(o_orderkey AS VARCHAR)
        || '"},"o_orderstatus":"'
        || replace(replace(o_orderstatus, '\', '\\'), '"', '\"')
        || '","o_totalprice":' || CAST(o_totalprice AS VARCHAR)
        || ',"o_orderdate":{"$date":"'
        || strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%g')
        || 'Z"}}' AS doc
      FROM orders WHERE o_orderkey % 89 = 0""")),

    // Benchmark decontamination (GPT-3 appendix C / Llama eval hygiene):
    // word-4-gram overlap between a training slice and a held-out
    // "benchmark" slice — benchmark gram-hash set broadcast, training
    // grams exploded once, per-doc collision counts. The partial-overlap
    // leak [[Split]]'s exact fingerprints cannot see.
    ("q183_decontam", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(11)) === 0)
      val train = docs.filter(pmod(col("doc_id"), lit(11)) =!= 0)
      graft.llm.Decontam.gramHits(train, bench, "doc_id", "text", n = 4)
    }, Some("""WITH d AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      tr AS (SELECT * FROM d WHERE doc_id % 11 <> 0),
      be AS (SELECT * FROM d WHERE doc_id % 11 = 0),
      bg AS (SELECT DISTINCT md5(array_to_string(
          w[CAST(pos AS INTEGER):CAST(pos + 3 AS INTEGER)], ' ')) AS g
        FROM (SELECT w, unnest(range(1, len(w) - 2)) AS pos FROM be)),
      tg AS (SELECT doc_id, md5(array_to_string(
          w[CAST(pos AS INTEGER):CAST(pos + 3 AS INTEGER)], ' ')) AS g
        FROM (SELECT doc_id, w, unnest(range(1, len(w) - 2)) AS pos FROM tr)),
      h AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
          CAST(sum(CASE WHEN g IN (SELECT g FROM bg) THEN 1 ELSE 0 END) AS BIGINT) AS hits
        FROM tg GROUP BY doc_id)
      SELECT doc_id, n_grams, hits FROM h WHERE hits > 0""")),

    // The APPLIED decontamination scrub: q183's audit turned into the
    // training-set filter (drop docs with > 1 colliding window; short docs
    // and zero/one-hit docs pass), summarized per source so the oracle
    // pins exactly which documents survived.
    ("q186_decontam_filter", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(11)) === 0)
      val train = docs.filter(pmod(col("doc_id"), lit(11)) =!= 0)
      graft.llm.Decontam.filterClean(train, bench, "doc_id", "text",
          n = 4, maxHits = 1L)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
          sum(col("n_chars")).as("chars"))
    }, Some("""WITH d AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      be AS (SELECT * FROM d WHERE doc_id % 11 = 0),
      bg AS (SELECT DISTINCT md5(array_to_string(
          w[CAST(pos AS INTEGER):CAST(pos + 3 AS INTEGER)], ' ')) AS g
        FROM (SELECT w, unnest(range(1, len(w) - 2)) AS pos FROM be)),
      tg AS (SELECT doc_id, md5(array_to_string(
          w[CAST(pos AS INTEGER):CAST(pos + 3 AS INTEGER)], ' ')) AS g
        FROM (SELECT doc_id, w, unnest(range(1, len(w) - 2)) AS pos
          FROM d WHERE doc_id % 11 <> 0)),
      dirty AS (SELECT doc_id FROM tg
        GROUP BY doc_id
        HAVING sum(CASE WHEN g IN (SELECT g FROM bg) THEN 1 ELSE 0 END) > 1)
      SELECT source, CAST(count(*) AS BIGINT) AS n,
        CAST(CAST(sum(doc_id) AS BIGINT) AS BIGINT) AS id_sum,
        CAST(CAST(sum(n_chars) AS BIGINT) AS BIGINT) AS chars
      FROM documents
      WHERE doc_id % 11 <> 0 AND doc_id NOT IN (SELECT doc_id FROM dirty)
      GROUP BY source""")),

    // RESTORE + metadata-only row count: a bad merge + delete are rolled
    // back by publishing the v1 snapshot as a NEW manifest (pure metadata,
    // zero data I/O — Delta RESTORE), and `rowCount` serves `count(*)`
    // from parquet footers minus live DV positions (no data scan at
    // either point). The post-restore aggregate must equal the original
    // table; both metadata counts ride along as columns.
    ("q184_restore_rowcount", (s: SparkSession, d: String) => {
      import graft.sources.ManifestTable
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType)))
      val root = java.nio.file.Files.createTempDirectory("q184-res").toString + "/t"
      ManifestTable.commit(o, root, Some("o_orderstatus")) // v1
      ManifestTable.mergeDv( // v2: the "bad" update (no inserts)
        o.filter(pmod(col("o_orderkey"), lit(43)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 100),
        root, schema, "o_orderkey", Some("o_orderstatus"))
      ManifestTable.deleteWhere(s, root, schema, // v3: the "bad" delete
        pmod(col("o_orderkey"), lit(59)) === 0)
      val nAfterDelete = ManifestTable.rowCount(s, root)
      ManifestTable.restore(s, root, 1L) // v4 == v1 snapshot, metadata-only
      val nRestored = ManifestTable.rowCount(s, root)
      ManifestTable.read(s, root, schema)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sm"),
          sum(col("o_orderkey")).as("ok_sum"))
        .withColumn("n_del_meta", lit(nAfterDelete))
        .withColumn("n_restored_meta", lit(nRestored))
    }, Some(s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("o_totalprice")} AS sm,
        CAST(CAST(sum(o_orderkey) AS BIGINT) AS BIGINT) AS ok_sum,
        (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_orderkey % 59 <> 0)
          AS n_del_meta,
        (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_restored_meta
      FROM orders GROUP BY o_orderstatus""")),

    // BATCH change feed through the front door (Delta readChangeFeed
    // parity): three commits (seed, merge, DV delete), then ONE
    // spark.read with readChangeFeed=true serves the net diff v1→v3 —
    // update pre/post pairs for surviving updated keys, bare deletes for
    // removed ones (a key updated THEN deleted nets to one delete) —
    // aggregated per change type against the oracle's own replay.
    ("q185_front_door_cdf", (s: SparkSession, d: String) => {
      import graft.sources.ManifestTable
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType)))
      val root = java.nio.file.Files.createTempDirectory("q185-cdf").toString + "/t"
      ManifestTable.commit(o, root, Some("o_orderstatus")) // v1
      ManifestTable.mergeDv( // v2: update every %31 key
        o.filter(pmod(col("o_orderkey"), lit(31)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        root, schema, "o_orderkey", Some("o_orderstatus"))
      ManifestTable.deleteWhere(s, root, schema, // v3: delete every %77 key
        pmod(col("o_orderkey"), lit(77)) === 0)
      s.read.format("graft").option("readChangeFeed", "true")
        .option("key", "o_orderkey").option("startingVersion", "1")
        .load(root)
        .groupBy("_change_type")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("tp"),
          sum(col("o_orderkey")).as("ok_sum"))
    }, Some(s"""WITH t AS (SELECT o_orderkey, o_totalprice FROM orders),
      upd AS (SELECT * FROM t WHERE o_orderkey % 31 = 0 AND o_orderkey % 77 <> 0),
      del AS (SELECT * FROM t WHERE o_orderkey % 77 = 0),
      ch AS (
        SELECT 'update_preimage' AS _change_type, o_totalprice AS tp0, o_orderkey
          FROM upd
        UNION ALL SELECT 'update_postimage', o_totalprice * 2, o_orderkey FROM upd
        UNION ALL SELECT 'delete', o_totalprice, o_orderkey FROM del)
      SELECT _change_type, CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(CAST(tp0 AS DECIMAL(18,6))) AS DOUBLE) AS tp,
        CAST(CAST(sum(o_orderkey) AS BIGINT) AS BIGINT) AS ok_sum
      FROM ch GROUP BY _change_type""")),

    // The SQL-DML front door (VERDICT r13 gap: "the SQL-first story is
    // half-open"): the WHOLE lakehouse DML surface through `spark.sql`
    // against a DSv2-catalog graft table — CREATE TABLE, INSERT INTO,
    // UPDATE (row-level delta rewrite → merge-on-read commit), a
    // modular-predicate DELETE (untranslatable → same delta path), a
    // simple-predicate DELETE (metadata-only deletion-vector commit), and
    // a MERGE INTO with matched-update + not-matched-insert — then one
    // catalog-resolved aggregate read. The oracle replays each statement
    // as pure relational algebra. Every mutation writes O(changed rows):
    // at 100 TB the UPDATE's rewrite shuffles only matched rows, never
    // the table (reference: src/create_tables.sql,
    // src/process_insert_update_weather_data.py:110-162 — the SQL-DML
    // warehouse surface this reproduces).
    ("q187_sql_catalog_dml", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files.createTempDirectory("q187-cat").toString
      s.conf.set("spark.sql.catalog.gq187", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq187.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq187.db")
      s.sql("DROP TABLE IF EXISTS gq187.db.orders")
      s.sql("""CREATE TABLE gq187.db.orders (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE) PARTITIONED BY (o_orderstatus)""")
      o.createOrReplaceTempView("q187_src")
      s.sql("""INSERT INTO gq187.db.orders
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM q187_src""")
      s.sql("UPDATE gq187.db.orders SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderkey % 31 = 0")
      s.sql("DELETE FROM gq187.db.orders WHERE o_orderkey % 77 = 0")
      s.sql("DELETE FROM gq187.db.orders WHERE o_custkey < 5")
      s.sql("""MERGE INTO gq187.db.orders tgt
        USING (SELECT o_orderkey, o_custkey, o_orderstatus,
                      o_totalprice + 1000 AS o_totalprice
               FROM q187_src WHERE o_orderkey % 53 = 0) src
        ON tgt.o_orderkey = src.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = src.o_totalprice
        WHEN NOT MATCHED THEN INSERT *""")
      s.sql("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS tp,
        sum(o_orderkey) AS ok_sum
        FROM gq187.db.orders GROUP BY o_orderstatus""")
    }, Some("""WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
      upd AS (SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice * 2
               ELSE o_totalprice END AS o_totalprice FROM base),
      kept AS (SELECT * FROM upd WHERE o_orderkey % 77 <> 0 AND o_custkey >= 5),
      fin AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1000 AS o_totalprice
          FROM base WHERE o_orderkey % 53 = 0
        UNION ALL
        SELECT * FROM kept WHERE o_orderkey % 53 <> 0)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS tp,
        CAST(CAST(sum(o_orderkey) AS BIGINT) AS BIGINT) AS ok_sum
      FROM fin GROUP BY o_orderstatus""")),

    // SQL schema evolution on the catalog front door: rows committed
    // BEFORE an ALTER TABLE ADD COLUMNS backfill NULL on read (snapshot
    // reads pass an explicit schema, so old parquet files simply lack the
    // column — zero data rewritten, the only evolution cost a 100 TB
    // table can afford), rows after carry real values, and one aggregate
    // proves both generations coexist in a single scan.
    ("q188_sql_schema_evolution", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files.createTempDirectory("q188-cat").toString
      s.conf.set("spark.sql.catalog.gq188", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq188.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq188.db")
      s.sql("DROP TABLE IF EXISTS gq188.db.orders")
      s.sql("""CREATE TABLE gq188.db.orders (
        o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
        PARTITIONED BY (o_orderstatus)""")
      o.createOrReplaceTempView("q188_src")
      s.sql("""INSERT INTO gq188.db.orders
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM q188_src
        WHERE o_orderkey % 2 = 1""")
      s.sql("ALTER TABLE gq188.db.orders ADD COLUMNS (o_tier BIGINT)")
      s.sql("""INSERT INTO gq188.db.orders
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_custkey % 7 AS o_tier
        FROM q188_src WHERE o_orderkey % 2 = 0""")
      s.sql("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        CAST(count(o_tier) AS BIGINT) AS n_tier,
        sum(coalesce(o_tier, -1)) AS tier_sum,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS tp
        FROM gq188.db.orders GROUP BY o_orderstatus""")
    }, Some("""WITH fin AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
          CASE WHEN o_orderkey % 2 = 0 THEN o_custkey % 7 ELSE NULL END AS o_tier
        FROM orders)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        CAST(count(o_tier) AS BIGINT) AS n_tier,
        CAST(CAST(sum(coalesce(o_tier, -1)) AS BIGINT) AS BIGINT) AS tier_sum,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS tp
      FROM fin GROUP BY o_orderstatus""")),

    // SQL maintenance procedures (the OPTIMIZE/VACUUM/RESTORE verbs Delta
    // and Iceberg ship as `CALL`): row_count answers from metadata only
    // (footer counts minus DV positions — no data scan), compact folds the
    // DV-masked snapshot into one clean data version (rows must be
    // value-identical before and after — the invariant this query gates),
    // and vacuum reclaims the fragmented layout under a retention window.
    // The oracle sees only the declarative effect: base minus deletes.
    ("q189_sql_maintenance", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files.createTempDirectory("q189-cat").toString
      s.conf.set("spark.sql.catalog.gq189", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq189.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq189.db")
      s.sql("DROP TABLE IF EXISTS gq189.db.orders")
      s.sql("""CREATE TABLE gq189.db.orders (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE) PARTITIONED BY (o_orderstatus)""")
      o.createOrReplaceTempView("q189_src")
      s.sql("INSERT INTO gq189.db.orders SELECT * FROM q189_src")
      s.sql("DELETE FROM gq189.db.orders WHERE o_orderkey % 13 = 0")
      val rc = s.sql("CALL gq189.system.row_count('db.orders')").collect()(0)
      val (nLive, nDel) = (rc.getLong(0), rc.getLong(1))
      s.sql("CALL gq189.system.compact('db.orders', 2)")
      // hot-partition OPTIMIZE: rewrite ONE status partition, carry-forward
      // the rest — value-identity against the same oracle is the invariant
      s.sql("CALL gq189.system.compact('db.orders', 1, 'O')")
      s.sql("CALL gq189.system.vacuum('db.orders', 1)")
      s.sql(s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS tp,
        CAST($nLive AS BIGINT) AS n_live_meta, CAST($nDel AS BIGINT) AS n_del_meta
        FROM gq189.db.orders GROUP BY o_orderstatus""")
    }, Some("""WITH kept AS (SELECT * FROM orders WHERE o_orderkey % 13 <> 0)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS tp,
        (SELECT CAST(count(*) AS BIGINT) FROM kept) AS n_live_meta,
        (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_orderkey % 13 = 0)
          AS n_del_meta
      FROM kept GROUP BY o_orderstatus""")),

    // Metadata-only aggregate pushdown on the SQL catalog: a global
    // COUNT(*)/MIN/MAX over a graft table is answered from the manifest —
    // footer row counts and zone-map sidecar bounds, O(files) driver
    // metadata, ZERO data I/O (CatalogSpec asserts the LocalTableScan
    // plan; the same statement over a 100 TB table reads no data file).
    // The pre-delete aggregate spans TWO data versions (bounds merge
    // across commits); the post-delete COUNT stays pushed because
    // rowCount is DV-exact, while MIN/MAX would decline under a DV —
    // pushdown never answers inexactly, it falls back to the scan.
    ("q190_sql_agg_pushdown", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
      val wh = java.nio.file.Files.createTempDirectory("q190-cat").toString
      s.conf.set("spark.sql.catalog.gq190", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq190.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq190.db")
      s.sql("DROP TABLE IF EXISTS gq190.db.li")
      s.sql("""CREATE TABLE gq190.db.li (
        l_orderkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE,
        l_returnflag STRING) PARTITIONED BY (l_returnflag)
        TBLPROPERTIES ('statsCols'='l_orderkey,l_quantity,l_extendedprice')""")
      li.createOrReplaceTempView("q190_src")
      s.sql("INSERT INTO gq190.db.li SELECT * FROM q190_src WHERE l_orderkey % 2 = 1")
      s.sql("INSERT INTO gq190.db.li SELECT * FROM q190_src WHERE l_orderkey % 2 = 0")
      // `pre` is a materialized Row, not a DataFrame — the eager collect
      // IS the pre-delete snapshot pin (lit()s re-embed the values; keep
      // it a Row: a lazy frame here would re-plan post-delete)
      val pre = s.sql("""SELECT CAST(count(*) AS BIGINT) AS n_pre,
        min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
        min(l_quantity) AS min_q, max(l_quantity) AS max_q,
        min(l_extendedprice) AS min_ep, max(l_extendedprice) AS max_ep
        FROM gq190.db.li""").collect()(0)
      s.sql("DELETE FROM gq190.db.li WHERE l_orderkey % 7 = 0")
      s.sql("SELECT CAST(count(*) AS BIGINT) AS n_after_dv FROM gq190.db.li")
        .select(lit(pre.getLong(0)).as("n_pre"),
          lit(pre.getLong(1)).as("min_ok"), lit(pre.getLong(2)).as("max_ok"),
          lit(pre.getDouble(3)).as("min_q"), lit(pre.getDouble(4)).as("max_q"),
          lit(pre.getDouble(5)).as("min_ep"), lit(pre.getDouble(6)).as("max_ep"),
          col("n_after_dv"))
    }, Some("""SELECT CAST(count(*) AS BIGINT) AS n_pre,
        CAST(min(l_orderkey) AS BIGINT) AS min_ok,
        CAST(max(l_orderkey) AS BIGINT) AS max_ok,
        min(l_quantity) AS min_q, max(l_quantity) AS max_q,
        min(l_extendedprice) AS min_ep, max(l_extendedprice) AS max_ep,
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem WHERE l_orderkey % 7 <> 0)
          AS n_after_dv
      FROM lineitem""")),

    // Decontamination TRACEABILITY (VERDICT r15 #3): q183 flags a training
    // doc as contaminated; this answers WHICH benchmark doc(s) it leaked
    // from — top-3 benchmark ids per flagged doc by colliding-window
    // count, ties pinned on bench_id. The pair aggregate keys only on
    // colliding (train, bench) pairs; the rank-limit compiles to a bounded
    // per-partition heap, never a corpus sort.
    ("q191_decontam_trace", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(11)) === 0)
      val train = docs.filter(pmod(col("doc_id"), lit(11)) =!= 0)
      graft.llm.Decontam.gramTrace(train, bench, "doc_id", "text", n = 4, k = 3)
    }, Some("""WITH d AS (SELECT doc_id,
        list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), ' '),
                    x -> x <> '') AS w
        FROM documents),
      bg AS (SELECT DISTINCT doc_id AS bench_id, md5(array_to_string(
          w[CAST(pos AS INTEGER):CAST(pos + 3 AS INTEGER)], ' ')) AS g
        FROM (SELECT doc_id, w, unnest(range(1, len(w) - 2)) AS pos
          FROM d WHERE doc_id % 11 = 0)),
      tg AS (SELECT doc_id, md5(array_to_string(
          w[CAST(pos AS INTEGER):CAST(pos + 3 AS INTEGER)], ' ')) AS g
        FROM (SELECT doc_id, w, unnest(range(1, len(w) - 2)) AS pos
          FROM d WHERE doc_id % 11 <> 0)),
      pairs AS (SELECT tg.doc_id, bg.bench_id, CAST(count(*) AS BIGINT) AS pair_hits
        FROM tg JOIN bg USING (g) GROUP BY tg.doc_id, bg.bench_id),
      ranked AS (SELECT doc_id, bench_id, pair_hits,
          CAST(row_number() OVER (PARTITION BY doc_id
            ORDER BY pair_hits DESC, bench_id) AS INTEGER) AS rk
        FROM pairs)
      SELECT doc_id, bench_id, pair_hits, rk FROM ranked WHERE rk <= 3""")),

    // CTAS + TIMESTAMP AS OF on the hard gate (VERDICT r15 #4): create the
    // table via CREATE TABLE ... AS SELECT (v1), append (v2), read v1's
    // commit wall-clock back from t.history, and floor-resolve a
    // TIMESTAMP AS OF at that instant — replayable because the oracle
    // recomputes both snapshots from the same source rows; a wrong floor
    // resolution (v2 instead of v1) hash-mismatches n_ts/tp_ts.
    ("q192_ctas_timestamp_travel", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"))
      val wh = java.nio.file.Files.createTempDirectory("q192-cat").toString
      s.conf.set("spark.sql.catalog.gq192", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq192.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq192.db")
      s.sql("DROP TABLE IF EXISTS gq192.db.o")
      o.createOrReplaceTempView("q192_src")
      s.sql("CREATE TABLE gq192.db.o AS SELECT * FROM q192_src WHERE o_orderkey % 2 = 1")
      s.sql("INSERT INTO gq192.db.o SELECT * FROM q192_src WHERE o_orderkey % 2 = 0")
      // v1's commit instant, read back from the table's own history
      // (session TZ is UTC); floor semantics: ts1 <= t < ts2 resolves v1,
      // and publish-time monotonization guarantees ts2 >= ts1 + 1 µs
      val ts1 = s.sql("SELECT commit_ts FROM gq192.db.o.history ORDER BY version")
        .collect()(0).getTimestamp(0)
      val iso = ts1.toInstant.atZone(java.time.ZoneOffset.UTC)
        .toLocalDateTime.toString
      def agg(rel: String, suf: String) = s.sql(
        s"""SELECT CAST(count(*) AS BIGINT) AS n_$suf,
            ${dsumSql("o_totalprice")} AS tp_$suf FROM $rel""")
      agg(s"gq192.db.o TIMESTAMP AS OF '$iso'", "ts")
        .crossJoin(agg("gq192.db.o VERSION AS OF 1", "v1"))
        .crossJoin(agg("gq192.db.o", "cur"))
    }, Some(s"""SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_orderkey % 2 = 1) AS n_ts,
        (SELECT ${dsumSql("o_totalprice")} FROM orders WHERE o_orderkey % 2 = 1) AS tp_ts,
        (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_orderkey % 2 = 1) AS n_v1,
        (SELECT ${dsumSql("o_totalprice")} FROM orders WHERE o_orderkey % 2 = 1) AS tp_v1,
        (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_cur,
        (SELECT ${dsumSql("o_totalprice")} FROM orders) AS tp_cur""")),

    // CATALOG-NAME streaming on the hard gate (VERDICT r15 #2): the q177
    // replication loop addressed entirely by table NAME — SQL DML builds
    // the source history (merge-on-read UPDATE, DV DELETE),
    // readStream.table serves its change feed through the V1-fallback
    // seam (merge key from TBLPROPERTIES), and writeStream.toTable
    // AUTO-CREATES the replica (schema healed of the feed's
    // _change_type). The replica's aggregate must equal the oracle's
    // sequential replay.
    ("q193_stream_by_name", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val o = t(s, d, "orders").filter(pmod(col("o_orderkey"), lit(5)) === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files.createTempDirectory("q193-cat").toString
      s.conf.set("spark.sql.catalog.gq193", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq193.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq193.db")
      s.sql("DROP TABLE IF EXISTS gq193.db.src")
      s.sql("DROP TABLE IF EXISTS gq193.db.dst")
      s.sql("""CREATE TABLE gq193.db.src (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE) PARTITIONED BY (o_orderstatus)
        TBLPROPERTIES ('mergeKey'='o_orderkey')""")
      o.createOrReplaceTempView("q193_src")
      s.sql("INSERT INTO gq193.db.src SELECT * FROM q193_src") // v1: seed
      // v2 (r17): ONE MERGE carries both the update and the delete verb as
      // a single row-level DML commit — same final state as the former
      // separate UPDATE + DELETE rounds (the delete clause fires first, so
      // an overlapping key deletes, exactly the sequential replay's
      // outcome), and the stream drains one diff micro-batch instead of two
      s.sql("""MERGE INTO gq193.db.src t
        USING (SELECT * FROM q193_src
               WHERE o_orderkey % 53 = 0 OR o_orderkey % 67 = 0) s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND s.o_orderkey % 67 = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET o_totalprice = t.o_totalprice + 300""")
      val ckpt = java.nio.file.Files.createTempDirectory("q193-ck").toString
      val q = s.readStream.table("gq193.db.src")
        .writeStream.format("graft").partitionBy("o_orderstatus")
        .option("mergeKey", "o_orderkey").option("cdf", "true")
        .option("checkpointLocation", ckpt)
        .toTable("gq193.db.dst")
      try q.processAllAvailable() finally q.stop()
      s.sql(s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("o_totalprice")} AS s,
        CAST(CAST(sum(o_orderkey) AS BIGINT) AS BIGINT) AS ok_sum
        FROM gq193.db.dst GROUP BY o_orderstatus""")
    }, Some(s"""WITH t AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 5 = 0),
      m1 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderkey % 53 = 0 THEN o_totalprice + 300
               ELSE o_totalprice END AS o_totalprice FROM t),
      m2 AS (SELECT * FROM m1 WHERE o_orderkey % 67 <> 0)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("o_totalprice")} AS s,
        CAST(CAST(sum(o_orderkey) AS BIGINT) AS BIGINT) AS ok_sum
      FROM m2 GROUP BY o_orderstatus""")),

    // ANN index DELETE-MAINTENANCE (VERDICT r16 #5): a disk-resident
    // IVF-flat index in the q180 layout (cell-clustered manifest table,
    // zone+Bloom file skipping on `cell`) with the corpus ITSELF a
    // manifest table. The index is built at corpus v1; a merge-on-read
    // DELETE then masks rows — one of them a query's own nearest neighbor
    // (vec_id 4 is query 4's top-1 by construction) — and the search
    // anti-joins the probed index slice against
    // [[graft.sources.ManifestTable.deletedKeysSince]] (the net change
    // feed's delete/update_preimage keys between the index's build version
    // and the corpus head: O(changed partitions) to compute, deleted-rows-
    // sized to broadcast). Deleted vectors must never surface in top-k
    // while survivors' ranking stays bit-identical to the oracle's replay
    // over the filtered candidate set — the cheap, correct alternative to
    // eager reindexing: at 100 TB the index stays immutable and every
    // query pays one broadcast anti-join of O(deleted-since-build) keys
    // until a rebuild swallows the mask — that rebuild is now a first-
    // class verb (`CALL system.rebuild_index`, r18): q201 replays THIS
    // scenario through it against the same oracle, and SCALING.md's
    // ann_rebuild curve measures the mask-vs-flat gap. The anti-join is a
    // pure row filter on the id, so the same maintenance composes
    // unchanged with the PQ-coded index variants (q180/q131); LlmSpec
    // drives that contract on a planted-neighbor fixture.
    ("q194_ann_delete_maint", (s: SparkSession, d: String) => {
      import graft.sources.ManifestTable
      val embSchema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType))))
      val emb0 = t(s, d, "embeddings").filter(pmod(col("vec_id"), lit(4)) === 0)
        .select(col("vec_id"), col("embedding"))
      val base = java.nio.file.Files.createTempDirectory("q194-adm").toString
      val corpusRoot = s"$base/corpus"; val idxRoot = s"$base/index"
      ManifestTable.commit(emb0, corpusRoot, None) // corpus v1
      val cents = SimSearch.trainCentroids(emb0, centroidStride = 64, iters = 2)
      val idxSchema = StructType(Seq(
        StructField("vec_id", LongType), StructField("cell", LongType),
        StructField("embedding", ArrayType(FloatType))))
      ManifestTable.commit(
        emb0.join(SimSearch.assignCells(emb0, cents), Seq("vec_id"))
          .select(idxSchema.fieldNames.map(col): _*)
          .repartitionByRange(8, col("cell"), col("vec_id")),
        idxRoot, None, statsCols = Seq("cell"), bloomCols = Seq("cell"))
      val builtAt = ManifestTable.currentVersion(s, corpusRoot).get
      ManifestTable.deleteWhere(s, corpusRoot, embSchema, // corpus v2: DV
        pmod(col("vec_id"), lit(10)) === 4)
      val dead = ManifestTable.deletedKeysSince(s, corpusRoot, embSchema,
        Seq("vec_id"), builtAt)
      val q = emb0.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val probed = SimSearch.probeCells(q, cents, nprobe = 2)
        .select("cell").distinct().collect().map(_.getLong(0)).sorted
      val stored = ManifestTable.readAuto(s, idxRoot, idxSchema,
          col("cell").isin(probed.toIndexedSeq: _*))
        .join(broadcast(dead), Seq("vec_id"), "left_anti")
      SimSearch.ivfTopKStored(q, stored, cents, 5, nprobe = 2)
    }, Some("""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id % 4 = 0),
      c0 AS (SELECT vec_id AS cent_id, v AS cent FROM corp WHERE vec_id % 64 = 0),
      a1 AS (SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, t.cent_id AS cell,
          row_number() OVER (PARTITION BY c.vec_id
            ORDER BY round(list_cosine_similarity(c.v, t.cent), 6) DESC, t.cent_id) AS rn
        FROM corp c CROSS JOIN c0 t) WHERE rn = 1),
      c1 AS (SELECT cell AS cent_id, list(m ORDER BY dim) AS cent FROM (
          SELECT cell, dim, floor(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS m
          FROM (SELECT cell, unnest(range(len(v))) AS dim, unnest(v) AS x FROM a1)
          GROUP BY cell, dim) GROUP BY cell),
      a2 AS (SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, t.cent_id AS cell,
          row_number() OVER (PARTITION BY c.vec_id
            ORDER BY round(list_cosine_similarity(c.v, t.cent), 6) DESC, t.cent_id) AS rn
        FROM corp c CROSS JOIN c1 t) WHERE rn = 1),
      c2 AS (SELECT cell AS cent_id, list(m ORDER BY dim) AS cent FROM (
          SELECT cell, dim, floor(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS m
          FROM (SELECT cell, unnest(range(len(v))) AS dim, unnest(v) AS x FROM a2)
          GROUP BY cell, dim) GROUP BY cell),
      ca AS (SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, t.cent_id AS cell,
          row_number() OVER (PARTITION BY c.vec_id
            ORDER BY round(list_cosine_similarity(c.v, t.cent), 6) DESC, t.cent_id) AS rn
        FROM corp c CROSS JOIN c2 t) WHERE rn = 1),
      q AS (SELECT vec_id AS query_id, v AS qv FROM corp WHERE vec_id < 8),
      qa AS (SELECT query_id, qv, cell FROM (
        SELECT q.query_id, q.qv, t.cent_id AS cell,
          row_number() OVER (PARTITION BY q.query_id
            ORDER BY round(list_cosine_similarity(q.qv, t.cent), 6) DESC, t.cent_id) AS rn
        FROM q CROSS JOIN c2 t) WHERE rn <= 2),
      sc AS (SELECT qa.query_id, ca.vec_id, round(list_cosine_similarity(qa.qv, ca.v), 6) AS cosine
        FROM ca JOIN qa ON ca.cell = qa.cell
        WHERE ca.vec_id % 10 <> 4),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk FROM sc)
      SELECT query_id, vec_id, cosine, CAST(rnk AS INTEGER) AS rank FROM w WHERE rnk <= 5""")),

    // FIELD-ID COLUMN RENAME on the hard gate (VERDICT r16 #6): `ALTER
    // TABLE ... RENAME COLUMN` is a METADATA-ONLY sidecar edit — files
    // written before the rename keep the old parquet column name but
    // their stable field ids, and every read (current snapshot, the
    // VERSION AS OF pre-rename snapshot, the row-level UPDATE's target
    // scan) resolves columns BY ID ([[graft.sources.FieldIds]], the
    // Iceberg field-id mechanism on parquet's `field_id` annotation).
    // The final aggregate spans both file generations under the new
    // name plus a time-travel read of the PRE-rename snapshot; a
    // by-name resolution would NULL the renamed column for v1's files
    // and hash-mismatch every p_* column. At 100 TB this is the whole
    // point: a rename costs one sidecar write, never an O(table)
    // rewrite, and reads stay one-pass.
    ("q195_rename_evolution", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"))
      val wh = java.nio.file.Files.createTempDirectory("q195-cat").toString
      s.conf.set("spark.sql.catalog.gq195", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq195.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq195.db")
      s.sql("DROP TABLE IF EXISTS gq195.db.o")
      o.createOrReplaceTempView("q195_src")
      s.sql("""CREATE TABLE gq195.db.o (
        o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING)
        PARTITIONED BY (o_orderstatus)""")
      // v1: pre-rename file generation
      s.sql("""INSERT INTO gq195.db.o
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM q195_src
        WHERE o_orderkey % 2 = 1""")
      s.sql("ALTER TABLE gq195.db.o RENAME COLUMN o_totalprice TO price")
      // v2: post-rename file generation
      s.sql("""INSERT INTO gq195.db.o
        SELECT o_orderkey, o_totalprice AS price, o_orderstatus FROM q195_src
        WHERE o_orderkey % 2 = 0""")
      // v3: row-level UPDATE keyed on the renamed column, touching BOTH
      // generations (its staged delta files round-trip by id too)
      s.sql("UPDATE gq195.db.o SET price = price + 100 WHERE o_orderkey % 7 = 0")
      s.sql(s"""SELECT c.o_orderstatus, c.n_cur, c.p_cur, v.n_v1, v.p_v1
        FROM (SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_cur,
                ${dsumSql("price")} AS p_cur
              FROM gq195.db.o GROUP BY o_orderstatus) c
        JOIN (SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_v1,
                ${dsumSql("price")} AS p_v1
              FROM gq195.db.o VERSION AS OF 1 GROUP BY o_orderstatus) v
        ON c.o_orderstatus = v.o_orderstatus""")
    }, Some(s"""WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      cur AS (SELECT o_orderkey, o_orderstatus,
          CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100
               ELSE o_totalprice END AS price FROM t),
      v1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice AS price
             FROM t WHERE o_orderkey % 2 = 1)
      SELECT c.o_orderstatus, c.n_cur, c.p_cur, v.n_v1, v.p_v1
      FROM (SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_cur,
              ${dsumSql("price")} AS p_cur FROM cur GROUP BY o_orderstatus) c
      JOIN (SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_v1,
              ${dsumSql("price")} AS p_v1 FROM v1 GROUP BY o_orderstatus) v
      ON c.o_orderstatus = v.o_orderstatus""")),

    // LOSSLESS TYPE WIDENING (r17): `ALTER COLUMN ... TYPE` int→bigint and
    // float→double as METADATA-ONLY edits — the first generation's files
    // stay physically INT32/FLOAT and the parquet reader promotes them at
    // scan time, while the post-widen generation holds values that exceed
    // the old types' ranges outright. The whitelist (not the reader) is
    // the safety boundary: the vectorized reader also tolerates NARROWING
    // with silent overflow, so the catalog refuses anything lossy.
    // Determinism: generation 1's floats are integer-valued (float-exact
    // up to 2^24, so the double promotion and the decimal-routed sum are
    // exact on both engines — a fractional float's decimal expansion can
    // land on a .5e-7 half and diverge, the q124/q100 rule).
    ("q196_type_widening", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"))
      val wh = java.nio.file.Files.createTempDirectory("q196-cat").toString
      s.conf.set("spark.sql.catalog.gq196", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq196.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq196.db")
      s.sql("DROP TABLE IF EXISTS gq196.db.o")
      o.createOrReplaceTempView("q196_src")
      s.sql("""CREATE TABLE gq196.db.o (k INT, price FLOAT, status STRING)
        PARTITIONED BY (status)""")
      // generation 1: physically narrow (INT32 + FLOAT) files
      s.sql("""INSERT INTO gq196.db.o
        SELECT CAST(o_orderkey AS INT) AS k,
               CAST(CAST(o_totalprice AS BIGINT) AS FLOAT) AS price,
               o_orderstatus AS status
        FROM q196_src WHERE o_orderkey % 2 = 1""")
      s.sql("ALTER TABLE gq196.db.o ALTER COLUMN k TYPE BIGINT")
      s.sql("ALTER TABLE gq196.db.o ALTER COLUMN price TYPE DOUBLE")
      // generation 2: values an INT/FLOAT could not hold exactly
      s.sql("""INSERT INTO gq196.db.o
        SELECT o_orderkey + 10000000000 AS k, o_totalprice AS price,
               o_orderstatus AS status
        FROM q196_src WHERE o_orderkey % 2 = 0""")
      s.sql(s"""SELECT status, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(k) AS BIGINT) AS k_sum, ${dsumSql("price")} AS p_sum
        FROM gq196.db.o GROUP BY status""")
    }, Some(s"""WITH g1 AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
          CAST(CAST(CAST(trunc(o_totalprice) AS BIGINT) AS REAL) AS DOUBLE) AS price,
          o_orderstatus AS status
        FROM orders WHERE o_orderkey % 2 = 1),
      g2 AS (SELECT o_orderkey + 10000000000 AS k, o_totalprice AS price,
          o_orderstatus AS status
        FROM orders WHERE o_orderkey % 2 = 0),
      u AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
      SELECT status, CAST(count(*) AS BIGINT) AS n,
        CAST(CAST(sum(k) AS BIGINT) AS BIGINT) AS k_sum,
        ${dsumSql("price")} AS p_sum
      FROM u GROUP BY status""")),

    // FULL TRI-CLAUSE MERGE (r17): `WHEN NOT MATCHED BY SOURCE` — the
    // upstream-sync shape (rows that vanished from the source are deleted
    // or demoted in the SAME single commit as matched updates and
    // source-only inserts; the reference's replication loop does this as
    // a separate delete pass — reference:
    // src/process_insert_update_weather_data.py:166-187). Spark's
    // row-level rewrite emits target-only rowIds through the same
    // SupportsDelta writer: one target scan, one commit, bytes written =
    // O(changed rows). The oracle replays the four clauses as set logic.
    ("q197_merge_by_source", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"))
      val wh = java.nio.file.Files.createTempDirectory("q197-cat").toString
      s.conf.set("spark.sql.catalog.gq197", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq197.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq197.db")
      s.sql("DROP TABLE IF EXISTS gq197.db.t")
      o.createOrReplaceTempView("q197_src")
      s.sql("""CREATE TABLE gq197.db.t (
        o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING)
        PARTITIONED BY (o_orderstatus)""")
      s.sql("""INSERT INTO gq197.db.t
        SELECT * FROM q197_src WHERE o_orderkey % 3 = 0""")
      s.sql("""MERGE INTO gq197.db.t t USING (
          SELECT o_orderkey, o_totalprice + 100 AS o_totalprice, o_orderstatus
          FROM q197_src WHERE o_orderkey % 3 = 0 AND o_orderkey % 2 = 0
          UNION ALL
          SELECT o_orderkey, o_totalprice, o_orderstatus
          FROM q197_src WHERE o_orderkey % 3 = 1 AND o_orderkey % 5 = 0) s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'F' THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN
          UPDATE SET o_totalprice = t.o_totalprice + 5""")
      s.sql(s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
          ${dsumSql("o_totalprice")} AS tp
        FROM gq197.db.t GROUP BY o_orderstatus""")
    }, Some(s"""WITH t0 AS (SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 3 = 0),
      matched AS (SELECT o_orderkey, o_totalprice + 100 AS o_totalprice,
          o_orderstatus FROM t0 WHERE o_orderkey % 2 = 0),
      inserted AS (SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 3 = 1 AND o_orderkey % 5 = 0),
      by_src AS (SELECT o_orderkey, o_totalprice + 5 AS o_totalprice,
          o_orderstatus FROM t0
        WHERE o_orderkey % 2 = 1 AND o_orderstatus <> 'F'),
      u AS (SELECT * FROM matched UNION ALL SELECT * FROM inserted
        UNION ALL SELECT * FROM by_src)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("o_totalprice")} AS tp
      FROM u GROUP BY o_orderstatus""")),

    // SCHEMA EVOLUTION UNDER STREAMING (r17): a column rename lands
    // BETWEEN two runs of a name-addressed replication stream — the
    // change-feed offset log stores source VERSIONS, not column names, so
    // the SAME checkpoint resumes after a coordinated rename on both ends,
    // and the pre-rename source versions replay BY FIELD ID under the new
    // name. At 100 TB this is the operational contract that matters:
    // schema evolution never forces a replica rebuild or a fresh
    // checkpoint, because neither the offsets nor the files are rewritten.
    ("q198_stream_rename_resume", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val o = t(s, d, "orders").filter(pmod(col("o_orderkey"), lit(7)) === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files.createTempDirectory("q198-cat").toString
      s.conf.set("spark.sql.catalog.gq198", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq198.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq198.db")
      s.sql("DROP TABLE IF EXISTS gq198.db.src")
      s.sql("DROP TABLE IF EXISTS gq198.db.dst")
      s.sql("""CREATE TABLE gq198.db.src (
        o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING)
        PARTITIONED BY (o_orderstatus)
        TBLPROPERTIES ('mergeKey'='o_orderkey')""")
      s.sql("""CREATE TABLE gq198.db.dst (
        o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING)
        PARTITIONED BY (o_orderstatus)""")
      o.createOrReplaceTempView("q198_src")
      s.sql("""INSERT INTO gq198.db.src
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM q198_src""")
      val ckpt = java.nio.file.Files.createTempDirectory("q198-ck").toString
      def run(): Unit = {
        val q = s.readStream.table("gq198.db.src")
          .writeStream.format("graft").partitionBy("o_orderstatus")
          .option("mergeKey", "o_orderkey").option("cdf", "true")
          .option("checkpointLocation", ckpt)
          .toTable("gq198.db.dst")
        try q.processAllAvailable() finally q.stop()
      }
      run() // seed replicated under the OLD name
      s.sql("ALTER TABLE gq198.db.src RENAME COLUMN o_totalprice TO price")
      s.sql("ALTER TABLE gq198.db.dst RENAME COLUMN o_totalprice TO price")
      // one MERGE carries both verbs (delete-first matched clause, the
      // q193 pattern) so the resumed stream drains ONE diff micro-batch
      s.sql("""MERGE INTO gq198.db.src t
        USING (SELECT o_orderkey FROM q198_src
               WHERE o_orderkey % 3 = 0 OR o_orderkey % 11 = 0) s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND s.o_orderkey % 11 = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET price = t.price + 40""")
      run() // SAME checkpoint resumes post-rename
      s.sql(s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("price")} AS p FROM gq198.db.dst GROUP BY o_orderstatus""")
    }, Some(s"""WITH t0 AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0),
      m1 AS (SELECT o_orderkey, o_orderstatus,
          CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 40
               ELSE o_totalprice END AS price FROM t0),
      m2 AS (SELECT * FROM m1 WHERE o_orderkey % 11 <> 0)
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("price")} AS p FROM m2 GROUP BY o_orderstatus""")),

    // NESTED-FIELD SCHEMA EVOLUTION on the hard gate (VERDICT r17 #1):
    // field ids extend through structs, arrays and maps, so RENAME COLUMN
    // works BELOW top level — a struct member two levels down
    // (cur.cond.status), a depth-1 member (cur.clerk) and an
    // array-element member (tags.element.w) are all renamed between two
    // file generations, and the aggregate spans both generations under
    // the new names plus a pre-rename time-travel read. The reference's
    // document model is literally nested (current.condition.text —
    // reference src/process_insert_update_weather_data.py:87-90), so a
    // lake ingesting it hits nested evolution on its first migration. A
    // by-name read would NULL every renamed position for generation-1
    // files; resolution is by parquet field id at EVERY depth. Still
    // metadata-only: two sidecar writes, zero file rewrites, any scale.
    ("q199_nested_evolution", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"))
      val wh = java.nio.file.Files.createTempDirectory("q199-cat").toString
      s.conf.set("spark.sql.catalog.gq199", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq199.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq199.db")
      s.sql("DROP TABLE IF EXISTS gq199.db.w")
      o.createOrReplaceTempView("q199_src")
      s.sql("""CREATE TABLE gq199.db.w (
        k BIGINT,
        cur STRUCT<cond: STRUCT<status: STRING, price: DOUBLE>, clerk: STRING>,
        tags ARRAY<STRUCT<t: STRING, w: DOUBLE>>)""")
      // generation 1: files under the ORIGINAL nested names
      s.sql("""INSERT INTO gq199.db.w
        SELECT o_orderkey AS k,
          named_struct('cond',
            named_struct('status', o_orderstatus, 'price', o_totalprice),
            'clerk', o_orderpriority) AS cur,
          array(named_struct('t', o_orderstatus,
            'w', CAST(o_orderkey % 10 AS DOUBLE))) AS tags
        FROM q199_src WHERE o_orderkey % 2 = 1""")
      s.sql("ALTER TABLE gq199.db.w RENAME COLUMN cur.cond.status TO state")
      s.sql("ALTER TABLE gq199.db.w RENAME COLUMN cur.clerk TO agent")
      s.sql("ALTER TABLE gq199.db.w RENAME COLUMN tags.element.w TO weight")
      // generation 2: files under the NEW nested names
      s.sql("""INSERT INTO gq199.db.w
        SELECT o_orderkey AS k,
          named_struct('cond',
            named_struct('state', o_orderstatus, 'price', o_totalprice),
            'agent', o_orderpriority) AS cur,
          array(named_struct('t', o_orderstatus,
            'weight', CAST(o_orderkey % 10 AS DOUBLE))) AS tags
        FROM q199_src WHERE o_orderkey % 2 = 0""")
      s.sql(s"""SELECT c.state, c.n_cur, c.p_cur, c.w_cur, c.a_cur,
          v.n_v1, v.p_v1
        FROM (SELECT cur.cond.state AS state, CAST(count(*) AS BIGINT) AS n_cur,
                ${dsumSql("cur.cond.price")} AS p_cur,
                CAST(sum(CAST(tags[0].weight AS BIGINT)) AS BIGINT) AS w_cur,
                CAST(count(DISTINCT cur.agent) AS BIGINT) AS a_cur
              FROM gq199.db.w GROUP BY cur.cond.state) c
        JOIN (SELECT cur.cond.state AS state, CAST(count(*) AS BIGINT) AS n_v1,
                ${dsumSql("cur.cond.price")} AS p_v1
              FROM gq199.db.w VERSION AS OF 1 GROUP BY cur.cond.state) v
        ON c.state = v.state""")
    }, Some(s"""WITH t AS (SELECT o_orderkey AS k, o_orderstatus AS st,
          o_totalprice AS pr, o_orderpriority AS ag FROM orders),
      v1 AS (SELECT * FROM t WHERE k % 2 = 1)
      SELECT c.state, c.n_cur, c.p_cur, c.w_cur, c.a_cur, v.n_v1, v.p_v1
      FROM (SELECT st AS state, CAST(count(*) AS BIGINT) AS n_cur,
              ${dsumSql("pr")} AS p_cur,
              CAST(CAST(sum(k % 10) AS BIGINT) AS BIGINT) AS w_cur,
              CAST(count(DISTINCT ag) AS BIGINT) AS a_cur
            FROM t GROUP BY st) c
      JOIN (SELECT st AS state, CAST(count(*) AS BIGINT) AS n_v1,
              ${dsumSql("pr")} AS p_v1 FROM v1 GROUP BY st) v
      ON c.state = v.state""")),

    // DROP + RE-ADD RESURRECTION GUARD on the hard gate (VERDICT r17 #6),
    // at a NESTED position: DROP COLUMN s.v retires the field's id behind
    // the high-water mark, so re-adding the SAME name allocates a fresh
    // id and generation-1 files' values must read NULL under it — the
    // classic by-name resurrection bug (old files still physically hold
    // the column's bytes) made impossible by id resolution. The sibling
    // s.note keeps its id through the surgery, so BOTH generations keep
    // serving it. count(*) vs count(s.v) vs count(s.note) per group is
    // exactly the three-way split a resurrection or a sibling casualty
    // would corrupt.
    ("q200_drop_readd_guard", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"))
      val wh = java.nio.file.Files.createTempDirectory("q200-cat").toString
      s.conf.set("spark.sql.catalog.gq200", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq200.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq200.db")
      s.sql("DROP TABLE IF EXISTS gq200.db.o")
      o.createOrReplaceTempView("q200_src")
      s.sql("""CREATE TABLE gq200.db.o (
        k BIGINT, s STRUCT<v: DOUBLE, note: STRING>, status STRING)
        PARTITIONED BY (status)""")
      // generation 1: s.v populated everywhere
      s.sql("""INSERT INTO gq200.db.o
        SELECT o_orderkey AS k,
          named_struct('v', o_totalprice, 'note', o_orderpriority) AS s,
          o_orderstatus AS status
        FROM q200_src WHERE o_orderkey % 2 = 1""")
      s.sql("ALTER TABLE gq200.db.o DROP COLUMN s.v")
      s.sql("ALTER TABLE gq200.db.o ADD COLUMN s.v DOUBLE")
      // generation 2: the re-added s.v (fresh id), offset so any
      // resurrected generation-1 value would shift the sum
      s.sql("""INSERT INTO gq200.db.o
        SELECT o_orderkey AS k,
          named_struct('note', o_orderpriority, 'v', o_totalprice + 1000) AS s,
          o_orderstatus AS status
        FROM q200_src WHERE o_orderkey % 2 = 0""")
      s.sql(s"""SELECT status, CAST(count(*) AS BIGINT) AS n_all,
          CAST(count(s.v) AS BIGINT) AS n_v,
          ${dsumSql("s.v")} AS v_sum,
          CAST(count(s.note) AS BIGINT) AS n_note
        FROM gq200.db.o GROUP BY status""")
    }, Some(s"""WITH t AS (SELECT o_orderkey AS k, o_orderstatus AS status,
          o_totalprice AS pr, o_orderpriority AS note FROM orders)
      SELECT status, CAST(count(*) AS BIGINT) AS n_all,
        CAST(count(CASE WHEN k % 2 = 0 THEN 1 END) AS BIGINT) AS n_v,
        ${dsumSql("CASE WHEN k % 2 = 0 THEN pr + 1000 END")} AS v_sum,
        CAST(count(note) AS BIGINT) AS n_note
      FROM t GROUP BY status""")),

    // ANN REBUILD LIFECYCLE on the hard gate (VERDICT r17 #2, closing
    // q194's documented deferral): the same corpus-delete scenario as
    // q194, but resolved by `CALL system.rebuild_index` instead of the
    // query-time mask — the procedure gauges the deleted fraction since
    // the index's `#basedOn` corpus version, rewrites the index to
    // SURVIVORS (one broadcast anti-join; frozen-model cells need no
    // re-encode), re-clusters by cell and re-stamps `#basedOn` in the
    // same atomic commit. The post-rebuild search runs with NO mask and
    // must be bit-identical to q194's masked answer (the two queries
    // share one oracle). At 100 TB: queries pay the O(deleted) mask only
    // between rebuilds; the rebuild itself is one survivor-sized write.
    ("q201_ann_rebuild", (s: SparkSession, d: String) => {
      import graft.sources.{GraftCatalog, ManifestTable}
      val emb0 = t(s, d, "embeddings").filter(pmod(col("vec_id"), lit(4)) === 0)
        .select(col("vec_id"), col("embedding"))
      val wh = java.nio.file.Files.createTempDirectory("q201-cat").toString
      // fresh catalog NAME per invocation ([[catSeq]]): this query mixes
      // catalog SQL with direct warehouse paths, and Spark's by-name
      // catalog cache would pin a re-run's SQL to the previous temp dir
      val cat = s"gq201x${catSeq.incrementAndGet()}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      emb0.createOrReplaceTempView("q201_src")
      s.sql(s"CREATE TABLE $cat.db.corpus (vec_id BIGINT, embedding ARRAY<FLOAT>)")
      s.sql(s"INSERT INTO $cat.db.corpus SELECT * FROM q201_src")
      val corpusRoot = s"$wh/db/corpus"; val idxRoot = s"$wh/db/idx"
      val cents = SimSearch.trainCentroids(emb0, centroidStride = 64, iters = 2)
      s.sql(s"""CREATE TABLE $cat.db.idx (
        vec_id BIGINT, cell BIGINT, embedding ARRAY<FLOAT>)
        TBLPROPERTIES ('statsCols' = 'cell', 'bloomCols' = 'cell')""")
      ManifestTable.withBasedOn(
        ManifestTable.currentVersion(s, corpusRoot).get) {
        ManifestTable.commit(
          emb0.join(SimSearch.assignCells(emb0, cents), Seq("vec_id"))
            .select(col("vec_id"), col("cell"), col("embedding"))
            .repartitionByRange(8, col("cell"), col("vec_id")),
          idxRoot, None, carryForward = false,
          statsCols = Seq("cell"), bloomCols = Seq("cell"))
      }
      s.sql(s"DELETE FROM $cat.db.corpus WHERE vec_id % 10 = 4")
      val res = s.sql(s"""CALL $cat.system.rebuild_index(index => 'db.idx',
        corpus => 'db.corpus', key => 'vec_id', threshold => 0.01,
        cluster_by => 'cell')""").collect()(0)
      require(res.getBoolean(0), s"rebuild should have fired: $res")
      // post-rebuild: file-pruned probes, NO delete mask
      val q = emb0.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val idxSchema = StructType(Seq(
        StructField("vec_id", LongType), StructField("cell", LongType),
        StructField("embedding", ArrayType(FloatType))))
      val probed = SimSearch.probeCells(q, cents, nprobe = 2)
        .select("cell").distinct().collect().map(_.getLong(0)).sorted
      val stored = ManifestTable.readAuto(s, idxRoot, idxSchema,
        col("cell").isin(probed.toIndexedSeq: _*))
      SimSearch.ivfTopKStored(q, stored, cents, 5, nprobe = 2)
    }, Some("""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id % 4 = 0),
      c0 AS (SELECT vec_id AS cent_id, v AS cent FROM corp WHERE vec_id % 64 = 0),
      a1 AS (SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, t.cent_id AS cell,
          row_number() OVER (PARTITION BY c.vec_id
            ORDER BY round(list_cosine_similarity(c.v, t.cent), 6) DESC, t.cent_id) AS rn
        FROM corp c CROSS JOIN c0 t) WHERE rn = 1),
      c1 AS (SELECT cell AS cent_id, list(m ORDER BY dim) AS cent FROM (
          SELECT cell, dim, floor(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS m
          FROM (SELECT cell, unnest(range(len(v))) AS dim, unnest(v) AS x FROM a1)
          GROUP BY cell, dim) GROUP BY cell),
      a2 AS (SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, t.cent_id AS cell,
          row_number() OVER (PARTITION BY c.vec_id
            ORDER BY round(list_cosine_similarity(c.v, t.cent), 6) DESC, t.cent_id) AS rn
        FROM corp c CROSS JOIN c1 t) WHERE rn = 1),
      c2 AS (SELECT cell AS cent_id, list(m ORDER BY dim) AS cent FROM (
          SELECT cell, dim, floor(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS m
          FROM (SELECT cell, unnest(range(len(v))) AS dim, unnest(v) AS x FROM a2)
          GROUP BY cell, dim) GROUP BY cell),
      ca AS (SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, t.cent_id AS cell,
          row_number() OVER (PARTITION BY c.vec_id
            ORDER BY round(list_cosine_similarity(c.v, t.cent), 6) DESC, t.cent_id) AS rn
        FROM corp c CROSS JOIN c2 t) WHERE rn = 1),
      q AS (SELECT vec_id AS query_id, v AS qv FROM corp WHERE vec_id < 8),
      qa AS (SELECT query_id, qv, cell FROM (
        SELECT q.query_id, q.qv, t.cent_id AS cell,
          row_number() OVER (PARTITION BY q.query_id
            ORDER BY round(list_cosine_similarity(q.qv, t.cent), 6) DESC, t.cent_id) AS rn
        FROM q CROSS JOIN c2 t) WHERE rn <= 2),
      sc AS (SELECT qa.query_id, ca.vec_id, round(list_cosine_similarity(qa.qv, ca.v), 6) AS cosine
        FROM ca JOIN qa ON ca.cell = qa.cell
        WHERE ca.vec_id % 10 <> 4),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk FROM sc)
      SELECT query_id, vec_id, cosine, CAST(rnk AS INTEGER) AS rank FROM w WHERE rnk <= 5""")),

    // NESTED-COLUMN DATA SKIPPING on the hard gate (r18, completing the
    // nested-evolution story): zone maps and Bloom filters on DOTTED leaf
    // paths — parquet footers key chunk stats by exactly that path, the
    // Bloom harvest selects by it, and `readAuto` folds GetStructField
    // chains in the predicate to the same dotted name. The reference's
    // document model is nested (`current.condition.text`), so at 100 TB
    // its selective queries live or die on nested skipping: here a range
    // on `o.m.key` (range-clustered) prunes files via nested zones and an
    // equality on `o.m.status` rides the nested Bloom, with the full
    // predicate re-applied on the survivors — prune-then-filter is always
    // a correct superset, and the oracle pins exactness.
    ("q202_nested_skipping", (s: SparkSession, d: String) => {
      import graft.sources.ManifestTable
      val o = t(s, d, "orders").select(col("o_orderkey").as("k"),
        struct(
          struct(col("o_orderkey").as("key"),
            col("o_orderstatus").as("status")).as("m"),
          col("o_totalprice").as("price")).as("o"))
      val root = java.nio.file.Files.createTempDirectory("q202-ns").toString + "/t"
      ManifestTable.commit(o.repartitionByRange(8, col("k")), root, None,
        statsCols = Seq("o.m.key"), bloomCols = Seq("o.m.status"))
      val schema = StructType(Seq(
        StructField("k", LongType),
        StructField("o", StructType(Seq(
          StructField("m", StructType(Seq(
            StructField("key", LongType),
            StructField("status", StringType)))),
          StructField("price", DoubleType))))))
      ManifestTable.readAuto(s, root, schema,
          col("o.m.key") >= 64L && col("o.m.key") < 2048L &&
            col("o.m.status") === "F")
        .agg(count(lit(1)).cast("long").as("n"), dsum(col("o.price")).as("p"))
    }, Some(s"""SELECT CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("o_totalprice")} AS p
      FROM orders
      WHERE o_orderkey >= 64 AND o_orderkey < 2048 AND o_orderstatus = 'F'""")),

    // HIDDEN PARTITIONING (Iceberg-style partition transforms, r18): two
    // catalog tables partitioned by `days(ts)` and `bucket(8, user_id)` —
    // the derived value lives ONLY in the directory name (data files carry
    // exactly the declared schema), queries filter on the SOURCE column,
    // and [[graft.sources.PartSpec]] maps those predicates onto the
    // directories (a ts range keeps ~10/30 day dirs, a user_id equality
    // keeps 1/8 bucket dirs — PartSpecSpec asserts the exact dir counts).
    // This kills the clause the reference's hourly ETL hand-maintains
    // (reference src/get_weather_data.py windows on localtime_epoch
    // arithmetic): at 100 TB, forgetting the redundant day-column filter
    // no longer costs a full scan. Two INSERT generations make the day
    // dirs multi-version (blind appends commute).
    ("q203_hidden_partitioning", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val ev = t(s, d, "events").select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"))
      val wh = java.nio.file.Files.createTempDirectory("q203-cat").toString
      s.conf.set("spark.sql.catalog.gq203", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq203.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq203.db")
      s.sql("DROP TABLE IF EXISTS gq203.db.ev")
      s.sql("DROP TABLE IF EXISTS gq203.db.evb")
      ev.createOrReplaceTempView("q203_src")
      s.sql("""CREATE TABLE gq203.db.ev (
        event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        event_type STRING, value DOUBLE) PARTITIONED BY (days(ts))""")
      s.sql("INSERT INTO gq203.db.ev SELECT * FROM q203_src WHERE event_id % 2 = 1")
      s.sql("INSERT INTO gq203.db.ev SELECT * FROM q203_src WHERE event_id % 2 = 0")
      s.sql("""CREATE TABLE gq203.db.evb (
        event_id BIGINT, user_id BIGINT, value DOUBLE)
        PARTITIONED BY (bucket(8, user_id))""")
      s.sql("INSERT INTO gq203.db.evb SELECT event_id, user_id, value FROM q203_src")
      // 2024-01-10T00Z .. 2024-01-20T00Z in epoch micros (TZ-free literals)
      s.sql(s"""SELECT a.event_type, a.n, a.v, a.u, b.n_pt, b.v_pt
        FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                ${dsumSql("value")} AS v,
                CAST(count(DISTINCT user_id) AS BIGINT) AS u
              FROM gq203.db.ev
              WHERE ts >= timestamp_micros(1704844800000000)
                AND ts < timestamp_micros(1705708800000000)
              GROUP BY event_type) a
        CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_pt,
                ${dsumSql("value")} AS v_pt
              FROM gq203.db.evb WHERE user_id = 31) b""")
    }, Some(s"""WITH src AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
          user_id, event_type, value FROM events)
      SELECT a.event_type, a.n, a.v, a.u, b.n_pt, b.v_pt
      FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              ${dsumSql("value")} AS v,
              CAST(count(DISTINCT user_id) AS BIGINT) AS u
            FROM src
            WHERE ts >= make_timestamp(1704844800000000)
              AND ts < make_timestamp(1705708800000000)
            GROUP BY event_type) a
      CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_pt,
              ${dsumSql("value")} AS v_pt
            FROM src WHERE user_id = 31) b""")),

    // PARTITION-SPEC EVOLUTION (r18): an identity-partitioned events table
    // evolves to `days(ts)` METADATA-ONLY mid-life (one sidecar write — no
    // manifest version, no data I/O; generation 1 keeps its
    // `event_type=...` dirs, generation 2 lands under `ts_day=...`), then
    // row-level UPDATE and DELETE hit BOTH layouts in one pass each (the
    // DML rowId path is layout-agnostic), and one `CALL system.compact`
    // rewrites everything under the current spec and retires the mixed
    // state. The result joins three reads the evolution must keep exact:
    // the mixed snapshot after DML, a `VERSION AS OF` read of the
    // pre-evolution generation under ITS layout, and the post-compact
    // snapshot (bit-identical to the mixed one). An engine without spec
    // evolution rewrites the table to repartition — O(100 TB); this is
    // O(changed rows) DML + one sidecar write, with the compact optional.
    ("q204_partition_evolution", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val ev = t(s, d, "events").select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"))
      val wh = java.nio.file.Files.createTempDirectory("q204-cat").toString
      s.conf.set("spark.sql.catalog.gq204", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq204.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq204.db")
      s.sql("DROP TABLE IF EXISTS gq204.db.tev")
      ev.createOrReplaceTempView("q204_src")
      s.sql("""CREATE TABLE gq204.db.tev (
        event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        event_type STRING, value DOUBLE) PARTITIONED BY (event_type)""")
      s.sql("INSERT INTO gq204.db.tev SELECT * FROM q204_src WHERE event_id % 2 = 1")
      s.sql("CALL gq204.system.set_partitioning('db.tev', 'days(ts)')")
      s.sql("INSERT INTO gq204.db.tev SELECT * FROM q204_src WHERE event_id % 2 = 0")
      s.sql("UPDATE gq204.db.tev SET value = -1.0 WHERE user_id % 37 = 0")
      s.sql("DELETE FROM gq204.db.tev WHERE event_type = 'click' AND user_id % 11 = 3")
      // materialize the MIXED-layout aggregate before the compact rewrites
      // the table (the returned plan is lazy; the compact must not leak
      // into this leg) — a grouped aggregate, tiny at any corpus size
      val mixed = s.sql(s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n_mix,
            ${dsumSql("value")} AS v_mix
          FROM gq204.db.tev GROUP BY event_type""").localCheckpoint()
      mixed.createOrReplaceTempView("q204_mixed")
      s.sql("CALL gq204.system.compact('db.tev')")
      s.sql(s"""SELECT m.event_type, m.n_mix, m.v_mix, v.n_v1, v.v_v1, c.n_c, c.v_c
        FROM q204_mixed m
        JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS n_v1,
                ${dsumSql("value")} AS v_v1
              FROM gq204.db.tev VERSION AS OF 1 GROUP BY event_type) v
          ON m.event_type = v.event_type
        JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS n_c,
                ${dsumSql("value")} AS v_c
              FROM gq204.db.tev GROUP BY event_type) c
          ON m.event_type = c.event_type""")
    }, Some(s"""WITH src AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
          user_id, event_type, value FROM events),
      g1 AS (SELECT * FROM src WHERE event_id % 2 = 1),
      allr AS (SELECT * FROM src),
      upd AS (SELECT event_id, ts, user_id, event_type,
          CASE WHEN user_id % 37 = 0 THEN -1.0 ELSE value END AS value FROM allr),
      cur AS (SELECT * FROM upd
          WHERE NOT (event_type = 'click' AND user_id % 11 = 3))
      SELECT m.event_type, m.n_mix, m.v_mix, v.n_v1, v.v_v1, c.n_c, c.v_c
      FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n_mix,
              ${dsumSql("value")} AS v_mix FROM cur GROUP BY event_type) m
      JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS n_v1,
              ${dsumSql("value")} AS v_v1 FROM g1 GROUP BY event_type) v
        ON m.event_type = v.event_type
      JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS n_c,
              ${dsumSql("value")} AS v_c FROM cur GROUP BY event_type) c
        ON m.event_type = c.event_type""")),

    // SNAPSHOT TAGS (r18): named, vacuum-proof version pins — the
    // reproducibility primitive ("the snapshot we trained on") a plain
    // retention window cannot express. Two tags pin generation 1 and the
    // post-UPDATE state; an INSERT OVERWRITE then replaces the table and
    // `CALL system.vacuum(0)` reclaims ALL untagged history — the oracled
    // result reads both tags BY NAME after the vacuum (their manifests,
    // data, and DV survived), the current snapshot, and the history/tags
    // metadata-table counts that prove the untagged middle version's
    // manifest is actually gone (h_cnt = 3 of 4). At 100 TB a tag costs
    // one sidecar write; the alternative is copying the table per audit.
    ("q205_snapshot_tags", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val o = t(s, d, "orders").select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("status"), col("o_totalprice").as("price"))
      val wh = java.nio.file.Files.createTempDirectory("q205-cat").toString
      s.conf.set("spark.sql.catalog.gq205", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq205.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq205.db")
      s.sql("DROP TABLE IF EXISTS gq205.db.o")
      o.createOrReplaceTempView("q205_src")
      s.sql("CREATE TABLE gq205.db.o (k BIGINT, status STRING, price DOUBLE)")
      s.sql("INSERT INTO gq205.db.o SELECT * FROM q205_src WHERE k % 2 = 1") // v1
      s.sql("CALL gq205.system.create_tag('db.o', 'baseline')")
      s.sql("INSERT INTO gq205.db.o SELECT * FROM q205_src WHERE k % 2 = 0") // v2
      s.sql("UPDATE gq205.db.o SET status = 'X' WHERE k % 97 = 0") // v3
      s.sql("CALL gq205.system.create_tag('db.o', 'audited')")
      s.sql("INSERT OVERWRITE gq205.db.o SELECT * FROM q205_src WHERE k % 3 = 0") // v4
      s.sql("CALL gq205.system.vacuum('db.o', 0)")
      s.sql(s"""SELECT b.b_n, b.b_p, a.a_n, a.a_x, c.c_n, c.c_p, h.h_cnt, tg.tg_cnt
        FROM (SELECT CAST(count(*) AS BIGINT) AS b_n, ${dsumSql("price")} AS b_p
              FROM gq205.db.o VERSION AS OF 'baseline') b
        CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS a_n,
                CAST(count(CASE WHEN status = 'X' THEN 1 END) AS BIGINT) AS a_x
              FROM gq205.db.o VERSION AS OF 'audited') a
        CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS c_n,
                ${dsumSql("price")} AS c_p FROM gq205.db.o) c
        CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS h_cnt
              FROM gq205.db.o.history) h
        CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS tg_cnt
              FROM gq205.db.o.tags) tg""")
    }, Some(s"""WITH src AS (SELECT o_orderkey AS k, o_orderstatus AS status,
          o_totalprice AS price FROM orders)
      SELECT b.b_n, b.b_p, a.a_n, a.a_x, c.c_n, c.c_p,
        CAST(3 AS BIGINT) AS h_cnt, CAST(2 AS BIGINT) AS tg_cnt
      FROM (SELECT CAST(count(*) AS BIGINT) AS b_n, ${dsumSql("price")} AS b_p
            FROM src WHERE k % 2 = 1) b
      CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS a_n,
              CAST(count(CASE WHEN k % 97 = 0 THEN 1 END) AS BIGINT) AS a_x
            FROM src) a
      CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS c_n,
              ${dsumSql("price")} AS c_p FROM src WHERE k % 3 = 0) c""")),

    // CHECK CONSTRAINTS (r18): Delta-style write-time data-quality gates —
    // `graft.check.<name>` predicates fused into every write's own
    // projection (assert_true filter: zero extra scans), ADD-time
    // validated against the declared schema AND the live rows (one
    // O(table) scan at declaration, the price of the guarantee). This
    // query runs the whole ENFORCED lifecycle — CREATE-time constraint,
    // two INSERT generations, ALTER..SET adding a second constraint over
    // live data, a row-level UPDATE whose postimages must re-satisfy both
    // — and the oracle proves the enforced path is bit-identical to the
    // unguarded relational replay. (Violation paths throw; ChecksSpec
    // pins those.) The reference hand-rolls this as per-row Python type
    // checks feeding a dead-letter list (reference
    // src/process_insert_update_weather_data.py) — here it is declarative
    // and rides the engine's own write job at any scale.
    ("q206_check_constraints", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val o = t(s, d, "orders").select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("status"), col("o_totalprice").as("price"))
      val wh = java.nio.file.Files.createTempDirectory("q206-cat").toString
      s.conf.set("spark.sql.catalog.gq206", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq206.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq206.db")
      s.sql("DROP TABLE IF EXISTS gq206.db.o")
      o.createOrReplaceTempView("q206_src")
      s.sql("""CREATE TABLE gq206.db.o (k BIGINT, status STRING, price DOUBLE)
        TBLPROPERTIES ('graft.check.positive_price' = 'price > 0')""")
      s.sql("INSERT INTO gq206.db.o SELECT * FROM q206_src WHERE k % 2 = 1")
      s.sql("""ALTER TABLE gq206.db.o SET TBLPROPERTIES
        ('graft.check.known_status' = "status IN ('O','F','P')")""")
      s.sql("INSERT INTO gq206.db.o SELECT * FROM q206_src WHERE k % 2 = 0")
      s.sql("UPDATE gq206.db.o SET price = price + 1.0 WHERE k % 19 = 0")
      s.sql(s"""SELECT status, CAST(count(*) AS BIGINT) AS n,
          ${dsumSql("price")} AS p
        FROM gq206.db.o GROUP BY status""")
    }, Some(s"""WITH src AS (SELECT o_orderkey AS k, o_orderstatus AS status,
          CASE WHEN o_orderkey % 19 = 0 THEN o_totalprice + 1.0
               ELSE o_totalprice END AS price FROM orders)
      SELECT status, CAST(count(*) AS BIGINT) AS n, ${dsumSql("price")} AS p
      FROM src GROUP BY status""")),

    // COLUMN DEFAULT VALUES (r18): `ADD COLUMN ... DEFAULT` as a
    // METADATA-ONLY backfill — generation-1 files never carry the added
    // columns, yet read the frozen existence default instead of NULL
    // (Spark's parquet reader fills requested-but-absent columns from the
    // EXISTS_DEFAULT the DDL stored; by-id resolution keeps a dropped
    // column's bytes unreachable under a later re-add). SET DEFAULT then
    // retargets FUTURE inserts only. The oracle replays the three insert
    // generations with their generation's defaults as plain CASE logic —
    // bit-identical without any engine machinery, which is the point: at
    // 100 TB the engine pays ONE sidecar write where a by-name engine
    // rewrites every file to backfill.
    ("q207_column_defaults", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val o = t(s, d, "orders").select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("status"), col("o_totalprice").as("price"))
      val wh = java.nio.file.Files.createTempDirectory("q207-cat").toString
      s.conf.set("spark.sql.catalog.gq207", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq207.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq207.db")
      s.sql("DROP TABLE IF EXISTS gq207.db.o")
      o.createOrReplaceTempView("q207_src")
      s.sql("""CREATE TABLE gq207.db.o (k BIGINT, status STRING, price DOUBLE,
        src STRING DEFAULT 'legacy')""")
      s.sql("""INSERT INTO gq207.db.o (k, status, price)
        SELECT * FROM q207_src WHERE k % 3 = 0""")
      s.sql("""ALTER TABLE gq207.db.o ADD COLUMNS
        (region STRING DEFAULT 'UNKNOWN', prio INT DEFAULT 3)""")
      s.sql("""INSERT INTO gq207.db.o
        SELECT k, status, price, 'import', 'ASIA', CAST(k % 5 AS INT)
        FROM q207_src WHERE k % 3 = 1""")
      s.sql("ALTER TABLE gq207.db.o ALTER COLUMN src SET DEFAULT 'live'")
      s.sql("""INSERT INTO gq207.db.o (k, status, price)
        SELECT * FROM q207_src WHERE k % 3 = 2""")
      s.sql(s"""SELECT src, region, CAST(count(*) AS BIGINT) AS n,
          ${dsumSql("price")} AS p, CAST(sum(prio) AS BIGINT) AS pr
        FROM gq207.db.o GROUP BY src, region""")
    }, Some(s"""WITH src0 AS (SELECT o_orderkey AS k, o_orderstatus AS status,
          o_totalprice AS price FROM orders),
      g AS (
        SELECT k, price, 'legacy' AS src, 'UNKNOWN' AS region, 3 AS prio
          FROM src0 WHERE k % 3 = 0
        UNION ALL
        SELECT k, price, 'import', 'ASIA', CAST(k % 5 AS INT)
          FROM src0 WHERE k % 3 = 1
        UNION ALL
        SELECT k, price, 'live', 'UNKNOWN', 3 FROM src0 WHERE k % 3 = 2)
      SELECT src, region, CAST(count(*) AS BIGINT) AS n,
        ${dsumSql("price")} AS p, CAST(CAST(sum(prio) AS BIGINT) AS BIGINT) AS pr
      FROM g GROUP BY src, region""")),

    // COMPOSITE PARTITION SPECS (r19): `PARTITIONED BY (days(ts),
    // bucket(4, user_id))` — the canonical production layout (a time
    // dimension for retention/range pruning × a hash dimension for write
    // fan-out and point pruning), one nested hive segment per transform
    // (`ts_day=…/user_id_bucket=…`), both derived values living ONLY in
    // the directory names. Table `cev` is born composite: a ts range
    // prunes the day segments, a user_id equality prunes the bucket
    // segments, and a predicate on both intersects (PartSpecSpec asserts
    // the exact dir counts: 8/12, 3/12, 2/12 on its fixture). Table `mev`
    // EVOLVES days(ts) → composite metadata-only mid-life, takes row-level
    // UPDATE/DELETE across the mixed layouts, and one compact rewrite ends
    // the mix — the oracled result proves the mixed and post-compact
    // snapshots bit-equal. At 100 TB this is the layout that keeps BOTH
    // "last week's data" and "this user's rows" from full-scanning.
    // Split in r20 (VERDICT r19 #8): the suite's slowest query carried TWO
    // commit-lifecycle stories — a future regression couldn't name its
    // half. q208 keeps the BORN-COMPOSITE table (one commit, both
    // dimensions pruning from day one); q213 carries the evolving-table
    // DML + compact lifecycle.
    ("q208_composite_spec", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val ev = t(s, d, "events").select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"))
      val wh = java.nio.file.Files.createTempDirectory("q208-cat").toString
      s.conf.set("spark.sql.catalog.gq208", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq208.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq208.db")
      s.sql("DROP TABLE IF EXISTS gq208.db.cev")
      ev.createOrReplaceTempView("q208_src")
      // born-composite table: both dimensions prune from day one (blind-
      // append multi-version day dirs are q203's claim — one commit here;
      // per-commit cost is O(dir product), so the query stays lean)
      s.sql("""CREATE TABLE gq208.db.cev (
        event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        event_type STRING, value DOUBLE)
        PARTITIONED BY (days(ts), bucket(4, user_id))""")
      s.sql("INSERT INTO gq208.db.cev SELECT * FROM q208_src")
      // 2024-01-10T00Z .. 2024-01-20T00Z in epoch micros (TZ-free literals)
      s.sql(s"""SELECT a.event_type, a.n, a.v, b.n_pt, b.v_pt
        FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                ${dsumSql("value")} AS v
              FROM gq208.db.cev
              WHERE ts >= timestamp_micros(1704844800000000)
                AND ts < timestamp_micros(1705708800000000)
              GROUP BY event_type) a
        CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_pt,
                ${dsumSql("value")} AS v_pt
              FROM gq208.db.cev
              WHERE ts >= timestamp_micros(1704844800000000)
                AND ts < timestamp_micros(1705708800000000)
                AND user_id = 31) b""")
    }, Some(s"""WITH src AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
          user_id, event_type, value FROM events)
      SELECT a.event_type, a.n, a.v, b.n_pt, b.v_pt
      FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              ${dsumSql("value")} AS v
            FROM src
            WHERE ts >= make_timestamp(1704844800000000)
              AND ts < make_timestamp(1705708800000000)
            GROUP BY event_type) a
      CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_pt,
              ${dsumSql("value")} AS v_pt
            FROM src
            WHERE ts >= make_timestamp(1704844800000000)
              AND ts < make_timestamp(1705708800000000)
              AND user_id = 31) b""")),

    // The evolving half of the old q208: days(ts) generation, METADATA-ONLY
    // evolution to a composite spec, a second generation under the new
    // layout, row-level UPDATE and DELETE across the MIXED layouts, the
    // mixed-snapshot aggregate, then one compact that retires the mix —
    // post-compact results bit-identical to the mixed ones.
    ("q213_composite_evolve", (s: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val ev = t(s, d, "events").select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"))
      val wh = java.nio.file.Files.createTempDirectory("q213-cat").toString
      s.conf.set("spark.sql.catalog.gq213", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq213.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq213.db")
      s.sql("DROP TABLE IF EXISTS gq213.db.mev")
      ev.createOrReplaceTempView("q213_src")
      s.sql("""CREATE TABLE gq213.db.mev (
        event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        event_type STRING, value DOUBLE) PARTITIONED BY (days(ts))""")
      s.sql("INSERT INTO gq213.db.mev SELECT * FROM q213_src WHERE event_id % 2 = 1")
      s.sql("CALL gq213.system.set_partitioning('db.mev', 'days(ts),bucket(2,user_id)')")
      s.sql("INSERT INTO gq213.db.mev SELECT * FROM q213_src WHERE event_id % 2 = 0")
      s.sql("UPDATE gq213.db.mev SET value = -2.0 WHERE user_id % 29 = 5")
      s.sql("DELETE FROM gq213.db.mev WHERE event_type = 'view' AND user_id % 13 = 2")
      // materialize the mixed-layout aggregate before the compact (lazy
      // plans — the rewrite must not leak into this leg)
      val mixed = s.sql(s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n_mix,
            ${dsumSql("value")} AS v_mix
          FROM gq213.db.mev GROUP BY event_type""").localCheckpoint()
      mixed.createOrReplaceTempView("q213_mixed")
      s.sql("CALL gq213.system.compact('db.mev')")
      s.sql(s"""SELECT m.event_type, m.n_mix, m.v_mix, c.n_c, c.v_c
        FROM q213_mixed m
        JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS n_c,
                ${dsumSql("value")} AS v_c
              FROM gq213.db.mev GROUP BY event_type) c
          ON m.event_type = c.event_type""")
    }, Some(s"""WITH src AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
          user_id, event_type, value FROM events),
      upd AS (SELECT event_id, ts, user_id, event_type,
          CASE WHEN user_id % 29 = 5 THEN -2.0 ELSE value END AS value FROM src),
      cur AS (SELECT * FROM upd
          WHERE NOT (event_type = 'view' AND user_id % 13 = 2))
      SELECT m.event_type, m.n_mix, m.v_mix, c.n_c, c.v_c
      FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n_mix,
              ${dsumSql("value")} AS v_mix FROM cur GROUP BY event_type) m
      JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS n_c,
              ${dsumSql("value")} AS v_c FROM cur GROUP BY event_type) c
        ON m.event_type = c.event_type""")),

    // WRITE-PATH SCHEMA EVOLUTION (mergeSchema, r19): a CDC pipeline's
    // upstream adds fields mid-life — the reference's change-stream
    // documents are schemaless (reference
    // src/process_insert_update_weather_data.py upserts whatever fields
    // the Mongo doc carries), so every upstream addition used to need a
    // coordinated ALTER before the pipeline could resume. Here generation
    // 1 lands with 3 columns; a front-door append carrying TWO new
    // columns (`user_id`, `event_type`) auto-evolves the declared sidecar
    // (one metadata write, fresh field ids above high-water — the
    // drop/re-add resurrection guard stays intact, SchemaEvolveSpec); a
    // programmatic evolve+alignTo+mergeDv upsert then overwrites a slice
    // of the OLD generation's keys with the new shape. Old rows read NULL
    // for the added columns; the final aggregate groups over the evolved
    // column across all three generations.
    ("q209_merge_schema", (s: SparkSession, d: String) => {
      import graft.sources.{GraftCatalog, ManifestTable, SchemaEvolve}
      val ev = t(s, d, "events").select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"))
      val wh = java.nio.file.Files.createTempDirectory("q209-cat").toString
      // fresh catalog NAME per invocation ([[catSeq]]): this query mixes
      // catalog SQL with direct warehouse paths, and Spark's by-name
      // catalog cache would pin a re-run's SQL to the previous temp dir
      val cat = s"gq209x${catSeq.incrementAndGet()}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      ev.createOrReplaceTempView("q209_src")
      s.sql(s"CREATE TABLE $cat.db.e (event_id BIGINT, ts TIMESTAMP, value DOUBLE)")
      s.sql(s"""INSERT INTO $cat.db.e
        SELECT event_id, ts, value FROM q209_src WHERE event_id % 2 = 1""")
      val root = s"$wh/db/e"
      // generation 2: the frame carries user_id + event_type — mergeSchema
      // absorbs them into the declared sidecar and the write proceeds
      ev.filter(col("event_id") % 2 === 0)
        .write.format("graft").option("mergeSchema", "true")
        .mode("append").save(root)
      // generation 3: programmatic CDC upsert of a slice of the OLD keys
      // under the evolved shape (evolve is a no-op here — schema current)
      val batch = ev.filter(col("event_id") % 4 === 1)
        .withColumn("value", col("value") * 2)
      val evolved = SchemaEvolve.evolve(s, root, batch.schema)
      ManifestTable.mergeDv(SchemaEvolve.alignTo(batch, evolved), root, evolved,
        Seq("event_id"), None, Nil, Nil, None, None)
      // generation 4 (r20): SQL `MERGE WITH SCHEMA EVOLUTION` — the source
      // carries a THIRD new column (`score`); Spark's analyzer rule diffs
      // it against the target, ALTERs through the catalog (fresh field id),
      // then resolves the star assignments against the evolved schema. The
      // matched half rewrites gen-2 rows with their score; the not-matched
      // half (offset keys) inserts brand-new rows.
      val m4 = ev.filter(col("event_id") % 10 === 2)
        .withColumn("score", col("event_id") % 7)
      m4.unionByName(m4.withColumn("event_id", col("event_id") + 1000000000L))
        .createOrReplaceTempView("q209_m")
      s.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.db.e tgt
        USING q209_m src ON tgt.event_id = src.event_id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      s.sql(s"""SELECT coalesce(event_type, '<none>') AS et,
          CAST(count(*) AS BIGINT) AS n, ${dsumSql("value")} AS v,
          CAST(count(user_id) AS BIGINT) AS u,
          CAST(count(DISTINCT user_id) AS BIGINT) AS ud,
          CAST(count(score) AS BIGINT) AS sn,
          coalesce(CAST(sum(score) AS BIGINT), 0) AS ss
        FROM $cat.db.e GROUP BY coalesce(event_type, '<none>')""")
    }, Some(s"""WITH src AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
          user_id, event_type, value FROM events),
      tbl AS (
        SELECT event_id, value, CAST(NULL AS BIGINT) AS user_id,
            CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS BIGINT) AS score
          FROM src WHERE event_id % 2 = 1 AND event_id % 4 <> 1
        UNION ALL
        SELECT event_id, value, user_id, event_type, CAST(NULL AS BIGINT)
          FROM src WHERE event_id % 2 = 0 AND event_id % 10 <> 2
        UNION ALL
        SELECT event_id, value * 2, user_id, event_type, CAST(NULL AS BIGINT)
          FROM src WHERE event_id % 4 = 1
        UNION ALL
        SELECT event_id, value, user_id, event_type, event_id % 7
          FROM src WHERE event_id % 10 = 2
        UNION ALL
        SELECT event_id + 1000000000, value, user_id, event_type, event_id % 7
          FROM src WHERE event_id % 10 = 2)
      SELECT coalesce(event_type, '<none>') AS et,
        CAST(count(*) AS BIGINT) AS n, ${dsumSql("value")} AS v,
        CAST(count(user_id) AS BIGINT) AS u,
        CAST(count(DISTINCT user_id) AS BIGINT) AS ud,
        CAST(count(score) AS BIGINT) AS sn,
        coalesce(CAST(CAST(sum(score) AS BIGINT) AS BIGINT), 0) AS ss
      FROM tbl GROUP BY coalesce(event_type, '<none>')""")),

    // BRANCHES + WRITE-AUDIT-PUBLISH (r19): the audit-before-publish
    // workflow q205's read-only tags cannot express. A branch is a named
    // ref over the SHARED manifest log (the Iceberg snapshots+refs model,
    // head = max over append-only `_ref.<name>.<v>` markers): staged
    // INSERTs and a cross-generation DELETE land on branch `audit` under
    // the SAME CHECK constraints while main serves readers untouched; the
    // audit leg aggregates the branch by name (`VERSION AS OF 'audit'`);
    // `CALL system.fast_forward` publishes main := branch head METADATA-
    // ONLY after an ancestry walk over the `#parent` directives proves
    // main never diverged (BranchSpec pins the refusal on divergence, the
    // vacuum pin on branch heads, and main sliding past branch-claimed
    // version numbers). At 100 TB the audit costs zero data movement —
    // the alternative is a staging copy of the table per release.
    ("q210_wap", (s: SparkSession, d: String) => {
      import graft.sources.{GraftCatalog, ManifestTable}
      val o = t(s, d, "orders").select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("status"), col("o_totalprice").as("price"))
      val wh = java.nio.file.Files.createTempDirectory("q210-cat").toString
      s.conf.set("spark.sql.catalog.gq210", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq210.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gq210.db")
      s.sql("DROP TABLE IF EXISTS gq210.db.o")
      o.createOrReplaceTempView("q210_src")
      s.sql("""CREATE TABLE gq210.db.o (k BIGINT, status STRING, price DOUBLE)
        TBLPROPERTIES ('graft.check.ppos' = 'price >= 0')""")
      s.sql("INSERT INTO gq210.db.o SELECT * FROM q210_src WHERE k % 3 = 0")
      s.sql("CALL gq210.system.create_branch('db.o', 'audit')")
      ManifestTable.onBranch("audit") {
        s.sql("INSERT INTO gq210.db.o SELECT * FROM q210_src WHERE k % 3 = 1")
        s.sql("DELETE FROM gq210.db.o WHERE k % 30 = 3")
      }
      // audit the branch BY NAME while main still serves the old snapshot;
      // materialize the pre-publish main aggregate (lazy plans — the
      // fast-forward below must not leak into this leg)
      val before = s.sql(s"""SELECT status, CAST(count(*) AS BIGINT) AS n_b,
          ${dsumSql("price")} AS p_b
        FROM gq210.db.o GROUP BY status""").localCheckpoint()
      before.createOrReplaceTempView("q210_before")
      val branch = s.sql(s"""SELECT status, CAST(count(*) AS BIGINT) AS n_br,
          ${dsumSql("price")} AS p_br
        FROM gq210.db.o VERSION AS OF 'audit' GROUP BY status""").localCheckpoint()
      branch.createOrReplaceTempView("q210_branch")
      s.sql("CALL gq210.system.fast_forward('db.o', 'audit')")
      s.sql(s"""SELECT b.status, b.n_b, b.p_b, r.n_br, r.p_br, a.n_a, a.p_a
        FROM q210_before b
        JOIN q210_branch r ON b.status = r.status
        JOIN (SELECT status, CAST(count(*) AS BIGINT) AS n_a,
                ${dsumSql("price")} AS p_a
              FROM gq210.db.o GROUP BY status) a
          ON b.status = a.status""")
    }, Some(s"""WITH src AS (SELECT o_orderkey AS k, o_orderstatus AS status,
          o_totalprice AS price FROM orders),
      g1 AS (SELECT * FROM src WHERE k % 3 = 0),
      br AS (SELECT * FROM (SELECT * FROM g1 UNION ALL
               SELECT * FROM src WHERE k % 3 = 1)
             WHERE k % 30 <> 3)
      SELECT b.status, b.n_b, b.p_b, r.n_br, r.p_br, a.n_a, a.p_a
      FROM (SELECT status, CAST(count(*) AS BIGINT) AS n_b,
              ${dsumSql("price")} AS p_b FROM g1 GROUP BY status) b
      JOIN (SELECT status, CAST(count(*) AS BIGINT) AS n_br,
              ${dsumSql("price")} AS p_br FROM br GROUP BY status) r
        ON b.status = r.status
      JOIN (SELECT status, CAST(count(*) AS BIGINT) AS n_a,
              ${dsumSql("price")} AS p_a FROM br GROUP BY status) a
        ON b.status = a.status""")),

    // SCAN-STATISTICS ESTIMATES, ORACLED (r19): the row counts and column
    // NDV a catalog scan reports to Catalyst are not heuristics — rows are
    // exact footer sums over the pruned file set, and NDV is a KMV sketch
    // over PORTABLE md5 hashes, so DuckDB replays both bit-for-bit (the
    // q116 estimator replayed at the metadata layer: union of per-file
    // bottom-k sketches == global bottom-k, the KMV property). Two scopes:
    // the full table and a partition-pruned slice — proving the estimates
    // track exactly what the pruned plan will read, which is what makes
    // them safe to hand to join planning at 100 TB.
    ("q211_scan_stats", (s: SparkSession, d: String) => {
      import graft.sources.{GraftCatalog, ManifestTable}
      val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
        col("event_type"))
      val wh = java.nio.file.Files.createTempDirectory("q211-cat").toString
      val cat = s"gq211x${catSeq.incrementAndGet()}" // mixes SQL + raw paths
      s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      ev.createOrReplaceTempView("q211_src")
      s.sql(s"""CREATE TABLE $cat.db.e (
        event_id BIGINT, user_id BIGINT, event_type STRING)
        PARTITIONED BY (event_type)
        TBLPROPERTIES ('statsCols' = 'event_id', 'bloomCols' = 'user_id')""")
      s.sql(s"INSERT INTO $cat.db.e SELECT * FROM q211_src")
      val root = s"$wh/db/e"
      val cur = ManifestTable.currentVersion(s, root).get
      val (_, fullRows, fullNdv) = ManifestTable.estimatePruned(s, root, cur, Nil)
      val (_, clickRows, clickNdv) = ManifestTable.estimatePruned(s, root, cur,
        Nil, points = Seq("event_type" -> "click"))
      import s.implicits._
      Seq(("full", fullRows.get, fullNdv("user_id")),
        ("click", clickRows.get, clickNdv("user_id")))
        .toDF("scope", "n_rows", "ndv")
    }, Some("""WITH src AS (SELECT event_id, user_id, event_type FROM events),
      fh AS (SELECT DISTINCT
          ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        FROM src WHERE user_id IS NOT NULL),
      fk AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM fh),
      ch AS (SELECT DISTINCT
          ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        FROM src WHERE user_id IS NOT NULL AND event_type = 'click'),
      ck AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM ch)
      SELECT 'full' AS scope,
        (SELECT CAST(count(*) AS BIGINT) FROM src) AS n_rows,
        CASE WHEN (SELECT count(*) FROM fh) < 128
          THEN (SELECT CAST(count(*) AS BIGINT) FROM fh)
          ELSE CAST(floor(127.0 * 1152921504606846976.0 /
            CAST((SELECT hv FROM fk WHERE rn = 128) AS DOUBLE)) AS BIGINT)
        END AS ndv
      UNION ALL
      SELECT 'click',
        (SELECT CAST(count(*) AS BIGINT) FROM src WHERE event_type = 'click'),
        CASE WHEN (SELECT count(*) FROM ch) < 128
          THEN (SELECT CAST(count(*) AS BIGINT) FROM ch)
          ELSE CAST(floor(127.0 * 1152921504606846976.0 /
            CAST((SELECT hv FROM ck WHERE rn = 128) AS DOUBLE)) AS BIGINT)
        END""")),

    // STORAGE-PARTITIONED JOIN (r20): lineitem and orders land in two graft
    // tables both declared `PARTITIONED BY (bucket(8, <orderkey>))`, and
    // the fact–fact join on the orderkey plans with ZERO Exchange — each
    // scan reports `KeyGroupedPartitioning(bucket(8, k), 8)` and plans one
    // key-grouped input partition per bucket, so SortMergeJoin consumes
    // co-located buckets directly (SpjSpec asserts the plan shape; this
    // query oracles the RESULT equals a plain join — the q167
    // result-invisibility pattern). At 100 TB this is THE reason to bucket:
    // the recurring fact–fact shuffle (both sides, every run) becomes a
    // zero-movement merge. Runs on its own session so the SPJ switch and
    // the disabled broadcast threshold never leak into other queries.
    ("q212_spj_join", (s0: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val s = s0.newSession()
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = t(s, d, "lineitem").select(col("l_orderkey"),
        col("l_extendedprice"), col("l_quantity"))
      val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"))
      val wh = java.nio.file.Files.createTempDirectory("q212-cat").toString
      val cat = s"gq212x${catSeq.incrementAndGet()}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      li.createOrReplaceTempView("q212_li")
      ord.createOrReplaceTempView("q212_ord")
      s.sql(s"""CREATE TABLE $cat.db.li (
        l_orderkey BIGINT, l_extendedprice DOUBLE, l_quantity DOUBLE)
        PARTITIONED BY (bucket(8, l_orderkey))""")
      s.sql(s"""CREATE TABLE $cat.db.ord (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING)
        PARTITIONED BY (bucket(8, o_orderkey))""")
      s.sql(s"INSERT INTO $cat.db.li SELECT * FROM q212_li")
      s.sql(s"INSERT INTO $cat.db.ord SELECT * FROM q212_ord")
      s.sql(s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
          CAST(count(DISTINCT o_custkey) AS BIGINT) AS cust,
          ${dsumSql("l_extendedprice")} AS rev, ${dsumSql("l_quantity")} AS qty
        FROM $cat.db.li JOIN $cat.db.ord ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus""")
    }, Some(s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        CAST(count(DISTINCT o_custkey) AS BIGINT) AS cust,
        ${dsumSql("l_extendedprice")} AS rev, ${dsumSql("l_quantity")} AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus"""))
  ) ++ Seq[(String, (SparkSession, String) => DataFrame, Option[String])](

    // COMPOSITE-LAYOUT STORAGE-PARTITIONED JOIN (r20, second leg): two
    // `(days(ts), bucket(8, user_id))` tables — the canonical production
    // layout — self-join the events stream's odd and even halves on the
    // FULL partition tuple's sources (user_id, ts): same user, same
    // instant, across the two halves. Both scans key-group on (day,
    // bucket) and the join plans with ZERO Exchange (full-tuple SPJ needs
    // no subset switches; pushPartValues pads any day one half lacks).
    // The oracle replays the plain self-join — the q167/q212
    // result-invisibility pattern. Runs on its own session so the SPJ
    // switches never leak into other queries.
    ("q214_spj_composite", (s0: SparkSession, d: String) => {
      import graft.sources.GraftCatalog
      val s = s0.newSession()
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // hour-truncated event time: raw (user, ts) pairs are UNIQUE in the
      // fixture, so the co-presence join below would be empty — the hour
      // grain is the "same user active in the same hour" session shape
      val ev = t(s, d, "events").select(col("event_id"),
        date_trunc("hour", col("ts")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      val wh = java.nio.file.Files.createTempDirectory("q214-cat").toString
      val cat = s"gq214x${catSeq.incrementAndGet()}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      ev.createOrReplaceTempView("q214_src")
      Seq("odd" -> 1, "even" -> 0).foreach { case (nm, r) =>
        s.sql(s"""CREATE TABLE $cat.db.$nm (
          event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
          event_type STRING, value DOUBLE)
          PARTITIONED BY (days(ts), bucket(4, user_id))""")
        s.sql(s"INSERT INTO $cat.db.$nm SELECT * FROM q214_src WHERE event_id % 2 = $r")
      }
      s.sql(s"""SELECT a.event_type AS et_a, b.event_type AS et_b,
          CAST(count(*) AS BIGINT) AS n, ${dsumSql("a.value + b.value")} AS v
        FROM $cat.db.odd a JOIN $cat.db.even b
          ON a.user_id = b.user_id AND a.ts = b.ts
        GROUP BY a.event_type, b.event_type""")
    }, Some(s"""WITH src AS (SELECT event_id,
          date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ts,
          user_id, event_type, value FROM events)
      SELECT a.event_type AS et_a, b.event_type AS et_b,
        CAST(count(*) AS BIGINT) AS n, ${dsumSql("a.value + b.value")} AS v
      FROM (SELECT * FROM src WHERE event_id % 2 = 1) a
      JOIN (SELECT * FROM src WHERE event_id % 2 = 0) b
        ON a.user_id = b.user_id AND a.ts = b.ts
      GROUP BY a.event_type, b.event_type"""))
  )

  /** The BM25 replay shared by q72/q123 — postings, df, dl, corpus stats,
    * the sampleQueries VALUES list, and the exact scoring expression tree
    * through the decimal-routed per-(query, doc) sum `pd`. No leading WITH
    * and no trailing comma, so callers append their own CTEs.
    */
  private def bm25CoreSql: String = """d AS (SELECT doc_id,
        list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
        FROM documents),
      post AS (SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM d) GROUP BY doc_id, term),
      dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY doc_id),
      stats AS (SELECT count(*) AS n_docs,
        CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) / count(*) AS avgdl FROM dl),
      tdf AS (SELECT term, count(*) AS df FROM post GROUP BY term),
      q(query_id, qtext) AS (VALUES
        (0::BIGINT, 'spark join hash'), (1::BIGINT, 'vector stream merge'),
        (2::BIGINT, 'customer order window'), (3::BIGINT, 'slow scan filter table')),
      qt AS (SELECT DISTINCT query_id,
        unnest(list_filter(string_split_regex(trim(lower(qtext)), '\s+'), x -> x <> '')) AS term
        FROM q),
      sc AS (SELECT qt.query_id, post.doc_id,
          round(ln(1.0 + (stats.n_docs - tdf.df + 0.5) / (tdf.df + 0.5)), 6)
            * (post.tf * (1.2 + 1.0))
            / (post.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS contrib
        FROM post JOIN qt ON post.term = qt.term
        JOIN tdf ON post.term = tdf.term
        JOIN dl ON post.doc_id = dl.doc_id
        CROSS JOIN stats),
      pd AS (SELECT query_id, doc_id,
          round(CAST(SUM(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE), 4) AS score
        FROM sc GROUP BY query_id, doc_id)"""

  /** One unrolled full-batch GD round of the q136 logistic regression —
    * margin → quantized sigmoid residual → gradient → truncated-div weight
    * step, all fixed-point BIGINT (the [[graft.llm.Classifier]] contract).
    * Reads CTEs `feat`/`lab` and weights `w${i-1}`, emits `w$i`. No leading
    * or trailing comma.
    */
  private def logRegRoundSql(i: Int, lrDenom: Long): String = {
    val p = i - 1
    s"""m$i AS (SELECT f.doc_id, CAST(sum(w.wm * f.x) AS BIGINT) AS mm
        FROM feat f JOIN w$p w ON f.b = w.b GROUP BY f.doc_id),
      r$i AS (SELECT m.doc_id,
          CAST(floor(1.0 / (1.0 + exp(-(CAST(m.mm AS DOUBLE) / 1000000.0))) * 1000000.0 + 0.5) AS BIGINT)
            - lab.y * 1000000 AS rm
        FROM m$i m JOIN lab ON m.doc_id = lab.doc_id),
      g$i AS (SELECT f.b, CAST(sum(r.rm * f.x) AS BIGINT) AS gm
        FROM feat f JOIN r$i r ON f.doc_id = r.doc_id GROUP BY f.b),
      w$i AS (SELECT w.b, w.wm - CASE WHEN coalesce(g.gm, 0) >= 0
            THEN coalesce(g.gm, 0) // $lrDenom
            ELSE -((-coalesce(g.gm, 0)) // $lrDenom) END AS wm
        FROM w$p w LEFT JOIN g$i g ON w.b = g.b)"""
  }

  /** DuckDB squared-L2 over `n` dims between list columns `a` and `b`: the
    * sequential fold [[graft.llm.ProductQuant.sqDist]] replays (list_reduce
    * seeds from the first element; 0 + d1² == d1², so the engines' differing
    * fold seeds agree bit-for-bit).
    */
  private def sqSql(a: String, b: String, n: Int): String =
    s"""list_reduce(
      [($a[CAST(i AS INTEGER)] - $b[CAST(i AS INTEGER)])
       * ($a[CAST(i AS INTEGER)] - $b[CAST(i AS INTEGER)])
       FOR i IN range(1, ${n + 1})], (p, q) -> p + q)"""

  /** DuckDB replay of one Viterbi-DP segmentation (the q22 list-accumulator
    * pattern): best (dp, seg) per position, candidates over the last ≤4
    * chars, ties to the earliest split start, -1e18 sentinel for
    * unreachable positions. `word`/`mapv` name the source column and the
    * piece→logp map. ONE definition shared by every unigram oracle pass.
    */
  private def unigramDpSql(word: String, mapv: String): String = s"""list_reduce(
        [[{'dp': CAST(0.0 AS DOUBLE), 'seg': CAST([] AS VARCHAR[]), 'i': 0}]] ||
        [[{'dp': NULL, 'seg': NULL, 'i': i}] FOR i IN range(1, length(${word}) + 1)],
        (acc, x) -> acc || [
          list_reduce(
            [{'dp': CAST(-1e18 AS DOUBLE), 'seg': CAST([] AS VARCHAR[]), 'i': x[1].i}] ||
            list_filter(
              [{'dp': acc[CAST(j + 1 AS INTEGER)].dp
                  + map_extract(${mapv}, substr(${word}, CAST(j + 1 AS INTEGER), CAST(x[1].i - j AS INTEGER)))[1],
                'seg': acc[CAST(j + 1 AS INTEGER)].seg
                  || [substr(${word}, CAST(j + 1 AS INTEGER), CAST(x[1].i - j AS INTEGER))],
                'i': x[1].i} FOR j IN range(greatest(0, x[1].i - 4), x[1].i)],
              c -> c.dp IS NOT NULL),
            (b, c) -> CASE WHEN c.dp > b.dp THEN c ELSE b END)
        ]
      )[-1].seg"""

  /** The unigram-LM Viterbi-EM replay shared by q125/q128 (seed → prune →
    * 2 EM rounds) over a `toks(..., word)` relation: emits CTEs
    * `w, seed, v0, lp0, m0, seg1, c1, lp1, m1, seg2, c2` (no leading or
    * trailing comma). One definition so a replay fix can't silently
    * diverge between the two oracles (the pqChainSql convention).
    */
  private def unigramChainSql: String = s"""w AS (SELECT word, count(*) AS f FROM toks GROUP BY word),
      seed AS (SELECT piece, CAST(sum(f) AS BIGINT) AS c FROM (
          SELECT f, unnest(flatten([[substr(word, CAST(i AS INTEGER), CAST(l AS INTEGER))
              FOR l IN range(1, least(4, length(word) - i + 1) + 1)] FOR i IN range(1, length(word) + 1)])) AS piece
          FROM w) GROUP BY piece),
      v0 AS (SELECT piece, c FROM seed WHERE length(piece) = 1
         UNION ALL
         SELECT piece, c FROM (SELECT piece, c FROM seed WHERE length(piece) > 1
           ORDER BY c * length(piece) DESC, piece LIMIT 64)),
      lp0 AS (SELECT piece, round(ln(CAST(c AS DOUBLE) / (SELECT CAST(sum(c) AS DOUBLE) FROM v0)), 6) AS lp FROM v0),
      m0 AS (SELECT map(list(piece), list(lp)) AS m FROM lp0),
      seg1 AS (SELECT w.word, w.f, ${unigramDpSql("w.word", "m0.m")} AS seg FROM w CROSS JOIN m0),
      c1 AS (SELECT piece, CAST(sum(f) AS BIGINT) AS c FROM (SELECT f, unnest(seg) AS piece FROM seg1) GROUP BY piece),
      lp1 AS (SELECT piece, round(ln(CAST(c AS DOUBLE) / (SELECT CAST(sum(c) AS DOUBLE) FROM c1)), 6) AS lp FROM c1),
      m1 AS (SELECT map(list(piece), list(lp)) AS m FROM lp1),
      seg2 AS (SELECT w.word, w.f, ${unigramDpSql("w.word", "m1.m")} AS seg FROM w CROSS JOIN m1),
      c2 AS (SELECT piece, CAST(sum(f) AS BIGINT) AS c FROM (SELECT f, unnest(seg) AS piece FROM seg2) GROUP BY piece)"""

  /** The PQ Lloyd replay shared by q117/q118/q122 (seed → 2 rounds →
    * encode) over a subvector relation `src(vec_id, sub, sv)`: emits CTEs
    * `sb0, a1, cb1, a2, cb2, enc` (leading comma included). One definition
    * so a replay fix can't silently diverge between the three oracles.
    */
  /** One per-(vec, sub) nearest-codebook-entry assignment CTE (leading
    * comma): shared by the pqChainSql rounds and q124's batch-encode leg —
    * one definition, the chain-helper convention.
    */
  private def pqAsgSql(out: String, from: String, cb: String, proj: String): String = s""",
      $out AS (SELECT $proj FROM (
        SELECT x.vec_id, x.sub, x.sv, c.cid,
          row_number() OVER (PARTITION BY x.vec_id, x.sub
            ORDER BY round(${sqSql("x.sv", "c.cv", 8)}, 6), c.cid) AS rn
        FROM $from x JOIN $cb c ON x.sub = c.sub) WHERE rn = 1)"""

  /** One whole-vector coarse assignment CTE (leading comma): shared by the
    * coarseChainSql rounds, the cell/probe legs, and q124's batch cells.
    */
  private def coarseAsgSql(out: String, cb: String, srcSel: String,
                           proj: String, rnPred: String): String = s""",
      $out AS (SELECT $proj FROM (
        SELECT c.vec_id, c.v, t.ccid,
          row_number() OVER (PARTITION BY c.vec_id
            ORDER BY round(${sqSql("c.v", "t.ccv", 64)}, 6), t.ccid) AS rn
        FROM $srcSel c CROSS JOIN $cb t) WHERE $rnPred)"""

  /** The incremental-ANN replay shared by q124 (batch union append) and
    * q132 (the same index built through the STREAMING append path): train
    * on the base (vec_id % 5 < 4), encode the new batch (% 5 = 4) under the
    * frozen models, search the union. One definition — the two queries are
    * equal by construction (the streaming leg encodes with the same frozen
    * models and appends the same rows), so they must share one oracle.
    */
  private def incrementalAnnSql: String =
    s"""WITH corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE vec_id % 5 < 4)${coarseChainSql()},
      sv AS (SELECT vec_id, s.sub,
          v[CAST(8 * s.sub + 1 AS INTEGER):CAST(8 * s.sub + 8 AS INTEGER)] AS sv
        FROM corp, (SELECT unnest(range(0, 8)) AS sub) s)${pqChainSql("sv")},
      newb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE vec_id % 5 = 4),
      bsv AS (SELECT vec_id, s.sub,
          v[CAST(8 * s.sub + 1 AS INTEGER):CAST(8 * s.sub + 8 AS INTEGER)] AS sv
        FROM newb, (SELECT unnest(range(0, 8)) AS sub) s)${coarseAsgSql("cellb", "cc2", "newb", "vec_id, ccid AS cell", "rn = 1")}${pqAsgSql("encb", "bsv", "cb2", "vec_id, sub, cid AS code")},
      allcell AS (SELECT * FROM cellasg UNION ALL SELECT * FROM cellb),
      allenc AS (SELECT * FROM enc UNION ALL SELECT * FROM encb),
      dt AS (SELECT q.vec_id AS query_id, c.sub, c.cid AS code,
          round(${sqSql("q.sv", "c.cv", 8)}, 6) AS d
        FROM (SELECT * FROM sv WHERE vec_id < 8) q JOIN cb2 c ON q.sub = c.sub),
      sc AS (SELECT dt.query_id, e.vec_id,
          CAST(sum(CAST(dt.d AS DECIMAL(18,6))) AS DOUBLE) AS adc
        FROM allenc e
        JOIN allcell ce ON e.vec_id = ce.vec_id
        JOIN probe p ON p.cell = ce.cell
        JOIN dt ON e.sub = dt.sub AND e.code = dt.code AND dt.query_id = p.query_id
        GROUP BY dt.query_id, e.vec_id),
      w AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY adc, vec_id) AS rnk FROM sc)
      SELECT query_id, vec_id, adc, CAST(rnk AS INTEGER) AS rank
      FROM w WHERE rnk <= 5"""

  /** The SQ8 train + encode replay shared by q129/q130 (graft.llm
    * .ScalarQuant): per-dim [min,max] stats packed dim-ordered (`st`,
    * `sarr`) and the clamped-affine uint8 codes (`codes`) over
    * `$corp(vec_id, v)`. Leading comma; one definition so a replay fix
    * can't silently diverge between the two oracles.
    */
  private def sq8ChainSql(corp: String = "corp"): String = s""",
      st AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM (
          SELECT unnest(range(len(v))) AS dim, unnest(v) AS x FROM $corp) GROUP BY dim),
      sarr AS (SELECT list(mn ORDER BY dim) AS mn, list(mx ORDER BY dim) AS mx FROM st),
      codes AS (SELECT vec_id,
          [CASE WHEN s.mx[CAST(i AS INTEGER)] = s.mn[CAST(i AS INTEGER)] THEN 0
                ELSE greatest(0, least(255, CAST(floor((v[CAST(i AS INTEGER)] - s.mn[CAST(i AS INTEGER)])
                  / (s.mx[CAST(i AS INTEGER)] - s.mn[CAST(i AS INTEGER)]) * 255.0) AS INTEGER))) END
           FOR i IN range(1, len(v) + 1)] AS codes
        FROM $corp, sarr s)"""

  /** The SQ8 asymmetric distance replay: squared-L2 fold of `$qv` against
    * the affine reconstruction of `$codes`, with the sarr stats row in
    * scope as alias `s` — ScalarQuant.distOf∘reconOf in DuckDB. */
  private def sq8DistSql(qv: String, codes: String): String = {
    val recon = s"""CASE WHEN s.mx[CAST(i AS INTEGER)] = s.mn[CAST(i AS INTEGER)] THEN s.mn[CAST(i AS INTEGER)]
                   ELSE s.mn[CAST(i AS INTEGER)] + (CAST($codes[CAST(i AS INTEGER)] AS DOUBLE) + 0.5)
                     * (s.mx[CAST(i AS INTEGER)] - s.mn[CAST(i AS INTEGER)]) / 256.0 END"""
    s"""list_reduce([
            ($qv[CAST(i AS INTEGER)] - $recon)
            * ($qv[CAST(i AS INTEGER)] - $recon)
            FOR i IN range(1, len($qv) + 1)], (p, qq) -> p + qq)"""
  }

  private def pqChainSql(src: String, trainSample: Int = 4096,
                         corp: String = "corp", p: String = ""): String = {
    def asg(out: String, from: String, cb: String, proj: String) =
      pqAsgSql(out, from, cb, proj)
    def mean(out: String, from: String) = s""",
      $out AS (SELECT sub, cid, list(mn ORDER BY dim) AS cv FROM (
          SELECT sub, cid, dim,
            floor(CAST(sum(CAST(xx AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS mn
          FROM (SELECT sub, cid, unnest(range(len(sv))) AS dim, unnest(sv) AS xx FROM $from)
          GROUP BY sub, cid, dim) GROUP BY sub, cid)"""
    s""",
      ${p}sb0 AS (SELECT sub, vec_id AS cid, sv AS cv FROM $src
        WHERE vec_id % 32 = 0 AND vec_id < 512),
      ${p}tsv AS (SELECT * FROM $src
        WHERE CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
          / 4294967296.0 < least(CAST(1.0 AS DOUBLE),
            CAST($trainSample.0 AS DOUBLE) / (SELECT count(*) FROM $corp)))""" +
      asg(s"${p}a1", s"${p}tsv", s"${p}sb0", "vec_id, sub, sv, cid") + mean(s"${p}cb1", s"${p}a1") +
      asg(s"${p}a2", s"${p}tsv", s"${p}cb1", "vec_id, sub, sv, cid") + mean(s"${p}cb2", s"${p}a2") +
      asg(s"${p}enc", src, s"${p}cb2", "vec_id, sub, cid AS code")
  }

  /** The coarse-quantizer replay shared by q118/q122: whole-vector Lloyd
    * (seed → 2 rounds), final cell assignment, and the nprobe=2 query
    * probe — CTEs `cc0, ca1, cc1, ca2, cc2, cellasg, probe` over `corp`.
    */
  private def coarseChainSql(trainSample: Int = 4096,
                             corp: String = "corp"): String = {
    def asg(out: String, cb: String, srcSel: String, proj: String,
            rnPred: String) = coarseAsgSql(out, cb, srcSel, proj, rnPred)
    def mean(out: String, from: String) = s""",
      $out AS (SELECT ccid, list(mn ORDER BY dim) AS ccv FROM (
          SELECT ccid, dim,
            floor(CAST(sum(CAST(xx AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS mn
          FROM (SELECT ccid, unnest(range(len(v))) AS dim, unnest(v) AS xx FROM $from)
          GROUP BY ccid, dim) GROUP BY ccid)"""
    s""",
      cc0 AS (SELECT vec_id AS ccid, v AS ccv FROM $corp
        WHERE vec_id % 32 = 0 AND vec_id < 256),
      tcorp AS (SELECT * FROM $corp
        WHERE CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
          / 4294967296.0 < least(CAST(1.0 AS DOUBLE),
            CAST($trainSample.0 AS DOUBLE) / (SELECT count(*) FROM $corp)))""" +
      asg("ca1", "cc0", "tcorp", "vec_id, v, ccid", "rn = 1") + mean("cc1", "ca1") +
      asg("ca2", "cc1", "tcorp", "vec_id, v, ccid", "rn = 1") + mean("cc2", "ca2") +
      asg("cellasg", "cc2", corp, "vec_id, ccid AS cell", "rn = 1") +
      asg("probe", "cc2", s"(SELECT * FROM $corp WHERE vec_id < 8)",
        "vec_id AS query_id, ccid AS cell", "rn <= 2")
  }

  /** Unrolled DuckDB replay of BPE train + encode (q111): per round, pair
    * counts over the symbolized distinct-word relation, the tie-pinned top-1
    * merge, and the greedy left-to-right merge fold — the fold is
    * `list_reduce` over singleton-wrapped symbols with a list accumulator
    * (the q22 LCS pattern), `acc[:-2]` dropping the fused-away last element
    * (DuckDB slice bounds are inclusive). Exact by construction: counts are
    * integers, the top-1 is pinned by (c desc, pair asc), and the fold is
    * deterministic. Each s$k LEFT JOINs its merge row and falls back to
    * s${k-1}'s symbols when no pair remains (ADVICE r08: the unrolled
    * rounds must mirror train()'s EARLY STOP — a plain cross join against
    * an empty m$k would empty every later round and break the oracle on a
    * degenerate corpus).
    */
  private def bpeEncodeSql(rounds: Int): String = {
    val rs = (1 to rounds).map { k =>
      s""",
      p$k AS (SELECT pair, sum(f) AS c FROM (
        SELECT f, unnest([sym[CAST(i AS INTEGER)] || ' ' || sym[CAST(i+1 AS INTEGER)] FOR i IN range(1, len(sym))]) AS pair
        FROM s${k - 1} WHERE len(sym) >= 2) GROUP BY pair),
      m$k AS (SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b
        FROM p$k ORDER BY c DESC, pair LIMIT 1),
      s$k AS (SELECT word, f, CASE WHEN m.a IS NULL THEN sym
          ELSE list_reduce([[x] FOR x IN sym],
            (acc, x) -> CASE WHEN acc[-1] = m.a AND x[1] = m.b
                        THEN acc[:-2] || [m.a || m.b] ELSE acc || x END) END AS sym
        FROM s${k - 1} LEFT JOIN m$k m ON TRUE)"""
    }.mkString
    s"""WITH toks AS (SELECT doc_id,
        unnest(list_filter(string_split_regex(trim(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), ' '), x -> x <> '')) AS word
      FROM documents),
      w AS (SELECT word, count(*) AS f FROM toks GROUP BY word),
      s0 AS (SELECT word, f, [substr(word, CAST(i AS INTEGER), 1) FOR i IN range(1, length(word)+1)] AS sym FROM w)$rs
      SELECT t.doc_id, count(*) AS n_words, CAST(sum(len(s.sym)) AS BIGINT) AS n_tokens
      FROM toks t JOIN s$rounds s ON t.word = s.word
      GROUP BY t.doc_id"""
  }

  /** Unrolled DuckDB replay of [[graft.ops.LinkGraph.pageRank]] on the q100
    * edge set — one (c, d, r) CTE triple per round. Pure BIGINT fixed-point
    * arithmetic (1.0 == 1e12 units), so the replay is exact by construction:
    * integer `//` and `sum` have no engine-dependent rounding anywhere.
    */
  private def pageRankSql(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s""",
      c$k AS (SELECT e.dst AS node, CAST(sum(r.ru // od.outdeg) AS BIGINT) AS s
        FROM e JOIN r${k - 1} r ON e.src = r.node JOIN od ON e.src = od.src
        GROUP BY e.dst),
      d$k AS (SELECT CAST(coalesce(sum(r.ru), 0) AS BIGINT) AS dm
        FROM r${k - 1} r WHERE r.node NOT IN (SELECT src FROM od)),
      r$k AS (SELECT nodes.node,
          (15 * (1000000000000 // n) + 85 * (coalesce(c.s, 0) + d.dm // n)) // 100 AS ru
        FROM nodes LEFT JOIN c$k c ON nodes.node = c.node
        CROSS JOIN d$k d CROSS JOIN nn)"""
    }.mkString
    s"""WITH e AS (SELECT DISTINCT l_orderkey % 800 AS src, l_partkey % 1000 AS dst FROM lineitem WHERE l_linenumber = 1),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      nn AS (SELECT count(*) AS n FROM nodes),
      od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
      r0 AS (SELECT node, 1000000000000 // n AS ru FROM nodes CROSS JOIN nn)$rounds
      SELECT node, CAST(ru AS BIGINT) AS rank_units,
        CAST(ru AS DOUBLE) / CAST(1000000000000 AS DOUBLE) AS pr
      FROM r$iters"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, f, _) => n -> f }.toMap

  val oracleSql: Map[String, String] =
    all.collect { case (n, _, Some(sql)) => n -> sql.replaceAll("\\s+", " ").trim }.toMap
}
