package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed table catalog over the harness fixtures (TESTDATA.md).
  *
  * The reference's "lake" and "warehouse" are MongoDB collections and BigQuery
  * tables (reference: src/process_insert_places_data.py:23, src/create_tables.sql);
  * in this engine every table is a columnar Parquet scan so Catalyst's column
  * pruning and predicate pushdown reach the source for free (SURVEY.md §4).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = read(spark, name, s"$sfDir/$name.parquet")
    // events.ts has shipped as either parquet TIMESTAMP(NANOS) — which Spark's
    // vectorized reader rejects, so it surfaces as raw nanos under
    // nanosAsLong — or plain TIMESTAMP(MICROS) without isAdjustedToUTC, which
    // surfaces as TIMESTAMP_NTZ. Normalize both to a session-tz (UTC)
    // TIMESTAMP so every downstream query sees one type.
    if (name == "events") {
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else df
  }

  /** Fan heavy per-row work out of a parallelism-starved scan (optimization
    * r21, guide §2.5 "repartition immediately after the read"): a parquet
    * scan's parallelism is bounded by its ROW GROUPS, not its split count —
    * a one-row-group file runs its whole downstream projection in one task
    * however many splits the planner cuts (measured: q160's 2.2M
    * jaro-winkler scores in 1 task with 31 cores idle). When the scan's
    * natural parallelism is under half the session's cores, hash-repartition
    * by `key` to the core count BEFORE the expensive projection; at
    * production scale the input has >= cores row groups and this is a no-op
    * by construction — the check is against the actual scan partitioning,
    * never a constant. Hash-by-key (not round-robin) keeps the placement
    * deterministic under task retries with no sort-before-repartition pass.
    * Callers pass the relation BEFORE the heavy projection so the shuffle
    * carries input bytes once, exactly like the scan would have read them.
    *
    * KNOWN BLIND SPOT (ADVICE r21): the guard reads the SPLIT count
    * (`df.rdd.getNumPartitions`), not the row-group count — one large
    * single-row-group file cut into many mostly-empty splits passes the
    * check and skips the repartition. Splits-vs-row-groups only diverge
    * when maxPartitionBytes is far below the row-group size; the fixture
    * and any sanely-written parquet keep them aligned. The probe also
    * costs one extra physical planning of `df` (driver file listing) —
    * acceptable for the heavy-projection callers this guards.
    */
  def fanOut(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= cores) df.repartition(cores, keys: _*) else df
  }

  private def read(spark: SparkSession, name: String, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // every table goes through the connector seam: a deployment points
    // `spark.graft.conn.<table>.*` at its MongoDB/BigQuery connector and the
    // whole engine follows (graft.sources.Connectors scaladoc).
    graft.sources.Connectors.read(spark, name, path)
  }
}
