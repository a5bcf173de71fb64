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

  private def read(spark: SparkSession, name: String, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // every table goes through the connector seam: a deployment points
    // `spark.graft.conn.<table>.*` at its MongoDB/BigQuery connector and the
    // whole engine follows (graft.sources.Connectors scaladoc).
    graft.sources.Connectors.read(spark, name, path)
  }
}
