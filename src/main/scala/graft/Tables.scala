package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
