package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The lake→warehouse projection pipeline (SURVEY.md §2.2 P1-P8, P13-P16):
  * flatten nested documents, extract nested fields, cast to the declared
  * warehouse schema. All pure column expressions — Catalyst folds the whole
  * pipeline into one projection over the scan, so column pruning and
  * predicate pushdown reach the source untouched.
  */
object Flatten {

  /** P4: hoist every field of `structCol` to the top level, keeping `keep`
    * first (reference: src/process_insert_update_weather_data.py:87-89).
    */
  def flattenStruct(df: DataFrame, structCol: String, keep: Seq[String]): DataFrame =
    df.select(keep.map(col) :+ col(s"$structCol.*"): _*)

  /** P7: string→double cast with a trailing suffix character stripped —
    * the reference's `float(lat[:-1])` (reference: src/extract_coordinates.py:18).
    */
  def stripSuffixCast(c: Column): Column =
    substring(c, lit(1), length(c) - 1).cast("double")

  /** P8: timestamp parse with the reference's literal ":00" seconds suffix
    * (reference: src/ingest_weather_data.py:64;
    * src/process_insert_update_weather_data.py:112).
    */
  def parseMinuteTimestamp(c: Column): Column =
    to_timestamp(concat(c, lit(":00")), "yyyy-MM-dd HH:mm:ss")

  /** P13: truncate to hour after a fixed wall-clock shift — the reference's
    * `utcnow()+7h` expected-stamp (reference: src/ingest_weather_data.py:142).
    * The shift is explicit (session TZ stays UTC, SURVEY.md §2.10.5).
    */
  def truncHourShifted(ts: Column, hours: Int): Column =
    date_trunc("hour", ts + expr(s"INTERVAL $hours HOURS"))

  /** P14: GMT+7 wall-clock render
    * (reference: src/process_insert_update_weather_data.py:30-34).
    */
  def renderShifted(ts: Column, hours: Int): Column =
    date_format(ts + expr(s"INTERVAL $hours HOURS"), "yyyy-MM-dd HH:mm:ss")

  /** P15: strip the filename-hostile chars from a rendered timestamp
    * (reference: src/ingest_weather_data.py:37).
    */
  def fileSafe(c: Column): Column = regexp_replace(c, "[-\\s:]", "")

  /** Cast every column present in `schema` to its declared type, in schema
    * order — the typed replacement for the reference's per-value literal
    * rendering (P17, reference:
    * src/process_insert_update_weather_data.py:111-116).
    */
  def castTo(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)

  /** The reference's whole `process_document` (reference:
    * src/process_insert_update_weather_data.py:83-93): rename+cast `_id`→`id`
    * (P3), drop `location` (P2), flatten `current` (P4), reduce `condition`
    * to its text (P5), int→bool `is_day` (P6), parse `last_updated` (P8) —
    * landing on the declared warehouse schema (S15).
    */
  def promoteWeather(raw: DataFrame): DataFrame = {
    val flat = raw
      .withColumn("id", col("_id").cast("string"))
      .drop("_id", "location")
      .select(col("id"), col("place_id"), col("current.*"))
      .withColumn("condition", col("condition.text"))
      .withColumn("is_day", col("is_day").cast("boolean"))
      .withColumn("last_updated", parseMinuteTimestamp(col("last_updated")))
    castTo(flat, graft.Schemas.weatherFlat)
  }
}
