package graft

import org.apache.spark.sql.types._

/** Declared StructTypes — the engine's DDL (SURVEY.md §2.1 S15).
  *
  * `weatherRaw` mirrors the lake-side document shape inferred in SURVEY.md
  * §1.2 (reference: src/process_insert_update_weather_data.py:84-91);
  * `weatherFlat` mirrors the warehouse DDL (reference:
  * src/create_tables.sql:15-41); `places` mirrors
  * reference: src/create_tables.sql:2-12. `cdcEnvelope` is the change-stream
  * event shape (reference: src/process_insert_update_weather_data.py:170-183).
  */
object Schemas {

  val condition: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("icon", StringType),
    StructField("code", LongType)))

  val weatherCurrent: StructType = StructType(Seq(
    StructField("last_updated", StringType),   // "yyyy-MM-dd HH:mm"
    StructField("last_updated_epoch", LongType),
    StructField("temp_c", DoubleType),
    StructField("temp_f", DoubleType),
    StructField("is_day", LongType),           // 0|1, cast to bool on promote
    StructField("condition", condition),
    StructField("wind_mph", DoubleType),
    StructField("wind_kph", DoubleType),
    StructField("wind_degree", LongType),
    StructField("wind_dir", StringType),
    StructField("pressure_mb", DoubleType),
    StructField("pressure_in", DoubleType),
    StructField("precip_mm", DoubleType),
    StructField("precip_in", DoubleType),
    StructField("humidity", LongType),
    StructField("cloud", LongType),
    StructField("feelslike_c", DoubleType),
    StructField("feelslike_f", DoubleType),
    StructField("vis_km", DoubleType),
    StructField("vis_miles", DoubleType),
    StructField("uv", DoubleType),
    StructField("gust_mph", DoubleType),
    StructField("gust_kph", DoubleType)))

  val weatherRaw: StructType = StructType(Seq(
    StructField("_id", StringType),            // stringified ObjectId
    StructField("place_id", StringType),
    StructField("location", StructType(Seq(    // dropped on promote
      StructField("name", StringType),
      StructField("lat", DoubleType),
      StructField("lon", DoubleType)))),
    StructField("current", weatherCurrent)))

  /** Warehouse landing schema, reference: src/create_tables.sql:15-41. */
  val weatherFlat: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("place_id", StringType, nullable = false),
    StructField("last_updated", TimestampType, nullable = false),
    StructField("last_updated_epoch", LongType),
    StructField("temp_c", DoubleType),
    StructField("temp_f", DoubleType),
    StructField("is_day", BooleanType),
    StructField("condition", StringType),
    StructField("wind_mph", DoubleType),
    StructField("wind_kph", DoubleType),
    StructField("wind_degree", LongType),
    StructField("wind_dir", StringType),
    StructField("pressure_mb", DoubleType),
    StructField("pressure_in", DoubleType),
    StructField("precip_mm", DoubleType),
    StructField("precip_in", DoubleType),
    StructField("humidity", LongType),
    StructField("cloud", LongType),
    StructField("feelslike_c", DoubleType),
    StructField("feelslike_f", DoubleType),
    StructField("vis_km", DoubleType),
    StructField("vis_miles", DoubleType),
    StructField("uv", DoubleType),
    StructField("gust_mph", DoubleType),
    StructField("gust_kph", DoubleType)))

  /** reference: src/create_tables.sql:2-12 — lat/lon are STRINGS with a
    * trailing hemisphere char (src/extract_coordinates.py:18). The
    * reference DDL declares NOT NULL on country/lat/lon/name as well as the
    * key (ADVICE r08 — a schema-driven nullAudit against places was
    * silently under-enforcing with only place_id required).
    */
  val places: StructType = StructType(Seq(
    StructField("place_id", StringType, nullable = false),
    StructField("adm_area1", StringType),
    StructField("adm_area2", StringType),
    StructField("country", StringType, nullable = false),
    StructField("lat", StringType, nullable = false),
    StructField("lon", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("timezone", StringType),
    StructField("type", StringType)))

  /** Change-stream envelope, reference:
    * src/process_insert_update_weather_data.py:170-183. `fullDocument` stays
    * a JSON string at the envelope level (schema applied at dispatch).
    */
  val cdcEnvelope: StructType = StructType(Seq(
    StructField("operationType", StringType, nullable = false),
    StructField("documentKey", StringType, nullable = false),
    StructField("fullDocument", StringType),
    StructField("clusterTime", TimestampType)))

  /** The harness `events.props` JSON payload. */
  val eventProps: StructType = StructType(Seq(StructField("k", LongType)))
}
