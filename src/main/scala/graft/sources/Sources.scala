package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, StructType}

/** File sources (SURVEY.md §2.1 S2-S5). The reference's REST fetches (S1)
  * are replaced by file sources per SURVEY §0 — the engine's inputs are
  * parquet/JSON on a shared filesystem, the shape a 1000-executor cluster
  * actually reads.
  */
object Sources {

  /** S4: full table scan from the parquet catalog. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.Tables(spark, sfDir, name)

  /** S3: array-shaped JSON file (the reference's place_names.json — a JSON
    * array of structs, reference: src/ingest_places_data.py:17-20).
    * `multiLine` because a single array literal spans lines.
    */
  def jsonArrayFile(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("multiLine", true).schema(schema).json(path)

  /** S2: map-shaped JSON file (the reference's place_coordinates.json — one
    * object keyed by place_id, reference: src/ingest_weather_data.py:145-153),
    * exploded to (key, value-struct) rows.
    */
  def jsonMapFile(spark: SparkSession, path: String, valueSchema: StructType): DataFrame = {
    val raw = spark.read.option("multiLine", true)
      .option("wholetext", true).text(path)
    raw.select(explode(from_json(col("value"),
        MapType(StringType, valueSchema))).as(Seq("key", "value")))
      .select(col("key"), col("value.*"))
  }

  /** CSV with declared schema and corrupt-record routing — same contract as
    * [[jsonWithCorruptRouting]]: parse failures are banked, not crashed on or
    * silently nulled.
    */
  def csvWithCorruptRouting(spark: SparkSession, path: String,
                            schema: StructType, deadLetterPath: String,
                            runTs: java.sql.Timestamp,
                            header: Boolean = true): DataFrame = {
    val raw = spark.read.schema(schema.add("_corrupt_record", StringType))
      .option("header", header)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
    corruptRouting(raw, deadLetterPath, runTs)
  }

  /** Whole-file binary ingestion (`binaryFile` source): one row per file with
    * (path, modificationTime, length, content) — the ingest seam for the
    * multimodal pipeline (llm/Multimodal expects opaque binary payloads).
    * Spark parallelizes per file; pair with `pathGlobFilter` for extension
    * routing.
    */
  def binaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** Line-JSON read with corrupt-record ROUTING: well-formed rows parse
    * against `schema`; malformed lines land in the dead-letter sink with the
    * raw text preserved instead of crashing the batch (FAILFAST) or silently
    * nulling out (bare PERMISSIVE) — the reference's failed-fetch banking
    * (reference: src/ingest_weather_data.py:35-45) applied to parse errors.
    * One pass: the corrupt-record column splits the scan into the two legs.
    */
  def jsonWithCorruptRouting(spark: SparkSession, path: String,
                             schema: StructType, deadLetterPath: String,
                             runTs: java.sql.Timestamp): DataFrame = {
    val raw = spark.read.schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    corruptRouting(raw, deadLetterPath, runTs)
  }

  /** Shared corrupt-record split: malformed rows (raw text in
    * `_corrupt_record`) go to the dead-letter sink, parsed rows are
    * returned. The persist is load-bearing twice over: Spark refuses to
    * filter on ONLY the corrupt column of a lazy parse, and the two legs
    * must not re-read (and re-classify) the source independently.
    */
  private def corruptRouting(raw: DataFrame, deadLetterPath: String,
                             runTs: java.sql.Timestamp): DataFrame = {
    val pinned = raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    Sinks.deadLetter(
      pinned.filter(col("_corrupt_record").isNotNull)
        .select(col("_corrupt_record").as("raw")),
      deadLetterPath, runTs)
    pinned.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
  }

  /** mongoexport NDJSON dump reader — the OFFLINE Mongo ingestion path (the
    * reference pulls collections live via pymongo,
    * reference: src/ingest_weather_data.py:87-116; `mongoexport
    * --collection … --out dump.json` produces the same documents as
    * relaxed extended JSON, one per line, with NO network dependency).
    * Type wrappers (`$oid`, both `$date` forms, `$numberLong/Int` bare,
    * `$numberDecimal/Double` bare) collapse via the same codegen'd
    * [[graft.cdc.Dispatch.stripExtended]] passes the CDC envelope decoder
    * uses — one shared decoder, no parse/re-serialize round trip — then
    * `from_json` lands `docSchema`. Date-valued fields follow the CDC
    * convention: declare StringType and parse with
    * [[graft.cdc.Dispatch.parseWireDate]] (both wire forms arrive as
    * strings). Lines that fail to PARSE surface under `_malformed = true`
    * via the parser's own corrupt-record channel — a legitimately empty
    * document (`{}`, all schema fields absent → all-NULL row) is NOT
    * malformed (ADVICE r12: the old all-fields-NULL heuristic dead-lettered
    * those).
    */
  def mongoExportFile(spark: SparkSession, path: String,
                      docSchema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.from_json
    val corrupt = "_graft_corrupt"
    require(!docSchema.fieldNames.contains(corrupt),
      s"mongoExportFile: docSchema may not declare the reserved column $corrupt")
    val withCorrupt = StructType(docSchema.fields :+
      org.apache.spark.sql.types.StructField(corrupt,
        org.apache.spark.sql.types.StringType))
    spark.read.text(path)
      .select(from_json(graft.cdc.Dispatch.stripExtended(col("value")),
        withCorrupt, Map("columnNameOfCorruptRecord" -> corrupt)).as("d"))
      .select(col("d.*"))
      .withColumn("_malformed", col(corrupt).isNotNull)
      .drop(corrupt)
  }
}
