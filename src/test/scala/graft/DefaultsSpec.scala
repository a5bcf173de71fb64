package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.GraftCatalog

/** Column DEFAULT values: CREATE-time defaults filled on INSERT,
  * `ADD COLUMN ... DEFAULT` as a metadata-only backfill (committed files
  * read the existence default instead of NULL), SET/DROP DEFAULT touching
  * future inserts only, and the composition with field-id drop/re-add.
  */
class DefaultsSpec extends SparkSuite {

  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-def-wh").toString
    spark.conf.set("spark.sql.catalog.gdef", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdef.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdef.db")
    dir
  }

  test("CREATE-time default fills omitted columns on INSERT") {
    wh
    spark.sql("DROP TABLE IF EXISTS gdef.db.d1")
    spark.sql("""CREATE TABLE gdef.db.d1 (k BIGINT, status STRING DEFAULT 'new',
      n INT DEFAULT 0)""")
    spark.sql("INSERT INTO gdef.db.d1 (k) VALUES (1)")
    spark.sql("INSERT INTO gdef.db.d1 VALUES (2, 'live', 5)")
    spark.sql("INSERT INTO gdef.db.d1 (k, n) VALUES (3, DEFAULT)")
    val rows = spark.table("gdef.db.d1").as[(Long, String, Int)].collect().toSet
    assert(rows == Set((1L, "new", 0), (2L, "live", 5), (3L, "new", 0)))
  }

  test("ADD COLUMN ... DEFAULT backfills committed files metadata-only") {
    wh
    spark.sql("DROP TABLE IF EXISTS gdef.db.d2")
    spark.sql("CREATE TABLE gdef.db.d2 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gdef.db.d2 VALUES (1, 'a'), (2, 'b')") // generation 1
    val root = s"$wh/db/d2"
    val vBefore = graft.sources.ManifestTable.currentVersion(spark, root).get
    spark.sql("ALTER TABLE gdef.db.d2 ADD COLUMNS (score DOUBLE DEFAULT 1.5)")
    // metadata-only: no new manifest version, no data rewrite
    assert(graft.sources.ManifestTable.currentVersion(spark, root).get == vBefore)
    spark.sql("INSERT INTO gdef.db.d2 VALUES (3, 'c', 9.0)")
    spark.sql("INSERT INTO gdef.db.d2 (k, v) VALUES (4, 'd')")
    val got = spark.table("gdef.db.d2").select("k", "score")
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.5, 2L -> 1.5, 3L -> 9.0, 4L -> 1.5), got.toString)
    // filters over the backfilled column see the default too
    assert(spark.sql("SELECT count(*) FROM gdef.db.d2 WHERE score = 1.5")
      .as[Long].head() == 3L)
  }

  test("SET DEFAULT affects future inserts only; DROP DEFAULT ends the filling") {
    wh
    spark.sql("DROP TABLE IF EXISTS gdef.db.d3")
    spark.sql("CREATE TABLE gdef.db.d3 (k BIGINT, tag STRING DEFAULT 'v1')")
    spark.sql("INSERT INTO gdef.db.d3 (k) VALUES (1)")
    spark.sql("ALTER TABLE gdef.db.d3 ALTER COLUMN tag SET DEFAULT 'v2'")
    spark.sql("INSERT INTO gdef.db.d3 (k) VALUES (2)")
    spark.sql("ALTER TABLE gdef.db.d3 ALTER COLUMN tag DROP DEFAULT")
    spark.sql("INSERT INTO gdef.db.d3 (k) VALUES (3)")
    val rows = spark.table("gdef.db.d3").as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "v1", 2L -> "v2", 3L -> null), rows.toString)
    // a non-constant default is refused
    intercept[Exception](spark.sql(
      "ALTER TABLE gdef.db.d3 ALTER COLUMN tag SET DEFAULT concat('x', CAST(rand() AS STRING))"))
  }

  test("DROP + re-ADD with DEFAULT: old files' values stay dead, the default surfaces") {
    wh
    spark.sql("DROP TABLE IF EXISTS gdef.db.d4")
    spark.sql("CREATE TABLE gdef.db.d4 (k BIGINT, v STRING, gone INT)")
    spark.sql("INSERT INTO gdef.db.d4 VALUES (1, 'a', 111)")
    spark.sql("ALTER TABLE gdef.db.d4 DROP COLUMN gone")
    spark.sql("ALTER TABLE gdef.db.d4 ADD COLUMNS (gone INT DEFAULT 42)")
    spark.sql("INSERT INTO gdef.db.d4 VALUES (2, 'b', 7)")
    val got = spark.table("gdef.db.d4").select("k", "gone")
      .as[(Long, Int)].collect().toMap
    // generation-1's 111 must NOT resurrect (fresh field id); the re-added
    // column's default surfaces instead
    assert(got == Map(1L -> 42, 2L -> 7), got.toString)
  }

  test("defaults survive RENAME and show in DESCRIBE") {
    wh
    spark.sql("DROP TABLE IF EXISTS gdef.db.d5")
    spark.sql("CREATE TABLE gdef.db.d5 (k BIGINT, s STRING DEFAULT 'z')")
    spark.sql("INSERT INTO gdef.db.d5 (k) VALUES (1)")
    spark.sql("ALTER TABLE gdef.db.d5 RENAME COLUMN s TO label")
    spark.sql("INSERT INTO gdef.db.d5 (k) VALUES (2)")
    assert(spark.table("gdef.db.d5").select("label").as[String].collect().toSet
      == Set("z"))
    val desc = spark.sql("DESCRIBE gdef.db.d5").collect().map(_.toString).mkString
    assert(spark.table("gdef.db.d5").schema("label")
      .metadata.contains("CURRENT_DEFAULT"))
  }

  test("timestamp existence default is session-timezone-independent (ADVICE r18)") {
    wh
    spark.sql("DROP TABLE IF EXISTS gdef.db.d6")
    spark.sql("CREATE TABLE gdef.db.d6 (k BIGINT)")
    spark.sql("INSERT INTO gdef.db.d6 VALUES (1)")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      spark.sql("ALTER TABLE gdef.db.d6 ADD COLUMNS " +
        "(ts TIMESTAMP DEFAULT TIMESTAMP'2020-06-01 12:00:00')")
      val utc = spark.table("gdef.db.d6")
        .select(unix_micros(col("ts"))).as[Long].head()
      assert(utc == 1591012800000000L, s"DDL-time instant wrong: $utc")
      // a zoneless EXISTS_DEFAULT literal would re-fold under the reader's
      // session zone and shift the backfilled value by the offset
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ny = spark.table("gdef.db.d6")
        .select(unix_micros(col("ts"))).as[Long].head()
      assert(ny == utc, s"existence default shifted with session tz: $utc vs $ny")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }
}
