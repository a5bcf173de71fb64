package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{GraftCatalog, ManifestTable, SchemaEvolve}

/** Write-path schema evolution (`mergeSchema`): new columns absorbed into
  * the declared sidecar during a write, lossless type widening in place,
  * field-id discipline (fresh ids above high-water, no resurrection), and
  * the refusal cases.
  */
class SchemaEvolveSpec extends SparkSuite {

  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-se-wh").toString
    spark.conf.set("spark.sql.catalog.gse", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gse.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gse.db")
    dir
  }

  private def rootOf(name: String): String = { wh; s"$wh/db/$name" }

  test("front-door append with mergeSchema lands new columns; old rows read NULL") {
    wh
    spark.sql("DROP TABLE IF EXISTS gse.db.e1")
    spark.sql("CREATE TABLE gse.db.e1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gse.db.e1 VALUES (1, 'a'), (2, 'b')")
    val root = rootOf("e1")
    // frame carries a NEW column and omits nothing
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("k", "v", "score")
      .write.format("graft").option("mergeSchema", "true")
      .mode("append").save(root)
    val rows = spark.table("gse.db.e1").select("k", "score")
      .as[(Long, Option[Long])].collect().toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(30L), 4L -> Some(40L)))
    // declared schema evolved once, metadata-only (append bumped the
    // version; the sidecar write itself does not)
    assert(spark.table("gse.db.e1").schema.fieldNames.toSeq == Seq("k", "v", "score"))
    // a frame missing an OLD column aligns too (front door evolve path
    // conforms to the declared schema): v fills NULL
    Seq((5L, 50L)).toDF("k", "score")
      .write.format("graft").option("mergeSchema", "true")
      .mode("append").save(root)
    val r5 = spark.table("gse.db.e1").filter(col("k") === 5L)
      .select("v", "score").as[(Option[String], Long)].head()
    assert(r5 == ((None, 50L)))
  }

  test("mergeSchema on an existing sidecar-less table fails loudly, never silently drops") {
    wh
    // path-first table: committed data, no DDL sidecar to evolve
    val root = s"$wh/db/e_nosidecar"
    Seq((1L, "a")).toDF("k", "v").write.format("graft").save(root)
    val ex = intercept[IllegalStateException] {
      Seq((2L, "b", 20L)).toDF("k", "v", "score")
        .write.format("graft").option("mergeSchema", "true")
        .mode("append").save(root)
    }
    assert(ex.getMessage.contains("no DDL sidecar"), ex.getMessage)
    // a FRESH root is different: the first write defines the schema, so a
    // habitual mergeSchema option is a no-op, not an error
    val fresh = s"$wh/db/e_fresh"
    Seq((1L, 10L)).toDF("k", "score").write.format("graft")
      .option("mergeSchema", "true").save(fresh)
    assert(spark.read.format("graft").load(fresh).count() == 1)
  }

  test("without mergeSchema the drifted frame still refuses (no silent evolution)") {
    wh
    spark.sql("DROP TABLE IF EXISTS gse.db.e2")
    spark.sql("CREATE TABLE gse.db.e2 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gse.db.e2 VALUES (1, 'a')")
    intercept[Exception] {
      Seq((2L, "b", 1L)).toDF("k", "v", "extra")
        .write.format("graft").mode("append").save(rootOf("e2"))
    }
    assert(spark.table("gse.db.e2").schema.fieldNames.toSeq == Seq("k", "v"))
  }

  test("type widening in place; narrower frames upcast; incompatible refuses") {
    wh
    spark.sql("DROP TABLE IF EXISTS gse.db.e3")
    spark.sql("CREATE TABLE gse.db.e3 (k BIGINT, n INT, f FLOAT)")
    spark.sql("INSERT INTO gse.db.e3 VALUES (1, 10, CAST(1.5 AS FLOAT))")
    val root = rootOf("e3")
    // incoming LONG for INT column widens the declaration; FLOAT->DOUBLE too
    Seq((2L, 20L, 2.5d)).toDF("k", "n", "f")
      .write.format("graft").option("mergeSchema", "true")
      .mode("append").save(root)
    val sch = spark.table("gse.db.e3").schema
    assert(sch("n").dataType == LongType && sch("f").dataType == DoubleType,
      sch.simpleString)
    assert(spark.table("gse.db.e3").select(sum(col("n"))).as[Long].head() == 30L)
    // a narrower incoming frame (INT again) upcasts on write, schema stays
    Seq((3, 30)).toDF("k", "n")
      .write.format("graft").option("mergeSchema", "true")
      .mode("append").save(root)
    assert(spark.table("gse.db.e3").schema("n").dataType == LongType)
    assert(spark.table("gse.db.e3").count() == 3)
    // incompatible type refuses loudly
    val ex = intercept[Exception] {
      Seq((4L, "not-a-number")).toDF("k", "n")
        .write.format("graft").option("mergeSchema", "true")
        .mode("append").save(root)
    }
    assert(ex.getMessage.contains("incompatible"))
  }

  test("nested struct fields evolve; case-variant names refuse") {
    wh
    spark.sql("DROP TABLE IF EXISTS gse.db.e4")
    spark.sql("CREATE TABLE gse.db.e4 (k BIGINT, o STRUCT<a: BIGINT>)")
    spark.sql("INSERT INTO gse.db.e4 SELECT 1, named_struct('a', 10L)")
    val root = rootOf("e4")
    Seq((2L, (20L, "x"))).toDF("k", "o")
      .select(col("k"), col("o._1").as("a"), col("o._2").as("b"))
      .select(col("k"), struct(col("a"), col("b")).as("o"))
      .write.format("graft").option("mergeSchema", "true")
      .mode("append").save(root)
    val sch = spark.table("gse.db.e4").schema("o").dataType.asInstanceOf[StructType]
    assert(sch.fieldNames.toSeq == Seq("a", "b"), sch.simpleString)
    val got = spark.table("gse.db.e4").select(col("k"), col("o.b"))
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> None, 2L -> Some("x")))
    // case-variant of an existing column refuses rather than corrupting
    val ex = intercept[Exception] {
      SchemaEvolve.evolve(spark, root, StructType(Seq(
        StructField("K", LongType), StructField("o",
          StructType(Seq(StructField("a", LongType)))))))
    }
    assert(ex.getMessage.contains("case"))
  }

  test("field ids: fresh ids above high-water, dropped ids never resurrect") {
    wh
    spark.sql("DROP TABLE IF EXISTS gse.db.e5")
    spark.sql("CREATE TABLE gse.db.e5 (k BIGINT, secret STRING)")
    spark.sql("INSERT INTO gse.db.e5 VALUES (1, 'classified')")
    val root = rootOf("e5")
    spark.sql("ALTER TABLE gse.db.e5 DROP COLUMN secret")
    // mergeSchema re-adds the same NAME: must get a fresh id, so the old
    // file's dropped values stay dead
    Seq((2L, "fresh")).toDF("k", "secret")
      .write.format("graft").option("mergeSchema", "true")
      .mode("append").save(root)
    val got = spark.table("gse.db.e5").select("k", "secret")
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> None, 2L -> Some("fresh")),
      s"dropped column values resurrected: $got")
  }

  test("programmatic CDC shape: evolve + alignTo + mergeDv upserts with a new column") {
    wh
    spark.sql("DROP TABLE IF EXISTS gse.db.e6")
    spark.sql("CREATE TABLE gse.db.e6 (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gse.db.e6 VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    val root = rootOf("e6")
    val batch = Seq((2L, 20.0, "eu"), (4L, 40.0, "us")).toDF("k", "v", "region")
    val evolved = SchemaEvolve.evolve(spark, root, batch.schema)
    ManifestTable.mergeDv(SchemaEvolve.alignTo(batch, evolved), root, evolved,
      Seq("k"), None, Nil, Nil, None, None)
    val got = spark.table("gse.db.e6").orderBy("k")
      .as[(Long, Double, Option[String])].collect().toSeq
    assert(got == Seq((1L, 1.0, None), (2L, 20.0, Some("eu")),
      (3L, 3.0, None), (4L, 40.0, Some("us"))), got.toString)
  }
}
