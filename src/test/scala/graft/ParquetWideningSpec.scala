package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader-level contracts the `ALTER COLUMN TYPE` whitelist is built on
  * ([[graft.sources.GraftCatalog.alterTable]]): the Spark 4 vectorized
  * parquet reader PROMOTES lossless physical→requested widenings at scan
  * time (so widening is metadata-only), it also TOLERATES narrowing with
  * silent overflow (so the catalog whitelist — not the reader — is the
  * safety boundary), and promotion composes with field-id resolution
  * (so a renamed column can be widened and old generations still read).
  */
class ParquetWideningSpec extends SparkSuite {

  test("the reader promotes every whitelisted widening") {
    val dir = java.nio.file.Files.createTempDirectory("widen").toString
    spark.range(3).select(
      col("id").cast("int").as("i"),
      col("id").cast("float").as("f"),
      col("id").cast("short").as("s"),
      col("id").cast("byte").as("b"),
      col("id").cast("decimal(5,2)").as("dec"))
      .write.mode("overwrite").parquet(dir)
    def read(field: String, dt: DataType): Seq[Any] = {
      val schema = StructType(Seq(StructField(field, dt)))
      spark.read.schema(schema).parquet(dir).collect().map(_.get(0)).toSeq
    }
    assert(read("i", LongType).map(_.asInstanceOf[Long]).sorted == Seq(0L, 1L, 2L))
    assert(read("f", DoubleType).map(_.asInstanceOf[Double]).sorted == Seq(0d, 1d, 2d))
    assert(read("s", IntegerType).map(_.asInstanceOf[Int]).sorted == Seq(0, 1, 2))
    assert(read("s", LongType).map(_.asInstanceOf[Long]).sorted == Seq(0L, 1L, 2L))
    assert(read("b", ShortType).map(_.asInstanceOf[Short]).sorted == Seq(0, 1, 2).map(_.toShort))
    assert(read("dec", DecimalType(12, 2)).map(_.toString).sorted
      == Seq("0.00", "1.00", "2.00"))
    assert(read("dec", DecimalType(12, 4)).map(_.toString).sorted
      == Seq("0.0000", "1.0000", "2.0000"))
    // the HAZARD the catalog whitelist exists for: the reader also reads
    // an INT32 column at a NARROWER requested type without complaint —
    // out-of-range values would silently overflow, so narrowing must be
    // refused at the DDL layer, it will not fail at scan time
    assert(read("i", ShortType).map(_.asInstanceOf[Short]).sorted
      == Seq(0, 1, 2).map(_.toShort))
  }

  test("widening composes with field-id resolution") {
    val dir = java.nio.file.Files.createTempDirectory("widenid").toString
    val meta = new MetadataBuilder().putLong("parquet.field.id", 7L).build()
    val df = spark.range(3).select(col("id").cast("int").as("oldname"))
    df.select(col("oldname").as("oldname", meta))
      .write.mode("overwrite").parquet(dir)
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    // request a RENAMED column (resolve by id 7) at a WIDENED type
    val schema = StructType(Seq(StructField("newname", LongType, metadata = meta)))
    val got = spark.read.schema(schema).parquet(dir).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(0L, 1L, 2L))
  }
}
