package graft

import org.apache.spark.sql.functions._

/** Full tri-clause MERGE (`WHEN NOT MATCHED BY SOURCE`) through the
  * SupportsDelta row-level seam: target-only rows can be deleted or
  * updated in the SAME single commit as matched updates and source-only
  * inserts — the "sync deletions from upstream" shape (reference: the
  * Mongo→warehouse replication loop deletes rows that vanished upstream,
  * src/process_insert_update_weather_data.py). Spark's rewrite emits the
  * target-only rowIds through the same delta writer, so no extra scan or
  * second commit is needed — verified oracled in q197.
  */
class MergeBySourceSpec extends SparkSuite {
  test("MERGE WHEN NOT MATCHED BY SOURCE deletes and updates target-only rows") {
    val dir = java.nio.file.Files.createTempDirectory("nmbs-wh").toString
    spark.conf.set("spark.sql.catalog.gnm", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnm.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnm.db")
    spark.sql("CREATE TABLE gnm.db.t (k BIGINT, v STRING, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gnm.db.t VALUES (1,'a','x'), (2,'b','y'), (3,'c','x')")
    val root = s"$dir/db/t"
    val vBefore = graft.sources.ManifestTable.currentVersion(spark, root).get
    spark.createDataFrame(Seq((2L, "B", "y"), (9L, "i", "x"))).toDF("k", "v", "p")
      .createOrReplaceTempView("nmbs_src")
    spark.sql("""MERGE INTO gnm.db.t tgt USING nmbs_src src ON tgt.k = src.k
      WHEN MATCHED THEN UPDATE SET v = src.v
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND v = 'c' THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = concat(v, '!')""")
    import spark.implicits._
    val got = spark.table("gnm.db.t").select("k", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a!"), (2L, "B"), (9L, "i")))
    assert(graft.sources.ManifestTable.currentVersion(spark, root).get == vBefore + 1,
      "all four clauses must land as ONE commit")
  }
}
