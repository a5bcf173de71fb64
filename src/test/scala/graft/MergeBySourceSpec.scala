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

  test("MERGE WITH SCHEMA EVOLUTION lands a new source column (r20)") {
    val dir = java.nio.file.Files.createTempDirectory("mse-wh").toString
    spark.conf.set("spark.sql.catalog.gms", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gms.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gms.db")
    spark.sql("CREATE TABLE gms.db.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gms.db.t VALUES (1,'a'), (2,'b')")
    spark.createDataFrame(Seq((2L, "B", 20L), (9L, "i", 90L)))
      .toDF("k", "v", "score").createOrReplaceTempView("mse_src")
    // WITHOUT the keyword: star assignments resolve against the TARGET —
    // the extra source column is silently ignored, never evolved (the
    // opt-in posture; an explicit `INSERT (k, v, score)` would refuse)
    spark.sql("""MERGE INTO gms.db.t tgt USING mse_src src ON tgt.k = src.k
      WHEN MATCHED AND false THEN UPDATE SET *""")
    assert(spark.table("gms.db.t").schema.fieldNames.toSeq == Seq("k", "v"))
    intercept[Exception](spark.sql(
      """MERGE INTO gms.db.t tgt USING mse_src src ON tgt.k = src.k
         WHEN NOT MATCHED THEN INSERT (k, v, score) VALUES (src.k, src.v, src.score)"""))
    // WITH SCHEMA EVOLUTION: the analyzer diffs source vs target, applies
    // the additive delta through the catalog's ALTER seam (fresh field id,
    // sidecar write), then resolves the assignments against the evolved
    // schema — old rows read NULL for the new column
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO gms.db.t tgt
      USING mse_src src ON tgt.k = src.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    import spark.implicits._
    val got = spark.table("gms.db.t").select("k", "v", "score")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(got == Set((1L, "a", None), (2L, "B", Some(20L)), (9L, "i", Some(90L))),
      got)
    assert(spark.table("gms.db.t").schema.fieldNames.toSeq == Seq("k", "v", "score"))
  }
}
