package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.GraftCatalog

/** CHECK constraints (`graft.check.<name>` table properties): ADD-time
  * validation (resolution + existing-row compliance), fused write-time
  * enforcement across INSERT / DML / the V1 path, SQL NULL-passes
  * semantics, and UNSET releasing the guard.
  */
class ChecksSpec extends SparkSuite {

  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-chk-wh").toString
    spark.conf.set("spark.sql.catalog.gchk", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gchk.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gchk.db")
    dir
  }

  test("constraint declared at CREATE: valid rows land, violations fail loudly and atomically") {
    wh
    spark.sql("DROP TABLE IF EXISTS gchk.db.c1")
    spark.sql("""CREATE TABLE gchk.db.c1 (k BIGINT, price DOUBLE)
      TBLPROPERTIES ('graft.check.positive_price' = 'price > 0')""")
    spark.sql("INSERT INTO gchk.db.c1 VALUES (1, 10.0), (2, 0.5)")
    assert(spark.table("gchk.db.c1").count() == 2)
    val ex = intercept[Exception](
      spark.sql("INSERT INTO gchk.db.c1 VALUES (3, 1.0), (4, -2.0)"))
    assert(exChain(ex).exists(_.contains("positive_price")), exChain(ex).mkString("|"))
    // the FAILED insert left nothing behind (staged write, never published)
    assert(spark.table("gchk.db.c1").count() == 2)
    // SQL semantics: NULL predicate passes
    spark.sql("INSERT INTO gchk.db.c1 VALUES (5, NULL)")
    assert(spark.table("gchk.db.c1").count() == 3)
  }

  test("ADD CONSTRAINT validates existing rows; DML honors it; UNSET releases it") {
    wh
    spark.sql("DROP TABLE IF EXISTS gchk.db.c2")
    spark.sql("CREATE TABLE gchk.db.c2 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gchk.db.c2 VALUES (1, 'ok'), (2, 'bad')")
    // refused: a live row violates
    val ex = intercept[Exception](spark.sql(
      "ALTER TABLE gchk.db.c2 SET TBLPROPERTIES ('graft.check.no_bad' = \"v <> 'bad'\")"))
    assert(exChain(ex).exists(_.contains("existing rows violate")))
    spark.sql("UPDATE gchk.db.c2 SET v = 'fixed' WHERE v = 'bad'")
    spark.sql(
      "ALTER TABLE gchk.db.c2 SET TBLPROPERTIES ('graft.check.no_bad' = \"v <> 'bad'\")")
    // an UPDATE whose postimage violates is refused
    val ex2 = intercept[Exception](
      spark.sql("UPDATE gchk.db.c2 SET v = 'bad' WHERE k = 1"))
    assert(exChain(ex2).exists(_.contains("no_bad")))
    assert(spark.table("gchk.db.c2").filter(col("v") === "bad").count() == 0)
    // MERGE's insert leg is enforced too
    val ex3 = intercept[Exception](spark.sql(
      """MERGE INTO gchk.db.c2 t USING (SELECT 9L AS k, 'bad' AS v) s
        |ON t.k = s.k WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(exChain(ex3).exists(_.contains("no_bad")))
    // UNSET drops the guard
    spark.sql("ALTER TABLE gchk.db.c2 UNSET TBLPROPERTIES ('graft.check.no_bad')")
    spark.sql("INSERT INTO gchk.db.c2 VALUES (9, 'bad')")
    assert(spark.table("gchk.db.c2").count() == 3)
  }

  test("unresolvable or nondeterministic predicates are refused at declaration") {
    wh
    spark.sql("DROP TABLE IF EXISTS gchk.db.c3")
    intercept[Exception](spark.sql(
      """CREATE TABLE gchk.db.c3 (k BIGINT)
        |TBLPROPERTIES ('graft.check.ghost' = 'nope > 0')""".stripMargin))
    spark.sql("CREATE TABLE gchk.db.c3 (k BIGINT)")
    intercept[Exception](spark.sql(
      "ALTER TABLE gchk.db.c3 SET TBLPROPERTIES ('graft.check.rng' = 'rand() > 0.5')"))
    intercept[Exception](spark.sql(
      "ALTER TABLE gchk.db.c3 SET TBLPROPERTIES ('graft.check.' = 'k > 0')"))
  }

  test("the V1 path-addressed save enforces the sidecar's constraints") {
    wh
    spark.sql("DROP TABLE IF EXISTS gchk.db.c4")
    spark.sql("""CREATE TABLE gchk.db.c4 (k BIGINT, price DOUBLE)
      TBLPROPERTIES ('graft.check.positive_price' = 'price > 0')""")
    spark.sql("INSERT INTO gchk.db.c4 VALUES (1, 1.0)")
    val root = s"$wh/db/c4"
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    val bad = Seq((2L, -5.0)).toDF("k", "price")
    val ex = intercept[Exception](
      bad.write.format("graft").mode("append").save(root))
    assert(exChain(ex).exists(_.contains("positive_price")))
    Seq((2L, 5.0)).toDF("k", "price").write.format("graft").mode("append").save(root)
    assert(spark.table("gchk.db.c4").count() == 2)
  }

  /** All messages down the cause chain (Spark wraps task failures). */
  private def exChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq
}
