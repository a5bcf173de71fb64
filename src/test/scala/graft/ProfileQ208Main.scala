package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q208's step costs at a given SF (not a test). */
object ProfileQ208Main {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftFunctions.installOptimizations(spark)
    val s = spark
    def step[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.sources.GraftCatalog
    val ev = Tables(s, sfDir, "events").select(col("event_id"), col("ts"),
      col("user_id"), col("event_type"), col("value"))
    val wh = java.nio.file.Files.createTempDirectory("q208prof").toString
    s.conf.set("spark.sql.catalog.gp208", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gp208.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gp208.db")
    ev.createOrReplaceTempView("q208_src")
    step("cev create")(s.sql("""CREATE TABLE gp208.db.cev (
      event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
      event_type STRING, value DOUBLE)
      PARTITIONED BY (days(ts), bucket(4, user_id))"""))
    step("cev insert1")(s.sql(
      "INSERT INTO gp208.db.cev SELECT * FROM q208_src WHERE event_id % 2 = 1"))
    step("cev insert2")(s.sql(
      "INSERT INTO gp208.db.cev SELECT * FROM q208_src WHERE event_id % 2 = 0"))
    step("mev create")(s.sql("""CREATE TABLE gp208.db.mev (
      event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
      event_type STRING, value DOUBLE) PARTITIONED BY (days(ts))"""))
    step("mev insert1")(s.sql(
      "INSERT INTO gp208.db.mev SELECT * FROM q208_src WHERE event_id % 2 = 1"))
    step("evolve")(s.sql(
      "CALL gp208.system.set_partitioning('db.mev', 'days(ts),bucket(4,user_id)')"))
    step("mev insert2")(s.sql(
      "INSERT INTO gp208.db.mev SELECT * FROM q208_src WHERE event_id % 2 = 0"))
    step("update")(s.sql(
      "UPDATE gp208.db.mev SET value = -2.0 WHERE user_id % 29 = 5"))
    step("delete")(s.sql(
      "DELETE FROM gp208.db.mev WHERE event_type = 'view' AND user_id % 13 = 2"))
    val mixed = step("mixed agg")(s.sql(
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_mix,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS DOUBLE) AS v_mix
      FROM gp208.db.mev GROUP BY event_type""").localCheckpoint())
    mixed.createOrReplaceTempView("q208_mixed")
    step("compact")(s.sql("CALL gp208.system.compact('db.mev')"))
    step("final query")(s.sql(
      """SELECT a.event_type, a.n, m.n_mix, c.n_c
      FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM gp208.db.cev
            WHERE ts >= timestamp_micros(1704844800000000)
              AND ts < timestamp_micros(1705708800000000)
            GROUP BY event_type) a
      JOIN q208_mixed m ON a.event_type = m.event_type
      JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS n_c
            FROM gp208.db.mev GROUP BY event_type) c
        ON a.event_type = c.event_type""").collect().length)
    // file counts per table
    def countFiles(t: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(s"$wh/db/$t"))
    }
    println(s"[prof] files cev=${countFiles("cev")} mev=${countFiles("mev")}")
    spark.stop()
  }
}
