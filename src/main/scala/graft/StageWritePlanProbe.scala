package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: dump the physical plan of the optimizeWrite clustering both
  * ways — `repartition(partCols)` (r21: AQE may coalesce the post-shuffle
  * write stage to one task) vs `repartition(n, partCols)` (r22: count
  * pinned, REPARTITION_BY_NUM) — the committed evidence for the staged-
  * write change, which lives inside eagerly-executed commands and never
  * appears in a query's final-frame plan.
  * Usage: runMain graft.StageWritePlanProbe <outDir>
  */
object StageWritePlanProbe {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(100000).select(
      (col("id") % 30).as("ts_day"), (col("id") % 2).as("bucket"),
      col("id").as("v"))
    def dump(name: String, d: org.apache.spark.sql.DataFrame): Unit = {
      // run through the noop sink so AQE's FINAL plan (post-coalesce) is
      // what gets captured — the initial plan hides the 1-task collapse
      d.write.format("noop").mode("overwrite").save()
      val plan = d.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), plan)
      println(s"[probe] wrote $name")
    }
    dump("stage_write_probe_before", df.repartition(col("ts_day"), col("bucket")))
    dump("stage_write_probe_after", df.repartition(
      math.max(1, spark.sparkContext.defaultParallelism),
      col("ts_day"), col("bucket")))
    spark.stop()
  }
}
