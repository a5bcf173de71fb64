package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Dev utility: run one registered query (steady-state, noop sink) with a
  * SparkListener that records every job's wall time, stage count, task
  * count and callsite, printed slowest-first — shows WHERE a multi-action
  * query (DDL lifecycle, streaming, iterative training) spends its time.
  * Usage: runMain graft.ProfJobs <queryName> [sfDir]
  */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.ui.enabled", "false")
    // extra A/B confs: SPARK_GRAFT_PROF_CONF="k=v;k=v" (dev-only knob)
    sys.env.get("SPARK_GRAFT_PROF_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    if (sys.env.contains("SPARK_GRAFT_PROF_NOCRC")) {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
      fs.setWriteChecksum(false)
      fs.setVerifyChecksum(false)
    }
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.spark.sql.graft.GraftFunctions.installOptimizations(spark)
    val fn = SparkEntry.queries(name)
    // warm-up (codegen/JIT), same protocol as Bench
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    org.apache.spark.sql.graft.Checkpoints.sweep(spark)

    case class J(id: Int, var start: Long = 0L, var end: Long = 0L,
                 var stages: Int = 0, var tasks: Int = 0, var site: String = "")
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = J(e.jobId, e.time)
        j.stages = e.stageInfos.size
        j.tasks = e.stageInfos.map(_.numTasks).sum
        j.site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobs.synchronized { jobs(e.jobId) = j }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    // let the listener bus drain
    Thread.sleep(500)
    val done = jobs.synchronized { jobs.values.toSeq }
    println(f"PROFJOBS $name total=$total%.2f s, ${done.size} jobs, " +
      f"sum=${done.map(j => (j.end - j.start) / 1e3).sum}%.2f s")
    done.sortBy(j => -(j.end - j.start)).take(40).foreach { j =>
      println(f"  job ${j.id}%4d ${(j.end - j.start) / 1e3}%7.3f s  " +
        f"stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.site}")
    }
    spark.stop()
  }
}
