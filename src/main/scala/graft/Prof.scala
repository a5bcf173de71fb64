package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time single queries (steady-state, noop sink — the Bench
  * protocol) without paying for the whole suite. Usage:
  *   sbt "runMain graft.Prof /root/testdata/sf0.1 q100 q104 q103"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val prefixes = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftFunctions.installOptimizations(spark)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
        spark.catalog.clearCache()
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val d = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          d
        }
        println(f"PROF $name%-28s min=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
      }
    spark.stop()
  }
}
