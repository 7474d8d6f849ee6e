package graft

import org.apache.spark.sql.SparkSession

/** Single-query bench/explain harness for iterating:
  * `runMain graft.QBench <queryName>[,name2,...] [explain] [jobs] [runs=N]`
  * over SPARK_GRAFT_SF_DIR (default sf0.1). Times N runs (default 2,
  * warm JVM). `jobs` prints a per-Spark-job time breakdown of the LAST
  * run (job description → wall seconds), the local stand-in for the
  * Spark UI's Jobs page (guide §1.1/§1.5) on a UI-less box.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // same input-derived shuffle width as Bench (SURVEY §5 rule)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      Sizing.shufflePartitions(sfDir, cpus.toInt).toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B hook for config probes (guide §1): "k=v;k=v" extra confs.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wantJobs = args.contains("jobs")
    val runs = args.collectFirst { case a if a.startsWith("runs=") => a.drop(5).toInt }
      .getOrElse(2)
    // (jobId, description|callsite, wall ms, tasks, task cpu-ms sum)
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          jobLog.add((je.jobId, desc, je.time - t0))
        }
      }
    })
    args(0).split(',').foreach { name =>
      val fn = SparkEntry.queries(name)
      if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
      (1 to runs).foreach { i =>
        jobLog.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[qbench] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      if (wantJobs) {
        import scala.jdk.CollectionConverters._
        val js = jobLog.asScala.toSeq.sortBy(_._1)
        println(s"[qbench] $name last-run jobs: ${js.size}, " +
          f"sum ${js.map(_._3).sum / 1e3}%.2f s")
        js.foreach { case (id, desc, ms) =>
          println(f"[qbench]   job $id%4d ${ms / 1e3}%7.3f s  ${desc.take(110)}")
        }
      }
    }
    spark.stop()
  }
}
