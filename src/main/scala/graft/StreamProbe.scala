package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler (dev tool only, repurposed per investigation).
  *
  * r15 shape: `runMain graft.StreamProbe <lane>[,lane...]` — attaches a
  * StreamingQueryListener, runs each lane twice (warm), and dumps every
  * replay's per-trigger durationMs phases + state-operator metrics, the
  * UI-less stand-in for the Structured Streaming tab.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions",
        Sizing.shufflePartitions(sfDir, cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val progress = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          progress.add(e.progress)
        override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })

    args(0).split(',').foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        progress.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name run$i: $wall%.2f s")
        if (i == 2) {
          import scala.jdk.CollectionConverters._
          progress.asScala.toSeq.sortBy(_.batchId).foreach { p =>
            println(s"[probe]   batch ${p.batchId} rows=${p.numInputRows} " +
              s"durations=${p.durationMs}")
            p.stateOperators.foreach { so =>
              println(s"[probe]     state op=${so.operatorName} " +
                s"rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
                s"commitMs=${so.commitTimeMs} mem=${so.memoryUsedBytes}")
            }
          }
        }
      }
    }
    spark.stop()
  }
}
