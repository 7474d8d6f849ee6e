package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for streaming per-batch overhead: runs either the
  * stream_windowed replay shape (`file`) or the admin engine's stream
  * table (`engine`) and prints Spark's own per-batch durationMs
  * breakdown — the UI's streaming tab on a UI-less box. Dev tool only.
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
    import org.apache.spark.sql.functions._

    (1 to 2).foreach { round =>
      val t0 = System.nanoTime()
      val root = java.nio.file.Files.createTempDirectory("graft_probe_eng")
      val e = new graft.admin.AdminEngine(spark, new graft.admin.MetaCatalog,
        root.toString, () => 1700000000000000000L)
      Seq(
        "CREATE DATABASE sdb",
        "--#DATABASE=sdb",
        "CREATE TABLE evts(value DOUBLE, TAGS(event_type))",
        "CREATE TABLE winagg(n BIGINT, sum_value DOUBLE, TAGS(event_type))"
      ).foreach(e.execute)
      val srcPath = root.resolve("cnosdb").resolve("sdb").resolve("evts")
      val staged = graft.Lake.staged(
        s"admin_evts|$sfDir|4", Seq(s"$sfDir/events.parquet")) { d =>
        Tables.eventsNanos(spark, sfDir)
          .select(col("ts").as("time_ns"), col("event_type"),
            col("value").cast("double").as("value"))
          .repartitionByRange(4, col("time_ns"))
          .write.mode("overwrite").parquet(d.toString)
      }
      java.nio.file.Files.createDirectories(srcPath)
      val ls = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
      try {
        val it = ls.iterator()
        while (it.hasNext) {
          val p = it.next(); val n = p.getFileName.toString
          if (n.startsWith("part-") || n == "_SUCCESS")
            java.nio.file.Files.copy(p, srcPath.resolve(n))
        }
      } finally ls.close()
      graft.queries.StreamQueries.pinMtimes(srcPath)
      val t1 = System.nanoTime()
      e.execute("CREATE STREAM TABLE evstream (time TIMESTAMP, event_type STRING, value DOUBLE)" +
        " WITH (db='sdb', table='evts', event_time_column='time') engine = tskv")
      e.execute("INSERT INTO winagg SELECT time.start, event_type, n, sum_value FROM (" +
        "SELECT time_window(time, interval '1 hour') AS time, event_type, count(*) AS n," +
        " round(sum(value), 4) AS sum_value" +
        " FROM evstream GROUP BY event_type, time_window(time, interval '1 hour'))")
      e.awaitStreams()
      val t2 = System.nanoTime()
      e.streamJobs.foreach { q =>
        q.recentProgress.foreach { p =>
          println(s"[probe]   batch ${p.batchId} rows=${p.numInputRows} " +
            s"durations=${p.durationMs}")
        }
      }
      e.stopStreams()
      val t3 = System.nanoTime()
      def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.2f"
      println(s"[probe] round $round: setup=${s(t0, t1)} stream=${s(t1, t2)} " +
        s"stop=${s(t2, t3)}")
    }
    spark.stop()
  }
}
