package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler (dev tool only, repurposed per investigation). */
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
    import org.apache.spark.sql.streaming.Trigger

    // where does a stream replay's wall time go? run the candlestick
    // lane's stream by hand and dump per-batch durationMs phases
    val fn = SparkEntry.queries("stream_candlestick")
    // warm up
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // manual replay of the same shape with progress dump
    // reuse the staged dir the warm-up call above already created
    // (same key + fingerprint => cached, the write thunk never runs)
    val srcs = Seq(s"$sfDir/events.parquet", s"$sfDir/documents.parquet")
      .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
    val stagedDir = graft.Lake.staged(s"stream|$sfDir/events_by_ts_ns|4", srcs)(
      _ => sys.error("expected the staged dir to exist already"))
    println(s"[probe] staged dir: $stagedDir")
    val src = spark.readStream
      .schema(spark.read.parquet(stagedDir).schema)
      .option("pathGlobFilter", "part-*")
      .option("maxFilesPerTrigger", "1")
      .parquet(stagedDir)
    val wm = src.withColumn("tstamp", timestamp_micros(expr("ts div 1000")))
    val agg = graft.streaming.StreamIngest.candlestickStats(
      wm, "tstamp", "event_type", "event_id", "value", "1 hour", "0 seconds")
    val roots = Seq("/tmp", "/dev/shm", "/tmp", "/dev/shm", "/tmp", "/dev/shm")
    roots.zipWithIndex.foreach { case (base, round) =>
      val parts = 1
      val root = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(base), "probe_replay").toString
      val t0 = System.nanoTime()
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      println(s"[probe] === parts=$parts root=$base")
      val frame = agg
      val q = frame.writeStream.format("parquet")
        .option("path", s"$root/data")
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[probe] round $round replay wall: $wall%.2f s, batches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        println(s"[probe]   batch ${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
    }
    spark.stop()
  }
}
