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

    // how many rounds does the star CC take on the doc corpus pairs?
    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val corpus = d.unionByName(d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000))
      .unionByName(d.filter(col("doc_id") % 17 === 0)
        .withColumn("doc_id", col("doc_id") + 2000000)
        .withColumn("text", concat(col("text"), lit(" extra trailing words appended"))))
    graft.functions.TextExpressions.register(spark)
    val withH = corpus.withColumn("__h", md5(col("text")))
    val repTbl = withH.select(col("__h"), col("doc_id"))
      .groupBy("__h").agg(min(col("doc_id")).as("__rep"))
    val reps = withH.join(repTbl, "__h")
      .filter(col("doc_id") === col("__rep"))
      .select(col("doc_id"), col("text")).localCheckpoint(false)
    val pairs = graft.operators.Dedup.minHashNearDups(reps, "doc_id", "text")
      .localCheckpoint(false)
    println(s"[probe] pair count: ${pairs.count()}")
    val t0 = System.nanoTime()
    val (lbl, rounds) = graft.operators.Dedup.dupGroupsStarWithRounds(
      pairs, "id_a", "id_b")
    lbl.write.format("noop").mode("overwrite").save()
    println(f"[probe] star rounds=$rounds in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    graft.operators.Dedup.dupGroups(pairs, "id_a", "id_b")
      .write.format("noop").mode("overwrite").save()
    println(f"[probe] min-label in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
