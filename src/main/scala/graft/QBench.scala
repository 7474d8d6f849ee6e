package graft

import org.apache.spark.sql.SparkSession

/** Single-query bench/explain harness for iterating:
  * `runMain graft.QBench <queryName> [explain]` over
  * SPARK_GRAFT_SF_DIR (default sf0.1). Times two runs (warm JVM).
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // same input-derived shuffle width as Bench (SURVEY §5 rule)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      Sizing.shufflePartitions(sfDir, cpus.toInt).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args(0).split(',').foreach { name =>
      val fn = SparkEntry.queries(name)
      if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[qbench] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
