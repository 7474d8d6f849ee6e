package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loader for the driver-generated parquet lake (TESTDATA.md).
  *
  * At 100 TB these reads become partitioned-directory scans; everything
  * downstream only depends on the DataFrame, so swapping a path for a
  * date-partitioned table root changes nothing else.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") events(spark, dir) else read(spark, dir, name)
  }

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS); Spark's TimestampType is micros, so
    // read nanos as raw Long and convert explicitly (see events()).
    // Set-once: a library shouldn't rewrite session conf on every table
    // load (the value never changes; repeated sets are just surprising
    // to callers diffing their session state).
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    if (spark.conf.getOption(k).forall(_ != "true")) spark.conf.set(k, "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with `ts` as a proper (micro-precision) timestamp and the
    * original nanosecond count kept as `ts_ns` for precision-sensitive
    * operators. DuckDB oracles use cast(ts AS TIMESTAMP) / epoch_ns(ts)
    * for the same two views of the column.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    read(spark, dir, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
