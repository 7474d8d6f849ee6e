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

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    // events.ts is TIMESTAMP(NANOS); Spark's TimestampType is micros.
    // Sessions must be built with spark.sql.legacy.parquet.nanosAsLong=true
    // (all graft mains and specs do) so the nanos arrive as a raw Long
    // that events() converts explicitly — a library must not mutate its
    // caller's session conf on a table load.
    spark.read.parquet(s"$dir/$name.parquet")

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
