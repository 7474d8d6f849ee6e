package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with BOTH time views every downstream operator keys on:
    * `ts` as a proper (micro-precision) timestamp and `ts_ns` as BIGINT
    * nanoseconds — regardless of how the lake physically encodes time.
    *
    * The reference's native time type is TIMESTAMP(NANOSECOND)
    * (query_server/sqllogicaltests/cases/dql/time_datatype.slt), and the
    * lake has shipped it two ways across rounds: parquet INT64 nanos
    * (read as LongType under spark.sql.legacy.parquet.nanosAsLong=true)
    * and plain `timestamp[us]` (read as TimestampType/NTZ). Dispatching
    * on the SCANNED dtype keeps both lakes working — a re-provisioned
    * lake must degrade to a clear error, never an analysis crash 60
    * queries downstream (round-6 lesson). DuckDB oracles use
    * `cast(ts AS TIMESTAMP)` / `epoch_us(...)`, which resolve
    * identically on both physical types.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // INT64 nanos lane (nanosAsLong view)
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType | TimestampNTZType => // µs lane: sub-µs digits are 0
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts at $dir has unsupported type $other — expected INT64 " +
            "nanos (nanosAsLong) or a parquet timestamp")
    }
  }

  /** events with `ts` normalized to raw BIGINT nanoseconds — the staging
    * view the streaming lanes persist and replay (their state operators
    * and oracles all derive µs as `ts div 1000` from this column).
    */
  def eventsNanos(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case TimestampType | TimestampNTZType =>
        raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts at $dir has unsupported type $other — expected INT64 " +
            "nanos (nanosAsLong) or a parquet timestamp")
    }
  }
}
