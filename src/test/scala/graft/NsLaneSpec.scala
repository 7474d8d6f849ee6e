package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the nanosecond time lane (reference dql/time_datatype.slt — the
  * reference's native time type is TIMESTAMP(NANOSECOND); Spark's
  * TimestampType is µs). Tables.events exposes both views of the
  * physical column: `ts` (µs timestamp) and `ts_ns` (raw BIGINT nanos).
  * These tests make the `ts_ns_roundtrip` driver entry non-vacuous and
  * keep the truncation contract from drifting.
  */
class NsLaneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("real parquet nanos carry sub-µs digits — the ns lane is non-vacuous") {
    val ev = Tables.events(spark, dir)
    val subUs = ev.filter(expr("ts_ns % 1000 != 0")).count()
    assert(subUs > 0, "events.parquet has no sub-µs content; the ns lane tests nothing")
  }

  test("µs timestamp is exactly the truncation of ts_ns on every row") {
    val bad = Tables.events(spark, dir)
      .filter(expr("unix_micros(ts) != ts_ns div 1000")).count()
    assert(bad == 0, s"$bad rows where ts != truncation of ts_ns")
  }

  test("ns round-trips exactly through the (µs timestamp, sub-µs remainder) split") {
    val bad = Tables.events(spark, dir)
      .withColumn("rt",
        expr("unix_micros(timestamp_micros(ts_ns div 1000)) * 1000 + ts_ns % 1000"))
      .filter(col("rt") =!= col("ts_ns")).count()
    assert(bad == 0, s"$bad rows fail the ns round-trip")
  }
}
