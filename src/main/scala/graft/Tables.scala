package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loader for the driver-generated parquet lake (TESTDATA.md).
  *
  * At 100 TB these reads become partitioned-directory scans; everything
  * downstream only depends on the DataFrame, so swapping a path for a
  * date-partitioned table root changes nothing else.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
