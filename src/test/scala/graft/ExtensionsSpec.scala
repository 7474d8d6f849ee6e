package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions wires vec_dot/num_gcd/num_lcm into a session via
  * spark.sql.extensions — the cluster-deployment registration path.
  */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("extension-registered functions resolve in plain SQL") {
    val row = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  num_gcd(12L, 18L) AS g, num_lcm(4L, 6L) AS l""".stripMargin).head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getLong(1) == 6L)
    assert(row.getLong(2) == 12L)
  }

  test("gcd/lcm edge semantics match the reference slt cases") {
    val row = spark.sql(
      """SELECT num_gcd(0L, 0L), num_gcd(-12L, 18L), num_lcm(0L, 5L),
        |  num_lcm(-4L, 6L)""".stripMargin).head()
    assert(row.getLong(0) == 0L)
    assert(row.getLong(1) == 6L)
    assert(row.getLong(2) == 0L)
    assert(row.getLong(3) == 12L)
  }
}
