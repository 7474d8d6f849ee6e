package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dml

/** DML-as-rewrite semantics (reference dml/delete.slt,
  * dml/update_field.slt, data_tests/data_ttl.slt): NULL predicates
  * neither delete nor update a row, TTL keeps the boundary row.
  */
class DmlSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def df = {
    import spark.implicits._
    Seq[(Long, String, java.lang.Double)](
      (1L, "a", 1.0), (2L, "b", null), (3L, "a", 3.0), (4L, "c", 10.0)
    ).toDF("id", "tag", "v")
  }

  test("delete drops matching rows; NULL predicate keeps the row") {
    val out = Dml.delete(df, col("v") < 5.0).select("id").as[Long](spark.implicits.newLongEncoder).collect().sorted
    assert(out.toSeq == Seq(2L, 4L)) // id=2 has NULL v → not deleted
  }

  test("update rewrites only matching rows; NULL predicate leaves value") {
    val out = Dml.update(df, col("v") >= 3.0, "tag", lit("hot"))
      .orderBy("id").select("tag").collect().map(_.getString(0)).toSeq
    assert(out == Seq("a", "b", "hot", "hot"))
  }

  test("applyTtl keeps rows at exactly now - ttl") {
    import spark.implicits._
    val ts = Seq("2024-01-01 00:00:00", "2024-01-10 00:00:00", "2024-01-20 00:00:00")
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
    val kept = Dml.applyTtl(ts, "ts", lit("2024-01-20 00:00:00").cast("timestamp"),
      expr("INTERVAL 10 DAY")).count()
    assert(kept == 2) // 01-10 is exactly the boundary → kept
  }
}
