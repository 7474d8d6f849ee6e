package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DML semantics over an immutable lake (reference: dml/delete.slt,
  * dml/update_field.slt, dml/update_tag.slt, data_tests/data_ttl.slt).
  *
  * CnosDB mutates TSM files in place; a Spark lake rewrites instead —
  * each op is a pure DataFrame transform whose output REPLACES the
  * table's partitions. All three are narrow (no shuffle): at 100 TB a
  * delete/update with a time or tag predicate rewrites only the
  * partitions the predicate touches (partition pruning on write), never
  * the whole table.
  */
object Dml {

  /** DELETE FROM t WHERE cond → keep the complement. */
  def delete(df: DataFrame, cond: Column): DataFrame =
    df.filter(!coalesce(cond, lit(false)))

  /** UPDATE t SET col = value WHERE cond. Also covers update_tag:
    * tags are plain columns here, so field and tag updates are the
    * same rewrite (the reference splits them only because tags live in
    * its series index).
    */
  def update(df: DataFrame, cond: Column, colName: String, value: Column): DataFrame =
    df.withColumn(colName, when(coalesce(cond, lit(false)), value).otherwise(col(colName)))

  /** TTL retention (data_ttl.slt): drop rows older than `now - ttl`.
    * Time-partitioned layouts turn this into dropping whole partition
    * directories — the filter prunes, it does not scan.
    */
  def applyTtl(df: DataFrame, tsCol: String, now: Column, ttl: Column): DataFrame =
    df.filter(col(tsCol) >= now - ttl)
}
