package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key aggregation — the SURVEY §5 "salting
  * for skew" rule as code rather than advice. A groupBy on a key
  * column with a handful of huge keys (status flags, country codes,
  * null-bucketed ids) puts each hot key's entire row mass through ONE
  * reduce task; at 100 TB that task is the job. Spark's map-side
  * partial aggregation already absorbs most of this for algebraic
  * aggregates, but the final merge per key is still single-task — and
  * for high-cardinality-accumulator aggregates (collect-style,
  * distinct-ish) the partials themselves are the problem.
  *
  * `saltedStats` runs the classic two-stage fix for the algebraic
  * stats family: stage 1 aggregates on (keys, salt) — `buckets`
  * deterministic sub-groups per key, salt = xxhash64 of a row-unique
  * column so the result is reproducible run to run (a rand() salt
  * would also re-partition correctly but breaks replay) — stage 2
  * merges the per-salt partials on the key alone. count/sum/min/max
  * merge losslessly (sum over exact integer cents), so the output is
  * BIT-IDENTICAL to the direct groupBy at any bucket count: the lane
  * oracle is the plain GROUP BY. avg derives from (sum, count) at the
  * end — never averaged across partials.
  */
object Skew {

  def saltedStats(df: DataFrame, keyCols: Seq[String], rowKeyCols: Seq[String],
                  valueCol: String, buckets: Int = 32): DataFrame = {
    require(buckets >= 1, s"saltedStats: buckets must be >= 1, got $buckets")
    require(rowKeyCols.nonEmpty, "saltedStats: need at least one row-key column")
    val cents = round(col(valueCol) * 100).cast("long")
    val stage1 = df
      .withColumn("__salt", pmod(xxhash64(rowKeyCols.map(col): _*), lit(buckets)))
      .withColumn("__c", cents)
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(col("__c")).as("__s"),
        min(col("__c")).as("__mn"), max(col("__c")).as("__mx"))
    stage1.groupBy(keyCols.map(col): _*)
      .agg(sum("__n").cast("long").as("n"),
        (sum("__s") / 100.0).as("sum_value"),
        (min("__mn") / 100.0).as("min_value"),
        (max("__mx") / 100.0).as("max_value"))
      .withColumn("avg_value",
        floor(col("sum_value") / col("n") * 1000000.0) / 1000000.0)
  }
}
