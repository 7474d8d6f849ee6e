package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted percentile — the reference's
  * `approx_percentile_cont_with_weight` surface (tested in
  * query_server/sqllogicaltests/cases/function/common/approx_agg/
  * approx_percentile_cont_with_weight.slt).
  *
  * This is the EXACT formulation (per-group sort + cumulative weight
  * threshold), so it ships with a DuckDB oracle; the reference's
  * t-digest sketch is an approximation of exactly this quantity. At
  * scale the cost is one shuffle on the group key + a per-group sort —
  * the same shape as any exact percentile; callers with huge groups can
  * fall back to `percentile_approx` (unweighted) or pre-aggregate equal
  * values (weights are additive over duplicates, so a (value, Σweight)
  * rollup first makes the sorted set |distinct values| long).
  */
object Percentiles {

  /** For each group, the smallest value whose cumulative weight reaches
    * q·Σweight, for every requested (label, q). Deterministic via the
    * tiebreak column; rows with null value or weight are excluded
    * (matching SQL aggregate null-skipping).
    */
  def weightedPercentile(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                         weightCol: Column, tiebreak: Column,
                         qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0 && q <= 1 },
      s"quantiles must be in (0, 1], got ${qs.map(_._2)}")
    val g = groupCols.map(col)
    val cumW = Window.partitionBy(g: _*).orderBy(valueCol, tiebreak)
      .rowsBetween(Window.unboundedPreceding, 0)
    val totW = Window.partitionBy(g: _*)
    val cum = df
      .filter(valueCol.isNotNull && weightCol.isNotNull)
      .withColumn("__cum", sum(weightCol).over(cumW))
      .withColumn("__tot", sum(weightCol).over(totW))
    val aggs = qs.map { case (label, q) =>
      min(when(col("__cum") >= lit(q) * col("__tot"), valueCol)).as(label)
    }
    cum.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
  }
}
