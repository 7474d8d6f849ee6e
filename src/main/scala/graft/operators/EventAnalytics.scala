package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product/event-analytics rollups over the time-series event stream —
  * the ClickHouse `retention`/`windowFunnel` class of operators a
  * metrics engine grows once events carry user ids (the reference's
  * events schema: cf. tskv tag columns). All counts are exact integers;
  * no floats anywhere, so lanes hash-check with no quantization.
  */
object EventAnalytics {

  /** Cohort retention: users grouped by their FIRST-seen day; for each
    * cohort, how many came back exactly `offsets` days later. Output:
    * one row per cohort day with n_users + one count per offset.
    *
    * 100 TB shape: the (user, day) activity set is ONE distinct
    * aggregate (shuffle keyed on user+day, partial-aggregable); first-
    * seen is a min over it keyed on user; the offset matrix is a single
    * conditional-count aggregate over the joined activity — user-keyed
    * equijoin, no window, no cross product. Cohort cardinality = days,
    * so the result is tiny however large the corpus.
    */
  def retention(df: DataFrame, userCol: String, tsCol: String,
                offsets: Seq[Int]): DataFrame = {
    val days = df.select(col(userCol), to_date(col(tsCol)).as("__day")).distinct()
    val first = days.groupBy(col(userCol)).agg(min(col("__day")).as("cohort_day"))
    val offs = days.join(first, userCol)
      .withColumn("__off", datediff(col("__day"), col("cohort_day")))
    val offCounts = offsets.map(o =>
      count_distinct(when(col("__off") === o, col(userCol))).as(s"d$o"))
    offs.groupBy(col("cohort_day"))
      .agg(count_distinct(col(userCol)).as("n_users"), offCounts: _*)
  }

  /** Ordered funnel: how many users performed `steps` in strict
    * timestamp order (each step strictly after the previous one's
    * EARLIEST qualifying time — the standard windowFunnel greedy rule,
    * unbounded window). Output: one row per step with the user count
    * reaching it (monotone non-increasing).
    *
    * 100 TB shape: one min-aggregate + one user-keyed equijoin per
    * step — each a partial-aggregable rollup over only that step's
    * events (filter pushed to the scan), state one row per user. No
    * window sort, no per-user event lists.
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    // reached(i) = users whose earliest chain through steps 0..i exists
    val reached = steps.tail.scanLeft(
      df.filter(col(typeCol) === steps.head)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))) { (prev, step) =>
      df.filter(col(typeCol) === step)
        .join(prev.select(col(userCol), col("__t").as("__prev")), userCol)
        .filter(col(tsCol) > col("__prev"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    }
    // one lazy plan: a counts branch per step, unioned — no driver-side
    // actions; each branch is a 1-row aggregate
    reached.zipWithIndex.map { case (r, i) =>
      r.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("long").as("step"),
          lit(steps(i)).as("event_type"), col("n_users"))
    }.reduce(_ unionByName _)
  }
}
