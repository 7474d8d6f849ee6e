package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{DataQuality, Gis, Repair}

/** Driver entries for data-quality, repair and GIS operators
  * (SURVEY.md §2.2). Data-quality/SCREEN/timestamp-repair are iterative
  * whole-series algorithms with no SQL equivalent → rows-only driver
  * checks; their semantics are pinned by ScalaTest fixtures from the
  * reference's own slt cases. value_fill(linear) and all GIS measures
  * ARE oracle-expressible and get full DuckDB checks.
  */
object QualityGisQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_data_quality" -> ((s, dir) =>
      DataQuality.dataQuality(
        Tables.events(s, dir).filter(col("user_id") < 30),
        col("ts"), col("value"), Seq("user_id"))
        .orderBy("user_id")),

    // Median/MAD outlier detection per series (the data-quality validity
    // kernel as a standalone distributed operator): exact-cents medians
    // keep every interpolated value a dyadic rational, so the DuckDB
    // median() recomputation is bit-identical.
    "ts_outlier_mad" -> ((s, dir) =>
      graft.functions.DataQuality.madOutliersCompact(
        Tables.events(s, dir), Seq("event_type", "user_id"), "value")
        .orderBy("event_type", "user_id")),

    "ts_value_fill" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id") < 30)
        .withColumn("v", when(col("event_id") % 17 === 0, lit(Double.NaN))
          .otherwise(col("value")))
      Repair.valueFill(ev, expr("ts_ns div 1000"), col("v"), Seq("user_id"), "linear")
        .select(col("user_id"), col("t"), col("original"),
          round(col("filled"), 6).as("filled"))
        .orderBy("user_id", "t")
    }),

    "ts_value_fill_mean" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id") < 30)
        .withColumn("v", when(col("event_id") % 17 === 0, lit(Double.NaN))
          .otherwise(col("value")))
      Repair.valueFill(ev, expr("ts_ns div 1000"), col("v"), Seq("user_id"), "mean")
        .select(col("user_id"), col("t"), round(col("filled"), 6).as("filled"))
        .orderBy("user_id", "t")
    }),

    "ts_value_fill_previous" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id") < 30)
        .withColumn("v", when(col("event_id") % 17 === 0, lit(Double.NaN))
          .otherwise(col("value")))
      Repair.valueFill(ev, expr("ts_ns div 1000"), col("v"), Seq("user_id"), "previous")
        .select(col("user_id"), col("t"), round(col("filled"), 6).as("filled"))
        .orderBy("user_id", "t")
    }),

    // AR(1)/MA fills are recursive / accumulator-defined → rows-only
    // (semantics pinned by RepairSpec fixtures from the reference code)
    "ts_value_fill_ar" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id") < 30)
        .withColumn("v", when(col("event_id") % 17 === 0, lit(Double.NaN))
          .otherwise(col("value")))
      Repair.valueFill(ev, expr("ts_ns div 1000"), col("v"), Seq("user_id"), "ar")
        .select(col("user_id"), col("t"), round(col("filled"), 6).as("filled"))
        .orderBy("user_id", "t")
    }),

    "ts_value_repair" -> ((s, dir) =>
      Repair.valueRepair(
        Tables.events(s, dir).filter(col("user_id") < 10),
        expr("ts_ns div 1000"), col("value"), Seq("user_id"))
        .select(col("user_id"), col("t"), col("original"),
          round(col("repaired"), 6).as("repaired"))
        .orderBy("user_id", "t")),

    "ts_timestamp_repair" -> ((s, dir) =>
      Repair.timestampRepairDf(
        Tables.events(s, dir).filter(col("user_id") < 5),
        expr("ts_ns div 1000"), col("value"), Seq("user_id"))
        .orderBy("user_id", "t")),

    "gis_distance" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id") < 50)
      // WKB round-trip exercises st_asbinary/st_geomfromwkb; the numeric
      // output is what the oracle checks.
      val wktA = format_string("POINT(%s %s)", col("value"),
        (pmod(col("user_id"), lit(10)) + lit(0.5)))
      val wktB = format_string("POINT(%s %s)", col("value") / 2, lit(3.3))
      ev.select(col("event_id"),
        round(Gis.stDistance(Gis.stGeomFromWkb(Gis.stAsBinary(wktA)), wktB), 6)
          .as("dist"))
        .orderBy("event_id")
    }),

    "gis_area" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id") < 50)
      val tri = format_string("POLYGON((0 0, %s 0, 0 %s, 0 0))",
        abs(col("value")), col("user_id") + 1)
      ev.select(col("event_id"), round(Gis.stArea(tri), 6).as("area"))
        .orderBy("event_id")
    }),

    "gis_predicates" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id") < 50)
      val pt = format_string("POINT(%s %s)", pmod(col("value"), lit(10.0)),
        pmod(col("user_id"), lit(10)) + lit(0.5))
      val box = lit("POLYGON((0 0, 5 0, 5 5, 0 5, 0 0))")
      val boxB = format_string("POLYGON((%s %s, %s %s, %s %s, %s %s, %s %s))",
        pmod(col("user_id"), lit(8)) + lit(0.5), pmod(col("user_id"), lit(8)) + lit(0.5),
        pmod(col("user_id"), lit(8)) + lit(5.5), pmod(col("user_id"), lit(8)) + lit(0.5),
        pmod(col("user_id"), lit(8)) + lit(5.5), pmod(col("user_id"), lit(8)) + lit(5.5),
        pmod(col("user_id"), lit(8)) + lit(0.5), pmod(col("user_id"), lit(8)) + lit(5.5),
        pmod(col("user_id"), lit(8)) + lit(0.5), pmod(col("user_id"), lit(8)) + lit(0.5))
      ev.select(col("event_id"),
        Gis.stWithin(pt, box).as("within_box"),
        Gis.stContains(box, pt).as("box_contains"),
        Gis.stIntersects(box, boxB).as("boxes_intersect"),
        Gis.stDisjoint(box, boxB).as("boxes_disjoint"),
        Gis.stEquals(pt, pt).as("eq_self"))
        .orderBy("event_id")
    })
  )

  // epoch_ns must read the raw nanosecond column, not the µs-truncated
  // alias (DuckDB lateral alias resolution would otherwise shadow it).
  private val E = "(SELECT event_id, user_id, event_type, value, cast(events.ts AS TIMESTAMP) AS ts, epoch_us(cast(events.ts AS TIMESTAMP)) AS ts_ns FROM events)"

  def oracleSql: Map[String, String] = Map(
    "ts_outlier_mad" ->
      """WITH e AS (
        |  SELECT event_type, user_id,
        |    CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events),
        |m AS (
        |  SELECT event_type, user_id, median(vc) AS mc
        |  FROM e GROUP BY event_type, user_id),
        |d AS (
        |  SELECT e.event_type, e.user_id, vc, abs(vc - mc) AS dev, mc
        |  FROM e JOIN m USING (event_type, user_id)),
        |md AS (
        |  SELECT event_type, user_id, median(dev) AS madc
        |  FROM d GROUP BY event_type, user_id)
        |SELECT d.event_type, d.user_id, count(*) AS n,
        |  count(CASE WHEN dev > 3.0 * 1.4826 * madc THEN 1 END) AS n_outliers,
        |  any_value(mc) / 100.0 AS median_v,
        |  any_value(madc) / 100.0 AS mad_v
        |FROM d JOIN md USING (event_type, user_id)
        |GROUP BY d.event_type, d.user_id
        |ORDER BY event_type, user_id""".stripMargin,
    "ts_value_fill" ->
      s"""WITH e AS (
         |  SELECT user_id, ts_ns AS t, event_id,
         |    CASE WHEN event_id % 17 = 0 THEN 'NaN'::DOUBLE ELSE value END AS v
         |  FROM $E WHERE user_id < 30),
         |r AS (
         |  SELECT user_id, t, v,
         |    cast(row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) AS DOUBLE) AS i
         |  FROM e),
         |f AS (
         |  SELECT user_id, t, v, i,
         |    max(CASE WHEN NOT isnan(v) THEN i END) OVER pw AS pi_,
         |    last_value(CASE WHEN NOT isnan(v) THEN v END IGNORE NULLS) OVER pw AS pv,
         |    min(CASE WHEN NOT isnan(v) THEN i END) OVER nw AS ni_,
         |    first_value(CASE WHEN NOT isnan(v) THEN v END IGNORE NULLS) OVER nw AS nv
         |  FROM r
         |  WINDOW pw AS (PARTITION BY user_id ORDER BY i
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |  nw AS (PARTITION BY user_id ORDER BY i
         |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
         |SELECT user_id, t, v AS original,
         |  round(CASE WHEN NOT isnan(v) THEN v
         |    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN nv + (nv - pv) / (ni_ - pi_) * (i - ni_)
         |    WHEN pv IS NOT NULL THEN pv
         |    ELSE nv END, 6) AS filled
         |FROM f ORDER BY user_id, t""".stripMargin,
    "ts_value_fill_mean" ->
      s"""WITH e AS (
         |  SELECT user_id, ts_ns AS t,
         |    CASE WHEN event_id % 17 = 0 THEN 'NaN'::DOUBLE ELSE value END AS v
         |  FROM $E WHERE user_id < 30),
         |m AS (SELECT user_id, sum(CASE WHEN NOT isnan(v) THEN v ELSE 0 END)
         |        / count(CASE WHEN NOT isnan(v) THEN 1 END) AS mean_v
         |      FROM e GROUP BY user_id)
         |SELECT e.user_id, t,
         |  round(CASE WHEN NOT isnan(v) THEN v ELSE mean_v END, 6) AS filled
         |FROM e JOIN m ON e.user_id = m.user_id
         |ORDER BY e.user_id, t""".stripMargin,
    "ts_value_fill_previous" ->
      s"""WITH e AS (
         |  SELECT user_id, ts_ns AS t, event_id,
         |    CASE WHEN event_id % 17 = 0 THEN 'NaN'::DOUBLE ELSE value END AS v
         |  FROM $E WHERE user_id < 30)
         |SELECT user_id, t,
         |  round(coalesce(last_value(CASE WHEN NOT isnan(v) THEN v END IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY t, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 'NaN'::DOUBLE), 6) AS filled
         |FROM e ORDER BY user_id, t""".stripMargin,
    "gis_distance" ->
      s"""SELECT event_id,
         |  round(sqrt(pow(value - value / 2, 2)
         |    + pow((((user_id % 10) + 10) % 10) + 0.5 - 3.3, 2)), 6) AS dist
         |FROM $E WHERE user_id < 50 ORDER BY event_id""".stripMargin,
    "gis_area" ->
      s"""SELECT event_id,
         |  round(abs(value) * (user_id + 1) / 2, 6) AS area
         |FROM $E WHERE user_id < 50 ORDER BY event_id""".stripMargin,
    "gis_predicates" ->
      s"""SELECT event_id,
         |  x > 0 AND x < 5 AND y > 0 AND y < 5 AS within_box,
         |  x > 0 AND x < 5 AND y > 0 AND y < 5 AS box_contains,
         |  off < 5 AS boxes_intersect,
         |  off >= 5 AS boxes_disjoint,
         |  true AS eq_self
         |FROM (
         |  SELECT event_id,
         |    ((value % 10) + 10) % 10 AS x,
         |    (((user_id % 10) + 10) % 10) + 0.5 AS y,
         |    (((user_id % 8) + 8) % 8) + 0.5 AS off
         |  FROM $E WHERE user_id < 50)
         |ORDER BY event_id""".stripMargin
    // ts_data_quality / ts_value_repair / ts_timestamp_repair: iterative
    // per-series algorithms, rows-only + ScalaTest fixtures.
  )
}
