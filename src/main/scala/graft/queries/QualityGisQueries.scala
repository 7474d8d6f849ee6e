package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{DataQuality, Gis, Repair}

/** Driver entries for data-quality, repair and GIS operators
  * (SURVEY.md §2.2). As of r9 EVERY lane here is hash-checked against
  * DuckDB — including the two former rows-only holdouts: the
  * data-quality windowed timestamp-anomaly state machine and the
  * timestamp-repair edit-distance DP both replay exactly as recursive
  * CTEs (one machine transition / one grid row per recursion step; see
  * the oracle comments below). Sequential tails of SCREEN and the AR
  * fill replay as recursive CTEs too; ScalaTest fixtures from the
  * reference's own slt cases additionally pin the kernels.
  */
object QualityGisQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_data_quality" -> ((s, dir) =>
      DataQuality.dataQuality(
        Tables.events(s, dir).filter(col("user_id") < 30),
        col("ts"), col("value"), Seq("user_id"))
        .orderBy("user_id")),

    // The full VALIDITY metric (reference data_quality) as a distributed
    // pipeline — NaN linear repair on time, then k=3 median/MAD outlier
    // counts over repaired values / first differences / speeds / speed
    // changes. Positional medians + µs-integer times keep every double
    // deterministic, so the oracle replays the whole pipeline in SQL;
    // equality with the sequential whole-series aggregate is spec-pinned
    // (DataQualitySpec). Hash-green since r6.
    "ts_validity" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id") < 30)
        .withColumn("v", when(col("event_id") % 17 === 0, lit(Double.NaN))
          .otherwise(col("value")))
      DataQuality.validityStats(ev, expr("ts_ns div 1000").cast("double"),
        col("v"), Seq("user_id"))
        .orderBy("user_id")
    }),

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

    // AR(1) fill is recursive, but on an INTEGER-CENT series every sum in
    // the fit (acf/factor/mean) is exact — order-insensitive — so theta is
    // bit-identical in any IEEE engine, and the two genuinely sequential
    // chains (meanEps accumulation, the fill recurrence) are replayed by
    // the oracle as recursive CTEs performing the identical op sequence.
    // Graduated from rows-only to hash-green in r6.
    "ts_value_fill_ar" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id") < 30)
        .withColumn("v", when(col("event_id") % 17 === 0, lit(Double.NaN))
          .otherwise(round(col("value") * 100)))
      Repair.valueFill(ev, expr("ts_ns div 1000"), col("v"), Seq("user_id"), "ar")
        .select(col("user_id"), col("t"),
          round(col("filled") / 100.0, 6).as("filled"))
        .orderBy("user_id", "t")
    }),

    // SCREEN is deterministic end-to-end on finite inputs: speed bounds
    // come from positional medians (exact (a+b)/2 on the two middle order
    // statistics), each unclamped repair is the exact middle of an odd
    // candidate multiset (a range self-join away), and only the
    // clamp-to-previous chain is sequential — a recursive CTE in the
    // oracle. Graduated from rows-only to hash-green in r6.
    "ts_value_repair" -> ((s, dir) =>
      Repair.valueRepair(
        Tables.events(s, dir).filter(col("user_id") < 10),
        expr("ts_ns div 1000"), col("value"), Seq("user_id"))
        .select(col("user_id"), col("t"), col("original"),
          round(col("repaired"), 6).as("repaired"))
        .orderBy("user_id", "t")),

    // NaN→NULL at the lane boundary (r9): the reference marks unfilled
    // grid slots NaN; SQL's missing-value is NULL, and NULL is the
    // representation the driver's hash compare provably handles (many
    // green lanes emit it) — the kernel itself stays NaN-faithful.
    "ts_timestamp_repair" -> ((s, dir) =>
      Repair.timestampRepairDf(
        Tables.events(s, dir).filter(col("user_id") < 5),
        expr("ts_ns div 1000"), col("value"), Seq("user_id"))
        .withColumn("v", when(isnan(col("v")), lit(null)).otherwise(col("v")))
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
    // validityStats replayed end-to-end: NaN repair from prev/next finite
    // neighbours (edge rows from the first/last finite PAIR), the four
    // anomaly series as one tall (uid, kind, x) frame, positional medians
    // (avg of the one-or-two middle order statistics), sigma = 1.4826·med
    // then the k·sigma comparison in the reference's association order.
    "ts_validity" ->
      s"""WITH b AS (
         |  SELECT user_id AS uid, CAST(ts_ns AS DOUBLE) AS t,
         |    CASE WHEN event_id % 17 = 0 THEN NULL ELSE value END AS v
         |  FROM $E WHERE user_id < 30),
         |n1 AS (
         |  SELECT uid, t, v,
         |    last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER pw AS pt,
         |    last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER pw AS pv,
         |    first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER nw AS nt,
         |    first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS) OVER nw AS nv
         |  FROM b
         |  WINDOW pw AS (PARTITION BY uid ORDER BY t
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |  nw AS (PARTITION BY uid ORDER BY t
         |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
         |fins AS (
         |  SELECT uid, t, v, row_number() OVER (PARTITION BY uid ORDER BY t) AS r,
         |    count(*) OVER (PARTITION BY uid) AS rn
         |  FROM b WHERE v IS NOT NULL),
         |fl AS (
         |  SELECT uid,
         |    min(CASE WHEN r = 1 THEN t END) AS f1t, min(CASE WHEN r = 1 THEN v END) AS f1v,
         |    min(CASE WHEN r = 2 THEN t END) AS f2t, min(CASE WHEN r = 2 THEN v END) AS f2v,
         |    min(CASE WHEN r = rn - 1 THEN t END) AS l1t, min(CASE WHEN r = rn - 1 THEN v END) AS l1v,
         |    min(CASE WHEN r = rn THEN t END) AS l2t, min(CASE WHEN r = rn THEN v END) AS l2v
         |  FROM fins GROUP BY uid),
         |rep AS (
         |  SELECT n1.uid, t, CASE
         |      WHEN v IS NOT NULL THEN v
         |      WHEN pv IS NULL THEN f1v + (f2v - f1v) * ((t - f1t) / (f2t - f1t))
         |      WHEN nv IS NULL THEN l1v + (l2v - l1v) * ((t - l1t) / (l2t - l1t))
         |      ELSE pv + (nv - pv) * ((t - pt) / (nt - pt)) END AS rv
         |  FROM n1 JOIN fl ON fl.uid = n1.uid),
         |d AS (
         |  SELECT uid, t, rv,
         |    rv - lag(rv) OVER w AS dv,
         |    (rv - lag(rv) OVER w) / (t - lag(t) OVER w) AS sp
         |  FROM rep WINDOW w AS (PARTITION BY uid ORDER BY t)),
         |sc AS (
         |  SELECT uid, sp - lag(sp) OVER (PARTITION BY uid ORDER BY t) AS spc
         |  FROM d WHERE dv IS NOT NULL),
         |tall AS (
         |  SELECT uid, 'val' AS kind, rv AS x FROM rep
         |  UNION ALL SELECT uid, 'var', dv FROM d WHERE dv IS NOT NULL
         |  UNION ALL SELECT uid, 'spd', sp FROM d WHERE dv IS NOT NULL
         |  UNION ALL SELECT uid, 'sch', spc FROM sc WHERE spc IS NOT NULL),
         |r1 AS (
         |  SELECT uid, kind, x,
         |    row_number() OVER (PARTITION BY uid, kind ORDER BY x) AS rx,
         |    count(*) OVER (PARTITION BY uid, kind) AS cnt
         |  FROM tall),
         |m1 AS (
         |  SELECT uid, kind, avg(x) AS med
         |  FROM r1 WHERE rx IN ((cnt + 1) // 2, (cnt + 2) // 2) GROUP BY uid, kind),
         |dev AS (
         |  SELECT r1.uid, r1.kind, abs(x - med) AS dev
         |  FROM r1 JOIN m1 USING (uid, kind)),
         |r2 AS (
         |  SELECT uid, kind, dev,
         |    row_number() OVER (PARTITION BY uid, kind ORDER BY dev) AS rx,
         |    count(*) OVER (PARTITION BY uid, kind) AS cnt
         |  FROM dev),
         |m2 AS (
         |  SELECT uid, kind, 1.4826 * avg(dev) AS sigma
         |  FROM r2 WHERE rx IN ((cnt + 1) // 2, (cnt + 2) // 2) GROUP BY uid, kind),
         |cn AS (
         |  SELECT dev.uid, dev.kind,
         |    count(CASE WHEN dev > 3.0 * sigma THEN 1 END) AS o
         |  FROM dev JOIN m2 USING (uid, kind) GROUP BY dev.uid, dev.kind),
         |p AS (
         |  SELECT uid,
         |    CAST(sum(CASE WHEN kind = 'val' THEN o ELSE 0 END) AS BIGINT) AS oval,
         |    CAST(sum(CASE WHEN kind = 'var' THEN o ELSE 0 END) AS BIGINT) AS ovar,
         |    CAST(sum(CASE WHEN kind = 'spd' THEN o ELSE 0 END) AS BIGINT) AS ospd,
         |    CAST(sum(CASE WHEN kind = 'sch' THEN o ELSE 0 END) AS BIGINT) AS osch
         |  FROM cn GROUP BY uid),
         |nn AS (SELECT uid, count(*) AS n FROM b GROUP BY uid)
         |SELECT nn.uid AS user_id, CAST(nn.n AS BIGINT) AS n,
         |  oval AS n_value_outliers, ovar AS n_variation_outliers,
         |  ospd AS n_speed_outliers, osch AS n_speedchange_outliers,
         |  round(CAST(1.0 AS DOUBLE) - CAST(0.25 AS DOUBLE)
         |    * (oval + ovar + ospd + osch) / nn.n, 8) AS validity
         |FROM nn JOIN p ON p.uid = nn.uid
         |ORDER BY user_id""".stripMargin,
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
         |ORDER BY event_id""".stripMargin,
    // SCREEN value_repair replayed exactly: Scala's med() is avg() of the
    // one-or-two middle order statistics (never quantile interpolation —
    // engines differ there), the per-start unclamped repair is the exact
    // middle of the 2m+1 candidate multiset from a windowed self-join,
    // and the clamp chain is the one sequential recursion.
    "ts_value_repair" ->
      """WITH RECURSIVE
        |e AS (
        |  SELECT user_id AS uid, epoch_us(cast(ts AS TIMESTAMP)) AS t, value AS v,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(cast(ts AS TIMESTAMP))) AS i
        |  FROM events WHERE user_id < 10),
        |iv AS (
        |  SELECT uid, (lead(t) OVER (PARTITION BY uid ORDER BY i)) - t AS dt,
        |    (lead(v) OVER (PARTITION BY uid ORDER BY i)) - v AS dv
        |  FROM e),
        |ivr AS (
        |  SELECT uid, CAST(dt AS DOUBLE) AS dt, dv / dt AS sp,
        |    row_number() OVER (PARTITION BY uid ORDER BY CAST(dt AS DOUBLE)) AS rdt,
        |    row_number() OVER (PARTITION BY uid ORDER BY dv / dt) AS rsp,
        |    count(*) OVER (PARTITION BY uid) AS m
        |  FROM iv WHERE dt IS NOT NULL),
        |wmed AS (
        |  SELECT uid,
        |    (SELECT avg(dt) FROM ivr x WHERE x.uid = ivr.uid
        |      AND x.rdt IN ((x.m + 1) // 2, (x.m + 2) // 2)) AS med_dt,
        |    (SELECT avg(sp) FROM ivr x WHERE x.uid = ivr.uid
        |      AND x.rsp IN ((x.m + 1) // 2, (x.m + 2) // 2)) AS med_sp
        |  FROM ivr GROUP BY uid),
        |devr AS (
        |  SELECT ivr.uid, abs(sp - med_sp) AS dev,
        |    row_number() OVER (PARTITION BY ivr.uid ORDER BY abs(sp - med_sp)) AS rdev,
        |    count(*) OVER (PARTITION BY ivr.uid) AS m
        |  FROM ivr JOIN wmed ON ivr.uid = wmed.uid),
        |params AS (
        |  SELECT wmed.uid, 5 * CAST(trunc(med_dt) AS BIGINT) AS w,
        |    med_sp - 3.0 * 1.4826 * mad AS smin,
        |    med_sp + 3.0 * 1.4826 * mad AS smax
        |  FROM wmed JOIN (
        |    SELECT uid,
        |      (SELECT avg(dev) FROM devr x WHERE x.uid = devr.uid
        |        AND x.rdev IN ((x.m + 1) // 2, (x.m + 2) // 2)) AS mad
        |    FROM devr GROUP BY uid) md ON wmed.uid = md.uid),
        |cand AS (
        |  SELECT a.uid, a.i, a.v AS x FROM e a
        |  UNION ALL
        |  SELECT a.uid, a.i, b.v + p.s * (a.t - b.t)
        |  FROM e a
        |  JOIN e b ON b.uid = a.uid AND b.i > a.i
        |  JOIN params pr ON pr.uid = a.uid
        |  CROSS JOIN LATERAL (SELECT unnest([pr.smin, pr.smax]) AS s) p
        |  WHERE b.t <= a.t + pr.w),
        |umed AS (
        |  SELECT uid, i, x,
        |    row_number() OVER (PARTITION BY uid, i ORDER BY x) AS rx,
        |    count(*) OVER (PARTITION BY uid, i) AS cnt
        |  FROM cand),
        |u AS (
        |  SELECT uid, i, x AS mdn FROM umed WHERE rx = (cnt + 1) // 2),
        |rec AS (
        |  SELECT u.uid, u.i, e.t, e.v, u.mdn AS rep
        |  FROM u JOIN e ON e.uid = u.uid AND e.i = u.i WHERE u.i = 1
        |  UNION ALL
        |  SELECT m.uid, m.i, e.t, e.v,
        |    greatest(r.rep + p.smin * (e.t - r.t),
        |             least(r.rep + p.smax * (e.t - r.t), m.mdn))
        |  FROM rec r
        |  JOIN u m ON m.uid = r.uid AND m.i = r.i + 1
        |  JOIN e ON e.uid = m.uid AND e.i = m.i
        |  JOIN params p ON p.uid = m.uid)
        |SELECT uid AS user_id, t, v AS original, round(rep, 6) AS repaired
        |FROM rec ORDER BY user_id, t""".stripMargin,
    // AR(1) fill on the integer-cent lane: acf/factor/mean are exact
    // integer sums (order-free), so theta matches Spark bit-for-bit; the
    // meanEps accumulation and the fill recurrence are the two genuinely
    // sequential passes, replayed as recursive CTEs with the identical
    // IEEE op sequence (acc + (v' - theta*v); theta*prev + meanEps).
    "ts_value_fill_ar" ->
      """WITH RECURSIVE
        |e AS (
        |  SELECT user_id AS uid, epoch_us(cast(ts AS TIMESTAMP)) AS t,
        |    CASE WHEN event_id % 17 = 0 THEN 'NaN'::DOUBLE
        |         ELSE round(value * 100) END AS v,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(cast(ts AS TIMESTAMP))) AS i
        |  FROM events WHERE user_id < 30),
        |fit AS (
        |  SELECT a.uid,
        |    sum(CASE WHEN isnan(a.v) THEN 0 ELSE a.v END
        |      * CASE WHEN isnan(b.v) THEN 0 ELSE b.v END) AS acf,
        |    sum(CASE WHEN isnan(a.v) THEN 0 ELSE a.v * a.v END) AS factor
        |  FROM e a JOIN e b ON b.uid = a.uid AND b.i = a.i + 1
        |  GROUP BY a.uid),
        |mn AS (
        |  SELECT uid, sum(CASE WHEN isnan(v) THEN 0 ELSE v END)
        |    / count(CASE WHEN NOT isnan(v) THEN 1 END) AS mean_v
        |  FROM e GROUP BY uid),
        |th AS (SELECT uid, acf / factor AS theta FROM fit),
        |eps AS (
        |  SELECT e.uid, e.i, CAST(0.0 AS DOUBLE) + CASE
        |      WHEN NOT isnan(e.v) AND NOT isnan(b.v) THEN b.v - th.theta * e.v
        |      ELSE 0 END AS acc,
        |    CASE WHEN NOT isnan(e.v) AND NOT isnan(b.v)
        |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS cnt
        |  FROM e JOIN e b ON b.uid = e.uid AND b.i = 2 JOIN th ON th.uid = e.uid
        |  WHERE e.i = 1
        |  UNION ALL
        |  SELECT p.uid, c.i, CASE
        |      WHEN NOT isnan(c.v) AND NOT isnan(b.v)
        |        THEN p.acc + (b.v - th.theta * c.v)
        |      ELSE p.acc END,
        |    CASE WHEN NOT isnan(c.v) AND NOT isnan(b.v)
        |      THEN p.cnt + CAST(1.0 AS DOUBLE) ELSE p.cnt END
        |  FROM eps p
        |  JOIN e c ON c.uid = p.uid AND c.i = p.i + 1
        |  JOIN e b ON b.uid = p.uid AND b.i = c.i + 1
        |  JOIN th ON th.uid = p.uid),
        |me AS (
        |  SELECT uid, acc / cnt AS mean_eps
        |  FROM (SELECT uid, acc, cnt,
        |          row_number() OVER (PARTITION BY uid ORDER BY i DESC) AS r
        |        FROM eps) WHERE r = 1),
        |fill AS (
        |  SELECT e.uid, e.i, e.t,
        |    CASE WHEN NOT isnan(e.v) THEN e.v ELSE mn.mean_v END AS f
        |  FROM e JOIN mn ON mn.uid = e.uid WHERE e.i = 1
        |  UNION ALL
        |  SELECT c.uid, c.i, c.t,
        |    CASE WHEN NOT isnan(c.v) THEN c.v
        |         ELSE th.theta * p.f + me.mean_eps END
        |  FROM fill p
        |  JOIN e c ON c.uid = p.uid AND c.i = p.i + 1
        |  JOIN th ON th.uid = c.uid
        |  JOIN me ON me.uid = c.uid)
        |SELECT uid AS user_id, t, round(f / 100.0, 6) AS filled
        |FROM fill ORDER BY user_id, t""".stripMargin,
    // The FULL data-quality aggregate replayed in SQL (r9 — was the
    // last rows-only lane bar the repair DP): the four value-anomaly
    // outlier counts are median/MAD CTEs (the ts_validity discipline),
    // and the windowed timestamp-anomaly scan — an imperative loop
    // with data-dependent window removals — is replayed EXACTLY by a
    // recursive CTE running one machine transition per recursion step:
    // mode 0 = outer-loop head (redundancy / enter-late-scan / plain
    // advance), mode 1 = one j-step of the inner late scan. Window
    // removals are list slices; refill happens only when an outer
    // iteration completes; counters/miss-late/redundancy follow
    // common.rs:126-158 branch for branch. All metrics are ratios of
    // these integer counters, so round(,8) hash-matches bit-for-bit.
    // (No NaN repair replay needed: the driver lake has no non-finite
    // values, so specialcnt = 0 and repair is the identity there; the
    // NaN path stays pinned by DataQualitySpec fixtures.)
    "ts_data_quality" ->
      """WITH RECURSIVE
        |pts AS (
        |  SELECT user_id AS uid, epoch(CAST(ts AS TIMESTAMP)) AS t, value AS v,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch(CAST(ts AS TIMESTAMP)), value) AS i
        |  FROM events WHERE user_id < 30),
        |cnt AS (SELECT uid, count(*) AS cnt FROM pts GROUP BY 1),
        |iv AS (
        |  SELECT uid, dt FROM (
        |    SELECT uid, lead(t) OVER (PARTITION BY uid ORDER BY i) - t AS dt FROM pts)
        |  WHERE dt IS NOT NULL),
        |base AS (SELECT uid, quantile_cont(dt, 0.5) AS base FROM iv GROUP BY 1),
        |vmed AS (SELECT uid, quantile_cont(v, 0.5) AS m FROM pts GROUP BY 1),
        |vmad AS (SELECT p.uid, 1.4826 * quantile_cont(abs(p.v - m.m), 0.5) AS s
        |         FROM pts p JOIN vmed m USING (uid) GROUP BY p.uid),
        |vcnt AS (SELECT p.uid, count(*) FILTER (WHERE abs(p.v - m.m) > 3.0 * s.s) AS c
        |         FROM pts p JOIN vmed m USING (uid) JOIN vmad s USING (uid) GROUP BY p.uid),
        |dvar AS (
        |  SELECT uid, d FROM (
        |    SELECT uid, lead(v) OVER (PARTITION BY uid ORDER BY i) - v AS d FROM pts)
        |  WHERE d IS NOT NULL),
        |dmed AS (SELECT uid, quantile_cont(d, 0.5) AS m FROM dvar GROUP BY 1),
        |dmad AS (SELECT p.uid, 1.4826 * quantile_cont(abs(p.d - m.m), 0.5) AS s
        |         FROM dvar p JOIN dmed m USING (uid) GROUP BY p.uid),
        |dcnt AS (SELECT p.uid, count(*) FILTER (WHERE abs(p.d - m.m) > 3.0 * s.s) AS c
        |         FROM dvar p JOIN dmed m USING (uid) JOIN dmad s USING (uid) GROUP BY p.uid),
        |spd AS (
        |  SELECT uid, sp, i FROM (
        |    SELECT uid, i, (lead(v) OVER w - v) / (lead(t) OVER w - t) AS sp
        |    FROM pts WINDOW w AS (PARTITION BY uid ORDER BY i))
        |  WHERE sp IS NOT NULL),
        |smed AS (SELECT uid, quantile_cont(sp, 0.5) AS m FROM spd GROUP BY 1),
        |smad AS (SELECT p.uid, 1.4826 * quantile_cont(abs(p.sp - m.m), 0.5) AS s
        |         FROM spd p JOIN smed m USING (uid) GROUP BY p.uid),
        |scnt AS (SELECT p.uid, count(*) FILTER (WHERE abs(p.sp - m.m) > 3.0 * s.s) AS c
        |         FROM spd p JOIN smed m USING (uid) JOIN smad s USING (uid) GROUP BY p.uid),
        |dspd AS (
        |  SELECT uid, d FROM (
        |    SELECT uid, lead(sp) OVER (PARTITION BY uid ORDER BY i) - sp AS d FROM spd)
        |  WHERE d IS NOT NULL),
        |cmed AS (SELECT uid, quantile_cont(d, 0.5) AS m FROM dspd GROUP BY 1),
        |cmad AS (SELECT p.uid, 1.4826 * quantile_cont(abs(p.d - m.m), 0.5) AS s
        |         FROM dspd p JOIN cmed m USING (uid) GROUP BY p.uid),
        |ccnt AS (SELECT p.uid, count(*) FILTER (WHERE abs(p.d - m.m) > 3.0 * s.s) AS c
        |         FROM dspd p JOIN cmed m USING (uid) JOIN cmad s USING (uid) GROUP BY p.uid),
        |tarr AS (SELECT uid, list(t ORDER BY i) AS ts FROM pts GROUP BY 1),
        |sm AS (
        |  SELECT b.uid, b.base, a.ts, a.ts[1:10] AS win,
        |    least(10, len(a.ts))::BIGINT AS nxt,
        |    0::BIGINT AS miss, 0::BIGINT AS late, 0::BIGINT AS red,
        |    0::BIGINT AS mode, 0::BIGINT AS j, 0::BIGINT AS temp, 0::BIGINT AS tgt,
        |    false AS done
        |  FROM base b JOIN tarr a USING (uid)
        |  UNION ALL
        |  SELECT uid, base, ts,
        |    CASE WHEN outerEnd
        |         THEN wr || ts[nxt+1 : nxt + greatest(0, 10 - len(wr))]
        |         ELSE wr END,
        |    CASE WHEN outerEnd
        |         THEN least(len(ts), nxt + greatest(0, 10 - len(wr)))
        |         ELSE nxt END,
        |    CASE WHEN innerEnd THEN miss + tgt - tUsed ELSE miss END,
        |    CASE WHEN innerEnd THEN late + tUsed ELSE late END,
        |    CASE WHEN bA THEN red + 1 ELSE red END,
        |    CASE WHEN bB OR dropCont OR bStep THEN 1 ELSE 0 END::BIGINT,
        |    CASE WHEN bB THEN 2 WHEN bStep THEN j + 1
        |         WHEN dropCont THEN j ELSE 0 END::BIGINT,
        |    CASE WHEN bB THEN 0 WHEN dropCont THEN temp + 1
        |         WHEN bStep THEN temp ELSE 0 END::BIGINT,
        |    CASE WHEN bB THEN round((win[2] - win[1]) / base - 1.0)::BIGINT
        |         WHEN dropCont OR bStep THEN tgt ELSE 0 END,
        |    fin
        |  FROM (
        |    SELECT *,
        |      CASE WHEN bA THEN win[3:]
        |           WHEN bC OR endNoDrop THEN win[2:]
        |           WHEN bDrop AND temp + 1 = tgt THEN (win[1:j::INT] || win[j+2:])[2:]
        |           WHEN bDrop THEN win[1:j::INT] || win[j+2:]
        |           ELSE win END AS wr,
        |      (bA OR bC OR endNoDrop OR (bDrop AND temp + 1 = tgt)) AS outerEnd,
        |      (endNoDrop OR (bDrop AND temp + 1 = tgt)) AS innerEnd,
        |      (bDrop AND temp + 1 <> tgt) AS dropCont,
        |      CASE WHEN bDrop THEN temp + 1 ELSE temp END AS tUsed
        |    FROM (
        |      SELECT *,
        |        (mode = 0 AND len(win) <= 1) AS fin,
        |        (mode = 0 AND len(win) > 1
        |          AND (win[2] - win[1]) / base <= 0.5) AS bA,
        |        (mode = 0 AND len(win) > 1
        |          AND (win[2] - win[1]) / base >= 2.0
        |          AND (win[2] - win[1]) / base <= 9.0) AS bB,
        |        (mode = 0 AND len(win) > 1
        |          AND (win[2] - win[1]) / base > 0.5
        |          AND NOT ((win[2] - win[1]) / base >= 2.0
        |                   AND (win[2] - win[1]) / base <= 9.0)) AS bC,
        |        (mode = 1 AND (j >= len(win)
        |          OR (win[j+1] - win[j]) / base >= 2.0)) AS endNoDrop,
        |        (mode = 1 AND j < len(win)
        |          AND (win[j+1] - win[j]) / base < 2.0
        |          AND (win[j+1] - win[j]) / base <= 0.5) AS bDrop,
        |        (mode = 1 AND j < len(win)
        |          AND (win[j+1] - win[j]) / base < 2.0
        |          AND (win[j+1] - win[j]) / base > 0.5) AS bStep
        |      FROM sm WHERE NOT done))
        |)
        |SELECT uid AS user_id,
        |  round(1.0 - miss::DOUBLE / (cnt + miss)::DOUBLE, 8) AS completeness,
        |  round(1.0 - red::DOUBLE / cnt::DOUBLE, 8) AS consistency,
        |  round(1.0 - late::DOUBLE / cnt::DOUBLE, 8) AS timeliness,
        |  round(1.0 - 0.25 * (vcnt.c + dcnt.c + scnt.c + ccnt.c)::DOUBLE
        |    / cnt::DOUBLE, 8) AS validity
        |FROM sm JOIN cnt USING (uid)
        |JOIN vcnt USING (uid) JOIN dcnt USING (uid)
        |JOIN scnt USING (uid) JOIN ccnt USING (uid)
        |WHERE done ORDER BY uid""".stripMargin,
    // The timestamp-repair DP replayed exactly (r9 — the LAST rows-only
    // lane, taking the no_oracle set to ZERO): median interval (the
    // reference's m-indexed spelling), mode start anchored at the last
    // sample of the best residue class, then the edit-distance DP one
    // GRID ROW per recursion step — the in-row remove-chain recurrence
    // f[i][j] = min(entry, f[i][j-1]+C) collapses to a segmented
    // prefix-min (exact-match cells force their value and reset the
    // chain; property-verified equal to the reference loop over 300
    // random DPs in the builder harness). The cost rows accumulate in
    // the recursion state, and a second recursion replays the
    // backtrack's decision order (assign iff exact-match or strictly
    // beating best-of-insert/remove + C, remove winning ties) from the
    // stored rows. The greedy >16M-cell fallback is not replayed —
    // driver-scale series are ~1e4 cells.
    "ts_timestamp_repair" ->
      """WITH RECURSIVE
        |pts AS (
        |  SELECT user_id AS uid, epoch_us(CAST(ts AS TIMESTAMP)) AS t, value AS v,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), value) AS i,
        |    count(*) OVER (PARTITION BY user_id) AS m
        |  FROM events WHERE user_id < 5),
        |ivs AS (
        |  SELECT uid, dt, row_number() OVER (PARTITION BY uid ORDER BY dt) AS r,
        |    max(m) OVER (PARTITION BY uid) AS m
        |  FROM (SELECT uid, lead(t) OVER (PARTITION BY uid ORDER BY i) - t AS dt, m
        |        FROM pts)
        |  WHERE dt IS NOT NULL),
        |med AS (
        |  SELECT uid, greatest(1, CASE WHEN m % 2 = 0
        |      THEN (max(CASE WHEN r = m/2 THEN dt END)
        |            + max(CASE WHEN r = m/2 + 1 THEN dt END)) // 2
        |      ELSE max(CASE WHEN r = (m+1)/2 THEN dt END) END) AS iv
        |  FROM ivs GROUP BY uid, m),
        |res AS (
        |  SELECT p.uid, p.t % m.iv AS r, count(*) AS c
        |  FROM pts p JOIN med m USING (uid) GROUP BY 1, 2),
        |best AS (
        |  SELECT uid, r FROM (
        |    SELECT uid, r, row_number() OVER (PARTITION BY uid
        |      ORDER BY c DESC, r ASC) AS rk
        |    FROM res) WHERE rk = 1),
        |anchor AS (
        |  SELECT p.uid, max(p.t) FILTER (WHERE p.t % m.iv = b.r) AS last_t,
        |    min(p.t) AS head, max(p.t) AS tail, m.iv
        |  FROM pts p JOIN med m USING (uid) JOIN best b USING (uid)
        |  GROUP BY p.uid, m.iv),
        |grid AS (
        |  SELECT uid, iv, tail,
        |    last_t - iv * greatest(0,
        |      CAST(ceil(CAST(last_t - head AS DOUBLE) / iv) AS BIGINT)) AS start
        |  FROM anchor),
        |gridn AS (
        |  SELECT uid, iv, start,
        |    CAST(ceil(CAST(tail - start AS DOUBLE) / iv + 1.0) AS BIGINT) AS gn
        |  FROM grid),
        |ser AS (
        |  SELECT p.uid, g.iv, g.start, g.gn, any_value(p.m) AS m,
        |    list(p.t ORDER BY p.i) AS ts, list(p.v ORDER BY p.i) AS vs
        |  FROM pts p JOIN gridn g USING (uid)
        |  WHERE p.m > 2
        |  GROUP BY 1, 2, 3, 4),
        |fwd AS (
        |  SELECT uid, iv, start, gn, m, ts,
        |    0::BIGINT AS i,
        |    list_transform(range(0, m + 1), k -> 100000000000 * k) AS fprev
        |  FROM ser
        |  UNION ALL
        |  SELECT uid, iv, start, gn, m, ts, i + 1,
        |    f AS fprev
        |  FROM (
        |    SELECT *,
        |      list_transform(range(0, m + 1), k ->
        |        CASE WHEN k = 0 THEN 100000000000 * (i + 1)
        |             WHEN ts[k::INT] = slot THEN entry[k::INT + 1]
        |             ELSE 100000000000 * k + list_min(list_slice(hv,
        |               coalesce(list_max(list_filter(fpos, x -> x <= k)), 0)::INT + 1,
        |               k::INT + 1)) END) AS f
        |    FROM (
        |      SELECT *,
        |        list_transform(range(0, m + 1), k ->
        |          entry[k::INT + 1] - 100000000000 * k) AS hv,
        |        list_filter(range(1, m + 1), k -> ts[k::INT] = slot) AS fpos
        |      FROM (
        |        SELECT *, start + iv * i AS slot,
        |          list_transform(range(0, m + 1), k ->
        |            CASE WHEN k = 0 THEN 100000000000 * (i + 1)
        |                 WHEN ts[k::INT] = start + iv * i THEN fprev[k::INT]
        |                 ELSE least(fprev[k::INT] + abs(ts[k::INT] - (start + iv * i)),
        |                            fprev[k::INT + 1] + 100000000000) END) AS entry
        |        FROM fwd WHERE i < gn)))
        |),
        |fwd_final AS (
        |  -- every step's cost row is already in the recursive result
        |  -- set: re-assemble the matrix here instead of copying an
        |  -- ever-growing accumulator through each step (O(gridN²·m)
        |  -- → O(gridN·m); 21 s → ~2 s at sf0.01)
        |  SELECT s.uid, s.iv, s.start, s.gn, s.m, s.ts, s.vs, a.acc
        |  FROM ser s JOIN (
        |    SELECT uid, list(fprev ORDER BY i) AS acc FROM fwd GROUP BY uid) a
        |  USING (uid)),
        |bt AS (
        |  SELECT uid, gn AS i, m AS j, []::STRUCT(gi BIGINT, sj BIGINT)[] AS outa
        |  FROM fwd_final
        |  UNION ALL
        |  SELECT b.uid,
        |    CASE WHEN asg THEN b.i - 1 WHEN ins THEN b.i - 1 ELSE b.i END,
        |    CASE WHEN asg THEN b.j - 1 WHEN ins THEN b.j ELSE b.j - 1 END,
        |    CASE WHEN asg THEN list_append(b.outa, {'gi': b.i, 'sj': b.j})
        |         ELSE b.outa END
        |  FROM (
        |    SELECT b.*, f.iv, f.start, f.ts, f.acc,
        |      (f.ts[b.j::INT] = f.start + f.iv * (b.i - 1)
        |        OR f.acc[b.i::INT][b.j::INT]
        |             + abs(f.ts[b.j::INT] - (f.start + f.iv * (b.i - 1)))
        |           < least(f.acc[b.i::INT][b.j::INT + 1],
        |                   f.acc[b.i::INT + 1][b.j::INT]) + 100000000000) AS asg,
        |      (f.acc[b.i::INT][b.j::INT + 1] < f.acc[b.i::INT + 1][b.j::INT]) AS ins
        |    FROM bt b JOIN fwd_final f USING (uid)
        |    WHERE b.i >= 1 AND b.j >= 1) b
        |),
        |assigns AS (
        |  SELECT uid, u.a.gi AS gi, u.a.sj AS sj
        |  FROM (SELECT uid, outa FROM bt WHERE i < 1 OR j < 1),
        |    LATERAL (SELECT unnest(outa) AS a) u),
        |slots AS (
        |  SELECT f.uid, u.k AS k, f.start + f.iv * u.k AS t
        |  FROM fwd_final f, LATERAL (SELECT unnest(range(0, f.gn)) AS k) u)
        |SELECT s.uid AS user_id, s.t, f.vs[a.sj::INT] AS v
        |FROM slots s
        |JOIN fwd_final f USING (uid)
        |LEFT JOIN assigns a ON a.uid = s.uid AND a.gi = s.k + 1
        |UNION ALL
        |SELECT uid AS user_id, t, v FROM pts WHERE m <= 2
        |ORDER BY user_id, t""".stripMargin
  )
}
