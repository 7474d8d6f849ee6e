package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operator library — cnosdb's extension surface re-expressed
  * Spark-first (reference: query_server/query/src/extension/expr/).
  *
  * Every operator here is a declarative DataFrame transform built from
  * codegen'd built-ins (`window`, `session_window`, window functions,
  * `min_by`-style struct aggregates), so Catalyst keeps pushdown/pruning
  * and all aggregations stay partial-aggregable. Nothing collects to the
  * driver; group keys are the shuffle keys, so at 100 TB the plans are
  * one shuffle per operator (none for the windowed aggs when the input
  * is already bucketed by the group key).
  */
object TimeSeries {

  /** `time_window(ts, win[, slide[, start]])` → adds `window_start`/
    * `window_end`. Tumbling when slide == win (reference
    * expr/window/time_window.rs:101-126; the 4-arg form aligns windows
    * to `start` — e.g. local midnight — instead of the 1970-01-01
    * default). Spark's `window()` expands sliding windows map-side
    * (Expand node) — the same design as cnosdb's Expand operator, no
    * shuffle added; `origin` maps to Spark's `startTime` offset.
    */
  def timeWindow(ts: Column, win: String, slide: Option[String] = None,
                 origin: Option[String] = None): Column =
    (slide, origin) match {
      case (Some(s), Some(o)) => window(ts, win, s, o)
      case (Some(s), None)    => window(ts, win, s)
      case (None, Some(o))    => window(ts, win, win, o)
      case (None, None)       => window(ts, win)
    }

  /** first/last by time with deterministic (ts, tiebreak) ordering —
    * cnosdb `first(time, value)` / `last(time, value)` UDAFs
    * (aggregate_function/{first,last}.rs). Single-pass min/max of an
    * ordered struct: partial-aggregable, no sort, no window.
    */
  def firstByTime(ts: Column, tiebreak: Column, value: Column): Column =
    min(struct(ts, tiebreak, value)).getField(value.toString)

  def lastByTime(ts: Column, tiebreak: Column, value: Column): Column =
    max(struct(ts, tiebreak, value)).getField(value.toString)

  /** Deterministic mode — most frequent value, smallest value on ties
    * (aggregate_function/mode.rs). Two partial-aggregable aggregations;
    * ties resolved by value ordering so results are reproducible across
    * partitionings (cnosdb's accumulator has the same property).
    */
  def modeOf(df: DataFrame, groupCols: Seq[String], valueCol: String,
             out: String = "mode"): DataFrame = {
    val counted = df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__cnt").desc, col(valueCol))
    counted.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((groupCols.map(col) :+ col(valueCol).as(out)): _*)
  }

  /** Prometheus-style counter increase (aggregate_function/increase.rs):
    * Σ (v - prev) when the counter grows, and the raw value after a
    * reset (v < prev). Verified against the reference's own test
    * vectors: 1..8 → 7; 1,2,3,4,1,2,3,4 → 7
    * (sqllogicaltests/cases/function/common/increase.slt).
    */
  def increase(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
               groupCols: Seq[String], out: String = "increase"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__prev", lag(valueCol, 1).over(w))
      .withColumn("__inc",
        when(col("__prev").isNull, lit(0.0))
          .when(valueCol >= col("__prev"), valueCol - col("__prev"))
          .otherwise(valueCol))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__inc")).as(out))
  }

  /** `gauge_agg(ts, value)` + accessors delta, time_delta, rate,
    * first_time/val, last_time/val (scalar_function/gauge/,
    * aggregate_function/gauge/): one partial-aggregable pass — min/max
    * of (ts, tiebreak, value) structs.
    */
  def gaugeAgg(df: DataFrame, tsCol: String, tiebreakCol: String, valueCol: String,
               groupCols: Seq[String]): DataFrame = {
    df.groupBy(groupCols.map(col): _*)
      .agg(
        min(struct(col(tsCol), col(tiebreakCol), col(valueCol))).as("__first"),
        max(struct(col(tsCol), col(tiebreakCol), col(valueCol))).as("__last"))
      .select(groupCols.map(col) ++ Seq(
        col(s"__first.$tsCol").as("first_time"),
        col(s"__first.$valueCol").as("first_val"),
        col(s"__last.$tsCol").as("last_time"),
        col(s"__last.$valueCol").as("last_val"),
        (col(s"__last.$valueCol") - col(s"__first.$valueCol")).as("delta"),
        (col(s"__last.$tsCol").cast("double") - col(s"__first.$tsCol").cast("double"))
          .as("time_delta_s"),
        when(col(s"__last.$tsCol") =!= col(s"__first.$tsCol"),
          (col(s"__last.$valueCol") - col(s"__first.$valueCol")) /
            (col(s"__last.$tsCol").cast("double") - col(s"__first.$tsCol").cast("double")))
          .as("rate")): _*)
  }

  /** `idelta_left/right` — delta of the two adjacent samples at the
    * series start/end (scalar_function/gauge/idelta_*.rs).
    */
  def idelta(df: DataFrame, tsCol: Column, tiebreak: Column, valueCol: Column,
             groupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(tsCol, tiebreak)
    val n = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(n))
      .withColumn("__next", lead(valueCol, 1).over(w))
      .withColumn("__prev", lag(valueCol, 1).over(w))
      .filter(col("__rn") === 1 || col("__rn") === col("__cnt"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(when(col("__rn") === 1, col("__next") - valueCol)).as("idelta_left"),
        max(when(col("__rn") === col("__cnt"), valueCol - col("__prev"))).as("idelta_right"))
  }

  /** TimescaleDB `counter_agg` composite: the counter summary struct —
    * first/last (time, value), reset count, reset-corrected total
    * increase (`idelta` ≡ PromQL increase), and the mean per-second
    * rate over the observed span — in ONE per-series pass. Everything
    * but the final rate stays exact integer cents/µs; the rate is one
    * mirrored float expression. One sort exchange serves the lag window
    * and the aggregate (the resetsChanges shape).
    */
  def counterAgg(df: DataFrame, seriesCols: Seq[String], orderCols: Seq[String],
                 tsUsCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val delta = when(col("__p").isNull, lit(0L))
      .when(col("__c") >= col("__p"), col("__c") - col("__p"))
      .otherwise(col("__c"))
    df.withColumn("__c", round(col(valueCol) * 100).cast("long"))
      .withColumn("__p", lag(col("__c"), 1).over(w))
      .groupBy(seriesCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        min(col(tsUsCol)).as("first_time_us"),
        min(struct(col(tsUsCol), col("__c"))).getField("__c").as("__fc"),
        max(col(tsUsCol)).as("last_time_us"),
        max(struct(col(tsUsCol), col("__c"))).getField("__c").as("__lc"),
        sum(when(col("__p").isNotNull && col("__c") < col("__p"), 1L)
          .otherwise(0L)).as("num_resets"),
        sum(delta).as("__inc"))
      .select(seriesCols.map(col) :+ col("n") :+
        col("first_time_us") :+ (col("__fc").cast("double") / 100.0).as("first_val") :+
        col("last_time_us") :+ (col("__lc").cast("double") / 100.0).as("last_val") :+
        col("num_resets") :+ (col("__inc").cast("double") / 100.0).as("increase") :+
        when(col("last_time_us") > col("first_time_us"),
          q6(col("__inc").cast("double") / 100.0
            / ((col("last_time_us") - col("first_time_us")).cast("double")
              / 1000000.0))).as("rate_q"): _*)
  }

  /** PromQL `irate`: instantaneous per-second rate from the LAST TWO
    * samples of each series, counter-reset aware (a drop contributes
    * the new value — the `increase` rule). The delta stays exact
    * integer cents over the exact µs gap; the rate is one mirrored
    * float expression. Same windowed tail-selection shape as [[idelta]]
    * — one per-series sort exchange. Series with < 2 samples or a
    * zero gap yield NULL rate.
    */
  def irate(df: DataFrame, tsUsCol: String, tiebreak: Column, valueCol: Column,
            groupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(tsUsCol), tiebreak)
    val n = Window.partitionBy(groupCols.map(col): _*)
    val delta = when(col("__c") >= col("__pc"), col("__c") - col("__pc"))
      .otherwise(col("__c"))
    df.withColumn("__c", round(valueCol * 100).cast("long"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(n))
      .withColumn("__pc", lag(col("__c"), 1).over(w))
      .withColumn("__pt", lag(col(tsUsCol), 1).over(w))
      .filter(col("__rn") === col("__cnt") && col("__cnt") >= 2)
      .select(groupCols.map(col) :+
        (delta.cast("double") / 100.0).as("idelta") :+
        (col(tsUsCol) - col("__pt")).as("dt_us") :+
        when(col(tsUsCol) - col("__pt") > 0,
          q6(delta.cast("double") / 100.0
            / ((col(tsUsCol) - col("__pt")).cast("double") / 1000000.0)))
          .as("irate_q"): _*)
  }

  /** `topk(v, k)` / `bottom(v, k)` selectors (selector_function/):
    * per-group rank-and-filter. rank() over a per-partition TopK sort —
    * AQE inserts partial limits; deterministic via tiebreak column.
    */
  def topk(df: DataFrame, valueCol: Column, tiebreak: Column, k: Int,
           groupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(valueCol.desc, tiebreak)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  def bottom(df: DataFrame, valueCol: Column, tiebreak: Column, k: Int,
             groupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(valueCol.asc, tiebreak)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  /** `state_agg`/`duration_in` — time spent in each state
    * (aggregate_function/state_agg/): interval to the next sample,
    * grouped by state; the series' last sample contributes nothing
    * (no successor bounds its state).
    */
  def durationIn(df: DataFrame, tsCol: Column, stateCol: Column,
                 seriesCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy(tsCol)
    df.withColumn("__next_ts", lead(tsCol, 1).over(w))
      .filter(col("__next_ts").isNotNull)
      .groupBy((seriesCols.map(col) :+ stateCol.as("state")): _*)
      .agg(sum(col("__next_ts").cast("double") - tsCol.cast("double")).as("duration_s"))
  }

  /** `state_at(t)` — the state in effect at time t (scalar_function/
    * state_at.rs): latest sample with ts <= t. Partial-aggregable
    * max-of-struct, no sort.
    */
  def stateAt(df: DataFrame, tsCol: Column, tiebreak: Column, stateCol: Column,
              at: Column, seriesCols: Seq[String]): DataFrame =
    df.filter(tsCol <= at)
      .groupBy(seriesCols.map(col): _*)
      .agg(max(struct(tsCol.as("ts"), tiebreak.as("tb"), stateCol.as("st")))
        .getField("st").as("state_at"))

  /** Last point per series — cnosdb's latest-data cache semantics
    * (data_tests/get_last_data.slt). At scale this is the classic
    * "latest snapshot" query: one partial-aggregable max-of-struct.
    */
  def lastPoint(df: DataFrame, tsCol: Column, tiebreak: Column,
                seriesCols: Seq[String], payload: Seq[String]): DataFrame =
    df.groupBy(seriesCols.map(col): _*)
      .agg(max(struct(tsCol.as("__ts"), tiebreak.as("__tb"),
        struct(payload.map(col): _*).as("__p"))).as("__m"))
      .select((seriesCols.map(col) :+ col("__m.__ts").as("last_ts")) ++
        payload.map(p => col(s"__m.__p.$p")): _*)

  /** Deterministic sample(n) — cnosdb `sample` (aggregate_function/
    * sample.rs) is a uniform reservoir; at 100 TB a reproducible sample
    * matters more than a fresh random one, so this orders by a hash of
    * the row key (uniform, seedable by salt) and keeps n. Returns all
    * rows when the input is smaller than n, like the reference.
    */
  def sample(df: DataFrame, keyCol: Column, n: Int, salt: String = ""): DataFrame =
    df.orderBy(md5(concat(keyCol.cast("string"), lit(salt)))).limit(n)

  /** Random reservoir sample(n) with the reference's uniform semantics
    * (aggregate_function/sample.rs): every row equally likely. Seeded
    * `rand(seed)` keeps it deterministic per seed; orderBy+limit
    * compiles to TakeOrdered (per-partition top-n, merge on driver), so
    * this is a single bounded pass — the distributed equivalent of a
    * reservoir. Returns all rows when the input is smaller than n.
    */
  def sampleReservoir(df: DataFrame, n: Int, seed: Long = 42L): DataFrame =
    df.orderBy(rand(seed)).limit(n)

  /** Backward as-of join: for every left row, the latest right row with
    * ts ≤ left.ts on the same key (DuckDB/pandas ASOF semantics; equal
    * timestamps match). Implemented as union + per-key window — ONE
    * shuffle on the key and a single ordered pass, never a per-row
    * range join (the naive formulation is |L|×|R| per key at 100 TB).
    * Rows from the right side sort before left rows at equal ts so the
    * match is inclusive. `toleranceSeconds` nulls out matches staler
    * than the horizon. Right rows should be unique per (key, ts) —
    * pre-aggregate otherwise, as match choice among equal-ts rows is
    * tie-broken arbitrarily.
    */
  def asofJoin(left: DataFrame, right: DataFrame, tsCol: String, keyCols: Seq[String],
               leftCols: Seq[String], rightCols: Seq[String],
               toleranceSeconds: Option[Long] = None): DataFrame = {
    val k = keyCols.map(col)
    val lt = left.select(k ++ Seq(col(tsCol).as("__ts"),
      struct(leftCols.map(col): _*).as("__lp"), lit(1).as("__src")): _*)
    val rt = right.select(k ++ Seq(col(tsCol).as("__ts"),
      struct(rightCols.map(col): _*).as("__rp"), lit(0).as("__src")): _*)
    val u = lt.unionByName(rt, allowMissingColumns = true)
    val w = Window.partitionBy(k: _*).orderBy(col("__ts"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withMatch = u.withColumn("__m",
      last(when(col("__src") === 0,
        struct(col("__ts").as("ts"), col("__rp").as("p"))), ignoreNulls = true).over(w))
    val bounded = toleranceSeconds match {
      case Some(tol) => when(
        col("__m").isNotNull &&
          col("__ts").cast("double") - col("__m.ts").cast("double") <= tol, col("__m"))
      case None => col("__m")
    }
    withMatch.filter(col("__src") === 1)
      .withColumn("__m", bounded)
      .select(k ++ Seq(col("__ts").as(tsCol)) ++
        leftCols.map(c => col(s"__lp.$c").as(c)) ++
        Seq(col("__m.ts").as("asof_ts")) ++
        rightCols.map(c => col(s"__m.p.$c").as(s"asof_$c")): _*)
  }

  /** Binned range join: left rows against right [start, end) intervals
    * (equi keys + containment). Spark would otherwise plan the ts ∈
    * [start, end) predicate as a nested-loop join — |L|×|R| per key.
    * Binning makes it an equijoin: left rows key on their time bin,
    * intervals explode to every bin they cover, the join matches on
    * (keys, bin) and the exact containment filter prunes bin-edge
    * false positives. Each left row lives in exactly one bin, so no
    * dedup is needed. Work is |L| + Σ interval-spans/bin — linear, one
    * shuffle. `maxBinsPerInterval` fail-fasts adversarially long
    * intervals (same guard pattern as gapfill).
    */
  def rangeJoinBinned(left: DataFrame, ltsCol: String, right: DataFrame,
                      startCol: String, endCol: String, equiKeys: Seq[String],
                      binSeconds: Long, maxBinsPerInterval: Long = 10000L): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    def bin(c: Column): Column = floor(c.cast("double") / binSeconds).cast("long")
    val lb = left.withColumn("__bin", bin(col(ltsCol)))
    val nBins = bin(col(endCol)) - bin(col(startCol)) + 1
    val guardedEnd = when(nBins > maxBinsPerInterval,
        raise_error(concat(
          lit("rangeJoinBinned: an interval covers "), nBins.cast("string"),
          lit(s" bins (> maxBinsPerInterval=$maxBinsPerInterval); widen binSeconds"))).cast("long"))
      .otherwise(bin(col(endCol)))
    val rb = right.withColumn("__bin", explode(sequence(bin(col(startCol)), guardedEnd)))
    lb.join(rb, equiKeys :+ "__bin")
      .filter(col(ltsCol) >= col(startCol) && col(ltsCol) < col(endCol))
      .drop("__bin")
  }

  /** time_window_gapfill + locf + interpolate (scalar_function/
    * {gapfill,locf,interpolate}.rs): dense per-group bucket spine from
    * the group's observed range, missing buckets carried forward (locf)
    * and/or linearly interpolated.
    *
    * Input: one row per (group, bucket) with a possibly-sparse value.
    * The spine is generated with sequence()+explode — bounded by the
    * group's own range — and joined back on the group key, so the only
    * shuffle is the original aggregation's.
    *
    * `maxBucketsPerGroup` is the densification guard (SURVEY §5): a
    * single series spanning years at 1-second buckets would explode an
    * unbounded row buffer in one task; past the cap the query fails
    * fast with the offending bucket count instead of OOMing an
    * executor. The guard is fused into the spine expression (not a
    * separate column) so column pruning can never drop it.
    */
  def gapfill(bucketed: DataFrame, groupCols: Seq[String], bucketCol: String,
              valueCol: String, bucketSeconds: Long,
              maxBucketsPerGroup: Long = 1000000L): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val g = groupCols.map(col)
    val nBuckets = (unix_timestamp(col("__hi")) - unix_timestamp(col("__lo")))
      ./(lit(bucketSeconds)) + 1
    val guardedHi = when(nBuckets > maxBucketsPerGroup,
        raise_error(concat(
          lit("gapfill: a group would densify to "), nBuckets.cast("string"),
          lit(s" buckets (> maxBucketsPerGroup=$maxBucketsPerGroup); widen the"),
          lit(" bucket or raise the cap"))).cast("timestamp"))
      .otherwise(col("__hi"))
    val spine = bucketed.groupBy(g: _*)
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
      .select(g :+ explode(sequence(col("__lo"), guardedHi,
        expr(s"INTERVAL $bucketSeconds SECOND"))).as(bucketCol): _*)
    val joined = spine.join(bucketed, groupCols :+ bucketCol, "left")
    val wAll = Window.partitionBy(g: _*).orderBy(col(bucketCol))
    val prevW = wAll.rowsBetween(Window.unboundedPreceding, 0)
    val nextW = wAll.rowsBetween(0, Window.unboundedFollowing)
    joined
      .withColumn("locf", last(col(valueCol), ignoreNulls = true).over(prevW))
      .withColumn("__pv", last(when(col(valueCol).isNotNull,
        struct(col(bucketCol).as("t"), col(valueCol).as("v"))), ignoreNulls = true).over(prevW))
      .withColumn("__nv", first(when(col(valueCol).isNotNull,
        struct(col(bucketCol).as("t"), col(valueCol).as("v"))), ignoreNulls = true).over(nextW))
      .withColumn("interpolated",
        when(col(valueCol).isNotNull, col(valueCol))
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv.v") + (col("__nv.v") - col("__pv.v")) *
              (col(bucketCol).cast("double") - col("__pv.t").cast("double")) /
              (col("__nv.t").cast("double") - col("__pv.t").cast("double")))
          .otherwise(lit(null)))
      .drop("__pv", "__nv")
  }

  /** Largest-Triangle-Three-Buckets index selection — the standard
    * visual downsampler (Steinarsson 2013; TimescaleDB toolkit ships it
    * as `lttb`): keeps first and last, then one point per bucket
    * maximizing the triangle area with the previously kept point and
    * the next bucket's centroid, preserving spikes a plain avg
    * downsample flattens. Pure scalar core, spec-pinned.
    */
  def lttbSelect(ts: Array[Long], vs: Array[Double], threshold: Int): Array[Int] = {
    val n = ts.length
    if (threshold >= n || threshold < 3) return Array.range(0, n)
    val out = new Array[Int](threshold)
    val every = (n - 2).toDouble / (threshold - 2)
    out(0) = 0
    var a = 0
    var i = 0
    while (i < threshold - 2) {
      val nextStart = math.floor((i + 1) * every).toInt + 1
      val nextEnd = math.min(math.floor((i + 2) * every).toInt + 1, n)
      var avgX = 0.0; var avgY = 0.0; var c = 0
      var j = nextStart
      while (j < nextEnd) { avgX += ts(j).toDouble; avgY += vs(j); c += 1; j += 1 }
      if (c == 0) { avgX = ts(n - 1).toDouble; avgY = vs(n - 1); c = 1 }
      avgX /= c; avgY /= c
      val start = math.floor(i * every).toInt + 1
      val end = math.min(math.floor((i + 1) * every).toInt + 1, n)
      var best = start
      var bestArea = -1.0
      j = start
      while (j < end) {
        val area = math.abs((ts(a).toDouble - avgX) * (vs(j) - vs(a)) -
          (ts(a).toDouble - ts(j).toDouble) * (avgY - vs(a))) / 2.0
        if (area > bestArea) { bestArea = area; best = j }
        j += 1
      }
      out(i + 1) = best
      a = best
      i += 1
    }
    out(threshold - 1) = n - 1
    out
  }

  private val lttbUdf = udf { (series: Seq[org.apache.spark.sql.Row], threshold: Int) =>
    SeriesGuard.check(series.length, "lttb")
    val ts = series.map(_.getLong(0)).toArray
    val vs = series.map(_.getDouble(1)).toArray
    lttbSelect(ts, vs, threshold).map(i => (ts(i), vs(i))).toSeq
  }

  /** Per-series LTTB downsample to ≤ `threshold` points. Same
    * whole-series shape as the repair operators: one shuffle on the
    * series key, collect_list per series, scalar pass, explode — a
    * series must fit an executor (millions of points; time-slice first
    * if longer).
    */
  /** Time-weighted average per series group — the TimescaleDB-toolkit
    * `time_weight('linear')`/`average` surface: the trapezoidal
    * integral of the value over the group's observed span, divided by
    * that span. Points count by how LONG they held, not how often they
    * were sampled — the right mean for irregularly-sampled gauges
    * (plain avg() over-weights densely-sampled intervals).
    *
    * 100 TB shape: ONE shuffle on the group key serves both the lead()
    * window and the final aggregation (same partitioning); the
    * aggregation is partial-aggregable. Engine-exact arithmetic:
    * timestamps are integer time units (ns or µs — any fixed unit; the
    * driver query uses µs, DuckDB's oracle-visible parquet precision),
    * values become exact integer cents,
    * each trapezoid is an exact integer product accumulated in
    * DECIMAL(38,0) (order-independent), and only the final ratio is
    * floated + floor-quantized. Single-point groups (zero span) emit
    * their value: the zero-width integral's limit.
    */
  def twa(df: DataFrame, groupCols: Seq[String], tsIntCol: String,
          valueCol: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(tsIntCol))
    val vc = round(col(valueCol) * 100).cast("long") // exact cents
    val contrib = when(lead(col(tsIntCol), 1).over(w).isNotNull,
      (lead(col(tsIntCol), 1).over(w) - col(tsIntCol)).cast("decimal(38,0)")
        * (vc + lead(vc, 1).over(w)).cast("decimal(38,0)"))
      .otherwise(lit(0).cast("decimal(38,0)"))
    df.withColumn("__tr", contrib)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (max(col(tsIntCol)) - min(col(tsIntCol))).as("span"),
        sum(col("__tr")).as("__integ2"),
        min(vc).as("__vc0"))
      .withColumn("twa",
        when(col("span") > 0,
          floor(col("__integ2").cast("double") / 2.0 / col("span").cast("double")
            / 100.0 * 1000000.0) / 1000000.0)
          .otherwise(floor(col("__vc0").cast("double") / 100.0 * 1000000.0) / 1000000.0))
      .drop("__integ2", "__vc0")
  }

  /** Equi-width histogram per series group (the TimescaleDB
    * `histogram(value, min, max, nbuckets)` aggregate surface, with the
    * bounds derived from the data): nbins equal buckets over the
    * group's [min, max], values at max clamped into the last bucket.
    * Two partial-aggregable passes (bounds, then counts) with the tiny
    * bounds table broadcast back — no sort, no window, no collect.
    * Bucket index arithmetic is the same IEEE double expression on both
    * engines (cents-exact inputs), so the assignment is deterministic.
    * Output: one row per (group, bin) with the bin's [lo, hi) bounds
    * floor-quantized; empty bins are emitted (count 0) via a sequence
    * explode on the bounds table so the shape is dense.
    */
  def histogramOf(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  nbins: Int = 10): DataFrame = {
    require(nbins >= 1, s"nbins must be >= 1, got $nbins")
    val gc = groupCols.map(col)
    val bounds = df.groupBy(gc: _*)
      .agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
    val binned = df.join(broadcast(bounds), groupCols)
      .withColumn("bin",
        when(col("__hi") === col("__lo"), lit(0)) // constant series → one bucket
          .otherwise(least(
            floor((col(valueCol) - col("__lo")) / (col("__hi") - col("__lo"))
              * nbins).cast("int"), lit(nbins - 1))))
      .groupBy((gc :+ col("bin")): _*)
      .agg(count(lit(1)).as("n"))
    val dense = bounds.select(gc :+ explode(sequence(lit(0), lit(nbins - 1))).as("bin")
      :+ col("__lo") :+ col("__hi"): _*)
    dense.join(binned, groupCols :+ "bin", "left")
      .select(gc ++ Seq(col("bin").cast("long").as("bin"),
        (floor((col("__lo") + (col("__hi") - col("__lo")) / nbins * col("bin"))
          * 1000000.0) / 1000000.0).as("bin_lo"),
        (floor((col("__lo") + (col("__hi") - col("__lo")) / nbins * (col("bin") + 1))
          * 1000000.0) / 1000000.0).as("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n")): _*)
  }

  def lttb(df: DataFrame, seriesCols: Seq[String], tsCol: Column, valueCol: Column,
           threshold: Int): DataFrame = {
    val g = seriesCols.map(col)
    df.groupBy(g: _*)
      .agg(sort_array(collect_list(struct(tsCol.cast("long").as("t"),
        valueCol.cast("double").as("v")))).as("__s"))
      .withColumn("__kept", explode(lttbUdf(col("__s"), lit(threshold))))
      .select(g :+ col("__kept._1").as("ts_us") :+ col("__kept._2").as("value"): _*)
  }

  /** OHLC candlestick per (series, bucket) — the TimescaleDB-toolkit
    * `candlestick_agg` surface (open/high/low/close + count + volume):
    * ONE partial-aggregated exchange, no window. Open/close are
    * `min_by`/`max_by` over a (time, rowId) struct so ties on the
    * timestamp break deterministically on the unique row id (the
    * toolkit's first/last have the same need; a bare min_by on a
    * duplicated timestamp is engine-order-dependent). The struct
    * ordering key makes Spark pick a sort-based aggregate buffer
    * (SortAggregate) — still map-side partial around a single shuffle,
    * which is the property that matters at 100 TB (plan-pinned in
    * ContractSpec). Volume sums exact integer cents and floats only
    * the final /100 — bit-identical across engines.
    */
  def candlestick(df: DataFrame, seriesCols: Seq[String], bucketCol: Column,
                  tieCols: Seq[String], valueCol: String): DataFrame = {
    val g = seriesCols.map(col)
    val ord = struct(tieCols.map(col): _*)
    val cents = round(col(valueCol) * 100).cast("long")
    df.withColumn("__c", cents).withColumn("__ord", ord)
      .groupBy(g :+ bucketCol.as("bucket"): _*)
      .agg(count(lit(1)).as("n"),
        min_by(col(valueCol), col("__ord")).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), col("__ord")).as("close"),
        (sum(col("__c")).cast("double") / 100.0).as("volume"))
  }

  /** Per-point z-score anomaly flags with ENGINE-EXACT flagging: the
    * |v − μ| > kσ test is algebraically cleared of divisions/square
    * roots — (v·n − S)² > k²·(n·Q − S²) over exact integer cents sums
    * in DECIMAL(38,0) — so the boolean can never flip on a float
    * boundary; the reported z itself is sqrt-based but floor-quantized
    * from identical operands. Two passes over the series: one partial-
    * aggregable (n, S, Q) rollup per group, broadcast back into the
    * scan (tiny — one row per series). No window sort.
    */
  def anomalyZscore(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    k: Int = 3): DataFrame = {
    val g = groupCols.map(col)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cents = round(col(valueCol) * 100).cast("long")
    val stats = df.withColumn("__c", cents)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("__n"), sum(dec(col("__c"))).as("__s"),
        sum(dec(col("__c")) * dec(col("__c"))).as("__q"))
    val joined = df.withColumn("__c", cents).join(broadcast(stats), groupCols)
    val num = dec(col("__c")) * dec(col("__n")) - col("__s") // v·n − S
    val varNum = dec(col("__n")) * col("__q") - col("__s") * col("__s") // n·Q − S²
    joined
      .withColumn("is_outlier",
        when(varNum > 0, num * num > lit(k * k) * varNum).otherwise(lit(false)))
      .withColumn("z",
        when(varNum > 0,
          floor(num.cast("double") / sqrt(varNum.cast("double")) * 1000000.0)
            / 1000000.0).otherwise(lit(0.0)))
      .drop("__c", "__n", "__s", "__q")
  }

  /** M4 visual downsampling — the error-free alternative to LTTB
    * (Jugel et al., VLDB'14): per (series, pixel bucket) keep the
    * first, last, min-value and max-value POINTS (≤ 4 rows per
    * bucket), which provably preserves the rendered line at the
    * target pixel width. All four selectors are min_by/max_by over
    * fully-ordered (value, ts, rowId) structs, so duplicated
    * timestamps/values select deterministically. ONE partial-
    * aggregated exchange (sort-based buffer, same note as
    * [[candlestick]]) + a ≤4-element explode — no window, and unlike
    * LTTB no sequential whole-series pass, so it parallelizes at any
    * series length.
    */
  def m4(df: DataFrame, seriesCols: Seq[String], bucketCol: Column,
         tsCol: String, rowIdCol: String, valueCol: String): DataFrame = {
    val g = seriesCols.map(col)
    val p = struct(col(tsCol), col(rowIdCol), col(valueCol))
    val tOrd = struct(col(tsCol), col(rowIdCol))
    val vOrd = struct(col(valueCol), col(tsCol), col(rowIdCol))
    df.groupBy(g :+ bucketCol.as("bucket"): _*)
      .agg(min_by(p, tOrd).as("__pf"), max_by(p, tOrd).as("__pl"),
        min_by(p, vOrd).as("__pmin"), max_by(p, vOrd).as("__pmax"))
      .select(g ++ Seq(col("bucket"),
        explode(array_distinct(array(col("__pf"), col("__pmin"),
          col("__pmax"), col("__pl")))).as("__p")): _*)
      .select(g ++ Seq(col("bucket"), col(s"__p.$tsCol").as(tsCol),
        col(s"__p.$rowIdCol").as(rowIdCol), col(s"__p.$valueCol").as(valueCol)): _*)
  }

  /** Lag-k autocorrelation per series (the seasonality probe of every
    * TS toolbox), with the estimator cleared to exact integer sums so
    * both engines agree bit-for-bit: with cents v, S=Σv, Q=Σv², and
    * over the n−k lagged pairs P=Σv_i·v_{i+k}, A=Σv_i, B=Σv_{i+k},
    *   acf·n²·(nQ−S²)/n = n²P − nS(A+B) + (n−k)S²   (numerator)
    *   denominator       = n(nQ − S²)
    * — every term a DECIMAL(38,0) integer; only the final ratio floats
    * (floor-quantized). One sort shuffle on the series key feeds the
    * lead() window AND the aggregate (same partitioning); degenerate
    * series (n ≤ k, zero variance) emit NULL.
    */
  def acf(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
          valueCol: String, lag: Int): DataFrame = {
    val g = groupCols.map(col)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val w = Window.partitionBy(g: _*).orderBy(orderCols.map(col): _*)
    val cents = round(col(valueCol) * 100).cast("long")
    val agg = df.withColumn("__c", cents)
      .withColumn("__cl", lead(col("__c"), lag).over(w))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(dec(col("__c"))).as("s"),
        sum(dec(col("__c")) * dec(col("__c"))).as("q"),
        sum(when(col("__cl").isNotNull, dec(col("__c")) * dec(col("__cl")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("p"),
        sum(when(col("__cl").isNotNull, dec(col("__c")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("a"),
        sum(when(col("__cl").isNotNull, dec(col("__cl")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("b"))
    val n = dec(col("n"))
    val num = n * n * col("p") - n * col("s") * (col("a") + col("b")) +
      (n - lit(lag)) * col("s") * col("s")
    val den = n * (n * col("q") - col("s") * col("s"))
    agg.select(g ++ Seq(col("n"),
      when(col("n") > lag && den > 0,
        floor(num.cast("double") / den.cast("double") * 1000000.0) / 1000000.0)
        .as(s"acf_$lag")): _*)
  }

  /** CUSUM change-point screening per series: flags points where the
    * cumulative deviation from the series mean exceeds k standard
    * deviations under the Brownian-bridge scaling — the classic
    * mean-shift detector. The test is cleared to exact integers (with
    * prefix P_i of cents, D = n·P_i − i·S):
    *   flag_i ⇔ D² · n > k² · i·(n−i) · (nQ − S²)
    * so the boolean can never flip on a float boundary; the reported
    * standardized statistic floats from the same exact operands and is
    * floor-quantized. One sort shuffle per series (prefix sum + row
    * number share the window), stats broadcast back. D²·n stays inside
    * DECIMAL(38,0) for series up to ~10⁷ cents-scale points — bucket
    * longer series first (the detector is about the shape, not the
    * sampling rate).
    */
  def cusum(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
            valueCol: String, k: Int = 3): DataFrame = {
    val g = groupCols.map(col)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cents = round(col(valueCol) * 100).cast("long")
    val w = Window.partitionBy(g: _*).orderBy(orderCols.map(col): _*)
    val stats = df.withColumn("__c", cents)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("__n"), sum(dec(col("__c"))).as("__s"),
        sum(dec(col("__c")) * dec(col("__c"))).as("__q"))
    val withPrefix = df.withColumn("__c", cents)
      .withColumn("__p", sum(cents).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__i", row_number().over(w).cast("long"))
      .join(broadcast(stats), groupCols)
    val n = dec(col("__n"))
    val d = n * dec(col("__p")) - dec(col("__i")) * col("__s")
    val varNum = n * col("__q") - col("__s") * col("__s")
    val bridge = dec(col("__i")) * (n - dec(col("__i"))) * varNum
    withPrefix
      .withColumn("is_shift",
        when(bridge > 0, d * d * n > lit(k.toLong * k) * bridge).otherwise(lit(false)))
      .withColumn("cusum_z",
        when(bridge > 0,
          floor(d.cast("double") / sqrt(bridge.cast("double") / col("__n").cast("double"))
            * 1000000.0) / 1000000.0).otherwise(lit(0.0)))
      .drop("__c", "__p", "__i", "__n", "__s", "__q")
  }

  /** Centered moving average per series — exact integer cents summed
    * over a ROWS frame (±`halfWindow` rows around each point, ordered
    * by a unique (time, rowId) key so the frame contents are
    * deterministic), floated + floor-quantized only at the end. One
    * sort shuffle on the series key — the standard window shape.
    */
  def movingAverage(df: DataFrame, seriesCols: Seq[String], orderCols: Seq[String],
                    valueCol: String, halfWindow: Int = 3): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-halfWindow, halfWindow)
    val cents = round(col(valueCol) * 100).cast("long")
    df.withColumn("__c", cents)
      .withColumn("ma",
        floor(sum(col("__c")).over(w).cast("double") / count(lit(1)).over(w)
          / 100.0 * 1000000.0) / 1000000.0)
      .drop("__c")
  }

  /** Bollinger bands per series over a trailing ROWS frame (`lookback`
    * preceding rows + current): mid = frame mean, upper/lower = mid ±
    * k·σ(population). The volatility-envelope surface TA stacks and
    * metric dashboards share. Engine-stable by construction: the frame
    * accumulates exact integer cents (S = Σc, Q = Σc²; n·Q − S² ≥ 0),
    * and each band is ONE mirrored float expression over those exact
    * integers — (S ± k·√(nQ−S²))/n — so the DuckDB oracle reproduces
    * every band bit-for-bit. One sort shuffle per series serves all
    * three window sums; at 100 TB the frame never leaves its partition
    * (ROWS frames are computed inside the sorted run, no extra
    * exchange).
    */
  def bollingerBands(df: DataFrame, seriesCols: Seq[String], orderCols: Seq[String],
                     valueCol: String, lookback: Int = 19, k: Int = 2): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-lookback, 0)
    val cents = round(col(valueCol) * 100).cast("long")
    def q6(c: Column): Column = floor(c / 100.0 * 1000000.0) / 1000000.0
    df.withColumn("__c", cents)
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(col("__c")).over(w))
      .withColumn("__q", sum(col("__c") * col("__c")).over(w))
      // √(nQ−S²) of exact integers: deterministic IEEE on both engines
      .withColumn("__sd",
        sqrt((col("__n") * col("__q") - col("__s") * col("__s")).cast("double")))
      .withColumn("mid", q6(col("__s").cast("double") / col("__n")))
      .withColumn("upper", q6((col("__s") + lit(k) * col("__sd")) / col("__n")))
      .withColumn("lower", q6((col("__s") - lit(k) * col("__sd")) / col("__n")))
      .drop("__c", "__n", "__s", "__q", "__sd")
  }

  /** PromQL `histogram_quantile(q, ...)` read-off over le-bucketed
    * cumulative counts — the Prometheus histogram surface: per (series,
    * day), counts accumulate into fixed le thresholds (cents), the
    * target bucket is the first whose cumulative count covers rank q·n,
    * and the quantile interpolates linearly inside that bucket. One
    * partial-aggregable pass: each cumulative bucket count is a
    * conditional sum (c ≤ le), so the whole histogram is ONE hash
    * aggregate with map-side combine — no explode, no window; at 100 TB
    * only (series, day, 8 longs) partials shuffle. Bucket choice is an
    * exact integer comparison (100·cum ≥ q100·n) and the interpolation
    * is one mirrored float expression over exact integers, so the lane
    * hash-checks.
    */
  def histogramQuantile(df: DataFrame, seriesCols: Seq[String], bucket: Column,
                        valueCol: String, les: Seq[Long], q100: Int): DataFrame = {
    require(les.nonEmpty && les == les.sorted, s"le thresholds must be ascending: $les")
    val cents = round(col(valueCol) * 100).cast("long")
    val bucketCols = les.zipWithIndex.map { case (le, i) =>
      sum(when(cents <= le, 1L).otherwise(0L)).as(s"cum_$i")
    }
    val aggd = df.groupBy(seriesCols.map(col) :+ bucket.as("bucket"): _*)
      .agg(bucketCols.head, bucketCols.tail :+ count(lit(1)).as("n"): _*)
    // First bucket with 100·cum ≥ q100·n; rows above the last le (none
    // with these thresholds ≥ max) would fall through to the last
    // bucket, PromQL's +Inf→highest-finite-upper rule.
    val target = lit(q100) * col("n")
    val chosen = les.indices.foldRight(
      struct(lit(les.last).as("lo"), lit(les.last).as("hi"),
        col(s"cum_${les.size - 1}").as("cp"), lit(1L).as("cb"))) { (i, elseCol) =>
      val cumPrev = if (i == 0) lit(0L) else col(s"cum_${i - 1}")
      val lo = if (i == 0) lit(0L) else lit(les(i - 1))
      when(col(s"cum_$i") * 100 >= target,
        struct(lo.as("lo"), lit(les(i)).as("hi"), cumPrev.as("cp"),
          (col(s"cum_$i") - cumPrev).as("cb"))).otherwise(elseCol)
    }
    aggd.withColumn("__b", chosen)
      .withColumn("quantile",
        floor((col("__b.lo") * lit(1.0)
          + (col("__b.hi") - col("__b.lo")) * (target - lit(100L) * col("__b.cp"))
            / (lit(100.0) * col("__b.cb")))
          / 100.0 * 1000000.0) / 1000000.0)
      .select(seriesCols.map(col) :+ col("bucket") :+ col("n") :+ col("quantile"): _*)
  }

  /** Mergeable quantile-sketch rollup — the TimescaleDB-toolkit
    * `percentile_agg`/UddSketch surface made engine-exact: hour-level
    * (series, bin) counts MERGE into day level without rescanning raw
    * rows (the same two-level shape as the HLL sketch rollup), and
    * p50/p95 come off the merged bins as the first bin whose cumulative
    * count reaches the exact integer rank. Bin id = digits·100 +
    * two-leading-digits of the cent value — monotone in value, ≤ 90
    * bins per decade (≲5% relative error), and every step is integer
    * arithmetic both engines reproduce bit-for-bit (no log()). At
    * 100 TB only (series, day, bin) partial rows shuffle; the raw scan
    * is touched once at hour level. Requires non-negative values
    * (c = 0 bins naturally: digits("0")=1, prefix 0 → bid 100, below
    * every positive bid) — a negative row raises rather than silently
    * mis-binning (its digit string would start with '-').
    */
  def quantileRollup(df: DataFrame, seriesCols: Seq[String], tsCol: String,
                     valueCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    val base = df
      .withColumn("__c", when(cents >= 0, cents).otherwise(expr(
        "CAST(raise_error('quantileRollup: needs non-negative values; " +
          "shift or split the series') AS BIGINT)")))
      .withColumn("__d", length(col("__c").cast("string")).cast("long"))
      .withColumn("__div",
        pow(lit(10.0), greatest(col("__d") - 2, lit(0L)).cast("double")).cast("long"))
      .withColumn("__bid", col("__d") * 100 + expr("__c div __div"))
      .withColumn("hour_us", unix_micros(date_trunc("hour", col(tsCol))))
      .withColumn("day_us", unix_micros(date_trunc("day", col(tsCol))))
    val hourly = base
      .groupBy((seriesCols.map(col) :+ col("day_us") :+ col("hour_us") :+ col("__bid")): _*)
      .agg(count(lit(1)).as("hn"))
    val daily = hourly
      .groupBy((seriesCols.map(col) :+ col("day_us") :+ col("__bid")): _*)
      .agg(sum(col("hn")).as("bn"))
    val part = Window.partitionBy((seriesCols.map(col) :+ col("day_us")): _*)
    val cum = daily
      .withColumn("cum", sum(col("bn")).over(part.orderBy(col("__bid"))))
      .withColumn("__n", sum(col("bn")).over(part))
    cum.groupBy((seriesCols.map(col) :+ col("day_us")): _*)
      .agg(
        min(col("__n")).as("n"),
        min(when(col("cum") >= expr("(__n + 1) div 2"), col("__bid"))).as("p50_bid"),
        min(when(col("cum") >= expr("(__n * 19 + 19) div 20"), col("__bid"))).as("p95_bid"))
      .withColumn("p50_lo_cents", expr(
        "(p50_bid % 100) * CAST(pow(10, greatest(p50_bid div 100 - 2, 0)) AS BIGINT)"))
      .withColumn("p95_lo_cents", expr(
        "(p95_bid % 100) * CAST(pow(10, greatest(p95_bid div 100 - 2, 0)) AS BIGINT)"))
  }

  /** PromQL `resets`/`changes` counter inspection per series: resets =
    * adjacent drops (vₜ < vₜ₋₁), changes = adjacent inequalities —
    * compared on exact integer cents so no float-equality boundary can
    * flip a count. One lag window + one partial-aggregable count; the
    * standard per-series shuffle shape.
    */
  def resetsChanges(df: DataFrame, seriesCols: Seq[String], orderCols: Seq[String],
                    valueCol: String): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__c", round(col(valueCol) * 100).cast("long"))
      .withColumn("__p", lag(col("__c"), 1).over(w))
      .groupBy(seriesCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__p").isNotNull && col("__c") < col("__p"), 1L)
          .otherwise(0L)).as("resets"),
        sum(when(col("__p").isNotNull && col("__c") =!= col("__p"), 1L)
          .otherwise(0L)).as("changes"))
  }

  /** Per-series Holt DOUBLE exponential smoothing (level + trend,
    * α=β=1/4 — the TimescaleDB-toolkit/PromQL `holt_winters` surface
    * without seasonality): every step floor-quantizes to integer
    * cents, so the two-variable recursion
    * lₜ=(cₜ+3(lₜ₋₁+bₜ₋₁)) quot 4, bₜ=(lₜ−lₜ₋₁+3bₜ₋₁) quot 4 (seeds
    * l₁=c₁, b₁=0) is deterministic and a recursive CTE replays it
    * exactly. Quantization is TRUNCATING division (Java `/`), not
    * floorDiv: the trend goes negative and DuckDB's `//` truncates
    * toward zero on negatives — the two engines must round the same
    * way. `forecast_q` =
    * lₜ+bₜ is the one-step-ahead prediction. Whole-series sequential
    * algorithm → the Repair shape: collect_list per bounded series,
    * one scalar pass, explode back out.
    */
  private val holtUdf = udf { series: Seq[Row] =>
    SeriesGuard.check(series.length, "holt_smooth")
    val n = series.length
    val out = new Array[(Long, Long)](n)
    var l = 0L
    var b = 0L
    var i = 0
    while (i < n) {
      val c = series(i).getLong(2)
      if (i == 0) { l = c; b = 0L }
      else {
        val lNew = (c + 3L * (l + b)) / 4L
        b = (lNew - l + 3L * b) / 4L
        l = lNew
      }
      out(i) = (l, b)
      i += 1
    }
    out.toSeq
  }

  def holtSmooth(df: DataFrame, seriesCols: Seq[String], tsUsCol: String,
                 idCol: String, valueCol: String): DataFrame =
    df.withColumn("__c", round(col(valueCol) * 100).cast("long"))
      .groupBy(seriesCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col(tsUsCol).cast("long").as("t"),
        col(idCol).cast("long").as("id"), col("__c").as("c")))).as("__s"))
      .withColumn("__h", holtUdf(col("__s")))
      .select(seriesCols.map(col) :+
        posexplode(arrays_zip(col("__s"), col("__h"))).as(Seq("__i", "__z")): _*)
      .select(seriesCols.map(col) ++ Seq(
        col("__z.__s.id").as(idCol),
        col("__z.__h._1").as("level_q"),
        col("__z.__h._2").as("trend_q")): _*)
      .withColumn("forecast_q", col("level_q") + col("trend_q"))

  /** Truncated exponential moving average (EWMA, decay 3/4 over the
    * last `depth` samples) per series — the PromQL/TimescaleDB
    * smoothing surface with the tail truncated so the operator is a
    * fixed lag window, not a sequential scan: integer weights
    * wᵢ = 3ⁱ·4^(depth−1−i) (geometric ratio 3/4) renormalize over the
    * lags that exist at the series head. Numerator and denominator are
    * exact integers (cents × integer weights); the value floats in ONE
    * mirrored expression (num/den/100·1e6, floored), so both engines
    * see identical IEEE operands and the output is bit-stable. One sort
    * shuffle on the series key — the same shape as any lag window at
    * 100 TB, no per-series state.
    */
  def ewma(df: DataFrame, seriesCols: Seq[String], orderCols: Seq[String],
           valueCol: String, depth: Int = 4): DataFrame = {
    require(depth >= 1 && depth <= 16, s"ewma depth must be in [1,16], got $depth")
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val weights = (0 until depth).map(i =>
      math.pow(3, i).toLong * math.pow(4, depth - 1 - i).toLong)
    val terms = (0 until depth).map { i =>
      val lv = if (i == 0) col("__c") else lag(col("__c"), i).over(w)
      (when(lv.isNotNull, lit(weights(i))).otherwise(lit(0L)),
        when(lv.isNotNull, lv * weights(i)).otherwise(lit(0L)))
    }
    val num = terms.map(_._2).reduce(_ + _)
    val den = terms.map(_._1).reduce(_ + _)
    df.withColumn("__c", round(col(valueCol) * 100).cast("long"))
      .withColumn("ewma",
        floor(num.cast("double") / den.cast("double") / 100.0 * 1000000.0) / 1000000.0)
      .drop("__c")
  }

  /** Per-series least-squares linear trend — the `stats_agg` 2-D
    * regression surface (slope / intercept / r² / n) with ENGINE-EXACT
    * accumulation: x (integer time units) and y (exact integer cents)
    * are summed as DECIMAL(38,0) — order-independent, no double
    * accumulation drift — and only the final closed-form arithmetic
    * floats, in one fixed expression shape both engines evaluate
    * identically (IEEE ops on identical operands are bit-exact), then
    * floor-quantized. One partial-aggregable hash aggregate; at 100 TB
    * this is the same shape as any sum/count rollup.
    *
    * `xCol` should be pre-shifted near zero (e.g. seconds since the
    * corpus epoch): the closed form subtracts big near-equal products,
    * so keeping x small preserves significance in the double stage.
    * Degenerate groups (single point, constant x) emit NULL slope; a
    * constant-y group has zero variance and emits NULL r².
    */
  def linearTrend(df: DataFrame, groupCols: Seq[String], xCol: Column,
                  yCol: Column): DataFrame = {
    val (agg, g) = trendCore(df, groupCols, xCol, yCol)
    val (vx, vy, cxy) = trendMoments
    agg.select(g ++ Seq(col("n"),
      when(vx > 0, q6(cxy / vx / 100.0)).as("slope"),
      when(vx > 0, q6((col("sy").cast("double") / col("n").cast("double")
        - (cxy / vx) * (col("sx").cast("double") / col("n").cast("double"))) / 100.0))
        .as("intercept"),
      when(vx > 0 && vy > 0, q6(cxy * cxy / (vx * vy))).as("r2")): _*)
  }

  /** PromQL `predict_linear` / stats_agg forecast surface: each series'
    * least-squares line evaluated `horizon` x-units past its last
    * sample. The extrapolation is computed FROM the same 1e-6-floored
    * slope/intercept [[linearTrend]] publishes — one shared double
    * expression over identical operands, so any engine replaying the
    * floored values reproduces the prediction bit-for-bit. max(x) rides
    * the same single partial-aggregable pass (no second scan).
    */
  def predictLinear(df: DataFrame, groupCols: Seq[String], xCol: Column,
                    yCol: Column, horizon: Long): DataFrame = {
    val (agg, g) = trendCore(df, groupCols, xCol, yCol)
    val (vx, _, cxy) = trendMoments
    val quantified = agg.select(g ++ Seq(col("n"), col("mx"),
      when(vx > 0, q6(cxy / vx / 100.0)).as("slope"),
      when(vx > 0, q6((col("sy").cast("double") / col("n").cast("double")
        - (cxy / vx) * (col("sx").cast("double") / col("n").cast("double"))) / 100.0))
        .as("intercept")): _*)
    quantified.select(g ++ Seq(col("n"), col("slope"), col("intercept"),
      (col("mx") + lit(horizon)).as("x_pred"),
      when(col("slope").isNotNull,
        q6(col("intercept") + col("slope") * (col("mx") + lit(horizon)).cast("double")))
        .as("predicted")): _*)
  }

  /** TimescaleDB-toolkit `heartbeat_agg` liveness surface: each
    * heartbeat asserts its series is live for the next `livenessUs`
    * microseconds; overlapping assertions merge into covered intervals
    * (the reference's stream-table health view computes the same
    * covered-time rollup over ingest heartbeats). Per series:
    * heartbeat count, merged live-interval count, total live µs
    * (exact integer: Σ min(nextₜ−tₜ, L) over interior points + L for
    * the last), gap count and total dead µs inside [first, last].
    *
    * 100 TB shape: ONE sort shuffle on the series key serves both the
    * lead() window and the aggregate; all arithmetic is exact integer
    * µs so the result is engine-stable. Duplicate timestamps are safe:
    * adjacent gaps of a sorted multiset don't depend on the order of
    * equal keys (ties contribute gap 0).
    */
  def heartbeatAgg(df: DataFrame, seriesCols: Seq[String], tsUsCol: String,
                   livenessUs: Long): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy(col(tsUsCol))
    val L = lit(livenessUs)
    df.withColumn("__gap", lead(col(tsUsCol), 1).over(w) - col(tsUsCol))
      .groupBy(seriesCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_heartbeats"),
        (sum(when(col("__gap") > L, 1L).otherwise(0L)) + lit(1L)).as("n_intervals"),
        (sum(when(col("__gap").isNotNull, least(col("__gap"), L)).otherwise(0L)) + L)
          .as("live_us"),
        sum(when(col("__gap") > L, col("__gap") - L).otherwise(0L)).as("dead_us"))
      .withColumn("n_gaps", col("n_intervals") - lit(1L))
  }

  /** PromQL-style bucketed counter rate: reset-aware adjacent deltas
    * (the `increase` rule: a drop contributes the new value) summed per
    * (series, time bucket), each delta attributed to its CURRENT
    * sample's bucket, plus the per-second rate. Deltas stay exact
    * integer cents; the rate is one mirrored float expression.
    * Completes the PromQL counter family: `increase` (whole series),
    * `resets`/`changes` (inspection), `rate` (bucketed).
    *
    * 100 TB shape: the standard per-series sort shuffle serves the lag
    * window AND the (series, bucket) aggregate (bucket derives from ts
    * map-side) — one exchange, partial-aggregable on top.
    */
  def rateBucketed(df: DataFrame, seriesCols: Seq[String], orderCols: Seq[String],
                   tsUsCol: String, valueCol: String, bucketUs: Long): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__c", round(col(valueCol) * 100).cast("long"))
      .withColumn("__p", lag(col("__c"), 1).over(w))
      .withColumn("__d", when(col("__p").isNull, lit(null).cast("long"))
        .when(col("__c") >= col("__p"), col("__c") - col("__p"))
        .otherwise(col("__c")))
      .withColumn("bucket_us", expr(s"($tsUsCol div $bucketUs) * $bucketUs"))
      .groupBy(seriesCols.map(col) :+ col("bucket_us"): _*)
      .agg(count(lit(1)).as("n"),
        (sum(col("__d")).cast("double") / 100.0).as("inc"),
        q6(sum(col("__d")).cast("double") / 100.0 / lit(bucketUs / 1000000.0))
          .as("rate_q"))
  }

  /** SAX symbolization (Lin et al. 2003 Symbolic Aggregate
    * approXimation, the time-series indexing/motif sketch): each series
    * is piecewise-aggregate-approximated over fixed time buckets, the
    * per-bucket means binned into `nsym` equi-width symbols over the
    * series' own [min, max], and the symbols concatenated in bucket
    * order into one word per series. Classic SAX z-normalizes with
    * Gaussian breakpoints; the equi-width variant keeps EVERY step in
    * exact integer arithmetic (truncating div on nonnegative operands ≡
    * floor, mirrored by DuckDB's `//`), so the whole word hash-checks.
    *
    * 100 TB shape: one partial-aggregable (series, bucket) rollup →
    * tiny per-series stats broadcast back → one word-assembly aggregate
    * keyed on series. Bucket count bounds word length; no corpus sort.
    */
  def sax(df: DataFrame, seriesCols: Seq[String], tsUsCol: String,
          valueCol: String, bucketUs: Long, nsym: Int = 4): DataFrame = {
    val g = seriesCols.map(col)
    val paa = df
      .withColumn("__b", expr(s"$tsUsCol div $bucketUs"))
      .withColumn("__c", round(col(valueCol) * 100).cast("long"))
      .groupBy(g :+ col("__b"): _*)
      .agg(sum(col("__c")).as("__sc"), count(lit(1)).as("__n"))
      .withColumn("__paa", expr("__sc div __n"))
    val stats = paa.groupBy(g: _*)
      .agg(min(col("__paa")).as("__mn"), max(col("__paa")).as("__mx"))
    paa.join(broadcast(stats), seriesCols)
      .withColumn("__sym", expr(s"((__paa - __mn) * $nsym) div (__mx - __mn + 1)"))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_buckets"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("__b"), expr("char(97 + __sym)").as("__ch")))),
          x => x("__ch"))).as("sax_word"))
  }

  /** Seasonal-naive decomposition by hour-of-day (the STL-lite surface
    * behind "is this spike load or just 9am?"): per point, seasonal =
    * its (series, hour-of-day) mean minus the series mean, residual =
    * value minus the hour-of-day mean. Both quantities stay exact
    * integer-cents cross-products (DECIMAL(38,0) — no overflow at 100 TB
    * row counts) until ONE mirrored float expression, so the oracle
    * reproduces them bit-for-bit.
    *
    * 100 TB shape: two partial-aggregable rollups (per (series, hod) —
    * ≤ 24× series rows — and per series), both BROADCAST back into the
    * scan; no window, no corpus shuffle beyond the two tiny aggregates.
    */
  def seasonalDecompose(df: DataFrame, seriesCols: Seq[String], tsCol: String,
                        valueCol: String): DataFrame = {
    val g = seriesCols.map(col)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val withH = df.withColumn("__hod", hour(col(tsCol)).cast("long"))
      .withColumn("__c", round(col(valueCol) * 100).cast("long"))
    val byHod = withH.groupBy(g :+ col("__hod"): _*)
      .agg(count(lit(1)).as("__nh"), sum(dec(col("__c"))).as("__sh"))
    val bySeries = withH.groupBy(g: _*)
      .agg(count(lit(1)).as("__n"), sum(dec(col("__c"))).as("__s"))
    withH
      .join(broadcast(byHod), seriesCols :+ "__hod")
      .join(broadcast(bySeries), seriesCols)
      .withColumn("hod", col("__hod"))
      .withColumn("seasonal_q", q6(
        (dec(col("__sh")) * dec(col("__n")) - dec(col("__s")) * dec(col("__nh")))
          .cast("double")
          / (dec(col("__nh")) * dec(col("__n"))).cast("double") / 100.0))
      .withColumn("residual_q", q6(
        (dec(col("__c")) * dec(col("__nh")) - dec(col("__sh"))).cast("double")
          / col("__nh").cast("double") / 100.0))
      .drop("__hod", "__c", "__nh", "__sh", "__n", "__s")
  }

  private def q6(c: Column): Column = floor(c * lit(1000000.0)) / 1000000.0

  /** Shared exact-decimal regression sums (+ per-group max x). */
  private def trendCore(df: DataFrame, groupCols: Seq[String], xCol: Column,
                        yCol: Column): (DataFrame, Seq[Column]) = {
    val g = groupCols.map(col)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val x = xCol.cast("long")
    val y = round(yCol * 100).cast("long") // exact cents
    val agg = df
      .withColumn("__x", x).withColumn("__y", y)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(dec(col("__x"))).as("sx"), sum(dec(col("__y"))).as("sy"),
        sum(dec(col("__x")) * dec(col("__x"))).as("sxx"),
        sum(dec(col("__y")) * dec(col("__y"))).as("syy"),
        sum(dec(col("__x")) * dec(col("__y"))).as("sxy"),
        max(col("__x")).as("mx"))
    (agg, g)
  }

  /** (vx, vy, cxy) covariance/variance numerators over [[trendCore]]'s
    * columns; y stays in cents until the final division.
    */
  private def trendMoments: (Column, Column, Column) = {
    val (n, sx, sy, sxx, syy, sxy) =
      (col("n").cast("double"), col("sx").cast("double"), col("sy").cast("double"),
        col("sxx").cast("double"), col("syy").cast("double"), col("sxy").cast("double"))
    (n * sxx - sx * sx, n * syy - sy * sy, n * sxy - sx * sy)
  }
}
