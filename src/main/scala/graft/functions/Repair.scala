package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Time-series repair generators — cnosdb's ts_gen_func surface
  * (reference query_server/query/src/extension/expr/ts_gen_func/
  * data_repair/): `value_fill` (mean/previous/linear), `value_repair`
  * (SCREEN speed-constraint repair) and `timestamp_repair` (grid
  * realignment).
  *
  * Like data-quality these are whole-series algorithms: grouped
  * collect_list per series, scalar pass, explode back out. Series are
  * bounded (one device/tag's samples), so the per-group array is the
  * same memory shape the reference's accumulator builds.
  */
object Repair {

  /** value_fill(values, method): fill NaN/±Inf samples
    * (data_repair/value_fill.rs: mean, previous, linear, ar, ma).
    * Linear interpolates on *position* between finite neighbours and
    * clamps at the edges (leading NaNs take the first finite value,
    * trailing take the last), matching fill_linear. `ar` fits the
    * reference's AR(1) (NaN-as-zero autocorrelation estimate,
    * recursive fill from the previous repaired value). `ma` transcribes
    * the reference's windowed accumulator EXACTLY — including that it
    * never evicts the left edge, so past the warm-up the "window"
    * is a growing prefix mean; semantic parity beats a prettier
    * average here.
    */
  def fillSeries(values: Array[Double], method: String): Array[Double] = {
    val n = values.length
    val v = values.map(x => if (java.lang.Double.isFinite(x)) x else Double.NaN)
    val finite = v.filter(!_.isNaN)
    if (finite.isEmpty) return v
    method match {
      case "mean" =>
        val m = finite.sum / finite.length
        v.map(x => if (x.isNaN) m else x)
      case "previous" =>
        var last = Double.NaN
        v.map { x => if (!x.isNaN) last = x; last }
      case "linear" =>
        val out = new Array[Double](n)
        var prev = -1
        var i = 0
        while (i < n) {
          if (!v(i).isNaN) {
            val k = if (prev >= 0) (v(i) - v(prev)) / (i - prev) else 0.0
            var t = prev + 1
            while (t < i) { out(t) = v(i) + k * (t - i); t += 1 }
            out(i) = v(i)
            prev = i
          }
          i += 1
        }
        var t = math.max(prev, 0)
        while (t < n) { out(t) = v(prev); t += 1 }
        out
      case "ar" =>
        val mean = finite.sum / finite.length
        var acf = 0.0
        var factor = 0.0
        var i = 0
        while (i < n - 1) {
          val l = if (v(i).isNaN) 0.0 else v(i)
          val r = if (v(i + 1).isNaN) 0.0 else v(i + 1)
          acf += l * r
          factor += l * l
          i += 1
        }
        if (factor == 0.0)
          throw new IllegalArgumentException("Cannot fit AR(1) model. Please try another method.")
        val theta = acf / factor
        var meanEps = 0.0
        var cntEps = 0.0
        i = 0
        while (i < n - 1) {
          if (!v(i).isNaN && !v(i + 1).isNaN) {
            cntEps += 1
            meanEps += v(i + 1) - theta * v(i)
          }
          i += 1
        }
        if (cntEps == 0.0)
          throw new IllegalArgumentException("Cannot fit AR(1) model. Please try another method.")
        meanEps /= cntEps
        val out = new Array[Double](n)
        i = 0
        while (i < n) {
          out(i) =
            if (!v(i).isNaN) v(i)
            else if (i == 0) mean
            else theta * out(i - 1) + meanEps
          i += 1
        }
        out
      case "ma" =>
        val windowSize = 5
        var sum = 0.0
        var cnt = 0
        var r = windowSize - 1
        var i = 0
        while (i < math.min(r, n)) {
          if (!v(i).isNaN) { sum += v(i); cnt += 1 }
          i += 1
        }
        val out = new Array[Double](n)
        i = 0
        while (i < n) {
          out(i) = if (!v(i).isNaN) v(i) else sum / cnt
          if (!(i <= (windowSize - 1) / 2 || i >= n - (windowSize - 1) / 2 - 1)) {
            if (!v(r).isNaN) { sum += v(r); cnt += 1 }
            r += 1
          }
          i += 1
        }
        out
      case other => throw new IllegalArgumentException(s"Invalid fill method: $other")
    }
  }

  private def med(xs: Seq[Double]): Double = {
    val s = xs.sorted; val n = s.length
    if (n == 0) return Double.NaN
    if (n % 2 == 0) (s(n / 2 - 1) + s(n / 2)) / 2.0 else s(n / 2)
  }

  private def madOf(xs: Seq[Double]): Double = {
    val mid = med(xs)
    1.4826 * med(xs.map(x => math.abs(x - mid)))
  }

  /** value_repair SCREEN (data_repair/value_repair.rs:165-240): clamp
    * each sample into the speed band [smin, smax] derived from the
    * median/MAD of observed speeds, using the window median of
    * speed-projected candidates. NaNs are first linearly repaired on
    * time (process_nan).
    */
  def screen(times: Array[Long], values0: Array[Double],
             sminOpt: Option[Double] = None, smaxOpt: Option[Double] = None): Array[Double] = {
    val n = times.length
    if (n < 2) return values0.clone()
    val values = values0.map(x => if (java.lang.Double.isFinite(x)) x else Double.NaN)
    // linear NaN repair on time
    var i1 = 0
    while (i1 < n && values(i1).isNaN) i1 += 1
    if (i1 >= n) return values
    var i2 = i1 + 1
    while (i2 < n && values(i2).isNaN) i2 += 1
    if (i2 >= n) return values
    def interp(i: Int, a: Int, b: Int): Double =
      values(a) + (values(b) - values(a)) * ((times(i) - times(a)).toDouble / (times(b) - times(a)))
    var i = 0
    while (i < i2) { values(i) = interp(i, i1, i2); i += 1 }
    i = i2 + 1
    while (i < n) {
      if (!values(i).isNaN) {
        i1 = i2; i2 = i
        var j = i1 + 1
        while (j < i2) { values(j) = interp(j, i1, i2); j += 1 }
      }
      i += 1
    }
    i = i2 + 1
    while (i < n) { values(i) = interp(i, i1, i2); i += 1 }

    val intervals = Array.tabulate(n - 1)(k => (times(k + 1) - times(k)).toDouble)
    val w = 5L * med(intervals.toIndexedSeq).toLong
    val speeds = Array.tabulate(n - 1)(k =>
      (values(k + 1) - values(k)) / (times(k + 1) - times(k)))
    val sigma = madOf(speeds.toIndexedSeq)
    val mid = med(speeds.toIndexedSeq)
    val smin = sminOpt.getOrElse(mid - 3.0 * sigma)
    val smax = smaxOpt.getOrElse(mid + 3.0 * sigma)

    val ans = Array.tabulate(n)(k => (times(k), values(k)))
    def localRepair(start: Int): Unit = {
      // window median of candidates projected at smin/smax speeds
      var m = 0
      while (start + m + 1 < n && ans(start + m + 1)._1 <= ans(start)._1 + w) m += 1
      val x = new Array[Double](2 * m + 1)
      x(0) = ans(start)._2
      var k = 1
      while (k <= m) {
        x(k) = ans(start + k)._2 + smin * (ans(start)._1 - ans(start + k)._1)
        x(k + m) = ans(start + k)._2 + smax * (ans(start)._1 - ans(start + k)._1)
        k += 1
      }
      java.util.Arrays.sort(x)
      val median = x(m)
      if (start == 0) ans(start) = (ans(start)._1, median)
      else {
        val xmin = ans(start - 1)._2 + smin * (ans(start)._1 - ans(start - 1)._1)
        val xmax = ans(start - 1)._2 + smax * (ans(start)._1 - ans(start - 1)._1)
        ans(start) = (ans(start)._1, math.max(xmin, math.min(xmax, median)))
      }
    }
    var start = 0
    i = 1
    while (i < n) {
      while (ans(start)._1 + w < ans(i)._1) { localRepair(start); start += 1 }
      i += 1
    }
    while (start < n) { localRepair(start); start += 1 }
    ans.map(_._2)
  }

  /** Interval estimate with the reference's exact indexing quirk
    * (timestamp_repair.rs:320-332 `get_interval_median` indexes the
    * n−1 intervals with n/2 where n = |timestamps|).
    */
  private def intervalMedian(times: Array[Long]): Long = {
    val size = times.length
    val intervals = Array.tabulate(size - 1)(k => times(k + 1) - times(k))
    java.util.Arrays.sort(intervals)
    if (size % 2 == 0) (intervals(size / 2 - 1) + intervals(size / 2)) / 2
    else intervals(size / 2)
  }

  /** start_mode=mode (timestamp_repair.rs:199-226): the residue class
    * (t mod interval) most samples share, anchored at the last sample
    * in that class and walked back below the first timestamp. Count
    * ties break to the smaller residue for determinism (the reference
    * iterates a HashMap).
    */
  private def startMode(times: Array[Long], interval: Long): Long = {
    val counts = scala.collection.mutable.LongMap.empty[Int]
    val mods = times.map { t => val r = t % interval
      counts(r) = counts.getOrElse(r, 0) + 1; r }
    val bestMod = counts.toSeq.maxBy { case (k, c) => (c, -k) }._1
    var result = 0L
    var i = 0
    while (i < times.length) { if (mods(i) == bestMod) result = times(i); i += 1 }
    while (result > times.head) result -= interval
    result
  }

  /** timestamp_repair (data_repair/timestamp_repair.rs): realign samples
    * onto a regular grid `start + k*interval` (median interval, mode
    * start) via the reference's DP alignment (timestamp_repair.rs:
    * 121-188): edit distance over (grid slot, sample) with unit cost
    * |t − slot| for assignment and a large constant for insert (empty
    * slot → NaN) / remove (drop sample). O(grid·samples) per series —
    * series are bounded per group; past `maxDpCells` the greedy
    * nearest-slot assignment stands in so one pathological series can't
    * allocate an unbounded cost matrix.
    */
  def timestampRepair(times: Array[Long], values: Array[Double],
                      intervalOpt: Option[Long] = None,
                      maxDpCells: Long = 16L * 1024 * 1024): (Array[Long], Array[Double]) = {
    val m = times.length
    if (m <= 2) return (times.clone(), values.clone())
    val vals = values.map(v => if (java.lang.Double.isFinite(v)) v else Double.NaN)
    val interval = intervalOpt.getOrElse(intervalMedian(times)).max(1L)
    val start = startMode(times, interval)
    val gridN = (((times.last - start).toDouble / interval) + 1.0).ceil.toInt
    if (gridN.toLong * m > maxDpCells) greedyRepair(start, interval, gridN, times, vals)
    else dpRepair(start, interval, gridN, times, vals)
  }

  private def dpRepair(start: Long, interval: Long, gridN: Int,
                       times: Array[Long], vals: Array[Double]): (Array[Long], Array[Double]) = {
    val m = times.length
    val addCost = 100000000000L
    val W = m + 1
    val f = new Array[Long]((gridN + 1) * W)
    val steps = new Array[Byte]((gridN + 1) * W) // 0 assign, 1 insert, 2 remove
    var i = 0
    while (i <= gridN) { f(i * W) = addCost * i; steps(i * W) = 1; i += 1 }
    var j = 0
    while (j <= m) { f(j) = addCost * j; steps(j) = 2; j += 1 }
    i = 1
    while (i <= gridN) {
      val slot = start + interval * (i - 1)
      j = 1
      while (j <= m) {
        val idx = i * W + j
        if (times(j - 1) == slot) {
          f(idx) = f(idx - W - 1); steps(idx) = 0
        } else {
          if (f(idx - W) < f(idx - 1)) { f(idx) = f(idx - W) + addCost; steps(idx) = 1 }
          else { f(idx) = f(idx - 1) + addCost; steps(idx) = 2 }
          val assign = f(idx - W - 1) + math.abs(times(j - 1) - slot)
          if (assign < f(idx)) { f(idx) = assign; steps(idx) = 0 }
        }
        j += 1
      }
      i += 1
    }
    val outT = Array.tabulate(gridN)(k => start + k.toLong * interval)
    val outV = Array.fill(gridN)(Double.NaN) // un-backtracked slots stay empty
    i = gridN; j = m
    while (i >= 1 && j >= 1) {
      steps(i * W + j) match {
        case 0 => outV(i - 1) = vals(j - 1); i -= 1; j -= 1
        case 1 => i -= 1 // inserted slot: NaN already
        case _ => j -= 1 // removed sample
      }
    }
    (outT, outV)
  }

  /** Greedy nearest-slot fallback for series whose DP matrix would be
    * unreasonably large; same grid, last-sample-wins per slot.
    */
  private def greedyRepair(start: Long, interval: Long, gridN: Int,
                           times: Array[Long], vals: Array[Double]): (Array[Long], Array[Double]) = {
    val outT = Array.tabulate(gridN)(k => start + k.toLong * interval)
    val outV = Array.fill(gridN)(Double.NaN)
    var src = 0
    var g = 0
    while (g < gridN && src < times.length) {
      var best = -1
      while (src < times.length &&
        math.round((times(src) - start).toDouble / interval).toInt <= g) {
        best = src; src += 1
      }
      if (best >= 0) outV(g) = vals(best)
      g += 1
    }
    (outT, outV)
  }

  private val fillUdf = udf { (series: Seq[Row], method: String) =>
    SeriesGuard.check(series.length, "value_fill")
    val vs = series.map(_.getDouble(1)).toArray
    fillSeries(vs, method).toSeq
  }

  private val screenUdf = udf { series: Seq[Row] =>
    SeriesGuard.check(series.length, "value_repair")
    val ts = series.map(_.getLong(0)).toArray
    val vs = series.map(_.getDouble(1)).toArray
    screen(ts, vs).toSeq
  }

  /** DataFrame form of value_fill: one row per sample, `filled` column. */
  def valueFill(df: DataFrame, orderCol: Column, valueCol: Column,
                groupCols: Seq[String], method: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(orderCol.cast("long").as("t"),
        valueCol.cast("double").as("v")))).as("__s"))
      .withColumn("__filled", fillUdf(col("__s"), lit(method)))
      .select(groupCols.map(col) :+
        posexplode(arrays_zip(col("__s"), col("__filled"))).as(Seq("__i", "__z")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("__z.__s.t").as("t"), col("__z.__s.v").as("original"),
        col("__z.__filled").as("filled")): _*)

  private val tsRepairUdf = udf { series: Seq[Row] =>
    SeriesGuard.check(series.length, "timestamp_repair")
    val ts = series.map(_.getLong(0)).toArray
    val vs = series.map(_.getDouble(1)).toArray
    val (t2, v2) = timestampRepair(ts, vs)
    t2.zip(v2).toSeq
  }

  /** DataFrame form of timestamp_repair: regular-grid series per group. */
  def timestampRepairDf(df: DataFrame, orderCol: Column, valueCol: Column,
                        groupCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(orderCol.cast("long").as("t"),
        valueCol.cast("double").as("v")))).as("__s"))
      .withColumn("__r", explode(tsRepairUdf(col("__s"))))
      .select(groupCols.map(col) ++ Seq(
        col("__r._1").as("t"), col("__r._2").as("v")): _*)

  /** DataFrame form of value_repair (SCREEN). */
  def valueRepair(df: DataFrame, orderCol: Column, valueCol: Column,
                  groupCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(orderCol.cast("long").as("t"),
        valueCol.cast("double").as("v")))).as("__s"))
      .withColumn("__rep", screenUdf(col("__s")))
      .select(groupCols.map(col) :+
        posexplode(arrays_zip(col("__s"), col("__rep"))).as(Seq("__i", "__z")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("__z.__s.t").as("t"), col("__z.__s.v").as("original"),
        col("__z.__rep").as("repaired")): _*)
}
