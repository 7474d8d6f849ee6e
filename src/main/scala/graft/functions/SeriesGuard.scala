package graft.functions

/** Fail-fast cap for the whole-series sequential operators (Holt,
  * LTTB, value_fill/value_repair/timestamp_repair, data-quality
  * metrics). These algorithms are inherently sequential per series —
  * the reference runs them over one series' accumulator too
  * (query_server/query/src/extension/expr/ts_gen_func/mod.rs) — so the
  * Spark shape is collect_list per series key: one executor task holds
  * one series. That is the documented, correct shape for BOUNDED
  * series (one device/tag's samples); for a pathological key (a
  * 100 M-sample series at 100 TB) the task would OOM an executor with
  * an opaque heap dump. This guard turns that into a readable error
  * naming the knob, the same discipline as Dedup.maxBucketSize /
  * Similarity.maxBlockSize.
  *
  * The default (4M samples ≈ 100 MB of (t, v) structs in one task)
  * sits comfortably under a typical executor heap share;
  * SPARK_GRAFT_MAX_SERIES_LEN overrides it for deployments with
  * bigger executors or genuinely longer series. Fixed-window
  * alternatives that need no cap exist alongside (ewma, movingAvg,
  * windowed gapfill) — prefer them when series are unbounded.
  */
object SeriesGuard {
  val MaxSeriesLength: Int =
    sys.env.getOrElse("SPARK_GRAFT_MAX_SERIES_LEN", "4000000").toInt

  /** Test seam: local-mode UDFs share the JVM, so specs can lower the
    * cap to trip the guard on a 20-row fixture. Production path never
    * writes it.
    */
  @volatile private[graft] var capForTest: Int = MaxSeriesLength

  /** Called at the head of every whole-series UDF — evaluation there
    * is guaranteed (the UDF IS the operator), unlike a separate
    * assert column Catalyst could prune.
    */
  def check(n: Int, op: String): Unit =
    if (n > capForTest) throw new IllegalArgumentException(
      s"$op: series has $n samples, exceeding maxSeriesLength=" +
        s"$capForTest — this whole-series sequential operator " +
        "holds one series per executor task. Split the series key, " +
        "raise SPARK_GRAFT_MAX_SERIES_LEN, or use a fixed-window " +
        "alternative (ewma / movingAvg / windowed gapfill)")
}
