package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming ingestion — cnosdb's stream tables / continuous
  * queries re-expressed (reference: the stream .slt suites and
  * query_server/query/src/stream).
  *
  * The transforms are written against plain DataFrames so the SAME
  * function runs in batch (driver correctness checks) and with
  * readStream (production): Spark's unified API replaces cnosdb's
  * separate stream-table machinery.
  */
object StreamIngest {

  /** Watermarked tumbling-window aggregation per key — the canonical
    * continuous ingest query (downsampling). Works on batch or
    * streaming frames alike.
    */
  def windowedStats(events: DataFrame, tsCol: String, keyCol: String,
                    window: String, watermark: String): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    wm.groupBy(org.apache.spark.sql.functions.window(col(tsCol), window).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"),
        round(avg("value"), 6).as("avg_value"))
      .select(col(keyCol), col("w.start").as("w_start"), col("n"),
        col("sum_value"), col("avg_value"))
  }

  /** File-source streaming reader over a parquet directory (the lake's
    * landing zone at scale; a single file locally via pathGlobFilter).
    */
  def readEventsStream(spark: SparkSession, dir: String, glob: String,
                       schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", glob)
      .parquet(dir)

  final case class LastPoint(user_id: Long, ts_us: Long, event_type: String, value: Double)

  /** Stateful latest-point cache per series — cnosdb's "last cache"
    * (get_last_data.slt) as mapGroupsWithState: state is one row per
    * key, updates are monotone max-by-time.
    */
  def streamingLastPoint(events: Dataset[LastPoint]): Dataset[LastPoint] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[LastPoint, LastPoint](GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[LastPoint]) =>
          val ord = Ordering[(Long, String)]
          val incoming = rows.maxBy(p => (p.ts_us, p.event_type))(ord)
          val best = state.getOption match {
            case Some(prev) if ord.gteq((prev.ts_us, prev.event_type),
              (incoming.ts_us, incoming.event_type)) => prev
            case _ => incoming
          }
          state.update(best)
          best
      }
  }

  /** Continuous ingest pipeline: stream → windowed stats → sink.
    * `memory` sink + processAllAvailable in tests; `parquet` +
    * checkpointLocation in production.
    */
  def startWindowedIngest(stream: DataFrame, tsCol: String, keyCol: String,
                          window: String, watermark: String,
                          queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    windowedStats(stream, tsCol, keyCol, window, watermark)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .start()
}
