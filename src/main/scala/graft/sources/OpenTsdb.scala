package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OpenTSDB ingestion — cnosdb's second and third write formats
  * (reference: query_server/sqllogicaltests/cases/write/cli_precision
  * .slt `--#OPENTSDB_BEGIN` / `--#OPENTSDB_JSON_BEGIN` blocks;
  * opentsdb line handler in the server's write path):
  *
  *   telnet: `metric timestamp value tag1=v1 [tag2=v2 ...]`
  *           (the classic `put`-command body)
  *   json:   `[{"metric": m, "timestamp": t, "value": v,
  *             "tags": {k: v, ...}}, ...]`
  *
  * Timestamps pass through as raw integers — the reference resolves
  * their unit from the database's `precision` attribute, so the unit
  * is the CALLER's metadata, not something a parser should guess from
  * digit counts. Both parsers are pure mappers (telnet: one split
  * pass per line; json: Spark's codegen'd `from_json` + explode), so
  * the 100 TB shape is a scan-wide parse with no shuffle — the same
  * contract as [[LineProtocol]]: Dataset[String] in, typed rows out,
  * drops onto a Kafka `value` column unchanged.
  */
object OpenTsdb {

  final case class Point(metric: String, ts: Long, value: Double,
                         tags: Map[String, String])

  /** Parse one telnet-format line; None for blank/comment/malformed
    * rows (permissive-by-row, the LineProtocol dead-letter rationale).
    */
  def parseTelnetLine(line: String): Option[Point] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) return None
    // tolerate the explicit `put ` command prefix the telnet API uses
    val body = if (t.startsWith("put ")) t.substring(4) else t
    val parts = body.split("\\s+")
    if (parts.length < 3) return None
    val metric = parts(0)
    val ts = try parts(1).toLong catch { case _: NumberFormatException => return None }
    val value = try parts(2).toDouble catch { case _: NumberFormatException => return None }
    val tags = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = 3
    while (i < parts.length) {
      val kv = parts(i)
      val eq = kv.indexOf('=')
      if (eq <= 0 || eq == kv.length - 1) return None // malformed tag kills the row
      tags(kv.substring(0, eq)) = kv.substring(eq + 1)
      i += 1
    }
    Some(Point(metric, ts, value, tags.toMap))
  }

  /** telnet lines → (metric, ts, value, tags) rows. */
  def parseTelnet(lines: Dataset[String]): DataFrame = {
    import lines.sparkSession.implicits._
    lines.flatMap(parseTelnetLine).toDF()
  }

  private val jsonSchema = ArrayType(StructType(Seq(
    StructField("metric", StringType),
    StructField("timestamp", LongType),
    StructField("value", DoubleType),
    StructField("tags", MapType(StringType, StringType)))))

  /** OpenTSDB JSON batches (one array document per input row) →
    * (metric, ts, value, tags) rows. `from_json` is codegen'd and
    * null-safe: a malformed document yields a NULL array and simply
    * contributes no rows (the same permissive-by-row contract).
    */
  def parseJson(docs: DataFrame, docCol: String): DataFrame =
    docs.select(explode(from_json(col(docCol), jsonSchema)).as("p"))
      .select(col("p.metric").as("metric"), col("p.timestamp").as("ts"),
        col("p.value").as("value"), col("p.tags").as("tags"))
      .filter(col("metric").isNotNull && col("ts").isNotNull)
}
