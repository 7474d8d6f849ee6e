package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Influx line-protocol ingestion — cnosdb's primary write format
  * (reference: dml/insert/line_protocol_write.slt and the client's
  * write path).
  *
  *   measurement[,tag=v...] field=value[,field=value...] [timestamp_ns]
  *
  * The parser handles the escape rules for measurement/tag/field keys
  * (`\,` `\ ` `\=`) and string field values (`"..."` with `\"`).
  * Exposed as Dataset[String] → DataFrame so it drops onto any source —
  * a Kafka stream's `value` column at scale, a text file here.
  */
object LineProtocol {

  final case class Line(measurement: String, tags: Map[String, String],
                        fields: Map[String, String], ts: Long)

  /** Split on an unescaped separator. */
  private def splitUnescaped(s: String, sep: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inQuotes = false
    while (i < s.length) {
      val c = s.charAt(i)
      // escapes pair up both outside quotes (\, \= \space) and inside
      // string values (\") — consuming the pair keeps \" from toggling
      // the quote state.
      if (c == '\\' && i + 1 < s.length) {
        cur.append(c).append(s.charAt(i + 1)); i += 2
      } else {
        if (c == '"') inQuotes = !inQuotes
        if (c == sep && !inQuotes) { out += cur.result(); cur.clear() }
        else cur.append(c)
        i += 1
      }
    }
    out += cur.result()
    out.result()
  }

  private def unescape(s: String): String =
    s.replace("\\,", ",").replace("\\ ", " ").replace("\\=", "=")

  /** Parse one line; None for blank/comment/malformed lines (cnosdb
    * rejects the whole batch — for a 100 TB backfill, dead-lettering
    * malformed rows beats aborting, so this is permissive-by-row).
    */
  def parseLine(line: String): Option[Line] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) return None
    val parts = splitUnescaped(t, ' ').filter(_.nonEmpty)
    if (parts.length < 2) return None
    val head = splitUnescaped(parts(0), ',')
    val measurement = unescape(head.head)
    if (measurement.isEmpty) return None
    val tags = head.tail.flatMap { kv =>
      splitUnescaped(kv, '=') match {
        case Vector(k, v) => Some(unescape(k) -> unescape(v))
        case _ => None
      }
    }.toMap
    val fields = splitUnescaped(parts(1), ',').flatMap { kv =>
      splitUnescaped(kv, '=') match {
        case Vector(k, v) => Some(unescape(k) -> v)
        case _ => None
      }
    }.toMap
    if (fields.isEmpty) return None
    val ts = if (parts.length > 2) parts(2).toLong else -1L
    Some(Line(measurement, tags, fields, ts))
  }

  /** Typed view of a raw field value: i-suffixed ints, quoted strings,
    * t/f booleans, bare doubles.
    */
  def fieldDouble(raw: String): Option[Double] = {
    val r = raw.trim
    if (r.isEmpty || r.startsWith("\"")) None
    else if (r.endsWith("i")) r.dropRight(1).toLongOption.map(_.toDouble)
    else r.toDoubleOption
  }

  def fieldString(raw: String): Option[String] = {
    val r = raw.trim
    if (r.length >= 2 && r.startsWith("\"") && r.endsWith("\""))
      Some(r.substring(1, r.length - 1).replace("\\\"", "\""))
    else None
  }

  /** Dataset[String] → parsed DataFrame (measurement, tags map, fields
    * map of raw strings, ts nanos). flatMap keeps it one streaming-safe
    * narrow transform — no shuffle at ingest.
    */
  def parse(lines: Dataset[String]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.flatMap(parseLine _).toDF()
  }

  /** Convenience: parsed lines with one double field projected out. */
  def parseWithField(lines: Dataset[String], field: String): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.flatMap(parseLine _)
      .map(l => (l.measurement, l.tags, l.ts, l.fields.get(field).flatMap(fieldDouble)))
      .toDF("measurement", "tags", "ts_ns", field)
  }
}
