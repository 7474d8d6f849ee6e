package graft.sources

import java.time.OffsetDateTime

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Dataset}

/** JSON log ingestion — the reference's third write family after line
  * protocol and OpenTSDB (reference:
  * common/protocol_parser/src/json_protocol/parser.rs:105 ES bulk
  * pairing, :146 NDJSON, :71 `flatten_json`, :496 `parse_to_line`;
  * served by the HTTP write_es_log route, main/src/http/http_service
  * .rs:1521). Two wire shapes share one row model:
  *
  *   bulk:   Elasticsearch `_bulk` NDJSON — alternating command lines
  *           (`{"create": {"_index": …, "_id": …}}` / `{"index": …}`)
  *           and document lines; one REQUEST BODY per input row.
  *   ndjson: one JSON document per line, no command lines. (The
  *           reference's Loki-JSON branch flattens documents the same
  *           way — parser.rs:146 vs :163 are line-identical — so this
  *           path covers both; Loki-protobuf/OTLP-trace are snappy/
  *           protobuf TRANSPORT, see SURVEY §2.5.)
  *
  * Semantics kept from the reference:
  *   - documents flatten recursively into dot-joined keys
  *     (`{"a":{"b":1}}` → `a.b`; arrays index as `a.0`, `a.1`),
  *   - the `timeColumn` key supplies the timestamp: JSON number →
  *     raw i64 nanos, JSON string → RFC 3339 parse to nanos,
  *   - keys listed in `tagColumns` become string tags (numbers and
  *     booleans stringified, quotes trimmed),
  *   - every other scalar lands in exactly one typed field bucket:
  *     Bool → boolean, Number → DOUBLE (the reference coerces integer
  *     JSON numbers to F64 too), String → string.
  *
  * Departures, both deliberate: a malformed pair/document drops THAT
  * row instead of failing the whole request (the [[LineProtocol]]
  * dead-letter rationale — a poison request must not kill a 100 TB
  * ingest job), and a document with no resolvable time yields ts = -1
  * instead of server now() so replays stay deterministic; callers map
  * -1 to their ingest clock.
  *
  * Both parsers are pure `flatMap` mappers — a scan-wide parse with no
  * shuffle, the same Dataset[String]-in / typed-rows-out contract as
  * [[LineProtocol]] and [[OpenTsdb]].
  */
object JsonLog {

  /** One parsed log line in the reference's Line shape: the command
    * metadata (bulk only), nanosecond timestamp, string tags, and the
    * three typed field buckets.
    */
  final case class LogLine(cmd: String, esIndex: String, esId: String,
                           ts: Long, tags: Map[String, String],
                           strFields: Map[String, String],
                           numFields: Map[String, Double],
                           boolFields: Map[String, Boolean])

  // ObjectMapper is thread-safe after configuration; one per executor
  // JVM via the companion-object field (serialized closures capture
  // the object reference, not the mapper).
  @transient private lazy val mapper = new ObjectMapper()

  /** Recursive dot-key flatten of one JSON document (parser.rs:71):
    * objects join child keys with '.', arrays use the element index as
    * the key segment, scalars land as leaves.
    */
  private def flatten(prefix: String, node: JsonNode,
                      out: scala.collection.mutable.LinkedHashMap[String, JsonNode]): Unit = {
    if (node.isObject) {
      val it = node.fields()
      while (it.hasNext) {
        val e = it.next()
        val key = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
        flatten(key, e.getValue, out)
      }
    } else if (node.isArray) {
      var i = 0
      while (i < node.size()) {
        val key = if (prefix.isEmpty) i.toString else s"$prefix.$i"
        flatten(key, node.get(i), out)
        i += 1
      }
    } else {
      out(prefix) = node
    }
  }

  private def rfc3339Nanos(s: String): Option[Long] =
    try {
      val t = OffsetDateTime.parse(s)
      Some(t.toEpochSecond * 1000000000L + t.getNano)
    } catch { case _: Exception => None }

  /** Flattened document + command metadata → LogLine (parser.rs:496
    * `parse_to_line`). Returns None when the time value is present but
    * unparseable (the reference's ParseTime error, narrowed to the row).
    */
  private def toLine(cmd: String, esIndex: String, esId: String, doc: JsonNode,
                     timeColumn: String, tagColumns: Set[String]): Option[LogLine] = {
    val flat = scala.collection.mutable.LinkedHashMap.empty[String, JsonNode]
    flatten("", doc, flat)
    var ts = -1L
    val tags = Map.newBuilder[String, String]
    val strs = Map.newBuilder[String, String]
    val nums = Map.newBuilder[String, Double]
    val bools = Map.newBuilder[String, Boolean]
    for ((k, v) <- flat) {
      if (tagColumns.contains(k)) {
        // reference stringifies via serde to_string then trims quotes
        tags += k -> (if (v.isTextual) v.asText() else v.toString)
      } else if (k == timeColumn) {
        if (v.isNumber) ts = v.asLong()
        else if (v.isTextual) rfc3339Nanos(v.asText()) match {
          case Some(n) => ts = n
          case None => return None
        }
        else return None
      } else if (v.isBoolean) bools += k -> v.asBoolean()
      else if (v.isNumber) nums += k -> v.asDouble()
      else if (v.isTextual) strs += k -> v.asText()
      // null scalar: the reference errors ("unsupported field type");
      // dropped per-key here so one null field doesn't kill the row
    }
    Some(LogLine(cmd, esIndex, esId, ts, tags.result(), strs.result(),
      nums.result(), bools.result()))
  }

  /** Parse one ES `_bulk` request body: split to lines, drop blanks,
    * pair command/document lines (parser.rs:105). Rows with a
    * malformed command or document JSON drop pairwise; a trailing
    * unpaired command line drops alone.
    */
  def parseBulkBody(body: String, timeColumn: String,
                    tagColumns: Set[String]): Seq[LogLine] = {
    val lines = body.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toArray
    val out = Seq.newBuilder[LogLine]
    var i = 0
    while (i + 1 < lines.length) {
      try {
        val cmdNode = mapper.readTree(lines(i))
        val cmdName =
          if (cmdNode.has("create")) "create"
          else if (cmdNode.has("index")) "index"
          else throw new IllegalArgumentException(s"invalid log type: ${lines(i)}")
        val info = cmdNode.get(cmdName)
        val esIndex = if (info != null && info.has("_index")) info.get("_index").asText() else ""
        val esId = if (info != null && info.has("_id")) info.get("_id").asText() else ""
        val doc = mapper.readTree(lines(i + 1))
        toLine(cmdName, esIndex, esId, doc, timeColumn, tagColumns).foreach(out += _)
      } catch { case _: Exception => () } // dead-letter the pair
      i += 2
    }
    out.result()
  }

  /** One NDJSON document line → LogLine (no command metadata). */
  def parseNdjsonLine(line: String, timeColumn: String,
                      tagColumns: Set[String]): Option[LogLine] = {
    val t = line.trim
    if (t.isEmpty) return None
    try toLine("", "", "", mapper.readTree(t), timeColumn, tagColumns)
    catch { case _: Exception => None }
  }

  /** ES bulk bodies (one request body per input row) → LogLine rows. */
  def parseBulk(bodies: Dataset[String], timeColumn: String = "time",
                tagColumns: Set[String] = Set.empty): DataFrame = {
    import bodies.sparkSession.implicits._
    bodies.flatMap(parseBulkBody(_, timeColumn, tagColumns)).toDF()
  }

  /** NDJSON lines (one document per input row) → LogLine rows. */
  def parseNdjson(lines: Dataset[String], timeColumn: String = "time",
                  tagColumns: Set[String] = Set.empty): DataFrame = {
    import lines.sparkSession.implicits._
    lines.flatMap(parseNdjsonLine(_, timeColumn, tagColumns)).toDF()
  }
}
