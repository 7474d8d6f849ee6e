package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.LineProtocol

/** Ingest-path driver entries (SURVEY.md §2.3): line-protocol parsing
  * is validated as a full round-trip — events rows are rendered to line
  * protocol, parsed back by graft.sources.LineProtocol, and the oracle
  * recomputes the original values directly.
  */
object IngestQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_line_protocol" -> ((s, dir) => {
      import s.implicits._
      val lines = Tables.events(s, dir)
        .select(format_string(
          "events,event_id=%s,user_id=%s,event_type=%s value=%s,n=%si %s",
          col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("user_id"), expr("ts_ns div 1000")).as("line"))
        .as[String]
      LineProtocol.parse(lines)
        .select(
          col("tags")("event_id").cast("long").as("event_id"),
          col("measurement"),
          col("tags")("user_id").cast("long").as("user_id"),
          col("tags")("event_type").as("event_type"),
          col("fields")("value").cast("double").as("value"),
          expr("cast(substring(fields['n'], 1, length(fields['n']) - 1) AS BIGINT)").as("n"),
          col("ts").as("ts_us"))
        .orderBy("event_id")
    }),

    // OpenTSDB telnet round-trip (write/cli_precision.slt
    // --#OPENTSDB_BEGIN): events rendered as `put` lines, parsed back
    // by graft.sources.OpenTsdb, oracle recomputes from the lake.
    "ts_opentsdb_telnet" -> ((s, dir) => {
      import s.implicits._
      val lines = Tables.events(s, dir)
        .select(format_string("put events_%s %s %s user_id=%s event_id=%s",
          col("event_type"), expr("ts_ns div 1000"), col("value"),
          col("user_id"), col("event_id")).as("line"))
        .as[String]
      graft.sources.OpenTsdb.parseTelnet(lines)
        .select(col("tags")("event_id").cast("long").as("event_id"),
          col("metric"), col("ts").as("ts_us"), col("value"),
          col("tags")("user_id").cast("long").as("user_id"))
        .orderBy("event_id")
    }),

    // OpenTSDB JSON round-trip (--#OPENTSDB_JSON_BEGIN): one JSON array
    // document per event through codegen'd from_json + explode.
    "ts_opentsdb_json" -> ((s, dir) => {
      val docs = Tables.events(s, dir)
        .select(format_string(
          """[{"metric": "events_%s", "timestamp": %s, "value": %s,""" +
            """ "tags": {"user_id": "%s", "event_id": "%s"}}]""",
          col("event_type"), expr("ts_ns div 1000"), col("value"),
          col("user_id"), col("event_id")).as("doc"))
      graft.sources.OpenTsdb.parseJson(docs, "doc")
        .select(col("tags")("event_id").cast("long").as("event_id"),
          col("metric"), col("ts").as("ts_us"), col("value"),
          col("tags")("user_id").cast("long").as("user_id"))
        .orderBy("event_id")
    }),

    // ES `_bulk` log round-trip (the reference's third write family:
    // json_protocol/parser.rs:105 pairing, :496 parse_to_line, served
    // by the write_es_log HTTP route): events rendered as one bulk
    // body per event — command line carrying _index/_id, document line
    // with a nested object to exercise the recursive dot-key flatten —
    // parsed back by graft.sources.JsonLog, oracle recomputes from the
    // lake. event_type rides as a declared tag column, user_id lands
    // in the numeric bucket as F64 (the reference coerces integer JSON
    // numbers to F64), `ok` in the boolean bucket.
    "ts_eslog_bulk" -> ((s, dir) => {
      import s.implicits._
      val bodies = Tables.events(s, dir)
        .select(format_string(
          "{\"create\": {\"_index\": \"events\", \"_id\": \"%s\"}}\n" +
            "{\"event_type\": \"%s\", \"time\": %s, \"value\": %s," +
            " \"u\": {\"id\": %s}, \"ok\": true}",
          col("event_id"), col("event_type"), col("ts_ns"), col("value"),
          col("user_id")).as("body"))
        .as[String]
      graft.sources.JsonLog.parseBulk(bodies, "time", Set("event_type"))
        .select(col("esId").cast("long").as("event_id"),
          col("cmd"), col("esIndex").as("es_index"),
          col("tags")("event_type").as("event_type"),
          col("ts").as("ts_ns"),
          col("numFields")("value").as("value"),
          col("numFields")("u.id").as("user_id_f"),
          col("boolFields")("ok").as("ok"))
        .orderBy("event_id")
    }),

    // NDJSON log round-trip (json_protocol/parser.rs:146; the Loki-JSON
    // branch flattens identically): one document per line, RFC 3339
    // STRING timestamps (the parse_to_line string-time path), event_id
    // as a declared tag restored by cast.
    "ts_ndjson_ingest" -> ((s, dir) => {
      import s.implicits._
      val lines = Tables.events(s, dir)
        .select(format_string(
          "{\"event_id\": %s, \"time\": \"%s\", \"value\": %s," +
            " \"n\": {\"chars\": %s}, \"lvl\": \"info\"}",
          col("event_id"),
          date_format(timestamp_micros(expr("ts_ns div 1000")),
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
          col("value"), col("user_id")).as("line"))
        .as[String]
      graft.sources.JsonLog.parseNdjson(lines, "time", Set("event_id"))
        .select(col("tags")("event_id").cast("long").as("event_id"),
          col("ts").as("ts_ns"),
          col("numFields")("value").as("value"),
          col("numFields")("n.chars").as("chars_f"),
          col("strFields")("lvl").as("lvl"))
        .orderBy("event_id")
    }),

    // Prometheus remote-write WIRE round-trip (new r13 — the wire half
    // of the reference's prom remote server, previously descoped; its
    // PromQL computational surface has been oracle-checked since r9):
    // events are partitioned into 4 ts-range batches — the bounded POST
    // bodies a real sender ships — each encoded as a prompb.WriteRequest
    // (hand-rolled varint wire, the 1.0 spec's 4-message subset) and
    // snappy BLOCK-compressed, then decoded back through the library
    // surface (PromRemote.decode: narrow flatMap over the binary
    // column, no shuffle at ingest). The per-metric aggregate of the
    // DECODED samples is oracle-checked against the raw lake: matching
    // hashes prove encode → snappy → decode loses nothing, and the
    // golden-byte spec (PromRemoteSpec) pins the wire layout itself so
    // a wrong-but-symmetric codec cannot pass.
    "ts_prom_remote_write" -> ((s, dir) => {
      import s.implicits._
      val batches = graft.Tables.eventsNanos(s, dir)
        .select(col("event_type"), expr("ts div 1000000").as("ts_ms"),
          col("value"))
        .repartitionByRange(4, col("event_type"), col("ts_ms"))
        .as[(String, Long, Double)]
        .mapPartitions { it =>
          val bySeries = it.toSeq.groupBy(_._1).toSeq.sortBy(_._1).map {
            case (metric, rows) =>
              (Seq("__name__" -> metric, "job" -> "graft"),
                rows.sortBy(r => (r._2, r._3)).map(r => (r._3, r._2)))
          }
          if (bySeries.isEmpty) Iterator.empty
          else Iterator.single(graft.sources.PromRemote.compress(
            graft.sources.PromRemote.encodeWriteRequest(bySeries)))
        }
      graft.sources.PromRemote.decode(batches)
        .filter(col("labels") === "job=graft")
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0)
            .as("sum_value"),
          min("ts_ms").as("first_ms"), max("ts_ms").as("last_ms"))
        .orderBy("metric")
    }),

    "csv_roundtrip" -> ((s, dir) => {
      // external-table surface (create_external_table.slt / COPY INTO):
      // write nation as CSV, read it back through the CSV source.
      val nation = Tables(s, dir, "nation")
      val tmp = s"/tmp/graft_csv/${new java.io.File(dir).getName}/nation"
      nation.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.option("header", "true")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .csv(tmp)
        .orderBy("n_nationkey")
    }),

    "json_roundtrip" -> ((s, dir) => {
      // JSON side of the external-table surface
      // (create_external_table.slt): write nation as JSON lines, read it
      // back through the JSON source with an explicit schema (no
      // inference scan — the 100 TB rule: schema is metadata, not a job).
      val nation = Tables(s, dir, "nation")
      val tmp = s"/tmp/graft_json/${new java.io.File(dir).getName}/nation"
      nation.coalesce(1).write.mode("overwrite").json(tmp)
      s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .json(tmp)
        .orderBy("n_nationkey")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "ts_line_protocol" ->
      """SELECT event_id, 'events' AS measurement, user_id, event_type, value,
        |  user_id AS n, epoch_us(cast(events.ts AS TIMESTAMP)) AS ts_us
        |FROM events ORDER BY event_id""".stripMargin,
    "ts_opentsdb_telnet" ->
      """SELECT event_id, 'events_' || event_type AS metric,
        |  epoch_us(cast(events.ts AS TIMESTAMP)) AS ts_us, value, user_id
        |FROM events ORDER BY event_id""".stripMargin,
    "ts_opentsdb_json" ->
      """SELECT event_id, 'events_' || event_type AS metric,
        |  epoch_us(cast(events.ts AS TIMESTAMP)) AS ts_us, value, user_id
        |FROM events ORDER BY event_id""".stripMargin,
    "ts_eslog_bulk" ->
      """SELECT event_id, 'create' AS cmd, 'events' AS es_index, event_type,
        |  epoch_ns(cast(events.ts AS TIMESTAMP)) AS ts_ns, value,
        |  CAST(user_id AS DOUBLE) AS user_id_f, TRUE AS ok
        |FROM events ORDER BY event_id""".stripMargin,
    "ts_ndjson_ingest" ->
      """SELECT event_id, epoch_ns(cast(events.ts AS TIMESTAMP)) AS ts_ns,
        |  value, CAST(user_id AS DOUBLE) AS chars_f, 'info' AS lvl
        |FROM events ORDER BY event_id""".stripMargin,
    "csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "json_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    // per-metric aggregate over the RAW lake in remote-write units (ms
    // timestamps): the Spark side computed it from DECODED wire samples
    "ts_prom_remote_write" ->
      """SELECT event_type AS metric, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
        |    AS sum_value,
        |  min(epoch_ns(ts) // 1000000) AS first_ms,
        |  max(epoch_ns(ts) // 1000000) AS last_ms
        |FROM events GROUP BY event_type ORDER BY metric""".stripMargin
  )
}
