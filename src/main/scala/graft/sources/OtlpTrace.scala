package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}

/** OTLP trace WIRE format: `ExportTraceServiceRequest` protobuf
  * payloads — the reference's OTLP write entry point
  * (`parse_protobuf_to_otlptrace`,
  * common/protocol_parser/src/json_protocol/parser.rs:218; served as
  * the HTTP `/api/v1/traces` route). The reference flattens the
  * resource → scope → span tree into one document per resource-span
  * group: hex-rendered ids, `kind` as the enum's name string, fixed64
  * start/end nanos, attributes stringified per type (parser.rs:246's
  * match). Here each SPAN becomes one typed row — the Spark-native
  * projection of the same tree, carrying the resource's
  * `service.name`, the instrumentation-scope name, and the span
  * fields the reference extracts.
  *
  * The proto subset is fixed by opentelemetry-proto trace/v1 +
  * common/v1 (public spec):
  *   ExportTraceServiceRequest { repeated ResourceSpans resource_spans = 1 }
  *   ResourceSpans { Resource resource = 1; repeated ScopeSpans scope_spans = 2;
  *                   string schema_url = 3 }
  *   Resource      { repeated KeyValue attributes = 1; ... }
  *   ScopeSpans    { InstrumentationScope scope = 1; repeated Span spans = 2; ... }
  *   InstrumentationScope { string name = 1; string version = 2; ... }
  *   Span { bytes trace_id = 1; bytes span_id = 2; string trace_state = 3;
  *          bytes parent_span_id = 4; string name = 5; SpanKind kind = 6;
  *          fixed64 start_time_unix_nano = 7; fixed64 end_time_unix_nano = 8;
  *          repeated KeyValue attributes = 9; ...; repeated Event events = 11; ... }
  *   KeyValue { string key = 1; AnyValue value = 2 }
  *   AnyValue { oneof: string=1 | bool=2 | int=3 | double=4 | ... }
  * Unknown fields (status, links, flags, …) are skipped by wire type.
  * OTLP/HTTP bodies are NOT snappy-compressed (the reference decodes
  * the raw body, parser.rs:219 — unlike its Loki/prom routes).
  *
  * Scale shape: one export request is one bounded blob (OTLP senders
  * batch ~512 spans); [[decode]] is a narrow flatMap over a binary
  * column — blobs decode where they land, no shuffle at ingest.
  */
object OtlpTrace {

  /** One decoded span: ids hex-rendered like the reference
    * (parser.rs:309's fold over bytes), `kind` as the SpanKind enum
    * name, attributes rendered sorted as `k=v,...` (every value
    * stringified per the reference's type match), `events_n` the
    * span-event count.
    */
  final case class SpanRow(service: String, scope: String, trace_id: String,
                           span_id: String, parent_span_id: String,
                           name: String, kind: String,
                           start_ns: Long, end_ns: Long,
                           attrs: String, events_n: Int)

  /** Encoder-side span input (lanes/specs build wire payloads from
    * this; a real deployment's sender is an OTLP exporter).
    */
  final case class SpanIn(traceId: Array[Byte], spanId: Array[Byte],
                          parentSpanId: Array[Byte], name: String, kind: Int,
                          startNs: Long, endNs: Long,
                          attrs: Seq[(String, String)] = Nil,
                          events: Seq[(Long, String)] = Nil)

  import ProtoWire._

  private val kindNames = Array("SPAN_KIND_UNSPECIFIED", "SPAN_KIND_INTERNAL",
    "SPAN_KIND_SERVER", "SPAN_KIND_CLIENT", "SPAN_KIND_PRODUCER",
    "SPAN_KIND_CONSUMER")

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  // ---- encode ---------------------------------------------------------

  private def encodeKeyValue(key: String, value: String): Array[Byte] = {
    val av = new java.io.ByteArrayOutputStream()
    writeString(av, 1, value) // AnyValue.string_value
    val kv = new java.io.ByteArrayOutputStream()
    writeString(kv, 1, key)
    writeLenDelim(kv, 2, av.toByteArray)
    kv.toByteArray
  }

  /** Encode resources — (service.name, (scope name, spans) groups) —
    * as an ExportTraceServiceRequest.
    */
  def encodeTraces(resources: Seq[(String, Seq[(String, Seq[SpanIn])])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    resources.foreach { case (service, scopes) =>
      val rs = new java.io.ByteArrayOutputStream()
      val res = new java.io.ByteArrayOutputStream()
      writeLenDelim(res, 1, encodeKeyValue("service.name", service))
      writeLenDelim(rs, 1, res.toByteArray)
      scopes.foreach { case (scopeName, spans) =>
        val ss = new java.io.ByteArrayOutputStream()
        val sc = new java.io.ByteArrayOutputStream()
        writeString(sc, 1, scopeName)
        writeLenDelim(ss, 1, sc.toByteArray)
        spans.foreach { sp =>
          val b = new java.io.ByteArrayOutputStream()
          writeLenDelim(b, 1, sp.traceId)
          writeLenDelim(b, 2, sp.spanId)
          if (sp.parentSpanId.nonEmpty) writeLenDelim(b, 4, sp.parentSpanId)
          writeString(b, 5, sp.name)
          writeVarintField(b, 6, sp.kind.toLong)
          writeFixed64(b, 7, sp.startNs)
          writeFixed64(b, 8, sp.endNs)
          sp.attrs.foreach { case (k, v) => writeLenDelim(b, 9, encodeKeyValue(k, v)) }
          sp.events.foreach { case (tsNs, name) =>
            val ev = new java.io.ByteArrayOutputStream()
            writeFixed64(ev, 1, tsNs)
            writeString(ev, 2, name)
            writeLenDelim(b, 11, ev.toByteArray)
          }
          writeLenDelim(ss, 2, b.toByteArray)
        }
        writeLenDelim(rs, 2, ss.toByteArray)
      }
      writeLenDelim(out, 1, rs.toByteArray)
    }
    out.toByteArray
  }

  // ---- decode ---------------------------------------------------------

  /** AnyValue → string, the reference's type match (parser.rs:246):
    * strings verbatim, bool/int/double via to_string.
    */
  private def anyValueString(r: Reader): String = {
    var s = ""
    while (r.hasNext) {
      val t = r.varint()
      (t >> 3, t & 7) match {
        case (1, 2) => s = r.string()
        case (2, 0) => s = (r.varint() != 0L).toString
        case (3, 0) => s = r.varint().toString
        case (4, 1) => s = java.lang.Double.longBitsToDouble(r.fixed64()).toString
        case (_, w) => r.skip(w.toInt)
      }
    }
    s
  }

  private def keyValue(r: Reader): (String, String) = {
    var k = ""; var v = ""
    while (r.hasNext) {
      val t = r.varint()
      (t >> 3, t & 7) match {
        case (1, 2) => k = r.string()
        case (2, 2) => v = anyValueString(r.lenDelim())
        case (_, w) => r.skip(w.toInt)
      }
    }
    (k, v)
  }

  /** Decode one ExportTraceServiceRequest body into one row per span. */
  def parseTraces(body: Array[Byte]): Seq[SpanRow] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[SpanRow]
    val req = new Reader(body, 0, body.length)
    while (req.hasNext) {
      val tag = req.varint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) {
        val rs = req.lenDelim()
        var service = ""
        val scopeGroups = scala.collection.mutable.ArrayBuffer.empty[Reader]
        while (rs.hasNext) {
          val t2 = rs.varint()
          (t2 >> 3, t2 & 7) match {
            case (1, 2) => // Resource: service.name from attributes
              val res = rs.lenDelim()
              while (res.hasNext) {
                val t3 = res.varint()
                if ((t3 >> 3) == 1 && (t3 & 7) == 2) {
                  val (k, v) = keyValue(res.lenDelim())
                  if (k == "service.name") service = v
                } else res.skip((t3 & 7).toInt)
              }
            case (2, 2) => scopeGroups += rs.lenDelim()
            case (_, w) => rs.skip(w.toInt)
          }
        }
        // Resource may follow scope_spans on the wire; resolve service
        // first, then walk the buffered scope groups.
        scopeGroups.foreach { ss =>
          var scopeName = ""
          val spanBufs = scala.collection.mutable.ArrayBuffer.empty[Reader]
          while (ss.hasNext) {
            val t3 = ss.varint()
            (t3 >> 3, t3 & 7) match {
              case (1, 2) =>
                val sc = ss.lenDelim()
                while (sc.hasNext) {
                  val t4 = sc.varint()
                  if ((t4 >> 3) == 1 && (t4 & 7) == 2) scopeName = sc.string()
                  else sc.skip((t4 & 7).toInt)
                }
              case (2, 2) => spanBufs += ss.lenDelim()
              case (_, w) => ss.skip(w.toInt)
            }
          }
          spanBufs.foreach { sp =>
            var traceId = Array.emptyByteArray; var spanId = Array.emptyByteArray
            var parentId = Array.emptyByteArray
            var name = ""; var kind = 0
            var startNs = 0L; var endNs = 0L; var eventsN = 0
            val attrs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
            while (sp.hasNext) {
              val t4 = sp.varint()
              (t4 >> 3, t4 & 7) match {
                case (1, 2) => traceId = sp.bytes()
                case (2, 2) => spanId = sp.bytes()
                case (4, 2) => parentId = sp.bytes()
                case (5, 2) => name = sp.string()
                case (6, 0) => kind = sp.varint().toInt
                case (7, 1) => startNs = sp.fixed64()
                case (8, 1) => endNs = sp.fixed64()
                case (9, 2) => attrs += keyValue(sp.lenDelim())
                case (11, 2) => sp.lenDelim(); eventsN += 1
                case (_, w) => sp.skip(w.toInt)
              }
            }
            val kindName =
              if (kind >= 0 && kind < kindNames.length) kindNames(kind)
              else kind.toString
            val attrStr = attrs.sortBy(_._1)
              .map { case (k, v) => s"$k=$v" }.mkString(",")
            rows += SpanRow(service, scopeName, hex(traceId), hex(spanId),
              hex(parentId), name, kindName, startNs, endNs, attrStr, eventsN)
          }
        }
      } else req.skip((tag & 7).toInt)
    }
    rows.toSeq
  }

  /** Spark surface: a binary column of export bodies → decoded span
    * rows. Narrow flatMap — each blob decodes in place, no shuffle.
    */
  def decode(bodies: Dataset[Array[Byte]]): DataFrame = {
    val s = bodies.sparkSession
    import s.implicits._
    bodies.flatMap(parseTraces _).toDF()
  }
}
