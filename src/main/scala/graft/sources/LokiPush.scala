package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}

/** Loki push-protocol WIRE format: snappy block-compressed
  * `logproto.PushRequest` protobuf payloads — the reference's
  * Loki-protobuf write entry point (`parse_protobuf_to_lokilog`,
  * common/protocol_parser/src/json_protocol/parser.rs:177). The
  * reference flattens each entry into the same document row the
  * Loki-JSON / NDJSON paths produce — `lables` (sic, the stream's
  * label string), `time` (seconds·1e9 + nanos), `msg` (the log line) —
  * then funnels it through the one `parse_to_line` conversion
  * [[JsonLog]] already implements. This closes the remaining wire
  * half: decoding the POST body a Loki client (promtail) sends,
  * without a network.
  *
  * The logproto subset is fixed by Loki's public push.proto:
  *   message PushRequest   { repeated StreamAdapter streams = 1; }
  *   message StreamAdapter { string labels = 1;
  *                           repeated EntryAdapter entries = 2;
  *                           uint64 hash = 3; }
  *   message EntryAdapter  { Timestamp timestamp = 1; string line = 2; }
  *   message Timestamp     { int64 seconds = 1; int32 nanos = 2; }
  * (newer senders append structured-metadata fields; the walker skips
  * unknown fields by wire type, per proto compatibility rules). Snappy
  * is the BLOCK format — same codec as remote-write, via the
  * snappy-java already on Spark's classpath.
  *
  * Scale shape: one POST body is one bounded blob (promtail batches
  * ~1 MB); [[decode]] is a narrow flatMap over a binary column — blobs
  * decode where they land, no shuffle at ingest.
  */
object LokiPush {

  /** One decoded log entry, in the reference's flattened row shape:
    * the stream's verbatim label string, nanosecond timestamp
    * (seconds·1e9 + nanos, parser.rs:203), and the line.
    */
  final case class LokiRow(labels: String, ts_ns: Long, msg: String)

  import ProtoWire._

  // ---- encode (the client half, used by lanes/specs to build wire
  // payloads deterministically; a real deployment's sender is promtail
  // or any Loki client) ------------------------------------------------

  /** Encode streams — (label string, (ts_ns, line) entries) — as an
    * UNCOMPRESSED logproto.PushRequest.
    */
  def encodePushRequest(streams: Seq[(String, Seq[(Long, String)])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    streams.foreach { case (labels, entries) =>
      val st = new java.io.ByteArrayOutputStream()
      writeString(st, 1, labels)
      entries.foreach { case (tsNs, line) =>
        val en = new java.io.ByteArrayOutputStream()
        val tsB = new java.io.ByteArrayOutputStream()
        writeVarintField(tsB, 1, Math.floorDiv(tsNs, 1000000000L))
        writeVarintField(tsB, 2, Math.floorMod(tsNs, 1000000000L))
        writeLenDelim(en, 1, tsB.toByteArray)
        writeString(en, 2, line)
        writeLenDelim(st, 2, en.toByteArray)
      }
      writeLenDelim(out, 1, st.toByteArray)
    }
    out.toByteArray
  }

  /** Snappy block-compress, as the push POST body requires. */
  def compress(bytes: Array[Byte]): Array[Byte] =
    org.xerial.snappy.Snappy.compress(bytes)

  // ---- decode (the server half — the library surface) ----------------

  /** Decode one snappy-compressed PushRequest POST body into rows. */
  def parsePushRequest(body: Array[Byte]): Seq[LokiRow] =
    parseUncompressed(org.xerial.snappy.Snappy.uncompress(body))

  private[graft] def parseUncompressed(bytes: Array[Byte]): Seq[LokiRow] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[LokiRow]
    val req = new Reader(bytes, 0, bytes.length)
    while (req.hasNext) {
      val tag = req.varint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) {
        val st = req.lenDelim()
        var labels = ""
        while (st.hasNext) {
          val t2 = st.varint()
          (t2 >> 3, t2 & 7) match {
            case (1, 2) => labels = st.string()
            case (2, 2) =>
              val en = st.lenDelim()
              var tsNs = 0L; var line = ""
              while (en.hasNext) {
                val t3 = en.varint()
                (t3 >> 3, t3 & 7) match {
                  case (1, 2) =>
                    val ts = en.lenDelim()
                    var sec = 0L; var nanos = 0L
                    while (ts.hasNext) {
                      val t4 = ts.varint()
                      (t4 >> 3, t4 & 7) match {
                        case (1, 0) => sec = ts.varint()
                        case (2, 0) => nanos = ts.varint()
                        case (_, w) => ts.skip(w.toInt)
                      }
                    }
                    // parser.rs:203: ts.seconds * 1e9 + ts.nanos
                    tsNs = sec * 1000000000L + nanos
                  case (2, 2) => line = en.string()
                  case (_, w) => en.skip(w.toInt)
                }
              }
              rows += LokiRow(labels, tsNs, line)
            case (_, w) => st.skip(w.toInt)
          }
        }
      } else req.skip((tag & 7).toInt)
    }
    rows.toSeq
  }

  /** Spark surface: a binary column of POST bodies → decoded log rows.
    * Narrow flatMap — each blob decodes in place, no shuffle.
    */
  def decode(bodies: Dataset[Array[Byte]]): DataFrame = {
    val s = bodies.sparkSession
    import s.implicits._
    bodies.flatMap(parsePushRequest _).toDF()
  }
}
