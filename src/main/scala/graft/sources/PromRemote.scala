package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}

/** Prometheus remote-write WIRE format: snappy block-compressed
  * `prompb.WriteRequest` protobuf payloads — the reference's remote
  * server surface (query_server/query/src/prom/remote_server.rs:1,
  * common/protos/src/prompb/). The PromQL COMPUTATIONAL surface behind
  * it has been oracle-checked since r9 (rate/irate/increase/resets/
  * histogram_quantile/... lanes); this closes the wire half: decoding
  * the POST body a Prometheus server sends, without a network.
  *
  * The prompb subset is tiny and fixed by the remote-write 1.0 spec:
  *   message WriteRequest { repeated TimeSeries timeseries = 1; }
  *   message TimeSeries  { repeated Label labels = 1;
  *                         repeated Sample samples = 2; }
  *   message Label       { string name = 1; string value = 2; }
  *   message Sample      { double value = 1; int64 timestamp = 2; } //ms
  * so the decoder is a hand-rolled varint/tag walker over exactly these
  * fields (unknown fields are skipped by wire type, per proto rules) —
  * no protobuf runtime needed. Snappy is the BLOCK format, decoded with
  * the snappy-java already on Spark's classpath (parquet uses it).
  *
  * Scale shape: one POST body is one bounded blob (Prometheus caps
  * batches at ~MB); [[decode]] is a narrow flatMap over a binary
  * column — blobs decode where they land, no shuffle at ingest.
  */
object PromRemote {

  /** One decoded sample: `metric` is the `__name__` label, `labels` the
    * remaining label pairs rendered sorted as `k=v,...` (a stable
    * single-column rendering of the label SET).
    */
  final case class PromRow(metric: String, labels: String, ts_ms: Long, value: Double)

  // ---- protobuf wire primitives -------------------------------------

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def writeLenDelim(out: java.io.ByteArrayOutputStream, field: Int,
                            bytes: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2); writeVarint(out, bytes.length.toLong)
    out.write(bytes)
  }

  private final class Reader(val b: Array[Byte], var p: Int, val end: Int) {
    def hasNext: Boolean = p < end
    def varint(): Long = {
      var v = 0L; var shift = 0
      while (true) {
        val x = b(p); p += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
        require(shift < 64, "prom remote-write: varint overflow")
      }
      v
    }
    def fixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
      p += 8; v
    }
    def lenDelim(): Reader = {
      val n = varint().toInt
      require(n >= 0 && p + n <= end, "prom remote-write: truncated field")
      val r = new Reader(b, p, p + n); p += n; r
    }
    def string(): String = {
      val n = varint().toInt
      require(n >= 0 && p + n <= end, "prom remote-write: truncated string")
      val s = new String(b, p, n, java.nio.charset.StandardCharsets.UTF_8)
      p += n; s
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => p += 8
      case 2 => val n = varint().toInt; p += n
      case 5 => p += 4
      case t => throw new IllegalArgumentException(s"prom remote-write: wire type $t")
    }
  }

  // ---- encode (the client half, used by lanes/specs to build wire
  // payloads deterministically; a real deployment's sender is Prometheus
  // itself) -----------------------------------------------------------

  /** Encode series — (sorted label pairs, (value, ts_ms) samples) — as
    * an UNCOMPRESSED prompb.WriteRequest.
    */
  def encodeWriteRequest(series: Seq[(Seq[(String, String)], Seq[(Double, Long)])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    series.foreach { case (labels, samples) =>
      val ts = new java.io.ByteArrayOutputStream()
      labels.foreach { case (n, v) =>
        val l = new java.io.ByteArrayOutputStream()
        writeLenDelim(l, 1, n.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        writeLenDelim(l, 2, v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        writeLenDelim(ts, 1, l.toByteArray)
      }
      samples.foreach { case (value, tsMs) =>
        val sm = new java.io.ByteArrayOutputStream()
        writeVarint(sm, (1 << 3) | 1)
        val bits = java.lang.Double.doubleToLongBits(value)
        (0 until 8).foreach(i => sm.write(((bits >>> (8 * i)) & 0xff).toInt))
        writeVarint(sm, (2 << 3) | 0)
        writeVarint(sm, tsMs)
        writeLenDelim(ts, 2, sm.toByteArray)
      }
      writeLenDelim(out, 1, ts.toByteArray)
    }
    out.toByteArray
  }

  /** Snappy block-compress, as the remote-write POST body requires. */
  def compress(bytes: Array[Byte]): Array[Byte] =
    org.xerial.snappy.Snappy.compress(bytes)

  // ---- decode (the server half — the library surface) ----------------

  /** Decode one snappy-compressed WriteRequest POST body into rows. */
  def parseWriteRequest(body: Array[Byte]): Seq[PromRow] =
    parseUncompressed(org.xerial.snappy.Snappy.uncompress(body))

  private[graft] def parseUncompressed(bytes: Array[Byte]): Seq[PromRow] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[PromRow]
    val req = new Reader(bytes, 0, bytes.length)
    while (req.hasNext) {
      val tag = req.varint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) {
        val ts = req.lenDelim()
        val labels = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        val samples = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
        while (ts.hasNext) {
          val t2 = ts.varint()
          (t2 >> 3, t2 & 7) match {
            case (1, 2) =>
              val l = ts.lenDelim()
              var n = ""; var v = ""
              while (l.hasNext) {
                val t3 = l.varint()
                (t3 >> 3, t3 & 7) match {
                  case (1, 2) => n = l.string()
                  case (2, 2) => v = l.string()
                  case (_, w) => l.skip(w.toInt)
                }
              }
              labels += ((n, v))
            case (2, 2) =>
              val sm = ts.lenDelim()
              var value = 0.0; var tsMs = 0L
              while (sm.hasNext) {
                val t3 = sm.varint()
                (t3 >> 3, t3 & 7) match {
                  case (1, 1) => value = java.lang.Double.longBitsToDouble(sm.fixed64())
                  case (2, 0) => tsMs = sm.varint()
                  case (_, w) => sm.skip(w.toInt)
                }
              }
              samples += ((value, tsMs))
            case (_, w) => ts.skip(w.toInt)
          }
        }
        val metric = labels.find(_._1 == "__name__").map(_._2).getOrElse("")
        val rest = labels.filter(_._1 != "__name__").sortBy(_._1)
          .map { case (n, v) => s"$n=$v" }.mkString(",")
        samples.foreach { case (v, t) => rows += PromRow(metric, rest, t, v) }
      } else req.skip((tag & 7).toInt)
    }
    rows.toSeq
  }

  /** Spark surface: a binary column of POST bodies → decoded sample
    * rows. Narrow flatMap — each blob decodes in place, no shuffle.
    */
  def decode(bodies: Dataset[Array[Byte]]): DataFrame = {
    val s = bodies.sparkSession
    import s.implicits._
    bodies.flatMap(parseWriteRequest _).toDF()
  }
}
