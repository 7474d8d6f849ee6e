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

  // ---- protobuf wire primitives (shared walker, see ProtoWire) ------

  import ProtoWire.{Reader, writeVarint, writeLenDelim}

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

  // ==== remote-READ: matcher → filter translation + response wire =====
  //
  // The reference's remote_read route (query_server/query/src/prom/
  // remote_server.rs:44) snappy-uncompresses a prompb.ReadRequest,
  // translates each Query's label matchers into SQL WHERE clauses
  // (remote_server.rs:269 build_sql_with_table: __name__ EQ selects the
  // table, __name__ RE filters the table list; EQ/NEQ/RE/NRE on other
  // labels become `=`/`!=`/`~`/`!~` predicates — UNANCHORED regex, as
  // DataFusion's `~`; time bounds land as `time >= start_ms·1e6 AND
  // time <= end_ms·1e6 ORDER BY time`), executes, and groups rows into
  // per-label-set TimeSeries (remote_server.rs:366
  // transform_time_series) serialized as a snappy ReadResponse. Here
  // the same translation targets a Catalyst filter over a samples
  // DataFrame (metric, string tag columns, ts_ms, value) — pushdown-
  // eligible, so the metric/time predicates reach the scan.
  //
  // prompb read subset (remote-read 1.0 spec):
  //   message ReadRequest  { repeated Query queries = 1; }
  //   message Query        { int64 start_timestamp_ms = 1;
  //                          int64 end_timestamp_ms = 2;
  //                          repeated LabelMatcher matchers = 3; }
  //   message LabelMatcher { Type type = 1;   // EQ=0 NEQ=1 RE=2 NRE=3
  //                          string name = 2; string value = 3; }
  //   message ReadResponse { repeated QueryResult results = 1; }
  //   message QueryResult  { repeated TimeSeries timeseries = 1; }
  // QueryResult's wire (`repeated TimeSeries = 1`) is byte-identical to
  // WriteRequest's, so the TimeSeries codec is shared — and because
  // encodings of a repeated field CONCATENATE into a valid message,
  // executors encode each series' block independently and the driver
  // only concatenates bounded blobs (no row-level driver work).

  /** One label matcher. `typ`: 0=EQ 1=NEQ 2=RE 3=NRE (prompb enum). */
  final case class Matcher(typ: Int, name: String, value: String)

  /** One decoded remote-read Query: ms time bounds + matchers. */
  final case class ReadQuery(startMs: Long, endMs: Long, matchers: Seq[Matcher])

  /** Encode queries as an UNCOMPRESSED prompb.ReadRequest. */
  def encodeReadRequest(queries: Seq[ReadQuery]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    queries.foreach { q =>
      val qb = new java.io.ByteArrayOutputStream()
      ProtoWire.writeVarintField(qb, 1, q.startMs)
      ProtoWire.writeVarintField(qb, 2, q.endMs)
      q.matchers.foreach { m =>
        val mb = new java.io.ByteArrayOutputStream()
        if (m.typ != 0) ProtoWire.writeVarintField(mb, 1, m.typ.toLong)
        ProtoWire.writeString(mb, 2, m.name)
        ProtoWire.writeString(mb, 3, m.value)
        writeLenDelim(qb, 3, mb.toByteArray)
      }
      writeLenDelim(out, 1, qb.toByteArray)
    }
    out.toByteArray
  }

  /** Decode one snappy-compressed ReadRequest POST body. */
  def parseReadRequest(body: Array[Byte]): Seq[ReadQuery] = {
    val bytes = org.xerial.snappy.Snappy.uncompress(body)
    val queries = scala.collection.mutable.ArrayBuffer.empty[ReadQuery]
    val req = new Reader(bytes, 0, bytes.length)
    while (req.hasNext) {
      val tag = req.varint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) {
        val qb = req.lenDelim()
        var startMs = 0L; var endMs = 0L
        val matchers = scala.collection.mutable.ArrayBuffer.empty[Matcher]
        while (qb.hasNext) {
          val t2 = qb.varint()
          (t2 >> 3, t2 & 7) match {
            case (1, 0) => startMs = qb.varint()
            case (2, 0) => endMs = qb.varint()
            case (3, 2) =>
              val mb = qb.lenDelim()
              var typ = 0; var name = ""; var value = ""
              while (mb.hasNext) {
                val t3 = mb.varint()
                (t3 >> 3, t3 & 7) match {
                  case (1, 0) => typ = mb.varint().toInt
                  case (2, 2) => name = mb.string()
                  case (3, 2) => value = mb.string()
                  case (_, w) => mb.skip(w.toInt)
                }
              }
              matchers += Matcher(typ, name, value)
            case (_, w) => qb.skip(w.toInt)
          }
        }
        queries += ReadQuery(startMs, endMs, matchers.toSeq)
      } else req.skip((tag & 7).toInt)
    }
    queries.toSeq
  }

  /** The matcher → Catalyst translation (build_sql_with_table's rules):
    * `__name__` matches the `metric` column (EQ/RE only, as the
    * reference — NEQ/NRE on the metric name are rejected there too);
    * any other name matches its tag column; RE/NRE are UNANCHORED
    * `rlike`, matching DataFusion's `~`/`!~`. Time bounds are inclusive
    * on the samples' ms column (the reference scales to its ns column;
    * units differ, bounds don't).
    */
  def queryFilter(q: ReadQuery): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit}
    var f = col("ts_ms") >= lit(q.startMs) && col("ts_ms") <= lit(q.endMs)
    q.matchers.foreach { m =>
      val c = if (m.name == "__name__") col("metric") else col(m.name)
      val p = m.typ match {
        case 0 => c === lit(m.value)
        case 1 =>
          require(m.name != "__name__",
            "prom remote-read: non-equal matchers are not supported on the metric name")
          c =!= lit(m.value)
        case 2 => c.rlike(m.value)
        case 3 =>
          require(m.name != "__name__",
            "prom remote-read: regex-non-equal matchers are not supported on the metric name")
          !c.rlike(m.value)
        case t => throw new IllegalArgumentException(s"prom remote-read: matcher type $t")
      }
      f = f && p
    }
    f
  }

  /** Serve decoded read queries against a samples DataFrame — columns
    * `metric` (string), the given string tag columns, `ts_ms` (long),
    * `value` (double) — and return the snappy ReadResponse body.
    *
    * Scale shape: the filter is a pushdown-eligible Catalyst predicate;
    * series assembly is one groupBy on the label set with each
    * TimeSeries block ENCODED ON THE EXECUTOR (QueryResult wire ==
    * WriteRequest wire, and repeated-field encodings concatenate), so
    * the driver only concatenates one bounded blob per series. The
    * `maxSeries` guard fail-fasts a request matching more series than a
    * response blob should hold, instead of silently OOMing the driver.
    */
  def executeRead(samples: DataFrame, tagCols: Seq[String],
                  queries: Seq[ReadQuery], maxSeries: Int = 1 << 20): Array[Byte] = {
    import org.apache.spark.sql.functions.{col, collect_list, sort_array, struct}
    val out = new java.io.ByteArrayOutputStream()
    queries.foreach { q =>
      val grouped = samples.filter(queryFilter(q))
        .groupBy((col("metric") +: tagCols.map(col)): _*)
        .agg(sort_array(collect_list(struct(col("ts_ms"), col("value")))).as("smp"))
      val blocks = grouped.map { row =>
        val labels = (("__name__" -> row.getString(0)) +:
          tagCols.zipWithIndex.map { case (c, i) => c -> row.getString(i + 1) })
          .sortBy(_._1)
        val smp = row.getSeq[org.apache.spark.sql.Row](tagCols.length + 1)
          .map(r => (r.getDouble(1), r.getLong(0)))
        encodeWriteRequest(Seq((labels, smp)))
      }(org.apache.spark.sql.Encoders.BINARY).collect()
      require(blocks.length <= maxSeries,
        s"prom remote-read: ${blocks.length} series exceed maxSeries=$maxSeries")
      val qr = new java.io.ByteArrayOutputStream()
      blocks.foreach(qr.write)
      writeLenDelim(out, 1, qr.toByteArray)
    }
    compress(out.toByteArray)
  }

  /** Decode a snappy ReadResponse body: one PromRow sequence per
    * QueryResult, reusing the TimeSeries walker (identical wire).
    */
  def parseReadResponse(body: Array[Byte]): Seq[Seq[PromRow]] = {
    val bytes = org.xerial.snappy.Snappy.uncompress(body)
    val results = scala.collection.mutable.ArrayBuffer.empty[Seq[PromRow]]
    val resp = new Reader(bytes, 0, bytes.length)
    while (resp.hasNext) {
      val tag = resp.varint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) {
        val qr = resp.lenDelim()
        results += parseUncompressed(
          java.util.Arrays.copyOfRange(qr.b, qr.p, qr.end))
      } else resp.skip((tag & 7).toInt)
    }
    results.toSeq
  }
}
