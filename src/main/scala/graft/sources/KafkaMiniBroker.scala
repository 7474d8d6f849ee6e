package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{InetAddress, ServerSocket, Socket, SocketException}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.concurrent.atomic.AtomicBoolean
import java.util.zip.CRC32C

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import KafkaWire._

/** A loopback single-node Kafka broker speaking the five wire APIs
  * [[KafkaWire.Client]] (and the `graft-kafka` DSv2 source) consume:
  * ApiVersions v0, Metadata v0–v1, ListOffsets v0–v1, Produce v2–v3,
  * Fetch v0–v4. It exists for the same reason [[WireHttp]] does — the
  * reference's stream-table transport
  * (`query_server/query/src/stream/`) must be EXECUTABLE on a box with
  * no connector jar and zero egress — and plays the role a real
  * cluster's brokers play in the 100 TB story: the engine side (DSv2
  * source, one fetch loop per topic-partition) is identical whether
  * the other end is this loopback log or a 100-broker cluster.
  *
  * The log is what a real broker's log is: an APPEND-ONLY FILE of raw
  * record-batch bytes per partition, stored VERBATIM (a compressed
  * batch stays compressed — the broker never decodes records; only the
  * 61-byte batch header is inspected, its CRC32C verified, and the
  * baseOffset field rewritten to the assigned offset, exactly the
  * mutation a real broker performs on append). Fetch answers raw file
  * slices from a per-BATCH index (base offset, file position, length —
  * a few dozen bytes per 512-record batch), so broker memory is
  * O(batches), not O(records), and the topic spills to disk at any
  * scale. Because stored bytes come back verbatim, the CONSUMER is the
  * one decompressing — the codec round-trips through the wire for
  * real. A fetch from an offset inside a batch returns the whole batch
  * (a real broker does too); the source filters records below the
  * requested offset. Appends synchronize per partition; fetch uses
  * positional channel reads, so it never blocks producers.
  */
final class KafkaMiniBroker private (server: ServerSocket,
                                     partsByTopic: Map[String, Int],
                                     logDir: Path) {

  private val closed = new AtomicBoolean(false)

  /** One partition's on-disk log + batch index. `index` rows are
    * (baseOffset, filePos, byteLen); `nextOffset` is the log-end
    * offset, `endPos` the file append position. */
  private final class PartLog(path: Path) {
    val chan: FileChannel = FileChannel.open(path,
      StandardOpenOption.CREATE, StandardOpenOption.READ, StandardOpenOption.WRITE)
    val index = new ArrayBuffer[(Long, Long, Int)]()
    var nextOffset: Long = 0L
    var endPos: Long = 0L
  }

  private val log = TrieMap.empty[(String, Int), PartLog]
  partsByTopic.foreach { case (t, n) =>
    (0 until n).foreach(p => log((t, p)) = new PartLog(logDir.resolve(s"$t-$p.log")))
  }

  def port: Int = server.getLocalPort
  def bootstrap: String = s"127.0.0.1:$port"

  /** Log-end offset (high watermark — everything is "committed"). */
  def endOffset(topic: String, partition: Int): Long = {
    val pl = log((topic, partition))
    pl.synchronized(pl.nextOffset)
  }

  def stop(): Unit = if (closed.compareAndSet(false, true)) {
    try server.close() catch { case _: IOException => () }
    log.values.foreach(pl => try pl.chan.close() catch { case _: IOException => () })
    try {
      val walk = Files.walk(logDir)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().forEachRemaining(Files.deleteIfExists(_))
      finally walk.close()
    } catch { case _: IOException => () }
  }

  // ---- request dispatch ----

  private def serve(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    try {
      while (!closed.get) {
        val len = in.readInt()
        require(len >= 8 && len < (1 << 26), s"kafka broker: bad frame $len")
        val req = new Array[Byte](len)
        in.readFully(req)
        val r = new Reader(req)
        val apiKey = r.i16().toInt
        val version = r.i16().toInt
        val correlation = r.i32()
        r.str() // clientId
        val body = new Writer
        body.i32(correlation)
        apiKey match {
          case ApiVersions    => apiVersionsResp(body)
          case ApiMetadata    => metadataResp(r, body, version)
          case ApiListOffsets => listOffsetsResp(r, body, version)
          case ApiProduce     => produceResp(r, body, version)
          case ApiFetch       => fetchResp(r, body, version)
          case other =>
            throw new IllegalArgumentException(s"kafka broker: api $other unsupported")
        }
        val resp = body.result()
        out.writeInt(resp.length)
        out.write(resp)
        out.flush()
      }
    } catch {
      case _: EOFException | _: SocketException | _: IOException => () // client left
    } finally {
      try sock.close() catch { case _: IOException => () }
    }
  }

  private def apiVersionsResp(w: Writer): Unit = {
    w.i16(0) // errorCode
    w.array(Seq(
      (ApiProduce, 2, 3), (ApiFetch, 0, 4), (ApiListOffsets, 0, 1),
      (ApiMetadata, 0, 1), (ApiVersions, 0, 0))) { (ww, a) =>
      ww.i16(a._1); ww.i16(a._2); ww.i16(a._3)
    }
  }

  private def metadataResp(r: Reader, w: Writer, version: Int): Unit = {
    val requested = r.array(_.str())
    val topics =
      if (requested.isEmpty) partsByTopic.keys.toVector.sorted
      else requested
    // brokers: just this node
    w.array(Seq(0)) { (ww, id) =>
      ww.i32(id); ww.str("127.0.0.1"); ww.i32(port)
      if (version >= 1) ww.str(null) // rack
    }
    if (version >= 1) w.i32(0) // controllerId
    w.array(topics) { (ww, t) =>
      partsByTopic.get(t) match {
        case Some(n) =>
          ww.i16(0); ww.str(t)
          if (version >= 1) ww.i8(0) // isInternal
          ww.array(0 until n) { (www, p) =>
            www.i16(0); www.i32(p); www.i32(0)  // leader = broker 0
            www.array(Seq(0))((b, x) => b.i32(x)) // replicas
            www.array(Seq(0))((b, x) => b.i32(x)) // isr
          }
        case None =>
          ww.i16(3) // UNKNOWN_TOPIC_OR_PARTITION
          ww.str(t)
          if (version >= 1) ww.i8(0)
          ww.array(Seq.empty[Int])((_, _) => ())
      }
    }
  }

  private def listOffsetsResp(r: Reader, w: Writer, version: Int): Unit = {
    r.i32() // replicaId
    val topics = r.array { t =>
      (t.str(), t.array { p =>
        val idx = p.i32(); val ts = p.i64()
        if (version == 0) p.i32() // v0: maxNumOffsets
        (idx, ts)
      })
    }
    w.array(topics) { (ww, t) =>
      ww.str(t._1)
      ww.array(t._2) { (www, p) =>
        val (idx, ts) = p
        log.get((t._1, idx)) match {
          case Some(pl) =>
            val end = pl.synchronized(pl.nextOffset)
            val off = if (ts == EarliestTs) 0L else end
            www.i32(idx); www.i16(0)
            if (version >= 1) { www.i64(-1L); www.i64(off) }
            else www.array(Seq(off))((b, o) => b.i64(o)) // v0: offset array
          case None =>
            www.i32(idx); www.i16(3)
            if (version >= 1) { www.i64(-1L); www.i64(-1L) }
            else www.array(Seq.empty[Long])((_, _) => ())
        }
      }
    }
  }

  /** Append a produced record-SET verbatim: per batch, verify the
    * CRC32C (it covers attributes..records, so no decode is needed),
    * rewrite baseOffset to the assigned offset (the one header field a
    * real broker mutates on append — deliberately OUTSIDE the CRC), and
    * append the bytes as-is. Returns the first assigned offset. */
  private def appendVerbatim(pl: PartLog, data: Array[Byte]): Long = pl.synchronized {
    val first = pl.nextOffset
    var pos = 0
    while (pos + 12 <= data.length) {
      val hdr = ByteBuffer.wrap(data, pos, 12)
      hdr.getLong                         // producer's baseOffset (rewritten)
      val batchLength = hdr.getInt
      require(pos + 12 + batchLength <= data.length,
        s"kafka broker: truncated produce batch at $pos")
      val magic = data(pos + 16)
      require(magic == 2, s"kafka broker: record batch magic $magic (only v2 supported)")
      val crcStored = ByteBuffer.wrap(data, pos + 17, 4).getInt
      val crc = new CRC32C
      crc.update(data, pos + 21, batchLength - 9)
      require(crc.getValue.toInt == crcStored,
        s"kafka broker: produce batch CRC mismatch at file offset ${pl.endPos}")
      // record count from lastOffsetDelta (+1), at attributes+2
      val lastOffsetDelta = ByteBuffer.wrap(data, pos + 23, 4).getInt
      val count = lastOffsetDelta + 1
      ByteBuffer.wrap(data, pos, 8).putLong(pl.nextOffset) // assign offsets
      val batch = ByteBuffer.wrap(data, pos, 12 + batchLength)
      var written = 0
      while (batch.hasRemaining) written += pl.chan.write(batch, pl.endPos + written)
      pl.index += ((pl.nextOffset, pl.endPos, 12 + batchLength))
      pl.nextOffset += count
      pl.endPos += 12 + batchLength
      pos += 12 + batchLength
    }
    first
  }

  private def produceResp(r: Reader, w: Writer, version: Int): Unit = {
    if (version >= 3) r.str() // transactionalId
    r.i16() // acks
    r.i32() // timeout
    val topics = r.array { t =>
      (t.str(), t.array { p => (p.i32(), p.bytes()) })
    }
    w.array(topics) { (ww, t) =>
      ww.str(t._1)
      ww.array(t._2) { (www, pr) =>
        val (idx, data) = pr
        log.get((t._1, idx)) match {
          case Some(pl) =>
            val base = appendVerbatim(pl, data)
            www.i32(idx); www.i16(0); www.i64(base)
            if (version >= 2) www.i64(-1L) // logAppendTime (CreateTime in use)
          case None =>
            www.i32(idx); www.i16(3); www.i64(-1L)
            if (version >= 2) www.i64(-1L)
        }
      }
    }
    if (version >= 1) w.i32(0) // throttle
  }

  private def fetchResp(r: Reader, w: Writer, version: Int): Unit = {
    r.i32() // replicaId
    r.i32() // maxWaitMs
    r.i32() // minBytes
    val respMaxBytes = if (version >= 3) r.i32() else (1 << 20)
    if (version >= 4) r.i8() // isolationLevel
    val topics = r.array { t =>
      (t.str(), t.array { p =>
        val idx = p.i32(); val off = p.i64(); val pmax = p.i32()
        (idx, off, pmax)
      })
    }
    if (version >= 1) w.i32(0) // throttle
    w.array(topics) { (ww, t) =>
      ww.str(t._1)
      ww.array(t._2) { (www, pr) =>
        val (idx, off, pmax) = pr
        log.get((t._1, idx)) match {
          case Some(pl) =>
            // snapshot under the lock; file reads happen outside it
            // (positional reads never see past endPos from the snapshot)
            val (end, span) = pl.synchronized {
              val e = pl.nextOffset
              if (off < 0 || off > e) (e, null)
              else if (off == e) (e, (0L, 0L)) // caught up: empty records
              else {
                // first batch whose LAST offset >= off (binary search on
                // base offsets, then step back one if the previous batch
                // still covers off)
                var lo = 0; var hi = pl.index.length - 1; var s = pl.index.length - 1
                while (lo <= hi) {
                  val mid = (lo + hi) >>> 1
                  if (pl.index(mid)._1 <= off) { s = mid; lo = mid + 1 }
                  else hi = mid - 1
                }
                val cap = math.min(respMaxBytes, pmax).toLong
                val startPos = pl.index(s)._2
                var endIdx = s
                // always ship ≥1 whole batch so the consumer progresses
                while (endIdx + 1 < pl.index.length &&
                       pl.index(endIdx)._2 + pl.index(endIdx)._3 - startPos < cap)
                  endIdx += 1
                val endPos = pl.index(endIdx)._2 + pl.index(endIdx)._3
                (e, (startPos, endPos))
              }
            }
            // error 1 = OFFSET_OUT_OF_RANGE, as a real broker answers
            www.i32(idx); www.i16(if (span == null) 1 else 0); www.i64(end)
            if (version >= 4) {
              www.i64(end)                          // lastStableOffset
              www.array(Seq.empty[Int])((_, _) => ()) // abortedTransactions
            }
            if (span == null) www.bytes(null)
            else {
              val (s0, s1) = span
              if (s1 == s0) www.bytes(Array.emptyByteArray)
              else {
                val buf = ByteBuffer.allocate((s1 - s0).toInt)
                var read = 0
                while (buf.hasRemaining) {
                  val n = pl.chan.read(buf, s0 + read)
                  require(n > 0, s"kafka broker: short log read at $s0")
                  read += n
                }
                www.bytes(buf.array())
              }
            }
          case None =>
            www.i32(idx); www.i16(3); www.i64(-1L)
            if (version >= 4) {
              www.i64(-1L); www.array(Seq.empty[Int])((_, _) => ())
            }
            www.bytes(null)
        }
      }
    }
  }
}

object KafkaMiniBroker {

  /** Start on an ephemeral loopback port with the given topics
    * (name → partition count). Partition logs live under a fresh temp
    * directory, removed on stop().
    */
  def start(topics: Map[String, Int]): KafkaMiniBroker = {
    val server = new ServerSocket(0, 64, InetAddress.getByName("127.0.0.1"))
    val logDir = Files.createTempDirectory("graft_kafka_log")
    val broker = new KafkaMiniBroker(server, topics, logDir)
    val acceptor = new Thread(() => {
      try {
        while (!broker.closed.get) {
          val sock = server.accept()
          val t = new Thread(() => broker.serve(sock), s"graft-kafka-conn")
          t.setDaemon(true)
          t.start()
        }
      } catch {
        case _: SocketException | _: IOException => () // closed
      }
    }, "graft-kafka-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
    broker
  }
}
