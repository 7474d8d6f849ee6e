package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{InetAddress, ServerSocket, Socket, SocketException}
import java.util.concurrent.atomic.AtomicBoolean

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
  * The log is in-memory and decoded (one `(timestampMs, key, value)`
  * triple per record); Fetch re-encodes record batches from the
  * requested offset, capped at the request's `maxBytes` but always at
  * least one batch so consumers make progress — the same contract a
  * real broker honors. Appends synchronize per partition; each
  * connection gets its own thread (bounded: one per Spark task + one
  * per driver client).
  */
final class KafkaMiniBroker private (server: ServerSocket,
                                     partsByTopic: Map[String, Int]) {

  private val closed = new AtomicBoolean(false)
  private val log = TrieMap.empty[(String, Int), ArrayBuffer[(Long, Array[Byte], Array[Byte])]]
  partsByTopic.foreach { case (t, n) =>
    (0 until n).foreach(p => log((t, p)) = ArrayBuffer.empty)
  }

  def port: Int = server.getLocalPort
  def bootstrap: String = s"127.0.0.1:$port"

  /** Log-end offset (high watermark — everything is "committed"). */
  def endOffset(topic: String, partition: Int): Long = {
    val buf = log((topic, partition))
    buf.synchronized(buf.length.toLong)
  }

  def stop(): Unit = if (closed.compareAndSet(false, true)) {
    try server.close() catch { case _: IOException => () }
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
          case Some(buf) =>
            val end = buf.synchronized(buf.length.toLong)
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
          case Some(buf) =>
            val records = decodeBatches(data)
            val base = buf.synchronized {
              val b = buf.length.toLong
              records.foreach(rec => buf += ((rec.timestampMs, rec.key, rec.value)))
              b
            }
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
          case Some(buf) =>
            val (end, slice) = buf.synchronized {
              val e = buf.length.toLong
              if (off < 0 || off > e) (e, null)
              else (e, buf.drop(off.toInt).toVector)
            }
            // error 1 = OFFSET_OUT_OF_RANGE, as a real broker answers
            www.i32(idx); www.i16(if (slice == null) 1 else 0); www.i64(end)
            if (version >= 4) {
              www.i64(end)                          // lastStableOffset
              www.array(Seq.empty[Int])((_, _) => ()) // abortedTransactions
            }
            if (slice == null) www.bytes(null)
            else if (off >= end || slice.isEmpty) www.bytes(Array.emptyByteArray)
            else {
              // batches of ≤512 records; stop past maxBytes but always
              // send the first batch so the consumer makes progress
              val cap = math.min(respMaxBytes, pmax)
              val out = new Writer
              var base = off
              val groups = slice.grouped(512)
              var full = false
              while (groups.hasNext && !full) {
                val g = groups.next()
                out.raw(encodeBatch(base, g))
                base += g.length
                full = out.size >= cap // ≥1 batch always ships
              }
              www.bytes(out.result())
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
    * (name → partition count).
    */
  def start(topics: Map[String, Int]): KafkaMiniBroker = {
    val server = new ServerSocket(0, 64, InetAddress.getByName("127.0.0.1"))
    val broker = new KafkaMiniBroker(server, topics)
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
