package graft.sources.kafka

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.KafkaWire

/** `format("graft-kafka")` — a Spark DSv2 source over the from-scratch
  * Kafka wire client ([[graft.sources.KafkaWire]]), closing the last
  * transport descope (SURVEY §2.5 #1): the reference's stream tables
  * consume Kafka topics (`query_server/query/src/stream/` — offset
  * trackers per topic-partition feeding watermarked windows;
  * `ddl/create_stream_table.slt`), and this source is that exact shape
  * on Spark:
  *
  *   - one INPUT PARTITION per topic-partition per micro-batch — on a
  *     real cluster a 1,024-partition topic fans out to 1,024 parallel
  *     fetch loops with zero driver-side data; the driver only tracks
  *     an offset map (per-partition longs, same as the checkpoint the
  *     reference's `stream/` offset trackers persist);
  *   - micro-batch boundaries via [[SupportsAdmissionControl]]
  *     (`maxOffsetsPerTrigger` rations rows per trigger, allocated
  *     across partitions proportional to their backlog) and
  *     [[SupportsTriggerAvailableNow]] (AvailableNow pins the end
  *     offsets at query start — bounded replay, same contract as the
  *     stock connector);
  *   - the fixed 7-column Kafka frame (key/value binary, topic,
  *     partition, offset, timestamp, timestampType), so every
  *     downstream graft transform written against the stock
  *     connector's schema runs unchanged — `KafkaTransportSpec`'s
  *     configuration-swap claim, now executable on this box.
  *
  * Readers verify record-batch CRC32C on every fetch; offsets restart
  * exactly from the checkpoint map (at-least-once into an idempotent
  * sink, exactly-once through the offset-log dedup Spark's streaming
  * engine provides — identical guarantees to the stock source).
  */
class GraftKafkaProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftKafka.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftKafkaTable(properties.asScala.toMap)
}

object GraftKafka {
  /** The stock Kafka connector's frame, verbatim. */
  val Schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  def parseBootstrap(opts: Map[String, String]): (String, Int) = {
    val bs = opts.getOrElse("bootstrap",
      opts.getOrElse("kafka.bootstrap.servers",
        sys.error("graft-kafka: set option 'bootstrap' (host:port)")))
    val hp = bs.split(",").head.split(":")
    require(hp.length == 2, s"graft-kafka: bad bootstrap '$bs'")
    (hp(0), hp(1).toInt)
  }

  /** Offsets serialized into the checkpoint's offset log — canonical
    * JSON with sorted integer keys so equal maps compare equal as
    * strings (the offset log compares serialized forms).
    */
  def offsetJson(offsets: Map[Int, Long]): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")

  def parseOffsetJson(s: String): Map[Int, Long] = {
    val t = s.trim
    require(t.startsWith("{") && t.endsWith("}"), s"graft-kafka: bad offset '$s'")
    val inner = t.substring(1, t.length - 1).trim
    if (inner.isEmpty) Map.empty
    else inner.split(",").map { kv =>
      val Array(k, v) = kv.split(":")
      k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
    }.toMap
  }
}

final case class GraftKafkaOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String = GraftKafka.offsetJson(offsets)
}

class GraftKafkaTable(options: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  private val topic = options.get("subscribe").orElse(options.get("topic"))
    .getOrElse(sys.error("graft-kafka: set option 'subscribe' (read) or 'topic' (write)"))
  override def name(): String = s"graft-kafka:$topic"
  override def schema(): StructType = GraftKafka.Schema
  // ACCEPT_ANY_SCHEMA: writes carry the QUERY's schema (value + optional
  // key/partition/topic/timestamp columns), same contract as the stock sink
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = options ++ caseInsensitive.asScala
    new ScanBuilder {
      override def build(): Scan = new GraftKafkaScan(merged, topic)
    }
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val merged = options ++ info.options.asScala
    new WriteBuilder {
      override def build(): Write = new GraftKafkaWrite(merged, topic, info.schema())
    }
  }
}

class GraftKafkaScan(options: Map[String, String], topic: String) extends Scan {
  override def readSchema(): StructType = GraftKafka.Schema
  override def description(): String = s"graft-kafka topic=$topic"
  override def toBatch: Batch = new GraftKafkaBatch(options, topic)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftKafkaMicroBatch(options, topic)
}

/** Shared driver-side broker interrogation. */
private[kafka] trait KafkaEndpoints {
  def options: Map[String, String]
  def topic: String
  protected lazy val (host, port) = GraftKafka.parseBootstrap(options)

  protected def withClient[T](f: KafkaWire.Client => T): T = {
    val c = new KafkaWire.Client(host, port)
    try f(c) finally c.close()
  }
  protected def partitions(c: KafkaWire.Client): Vector[Int] = {
    val metas = c.metadata(Seq(topic))
    require(metas.nonEmpty, s"graft-kafka: unknown topic $topic")
    metas.head.partitions.map(_.partition)
  }
  protected def offsetsAt(ts: Long): Map[Int, Long] = withClient { c =>
    partitions(c).map(p => p -> c.listOffset(topic, p, ts)).toMap
  }

  protected def plan(start: Map[Int, Long],
                     end: Map[Int, Long]): Array[InputPartition] =
    end.toSeq.sortBy(_._1).flatMap { case (p, e) =>
      val s = start.getOrElse(p, 0L)
      if (e > s) Some(GraftKafkaInputPartition(host, port, topic, p, s, e))
      else None
    }.toArray
}

class GraftKafkaBatch(val options: Map[String, String], val topic: String)
    extends Batch with KafkaEndpoints {
  override def planInputPartitions(): Array[InputPartition] =
    plan(offsetsAt(KafkaWire.EarliestTs), offsetsAt(KafkaWire.LatestTs))
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftKafkaReaderFactory
}

class GraftKafkaMicroBatch(val options: Map[String, String], val topic: String)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow with KafkaEndpoints {

  private val maxPerTrigger: Option[Long] =
    options.get("maxOffsetsPerTrigger").map(_.toLong)
  // AvailableNow: end offsets pinned at query start
  @volatile private var availableNowBound: Option[Map[Int, Long]] = None

  override def initialOffset(): Offset = {
    val starting = options.getOrElse("startingOffsets", "earliest")
    val ts = starting match {
      case "earliest" => KafkaWire.EarliestTs
      case "latest" => KafkaWire.LatestTs
      case other => sys.error(s"graft-kafka: startingOffsets '$other'")
    }
    GraftKafkaOffset(offsetsAt(ts))
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = Some(offsetsAt(KafkaWire.LatestTs))

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def reportLatestOffset(): Offset =
    GraftKafkaOffset(offsetsAt(KafkaWire.LatestTs))

  override def latestOffset(): Offset =
    sys.error("graft-kafka: latestOffset(start, limit) is the only entry " +
      "point (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startMap = start.asInstanceOf[GraftKafkaOffset].offsets
    val endMap = availableNowBound.getOrElse(offsetsAt(KafkaWire.LatestTs))
    val capped = limit match {
      case mr: ReadMaxRows =>
        val backlog = endMap.map { case (p, e) =>
          p -> math.max(0L, e - startMap.getOrElse(p, 0L))
        }
        val total = backlog.values.sum
        if (total <= mr.maxRows) endMap
        else {
          // proportional rationing; ≥1 row per backlogged partition so
          // every partition makes progress and the query terminates
          val f = mr.maxRows.toDouble / total
          endMap.map { case (p, e) =>
            val s = startMap.getOrElse(p, 0L)
            val take = math.min(e - s, math.max(1L, ((e - s) * f).toLong))
            p -> (s + math.max(0L, take))
          }
        }
      case _ => endMap
    }
    GraftKafkaOffset(capped)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    plan(start.asInstanceOf[GraftKafkaOffset].offsets,
      end.asInstanceOf[GraftKafkaOffset].offsets)

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftKafkaReaderFactory

  override def deserializeOffset(json: String): Offset =
    GraftKafkaOffset(GraftKafka.parseOffsetJson(json))

  override def commit(end: Offset): Unit = () // broker holds no consumer state
  override def stop(): Unit = ()
}

final case class GraftKafkaInputPartition(host: String, port: Int,
                                          topic: String, partition: Int,
                                          startOffset: Long, endOffset: Long)
    extends InputPartition

class GraftKafkaReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftKafkaPartitionReader(partition.asInstanceOf[GraftKafkaInputPartition])
}

/** One fetch loop per topic-partition: streams [startOffset, endOffset)
  * in bounded fetches — memory per task is one fetch response, never a
  * partition's worth.
  */
class GraftKafkaPartitionReader(p: GraftKafkaInputPartition)
    extends PartitionReader[InternalRow] {

  private val client = new KafkaWire.Client(p.host, p.port)
  private val topicUtf8 = UTF8String.fromString(p.topic)
  private var nextOffset = p.startOffset
  private var buffer: Iterator[KafkaWire.Record] = Iterator.empty
  private var current: KafkaWire.Record = _

  override def next(): Boolean = {
    while (!buffer.hasNext && nextOffset < p.endOffset) {
      val res = client.fetch(p.topic, p.partition, nextOffset)
      val recs = res.records.filter(r =>
        r.offset >= nextOffset && r.offset < p.endOffset)
      require(res.records.nonEmpty || res.highWatermark <= nextOffset,
        s"graft-kafka: empty fetch below high watermark at $nextOffset")
      if (recs.isEmpty && res.records.isEmpty) {
        // end of log before endOffset — offsets beyond HW don't exist
        require(res.highWatermark >= p.endOffset || nextOffset >= res.highWatermark,
          s"graft-kafka: stalled at $nextOffset (hw ${res.highWatermark})")
        if (nextOffset >= res.highWatermark) nextOffset = p.endOffset // drained
      } else {
        nextOffset = math.max(nextOffset + 1,
          res.records.map(_.offset).max + 1)
        buffer = recs.iterator
      }
    }
    if (buffer.hasNext) { current = buffer.next(); true } else false
  }

  override def get(): InternalRow = {
    val r = current
    new GenericInternalRow(Array[Any](
      r.key, r.value, topicUtf8, p.partition, r.offset,
      r.timestampMs * 1000L, 0)) // micros; 0 = CreateTime
  }

  override def close(): Unit = client.close()
}

// ---- write half: the Kafka SINK (batch `df.write` + streaming
// `df.writeStream.format("graft-kafka")`) ----

/** The write schema is the QUERY's (ACCEPT_ANY_SCHEMA): `value`
  * (binary|string, required), optional `key` (binary|string),
  * `partition` (int — explicit placement), `topic` (string — per-row
  * override of the `topic` option), `timestamp` (timestamp, micros →
  * record ms; or long, taken as ms). Rows without `partition` place by
  * Murmur3 of the key bytes (value bytes when key is null) mod the
  * topic's partition count — deterministic across runs and executors.
  *
  * Semantics match the stock Kafka sink: appends are immediate and
  * un-transactional, so a re-executed task/epoch re-produces —
  * AT-LEAST-ONCE into the topic; exactly-once needs an idempotent or
  * offset-deduping consumer downstream. Each task buffers per
  * (topic, partition) and flushes bounded record batches (order within
  * a partition = row order within the task), so task memory is one
  * flush buffer, never the task's whole input.
  */
class GraftKafkaWrite(options: Map[String, String], topic: String,
                      querySchema: StructType)
    extends Write with BatchWrite with StreamingWrite {
  private val (host, port) = GraftKafka.parseBootstrap(options)
  private val codec =
    KafkaWire.codecOf(options.getOrElse("compression", "none"))

  override def description(): String = s"graft-kafka sink topic=$topic"
  override def toBatch: BatchWrite = this
  override def toStreaming: StreamingWrite = this
  // BatchWrite and StreamingWrite both default this method; the
  // diamond needs one explicit pick (no coordination — appends commute)
  override def useCommitCoordinator(): Boolean = false

  private def factory = GraftKafkaWriterFactory(host, port, topic, querySchema, codec)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    factory
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    factory

  // appends are visible on produce; nothing to finalize or roll back
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private[kafka] case object GraftKafkaCommit extends WriterCommitMessage

final case class GraftKafkaWriterFactory(host: String, port: Int,
                                         topic: String, schema: StructType,
                                         codec: Int)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftKafkaDataWriter(host, port, topic, schema, codec)
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftKafkaDataWriter(host, port, topic, schema, codec)
}

class GraftKafkaDataWriter(host: String, port: Int, defaultTopic: String,
                           schema: StructType, codec: Int)
    extends DataWriter[InternalRow] {

  private val FlushRecords = 2048

  private def fieldIdx(name: String): Int = schema.fieldNames.indexOf(name)
  private val valueIdx = fieldIdx("value")
  require(valueIdx >= 0, "graft-kafka sink: query must project a 'value' column")
  private val keyIdx = fieldIdx("key")
  private val partIdx = fieldIdx("partition")
  private val topicIdx = fieldIdx("topic")
  private val tsIdx = fieldIdx("timestamp")
  Seq(valueIdx, keyIdx).filter(_ >= 0).foreach { i =>
    val dt = schema.fields(i).dataType
    require(dt == BinaryType || dt == StringType,
      s"graft-kafka sink: '${schema.fields(i).name}' must be binary or string, got $dt")
  }

  private var clientOpened = false
  private lazy val client = {
    clientOpened = true; new KafkaWire.Client(host, port)
  }
  private lazy val partCounts = scala.collection.mutable.Map.empty[String, Int]
  private def nParts(t: String): Int = partCounts.getOrElseUpdate(t, {
    val metas = client.metadata(Seq(t))
    require(metas.nonEmpty, s"graft-kafka sink: unknown topic $t")
    metas.head.partitions.size
  })

  private val buffers = scala.collection.mutable.LinkedHashMap
    .empty[(String, Int), scala.collection.mutable.ArrayBuffer[(Long, Array[Byte], Array[Byte])]]

  private def bin(row: InternalRow, i: Int): Array[Byte] =
    if (i < 0 || row.isNullAt(i)) null
    else schema.fields(i).dataType match {
      case BinaryType => row.getBinary(i)
      case _ => row.getUTF8String(i).getBytes
    }

  override def write(row: InternalRow): Unit = {
    val value = bin(row, valueIdx)
    val key = bin(row, keyIdx)
    val t =
      if (topicIdx >= 0 && !row.isNullAt(topicIdx))
        row.getUTF8String(topicIdx).toString
      else defaultTopic
    val ts =
      if (tsIdx < 0 || row.isNullAt(tsIdx)) -1L
      else schema.fields(tsIdx).dataType match {
        case TimestampType => row.getLong(tsIdx) / 1000L // µs → ms
        case LongType => row.getLong(tsIdx)
        case dt => sys.error(s"graft-kafka sink: 'timestamp' must be timestamp or long, got $dt")
      }
    val p =
      if (partIdx >= 0 && !row.isNullAt(partIdx)) row.getInt(partIdx)
      else {
        val basis = if (key != null) key else if (value != null) value else Array.emptyByteArray
        java.lang.Math.floorMod(
          scala.util.hashing.MurmurHash3.bytesHash(basis, 0x9747b28c), nParts(t))
      }
    val buf = buffers.getOrElseUpdate((t, p),
      scala.collection.mutable.ArrayBuffer.empty)
    buf += ((ts, key, value))
    if (buf.length >= FlushRecords) flush(t, p, buf)
  }

  private def flush(t: String, p: Int,
                    buf: scala.collection.mutable.ArrayBuffer[(Long, Array[Byte], Array[Byte])]): Unit =
    if (buf.nonEmpty) {
      client.produce(t, p, buf.toSeq, codec)
      buf.clear()
    }

  override def commit(): WriterCommitMessage = {
    buffers.foreach { case ((t, p), buf) => flush(t, p, buf) }
    GraftKafkaCommit
  }

  override def abort(): Unit = () // already-produced batches are not retractable
  override def close(): Unit = if (clientOpened) client.close()
}
