package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{KafkaMiniBroker, KafkaWire}

/** The Kafka TRANSPORT, executable end-to-end on this box (closes the
  * SURVEY §2.5 #1 descope that `KafkaTransportSpec` could only
  * assume-cancel): record-batch v2 codec round-trips with CRC32C
  * verification, the five wire APIs over a REAL loopback TCP hop
  * against [[KafkaMiniBroker]], and the `graft-kafka` DSv2 source —
  * partition-parallel batch reads, maxOffsetsPerTrigger micro-batch
  * slicing under AvailableNow, and checkpointed offset resume
  * delivering exactly once.
  */
class KafkaWireSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def bytes(s: String): Array[Byte] =
    if (s == null) null else s.getBytes("UTF-8")
  private def str(b: Array[Byte]): String =
    if (b == null) null else new String(b, "UTF-8")

  // ---- codec ----

  test("record batch v2 round-trips with CRC32C, null keys, unicode") {
    val recs = Seq(
      (1704067200000L, bytes("k0"), bytes("v0")),
      (1704067200123L, null, bytes("héllo ☃ wörld")),
      (1704067199000L, bytes(""), null), // ts BEFORE base: negative delta
      (1704067299999L, bytes("k3"), bytes("x" * 3000)))
    val enc = KafkaWire.encodeBatch(42L, recs)
    val dec = KafkaWire.decodeBatches(enc)
    assert(dec.length == 4)
    assert(dec.map(_.offset) == Vector(42L, 43L, 44L, 45L))
    assert(dec.map(_.timestampMs) == recs.map(_._1).toVector)
    assert(str(dec(1).value) == "héllo ☃ wörld")
    assert(dec(1).key == null && dec(2).value == null)
    assert(dec(2).key.length == 0)
    // multiple batches back to back (a fetch response's record set)
    val two = enc ++ KafkaWire.encodeBatch(46L, recs.take(1))
    assert(KafkaWire.decodeBatches(two).length == 5)
    // truncated trailing batch (broker cut at maxBytes) is skipped
    assert(KafkaWire.decodeBatches(two.dropRight(7)).length == 4)
    // corruption is CAUGHT, not decoded: flip one value byte
    val bad = enc.clone(); bad(enc.length - 5) = (bad(enc.length - 5) ^ 1).toByte
    val e = intercept[IllegalArgumentException](KafkaWire.decodeBatches(bad))
    assert(e.getMessage.contains("CRC"))
  }

  test("compressed record batches round-trip for every codec") {
    val recs = (0 until 500).map(i =>
      (1704067200000L + i, bytes(s"k$i"), bytes(s"payload $i " + "z" * 100)))
    for (codec <- Seq(KafkaWire.CodecGzip, KafkaWire.CodecSnappy,
      KafkaWire.CodecLz4, KafkaWire.CodecZstd)) {
      val enc = KafkaWire.encodeBatch(10L, recs, codec)
      assert(enc.length < KafkaWire.encodeBatch(10L, recs).length,
        s"codec $codec should shrink a repetitive payload")
      val dec = KafkaWire.decodeBatches(enc)
      assert(dec.length == 500, s"codec $codec")
      assert(dec.head.offset == 10L && dec.last.offset == 509L)
      assert(str(dec(3).value).startsWith("payload 3 "), s"codec $codec")
      // corruption inside the COMPRESSED payload is still caught by the
      // CRC before any decompressor sees the bytes
      val bad = enc.clone(); bad(enc.length - 3) = (bad(enc.length - 3) ^ 1).toByte
      val e = intercept[IllegalArgumentException](KafkaWire.decodeBatches(bad))
      assert(e.getMessage.contains("CRC"), s"codec $codec")
    }
    // compressed produce lands decoded on the broker like plain produce
    val broker = graft.sources.KafkaMiniBroker.start(Map("c" -> 1))
    try {
      val c = new KafkaWire.Client("127.0.0.1", broker.port)
      try {
        c.produce("c", 0, recs.take(5), KafkaWire.CodecZstd)
        c.produce("c", 0, recs.slice(5, 9), KafkaWire.CodecGzip)
        val got = c.fetch("c", 0, 0L)
        assert(got.records.map(r => str(r.value)) ==
          recs.take(9).map(r => str(r._3)).toVector)
      } finally c.close()
    } finally broker.stop()
  }

  test("zigzag varints round-trip extreme values") {
    val w = new KafkaWire.Writer
    val vals = Seq(0L, 1L, -1L, 63L, -64L, 64L, 300L, -301L,
      Int.MaxValue.toLong, Int.MinValue.toLong, Long.MaxValue, Long.MinValue)
    vals.foreach(w.varlong)
    val r = new KafkaWire.Reader(w.result())
    vals.foreach(v => assert(r.varlong() == v, s"varlong $v"))
  }

  // ---- wire APIs over loopback TCP ----

  test("the broker log stores compressed batches VERBATIM; the consumer decompresses") {
    val broker = KafkaMiniBroker.start(Map("comp" -> 1))
    try {
      val c = new KafkaWire.Client("127.0.0.1", broker.port)
      try {
        // snappy on the produce side; the broker never decodes records
        // (it only rewrites baseOffset + verifies the CRC), so the
        // fetch returns the SAME compressed bytes and this client-side
        // decode is the real codec round-trip
        val rows = (0 until 100).map(i => (1000L + i, bytes(s"k$i"), bytes(s"v$i" * 10)))
        assert(c.produce("comp", 0, rows, KafkaWire.CodecSnappy) == 0L)
        assert(c.produce("comp", 0, Seq((5000L, bytes("g"), bytes("gz"))),
          KafkaWire.CodecGzip) == 100L)
        val res = c.fetch("comp", 0, 0L)
        assert(res.records.length == 101)
        assert(str(res.records.head.value) == "v0" * 10)
        assert(str(res.records.last.value) == "gz" && res.records.last.offset == 100L)
        // mid-batch fetch: the whole containing batch ships; the
        // consumer skips below the requested offset
        val mid = c.fetch("comp", 0, 42L)
        assert(mid.records.head.offset == 42L && mid.records.length == 59)
      } finally c.close()
    } finally broker.stop()
  }

  test("five wire APIs round-trip against the mini broker") {
    val broker = KafkaMiniBroker.start(Map("events" -> 3))
    try {
      val c = new KafkaWire.Client("127.0.0.1", broker.port)
      try {
        val vers = c.apiVersions()
        assert(vers(KafkaWire.ApiFetch)._2 >= 4 && vers(KafkaWire.ApiProduce)._2 >= 3)
        val meta = c.metadata(Seq("events"))
        assert(meta.head.name == "events" && meta.head.partitions.size == 3)
        assert(c.listOffset("events", 1, KafkaWire.LatestTs) == 0L)
        val base = c.produce("events", 1, Seq(
          (1000L, bytes("a"), bytes("r0")), (2000L, null, bytes("r1"))))
        assert(base == 0L)
        assert(c.produce("events", 1, Seq((3000L, bytes("b"), bytes("r2")))) == 2L)
        assert(c.listOffset("events", 1, KafkaWire.LatestTs) == 3L)
        assert(c.listOffset("events", 1, KafkaWire.EarliestTs) == 0L)
        // fetch from the middle: skips r0, delivers r1+r2 with offsets
        val res = c.fetch("events", 1, 1L)
        assert(res.highWatermark == 3L)
        assert(res.records.map(r => (r.offset, str(r.value))) ==
          Vector((1L, "r1"), (2L, "r2")))
        // other partitions untouched
        assert(c.listOffset("events", 0, KafkaWire.LatestTs) == 0L)
        val empty = c.fetch("events", 0, 0L)
        assert(empty.records.isEmpty && empty.highWatermark == 0L)
      } finally c.close()
    } finally broker.stop()
  }

  // ---- Spark DSv2 source ----

  private def seed(broker: KafkaMiniBroker, topic: String,
                   parts: Int, rowsPerPart: Int): Unit = {
    val c = new KafkaWire.Client("127.0.0.1", broker.port)
    try {
      (0 until parts).foreach { p =>
        val recs = (0 until rowsPerPart).map { i =>
          (1704067200000L + i * 1000L, bytes(s"k$p-$i"), bytes(s"p$p i$i v${i * p}"))
        }
        // two produce calls: proves append re-basing across batches
        c.produce(topic, p, recs.take(rowsPerPart / 2))
        c.produce(topic, p, recs.drop(rowsPerPart / 2))
      }
    } finally c.close()
  }

  test("batch read fans out one input partition per topic partition") {
    val broker = KafkaMiniBroker.start(Map("ev" -> 4))
    try {
      seed(broker, "ev", 4, 50)
      val df = spark.read.format("graft-kafka")
        .option("bootstrap", broker.bootstrap)
        .option("subscribe", "ev").load()
      assert(df.schema.fieldNames.toSeq == Seq("key", "value", "topic",
        "partition", "offset", "timestamp", "timestampType"))
      assert(df.rdd.getNumPartitions == 4) // partition-parallel fetch
      assert(df.count() == 200)
      import spark.implicits._
      val byPart = df.groupBy("partition").agg(count(lit(1)).as("n"),
          min("offset").as("lo"), max("offset").as("hi"))
        .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
      assert(byPart.toSeq == (0 until 4).map(p => (p, 50L, 0L, 49L)))
      val r = df.filter($"partition" === 2 && $"offset" === 7L)
        .select($"key".cast("string"), $"value".cast("string"))
        .as[(String, String)].head()
      assert(r == (("k2-7", "p2 i7 v14")))
    } finally broker.stop()
  }

  test("maxOffsetsPerTrigger slices AvailableNow into real micro-batches") {
    val broker = KafkaMiniBroker.start(Map("ev" -> 2))
    try {
      seed(broker, "ev", 2, 40) // 80 rows total
      val root = Files.createTempDirectory("graft_kafka_stream").toString
      val q = spark.readStream.format("graft-kafka")
        .option("bootstrap", broker.bootstrap)
        .option("subscribe", "ev")
        .option("maxOffsetsPerTrigger", "25")
        .load()
        .selectExpr("CAST(value AS STRING) AS v", "partition", "offset")
        .writeStream.format("parquet")
        .option("path", s"$root/data")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 3, s"expected ≥3 micro-batches, got $batches") // 80/25
      val out = spark.read.parquet(s"$root/data")
      assert(out.count() == 80)
      assert(out.select("partition", "offset").distinct().count() == 80)

      // restart on the SAME checkpoint after producing more: resumes
      // from the recorded offsets, appends exactly the new rows
      val c = new KafkaWire.Client("127.0.0.1", broker.port)
      try c.produce("ev", 1, Seq((1704067300000L, null, bytes("late-row"))))
      finally c.close()
      val q2 = spark.readStream.format("graft-kafka")
        .option("bootstrap", broker.bootstrap)
        .option("subscribe", "ev")
        .option("maxOffsetsPerTrigger", "25")
        .load()
        .selectExpr("CAST(value AS STRING) AS v", "partition", "offset")
        .writeStream.format("parquet")
        .option("path", s"$root/data")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q2.awaitTermination()
      val out2 = spark.read.parquet(s"$root/data")
      assert(out2.count() == 81)
      assert(out2.filter(col("v") === "late-row").count() == 1)
    } finally broker.stop()
  }

  test("batch sink: df.write places by explicit partition or key hash") {
    val broker = KafkaMiniBroker.start(Map("out" -> 3))
    try {
      import spark.implicits._
      // explicit partition column wins
      Seq(("a", "v0", 2), ("b", "v1", 0), ("c", "v2", 2))
        .toDF("key", "value", "partition")
        .write.format("graft-kafka")
        .option("bootstrap", broker.bootstrap).option("topic", "out")
        .mode("append").save()
      assert(broker.endOffset("out", 2) == 2 && broker.endOffset("out", 0) == 1
        && broker.endOffset("out", 1) == 0)
      // no partition column: Murmur3(key bytes) mod nParts, deterministic
      Seq(("k1", "w1"), ("k2", "w2"), ("k1", "w3")).toDF("key", "value")
        .write.format("graft-kafka")
        .option("bootstrap", broker.bootstrap).option("topic", "out")
        .option("compression", "lz4")
        .mode("append").save()
      val read = spark.read.format("graft-kafka")
        .option("bootstrap", broker.bootstrap).option("subscribe", "out").load()
        .selectExpr("CAST(key AS STRING) AS k", "partition")
        .as[(String, Int)].collect()
      assert(read.length == 6)
      val k1Parts = read.filter(_._1 == "k1").map(_._2).distinct
      assert(k1Parts.length == 1, "same key must land in one partition")
      val expected = java.lang.Math.floorMod(
        scala.util.hashing.MurmurHash3.bytesHash("k1".getBytes("UTF-8"), 0x9747b28c), 3)
      assert(k1Parts.head == expected)
    } finally broker.stop()
  }

  test("streaming sink: writeStream appends each micro-batch's rows") {
    val broker = KafkaMiniBroker.start(Map("sout" -> 2))
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
      val root = Files.createTempDirectory("graft_kafka_sink").toString
      val q = mem.toDF().toDF("key", "value")
        .writeStream.format("graft-kafka")
        .option("bootstrap", broker.bootstrap).option("topic", "sout")
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      try {
        mem.addData(("a", "r0"), ("b", "r1"))
        q.processAllAvailable()
        mem.addData(("a", "r2"))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.read.format("graft-kafka")
        .option("bootstrap", broker.bootstrap).option("subscribe", "sout").load()
        .selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)")
        .as[(String, String)].collect().sortBy(_._2)
      assert(rows.toSeq == Seq(("a", "r0"), ("b", "r1"), ("a", "r2")))
    } finally broker.stop()
  }

  test("kafka-shaped frame feeds the graft transforms unchanged") {
    // the configuration-swap claim KafkaTransportSpec records for the
    // stock connector, EXECUTED here: line protocol over the wire into
    // the source-agnostic windowed aggregate
    val broker = KafkaMiniBroker.start(Map("lp" -> 1))
    try {
      val c = new KafkaWire.Client("127.0.0.1", broker.port)
      try c.produce("lp", 0, (0 until 60).map { i =>
        val ns = (1704067200L + i * 600L) * 1000000000L
        (1704067200000L + i * 600000L, null,
          bytes(s"click,user=u${i % 3} value=${i.toDouble} $ns"))
      }) finally c.close()
      import spark.implicits._
      val lines = spark.read.format("graft-kafka")
        .option("bootstrap", broker.bootstrap)
        .option("subscribe", "lp").load()
        .selectExpr("CAST(value AS STRING) AS line").as[String]
      val events = graft.sources.LineProtocol.parseWithField(lines, "value")
      val agg = events
        .withColumn("tstamp", timestamp_micros(expr("ts_ns div 1000")))
        .groupBy(window(col("tstamp"), "1 hour"), col("measurement"))
        .agg(count(lit(1)).as("n"), sum("value").as("s"))
      val rows = agg.select("n").as[Long].collect()
      assert(rows.sum == 60 && rows.length == 10) // 10 hours × 6 rows
    } finally broker.stop()
  }
}
