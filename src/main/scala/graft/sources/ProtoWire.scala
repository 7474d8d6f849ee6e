package graft.sources

/** Minimal protobuf wire primitives shared by the hand-rolled wire
  * decoders ([[PromRemote]], [[LokiPush]], [[OtlpTrace]]) — a varint/
  * tag walker plus the matching writer half. The reference decodes
  * these protocols with prost (`common/protos/`,
  * `common/protocol_parser/src/json_protocol/parser.rs:177,218`); here
  * the message subsets are tiny and fixed by their public specs, so a
  * ~60-line walker replaces a protobuf runtime dependency (none ships
  * in /opt/spark/jars). Unknown fields are skipped by wire type, per
  * proto compatibility rules, so payloads from newer senders decode.
  */
private[sources] object ProtoWire {

  def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  def writeLenDelim(out: java.io.ByteArrayOutputStream, field: Int,
                    bytes: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2); writeVarint(out, bytes.length.toLong)
    out.write(bytes)
  }

  def writeString(out: java.io.ByteArrayOutputStream, field: Int, s: String): Unit =
    writeLenDelim(out, field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def writeVarintField(out: java.io.ByteArrayOutputStream, field: Int, v: Long): Unit = {
    writeVarint(out, (field << 3) | 0); writeVarint(out, v)
  }

  def writeFixed64(out: java.io.ByteArrayOutputStream, field: Int, v: Long): Unit = {
    writeVarint(out, (field << 3) | 1)
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  final class Reader(val b: Array[Byte], var p: Int, val end: Int) {
    def hasNext: Boolean = p < end
    def varint(): Long = {
      var v = 0L; var shift = 0
      while (true) {
        val x = b(p); p += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
        require(shift < 64, "proto wire: varint overflow")
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
      require(n >= 0 && p + n <= end, "proto wire: truncated field")
      val r = new Reader(b, p, p + n); p += n; r
    }
    def string(): String = {
      val n = varint().toInt
      require(n >= 0 && p + n <= end, "proto wire: truncated string")
      val s = new String(b, p, n, java.nio.charset.StandardCharsets.UTF_8)
      p += n; s
    }
    def bytes(): Array[Byte] = {
      val n = varint().toInt
      require(n >= 0 && p + n <= end, "proto wire: truncated bytes")
      val out = java.util.Arrays.copyOfRange(b, p, p + n)
      p += n; out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => p += 8
      case 2 => val n = varint().toInt; p += n
      case 5 => p += 4
      case t => throw new IllegalArgumentException(s"proto wire: wire type $t")
    }
  }
}
