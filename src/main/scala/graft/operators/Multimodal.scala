package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.4): treat image/audio/video
  * as opaque `binary` columns with typed metadata.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * STUB over a deterministic fake container format:
  *   [int32be width][int32be height][payload bytes]
  * Everything around it — schema, binary column construction,
  * per-partition batch iteration (`mapPartitions`), metadata extraction
  * shape — is real and is what matters for the 100 TB plumbing: the
  * decode kernel is a black box that swaps for libjpeg/ffmpeg on a real
  * cluster.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, width: Int, height: Int, n_bytes: Long)

  /** Fake-encode a payload with a width/height header. */
  def encodeFake(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + payload.length)
    b.putInt(width); b.putInt(height); b.put(payload)
    b.array()
  }

  /** STUB decoder — replace with a real codec (libjpeg/ffmpeg) on a
    * cluster with media libraries. Reads the fake header only.
    */
  def decodeMetaStub(bytes: Array[Byte]): (Int, Int) = {
    val b = ByteBuffer.wrap(bytes)
    (b.getInt(), b.getInt())
  }

  /** Attach a fake binary media column derived from (doc_id, text) —
    * the relational construction (hex/unhex/concat) keeps it codegen'd.
    */
  def withFakeBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("media", concat(
      unhex(lpad(hex(pmod(col(idCol), lit(640)) + 1), 8, "0")),
      unhex(lpad(hex(pmod(col(idCol), lit(480)) + 1), 8, "0")),
      encode(col(textCol), "UTF-8")))

  /** Batch metadata extraction via mapPartitions — the real shape of a
    * decode/feature-extract stage: one iterator pass per partition, no
    * per-row task overhead, columnar in/out.
    */
  def extractMeta(df: DataFrame, idCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h) = decodeMetaStub(bytes)
          MediaMeta(id, w, h, bytes.length.toLong)
        }
      }
  }

  /** Frame-sample stub: deterministic byte-offset sampling of the
    * payload, standing in for video frame extraction.
    */
  def frameSample(df: DataFrame, idCol: String, every: Int): DataFrame =
    df.select(col(idCol), posexplode(expr(
      s"transform(sequence(8, octet_length(media) - 1, $every), i -> substring(media, i + 1, 1))"))
      .as(Seq("frame_idx", "frame_byte")))

  // ---- REAL codecs: BMP + WAV are plain little-endian byte layouts, so
  // they decode with no native libraries — these replace the stub for
  // the image/audio lanes (the fake-container stub remains only as the
  // documented boundary for codecs that DO need libjpeg/ffmpeg).

  final case class BmpMeta(doc_id: Long, width: Int, height: Int,
                           n_bytes: Long, mean_px: Double)

  /** Encode a real 24-bit uncompressed bottom-up BMP. Pixel (x, y) has
    * all three channels equal to `rowByte(y)` — deterministic content
    * whose statistics are SQL-recomputable for the oracle.
    */
  def encodeBmp(width: Int, height: Int, rowByte: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowSize = (3 * width + 3) / 4 * 4 // rows pad to 4-byte boundaries
    val size = 54 + rowSize * height
    val b = ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54)          // reserved, data offset
    b.putInt(40).putInt(width).putInt(height)      // BITMAPINFOHEADER
      .putShort(1).putShort(24)                    // planes, bpp
      .putInt(0).putInt(rowSize * height)          // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < height) { // bottom-up: row 0 is stored last
      val v = (rowByte(height - 1 - y) & 0xff).toByte
      var x = 0
      while (x < width) { b.put(v).put(v).put(v); x += 1 }
      var p = 3 * width
      while (p < rowSize) { b.put(0.toByte); p += 1 }
      y += 1
    }
    b.array()
  }

  /** Decode a real BMP: validates the magic, reads the header geometry,
    * and averages the actual pixel channel bytes (padding excluded) —
    * proof the payload is decoded, not just the header skimmed.
    */
  def decodeBmp(docId: Long, bytes: Array[Byte]): BmpMeta = {
    val b = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(b.get() == 'B' && b.get() == 'M', "not a BMP")
    b.getInt() // file size
    b.getInt() // reserved
    val dataOffset = b.getInt()
    require(b.getInt() == 40, "unsupported DIB header")
    val width = b.getInt()
    // negative height = top-down row order (a real-file variant). The
    // stats here are row-order independent, so decoding only needs the
    // magnitude; a resize/crop kernel would have to flip row iteration.
    val height = math.abs(b.getInt())
    b.getShort() // planes
    require(b.getShort() == 24, "only 24bpp supported")
    val rowSize = (3 * width + 3) / 4 * 4
    var sum = 0L
    var y = 0
    while (y < height) {
      val row = dataOffset + y.toLong * rowSize
      var x = 0
      while (x < 3 * width) { sum += bytes(row.toInt + x) & 0xff; x += 1 }
      y += 1
    }
    BmpMeta(docId, width, height, bytes.length.toLong,
      sum.toDouble / (3.0 * width * height))
  }

  /** Attach a REAL BMP binary derived from the id column: width
    * id%64+1, height id%48+1, row y's channels = (id + y) % 256.
    */
  def withBmpBinary(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (id % 64 + 1).toInt
        val h = (id % 48 + 1).toInt
        (id, encodeBmp(w, h, y => ((id + y) % 256).toInt))
      })
      .toDF(idCol, "media")
  }

  /** Batch BMP metadata extraction — same mapPartitions shape as
    * [[extractMeta]], but over real image bytes.
    */
  def extractBmpMeta(df: DataFrame, idCol: String): Dataset[BmpMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeBmp(id, bytes) })
  }

  /** Nearest-neighbor resize of a REAL 24-bit BMP — the image-resize
    * stage of a multimodal curation pipeline, on actual pixel bytes
    * (not a stub): source pixel (⌊x·sw/ow⌋, ⌊y·sh/oh⌋) for each output
    * pixel, top-down (negative height) inputs handled by flipping the
    * row iteration, output re-encoded bottom-up. Runs inside the same
    * mapPartitions batch shape as the decoders; a JPEG-backed version
    * would swap only the codec, not the plumbing.
    */
  def resizeBmp(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    require(outW > 0 && outH > 0)
    val b = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(b.get() == 'B' && b.get() == 'M', "not a BMP")
    b.getInt(); b.getInt()
    val dataOffset = b.getInt()
    require(b.getInt() == 40, "unsupported DIB header")
    val width = b.getInt()
    val rawH = b.getInt()
    val height = math.abs(rawH)
    val topDown = rawH < 0
    b.getShort()
    require(b.getShort() == 24, "only 24bpp supported")
    val srcRow = (3 * width + 3) / 4 * 4
    val dstRow = (3 * outW + 3) / 4 * 4
    val out = ByteBuffer.allocate(54 + dstRow * outH)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dstRow * outH)
      .putShort(0).putShort(0).putInt(54)
    out.putInt(40).putInt(outW).putInt(outH).putShort(1).putShort(24)
      .putInt(0).putInt(dstRow * outH).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // both loops iterate STORAGE rows of the (bottom-up) output; the
    // sampled source storage row accounts for the input's row order
    var oy = 0
    while (oy < outH) {
      val logicalY = outH - 1 - oy          // bottom-up storage → logical
      val sy = logicalY.toLong * height / outH
      val syStore = if (topDown) sy else height - 1 - sy
      var ox = 0
      while (ox < outW) {
        val sx = ox.toLong * width / outW
        val src = dataOffset + syStore * srcRow + 3 * sx
        out.put(bytes(src.toInt)).put(bytes(src.toInt + 1)).put(bytes(src.toInt + 2))
        ox += 1
      }
      var p = 3 * outW
      while (p < dstRow) { out.put(0.toByte); p += 1 }
      oy += 1
    }
    out.array()
  }

  /** Batch resize lane: (id, media) → (id, resized media) with the
    * decoded-and-re-encoded geometry checked downstream by
    * [[extractBmpMeta]] — the mapPartitions batch shape of a 100 TB
    * image-preprocessing pass.
    */
  def resizeBmpBatch(df: DataFrame, idCol: String, outW: Int, outH: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, resizeBmp(bytes, outW, outH)) })
      .toDF(idCol, "media")
  }

  /** Encode a real 24-bit bottom-up BMP with per-PIXEL gray content
    * `px(x, y)` (y from the top) — the column-varying sibling of
    * [[encodeBmp]], needed so perceptual hashes have per-position
    * entropy (row-constant images collapse aHash blocks to 2 values
    * and the pigeonhole buckets to O(n²)).
    */
  def encodeBmpXY(width: Int, height: Int, px: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowSize = (3 * width + 3) / 4 * 4
    val size = 54 + rowSize * height
    val b = ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)
      .putInt(0).putInt(rowSize * height)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < height) { // bottom-up storage: logical row height-1-y
      val ly = height - 1 - y
      var x = 0
      while (x < width) {
        val v = (px(x, ly) & 0xff).toByte
        b.put(v).put(v).put(v); x += 1
      }
      var p = 3 * width
      while (p < rowSize) { b.put(0.toByte); p += 1 }
      y += 1
    }
    b.array()
  }

  /** Image corpus with CONTROLLED near-duplicates, the fixture a
    * perceptual-hash dedup needs: content key k = id % 50 drives
    * geometry (w = 16 + k%17, h = 16 + k%13) and the base gray pattern
    * (k·7 + y·5 + x·3) mod 256; ids ≥ 50 are single-pixel variants of
    * their base (pixel (x, y) = ((id·3) mod w, id mod h) shifted by
    * 128) — the "same image, tiny edit" duplicates a crawl corpus
    * carries. All real BMP bytes through [[encodeBmpXY]].
    */
  def withBmpVariantBinary(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val k = (id % 50).toInt
        val w = 16 + k % 17
        val h = 16 + k % 13
        val vx = ((id * 3) % w).toInt
        val vy = (id % h).toInt
        (id, encodeBmpXY(w, h, (x, y) => {
          val base = (k * 7 + y * 5 + x * 3) % 256
          if (id >= 50 && x == vx && y == vy) (base + 128) % 256 else base
        }))
      })
      .toDF(idCol, "media")
  }

  /** Average-hash (aHash) of an 8×8 24-bit BMP: bit (y·8 + x) set iff
    * pixel (x, y) is strictly brighter than the image mean — the
    * comparison is exact-integer (px·64 > Σpx), so the hash is
    * engine-stable. Decodes the real bytes (magic, header, bottom-up
    * row order); feed it [[resizeBmpBatch]](…, 8, 8) output.
    */
  def aHashBmp(bytes: Array[Byte]): Long = {
    val b = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(b.get() == 'B' && b.get() == 'M', "not a BMP")
    b.getInt(); b.getInt()
    val dataOffset = b.getInt()
    require(b.getInt() == 40, "unsupported DIB header")
    val width = b.getInt()
    val height = b.getInt()
    require(width == 8 && height == 8, s"aHashBmp expects 8x8, got ${width}x$height")
    b.getShort()
    require(b.getShort() == 24, "only 24bpp supported")
    val rowSize = (3 * 8 + 3) / 4 * 4
    val px = new Array[Int](64)
    var sum = 0L
    var y = 0
    while (y < 8) {
      val row = dataOffset + (7 - y) * rowSize // bottom-up: logical y from top
      var x = 0
      while (x < 8) {
        val v = bytes(row + 3 * x) & 0xff
        px(y * 8 + x) = v; sum += v; x += 1
      }
      y += 1
    }
    var hash = 0L
    var j = 0
    while (j < 64) {
      if (px(j) * 64L > sum) hash |= 1L << j
      j += 1
    }
    hash
  }

  /** Batch perceptual-hash extraction — (id, 8×8 media) → (id, ahash
    * BIGINT), one 64-bit word per image leaving the scan: the mapper
    * half of image near-dup dedup (pair generation is
    * [[graft.operators.Dedup.sigHammingPairs]] over the hash column).
    */
  def aHash8Batch(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, aHashBmp(bytes)) })
      .toDF(idCol, "ahash")
  }

  /** Image corpus for the DCT-hash lane: 50 classes of 8×8 BLOCK
    * patterns (md5-derived black/white blocks painted in normalized
    * coordinates, so every geometry renders the same low-frequency
    * structure), and for id ≥ 50 a variant that is its base class
    * CONTRAST-SCALED (v·3/4) with ONE block inverted — the "same image,
    * different encode settings + tiny edit" duplicate class. This is
    * the robustness regime that separates pHash from aHash: a global
    * luma scale reorders pixels around the global mean (aHash bits
    * flip) but scales all DCT coefficients together (sign-vs-median
    * unchanged). The gradient fixture `withBmpVariantBinary` is
    * deliberately NOT reused — its classes differ only by a constant
    * offset, which is pure DC, invisible to a low-band hash (measured:
    * cross-class DCT distance min 0 there).
    */
  def withBmpContrastBinary(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { id =>
          val k = (id % 50).toInt
          val w = 16 + k % 17
          val h = 16 + k % 13
          val fb = (id % 64).toInt
          (id, encodeBmpXY(w, h, (x, y) => {
            val b = (y * 8 / h) * 8 + (x * 8 / w)
            md.reset()
            val d = md.digest(s"$k-$b".getBytes("UTF-8"))
            val bit = ((d(0) >> 4) & 1) == 1
            val v = if (id >= 50 && b == fb) 128 else if (bit) 220 else 35
            if (id >= 50) v * 3 / 4 else v
          }))
        }
      }
      .toDF(idCol, "media")
  }

  /** Integer DCT-II basis, the single source of truth for engine AND
    * oracle: T[u][x] = round(cos(π·(2x+1)·u/64)·4096) for u ∈ 0..7,
    * x ∈ 0..31. Quantizing the basis to a literal integer table makes
    * the whole DCT exact 64-bit arithmetic (|D| ≤ 255·4096²·1024 ≈
    * 4.4e15 < 2⁶³), so the hash is bit-stable across engines — the SQL
    * oracle splices THESE values in as literals rather than calling its
    * own cos(). 4096 keeps 12 bits of basis precision, far beyond what
    * a 64-bit sign-vs-median hash can observe.
    */
  val DctTable: Array[Array[Long]] = Array.tabulate(8, 32) { (u, x) =>
    math.round(math.cos(math.Pi * (2 * x + 1) * u / 64.0) * 4096.0)
  }

  /** DCT perceptual hash (pHash) of a 32×32 24-bit BMP — the
    * LAION-class image-dedup standard, robust where aHash is not:
    * aHash thresholds each pixel against the global mean, so a
    * contrast/gamma shift that reorders pixels around the mean flips
    * many bits, while the DCT low band captures SHAPE (the 8×8
    * lowest-frequency coefficients) and thresholds each against their
    * own median — monotone-ish luma maps move all low-band energies
    * together. Hash: bit u·8+v set iff D[u][v] > median, over the 63
    * AC coefficients (lower-middle order statistic of an odd count —
    * no .5 averaging); the DC term is excluded, bit 0 stays 0. All
    * exact integers end to end via [[DctTable]].
    */
  def dctHashBmp(bytes: Array[Byte]): Long = {
    val b = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(b.get() == 'B' && b.get() == 'M', "not a BMP")
    b.getInt(); b.getInt()
    val dataOffset = b.getInt()
    require(b.getInt() == 40, "unsupported DIB header")
    val width = b.getInt()
    val height = b.getInt()
    require(width == 32 && height == 32, s"dctHashBmp expects 32x32, got ${width}x$height")
    b.getShort()
    require(b.getShort() == 24, "only 24bpp supported")
    val rowSize = (3 * 32 + 3) / 4 * 4
    val px = new Array[Long](1024)
    var y = 0
    while (y < 32) {
      val row = dataOffset + (31 - y) * rowSize // bottom-up storage
      var x = 0
      while (x < 32) { px(y * 32 + x) = bytes(row + 3 * x) & 0xff; x += 1 }
      y += 1
    }
    // two-stage separable transform: M = T·P (8×32), D = M·Tᵀ (8×8)
    val m = new Array[Long](8 * 32)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 32) {
        var s = 0L
        var yy = 0
        while (yy < 32) { s += DctTable(u)(yy) * px(yy * 32 + x); yy += 1 }
        m(u * 32 + x) = s
        x += 1
      }
      u += 1
    }
    val d = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var x = 0
        while (x < 32) { s += m(u * 32 + x) * DctTable(v)(x); x += 1 }
        d(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val ac = java.util.Arrays.copyOfRange(d, 1, 64)
    java.util.Arrays.sort(ac)
    val med = ac(31) // lower-middle of 63 — exact order statistic
    var hash = 0L
    var j = 1
    while (j < 64) {
      if (d(j) > med) hash |= 1L << j
      j += 1
    }
    hash
  }

  /** Batch DCT-hash extraction — (id, 32×32 media) → (id, phash
    * BIGINT): one machine word per image leaves the scan, the same
    * mass-dedup shape as [[aHash8Batch]].
    */
  def dctHash32Batch(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, dctHashBmp(bytes)) })
      .toDF(idCol, "phash")
  }

  final case class WavMeta(doc_id: Long, sample_rate: Int, channels: Int,
                           bits: Int, n_samples: Long, mean_abs: Double)

  /** Encode real PCM16 mono WAV (RIFF/fmt/data chunks). */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1)                     // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)   // byte rate
      .putShort(2).putShort(16)                    // block align, bits
    b.put("data".getBytes).putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }

  /** Decode a real WAV: walks RIFF chunks (tolerating extra chunks
    * before `data`), reads the format, and averages |sample| over the
    * PCM payload.
    */
  def decodeWav(docId: Long, bytes: Array[Byte]): WavMeta = {
    val b = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII") }
    require(tag() == "RIFF", "not a RIFF file"); b.getInt()
    require(tag() == "WAVE", "not a WAV file")
    var sampleRate = 0; var channels = 0; var bits = 0
    var nSamples = 0L; var sumAbs = 0.0
    while (b.remaining() >= 8) {
      val id = tag(); val len = b.getInt()
      // RIFF chunks are word-aligned: an odd-length chunk is followed by
      // one pad byte that is NOT counted in `len` — skipping without it
      // desynchronizes the walk on real files (e.g. odd-sized LIST/INFO).
      val next = b.position() + len + (len & 1)
      id match {
        case "fmt " =>
          require(b.getShort() == 1, "only PCM supported")
          channels = b.getShort(); sampleRate = b.getInt()
          b.getInt(); b.getShort(); bits = b.getShort()
        case "data" =>
          require(bits == 16, "only PCM16 supported")
          require(len <= b.remaining(),
            s"truncated WAV: data chunk declares $len bytes, ${b.remaining()} remain")
          nSamples = len / 2L
          var i = 0L
          while (i < nSamples) { sumAbs += math.abs(b.getShort().toInt); i += 1 }
        case _ => ()
      }
      b.position(math.min(next, bytes.length))
    }
    WavMeta(docId, sampleRate, channels, bits, nSamples,
      if (nSamples == 0) 0.0 else sumAbs / nSamples)
  }

  /** Parse a real WAV's format + raw PCM16 samples (RIFF chunk walk,
    * same tolerances as [[decodeWav]]).
    */
  private def decodeWavSamples(bytes: Array[Byte]): (Int, Array[Short]) = {
    val b = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII") }
    require(tag() == "RIFF", "not a RIFF file"); b.getInt()
    require(tag() == "WAVE", "not a WAV file")
    var sampleRate = 0
    var samples: Array[Short] = Array.empty
    while (b.remaining() >= 8) {
      val id = tag(); val len = b.getInt()
      val next = b.position() + len + (len & 1)
      id match {
        case "fmt " =>
          require(b.getShort() == 1, "only PCM supported")
          val ch = b.getShort(); sampleRate = b.getInt()
          b.getInt(); b.getShort(); val bits = b.getShort()
          // the sample walk below reads a flat 16-bit mono stream; a
          // stereo or 8/24-bit file would be silently garbled, so fail
          // loudly instead (decodeWav records channels/bits as metadata
          // and doesn't need this restriction)
          require(ch == 1 && bits == 16,
            s"only mono PCM16 supported for sample decode, got channels=$ch bits=$bits")
        case "data" =>
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = b.getShort(); i += 1 }
        case _ => ()
      }
      b.position(math.min(next, bytes.length))
    }
    (sampleRate, samples)
  }

  /** Audio RESAMPLE by decimation: decode real PCM bytes, keep every
    * `factor`-th sample, re-encode at rate/factor — the audio analogue
    * of the nearest-neighbor BMP resize lane (decode → transform →
    * re-encode → re-decode, all real codec work). mapPartitions batch
    * lane like the other codecs; at 100 TB this is the pure-mapper
    * media-normalization pass before feature extraction.
    */
  def resampleWavBatch(df: DataFrame, idCol: String, factor: Int): DataFrame = {
    require(factor >= 1, s"resampleWavBatch: factor must be >= 1, got $factor")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (rate, samples) = decodeWavSamples(bytes)
        val strided = Array.tabulate((samples.length + factor - 1) / factor)(
          j => samples(j * factor))
        (id, encodeWav(math.max(rate / factor, 1), strided))
      }).toDF(idCol, "media")
  }

  final case class WavFeatures(doc_id: Long, n_samples: Long, peak_abs: Long,
                               zero_crossings: Long, rms: Double)

  /** Audio FEATURE EXTRACTION on real PCM bytes — the signal-level
    * curation metrics (silence/clipping/noisiness filters) computed
    * from the decoded samples, not the header: peak |amplitude|,
    * sign-change count, and RMS energy. RMS is sqrt of an exact
    * integer Σs² / n, floor-quantized — engine-stable. Same
    * mapPartitions batch lane as the decoders.
    */
  def decodeWavFeatures(docId: Long, bytes: Array[Byte]): WavFeatures = {
    val b = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII") }
    require(tag() == "RIFF", "not a RIFF file"); b.getInt()
    require(tag() == "WAVE", "not a WAV file")
    var nSamples = 0L; var sumSq = 0L; var peak = 0L; var zc = 0L
    while (b.remaining() >= 8) {
      val id = tag(); val len = b.getInt()
      val next = b.position() + len + (len & 1)
      if (id == "data") {
        nSamples = len / 2L
        var prev = 0
        var i = 0L
        while (i < nSamples) {
          val s = b.getShort().toInt
          sumSq += s.toLong * s
          if (math.abs(s) > peak) peak = math.abs(s)
          if (i > 0 && ((s < 0 && prev > 0) || (s > 0 && prev < 0))) zc += 1
          prev = s
          i += 1
        }
      }
      b.position(math.min(next, bytes.length))
    }
    val rms = if (nSamples == 0) 0.0
      else math.floor(math.sqrt(sumSq.toDouble / nSamples) * 1e6) / 1e6
    WavFeatures(docId, nSamples, peak, zc, rms)
  }

  /** Batch audio-feature lane over (id, media) WAV bytes. */
  def extractWavFeatures(df: DataFrame, idCol: String): Dataset[WavFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeWavFeatures(id, bytes) })
  }

  final case class FrameMeta(doc_id: Long, frame_idx: Int, width: Int,
                             height: Int, n_frames: Long, mean_y: Double)

  /** Encode REAL YUV4MPEG2 (.y4m) video — the uncompressed interchange
    * format ffmpeg/mplayer consume: ASCII stream header, then per frame
    * a FRAME marker + raw planar data. C444 keeps the plane math
    * trivial (Y, U, V each w·h bytes). Luma row y of frame f is
    * `lum(f, y)`; chroma planes sit at neutral 128.
    */
  def encodeY4m(width: Int, height: Int, frames: Int,
                lum: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && frames >= 0)
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C444\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val plane = width * height
    val b = ByteBuffer.allocate(header.length + frames * (marker.length + 3 * plane))
    b.put(header)
    var f = 0
    while (f < frames) {
      b.put(marker)
      var y = 0
      while (y < height) {
        val v = (lum(f, y) & 0xff).toByte
        var x = 0
        while (x < width) { b.put(v); x += 1 }
        y += 1
      }
      var c = 0
      while (c < 2 * plane) { b.put(128.toByte); c += 1 }
      f += 1
    }
    b.array()
  }

  /** Decode a real .y4m stream and SAMPLE every `every`-th frame — the
    * video half of the multimodal lane set (brief: decode /
    * feature-extract / resize / frame-sample): parses the ASCII stream
    * header (tag soup, order-free), walks FRAME markers (tolerating
    * per-frame parameters), and averages each sampled frame's actual
    * luma plane — proof the payload is decoded, not just the header.
    * Emits one row per SAMPLED frame; skipped frames are seeked over
    * without reading (what makes sparse sampling cheap at 100 TB).
    */
  def decodeY4mFrames(docId: Long, bytes: Array[Byte], every: Int): Seq[FrameMeta] = {
    require(every > 0)
    var p = 0
    def line(): String = {
      val start = p
      while (p < bytes.length && bytes(p) != '\n') p += 1
      val s = new String(bytes, start, p - start, "US-ASCII")
      p += 1 // consume the newline
      s
    }
    val head = line().split(' ')
    require(head.head == "YUV4MPEG2", "not a YUV4MPEG2 stream")
    var width = 0; var height = 0; var cs = "C420"
    head.tail.foreach { t =>
      if (t.nonEmpty) t.charAt(0) match {
        case 'W' => width = t.substring(1).toInt
        case 'H' => height = t.substring(1).toInt
        case 'C' => cs = t
        case _   => ()
      }
    }
    require(width > 0 && height > 0, "missing geometry")
    require(cs == "C444", s"only C444 supported, got $cs")
    val plane = width * height
    val out = scala.collection.mutable.ArrayBuffer.empty[FrameMeta]
    var f = 0
    while (p < bytes.length) {
      require(line().startsWith("FRAME"), s"frame $f: bad marker")
      require(p + 3 * plane <= bytes.length, s"frame $f: truncated payload")
      if (f % every == 0) {
        var sum = 0L
        var i = 0
        while (i < plane) { sum += bytes(p + i) & 0xff; i += 1 }
        out += FrameMeta(docId, f, width, height, 0L, sum.toDouble / plane)
      }
      p += 3 * plane
      f += 1
    }
    out.toSeq.map(_.copy(n_frames = f.toLong))
  }

  /** Attach a REAL .y4m video binary derived from the id column:
    * geometry id%16+1 × id%12+1, id%10+1 frames, luma row y of frame f
    * = (id + 7f + y) % 256 — a generating formula whose per-frame means
    * the oracle recomputes in SQL.
    */
  def withY4mBinary(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (id % 16 + 1).toInt
        val h = (id % 12 + 1).toInt
        val n = (id % 10 + 1).toInt
        (id, encodeY4m(w, h, n, (f, y) => ((id + 7L * f + y) % 256).toInt))
      })
      .toDF(idCol, "media")
  }

  /** Batch frame-sampling lane: (id, media) → one row per sampled
    * frame, same mapPartitions shape as the other decoders (flatMap
    * per row — a video fans out to its sampled frames).
    */
  def extractY4mFrames(df: DataFrame, idCol: String, every: Int): Dataset[FrameMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => decodeY4mFrames(id, bytes, every) })
  }

  /** Attach a REAL PCM16 WAV binary derived from the id column:
    * sample rate 8000 + id%8 · 1000, id%50 + 1 samples, sample i =
    * (id·31 + i·7) % 2001 − 1000 — a generating formula whose
    * rate/count/mean-abs the oracle recomputes in SQL.
    */
  def withWavBinary(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val n = (id % 50 + 1).toInt
        val samples = Array.tabulate(n)(i => ((id * 31 + i * 7) % 2001 - 1000).toShort)
        (id, encodeWav((8000 + (id % 8) * 1000).toInt, samples))
      })
      .toDF(idCol, "media")
  }

  /** Batch WAV metadata extraction — same mapPartitions shape as
    * [[extractBmpMeta]], over real RIFF bytes.
    */
  def extractWavMeta(df: DataFrame, idCol: String): Dataset[WavMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeWav(id, bytes) })
  }
}
