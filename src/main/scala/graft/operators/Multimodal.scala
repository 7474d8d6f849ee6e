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
}
