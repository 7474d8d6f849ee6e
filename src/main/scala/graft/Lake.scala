package graft

import java.nio.file.{Files, Path, Paths}

import scala.collection.concurrent.TrieMap

/** Disk staging for derived lake layouts (day-partitioned events, stream
  * replay part-files, clustered zone-map lakes).
  *
  * A staged layout is written ONCE per (logical key, source fingerprint)
  * and reused across sessions — the local stand-in for the one-time
  * layout job a production lake runs at write time. The fingerprint
  * (total bytes + file count + max mtime of the source paths) is folded
  * into the cache key so a REGENERATED lake at the same path restages
  * instead of silently answering from the stale copy and surfacing as a
  * confusing oracle hash mismatch (ADVICE r10).
  */
object Lake {

  /** Cheap content fingerprint of a lake file or directory: total bytes,
    * regular-file count, and max mtime. Not cryptographic — it guards
    * against lake regeneration, not adversarial collisions.
    */
  def fingerprint(path: String): String = {
    def walk(f: java.io.File): (Long, Long, Long) =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.map(walk).foldLeft((0L, 0L, 0L)) {
          case ((b, n, m), (b2, n2, m2)) => (b + b2, n + n2, math.max(m, m2))
        }).getOrElse((0L, 0L, 0L))
      else (f.length(), 1L, f.lastModified())
    val (bytes, files, mtime) = walk(new java.io.File(path))
    s"$bytes:$files:$mtime"
  }

  private val stagedDirs = TrieMap.empty[String, String]

  /** Stage a derived dataset once per (logical key, source fingerprint)
    * under the JVM tmpdir and return its root. `write` must leave a
    * `_SUCCESS` marker (every Spark parquet/text write does); a crashed
    * partial write is retried on the next call because the marker is
    * missing.
    */
  def staged(logicalKey: String, srcPaths: Seq[String])(write: Path => Unit): String = {
    val key = logicalKey + "|" + srcPaths.map(fingerprint).mkString(",")
    stagedDirs.getOrElseUpdate(key, {
      val hash = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_stage", hash)
      if (!Files.exists(dir.resolve("_SUCCESS"))) write(dir)
      dir.toString
    })
  }
}
