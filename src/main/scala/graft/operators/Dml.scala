package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DML semantics over an immutable lake (reference: dml/delete.slt,
  * dml/update_field.slt, dml/update_tag.slt, data_tests/data_ttl.slt).
  *
  * CnosDB mutates TSM files in place; a Spark lake rewrites instead —
  * each op is a pure DataFrame transform whose output REPLACES the
  * table's partitions. All three are narrow (no shuffle): at 100 TB a
  * delete/update with a time or tag predicate rewrites only the
  * partitions the predicate touches (partition pruning on write), never
  * the whole table.
  */
object Dml {

  /** DELETE FROM t WHERE cond → keep the complement. */
  def delete(df: DataFrame, cond: Column): DataFrame =
    df.filter(!coalesce(cond, lit(false)))

  /** UPDATE t SET col = value WHERE cond. Also covers update_tag:
    * tags are plain columns here, so field and tag updates are the
    * same rewrite (the reference splits them only because tags live in
    * its series index).
    */
  def update(df: DataFrame, cond: Column, colName: String, value: Column): DataFrame =
    df.withColumn(colName, when(coalesce(cond, lit(false)), value).otherwise(col(colName)))

  /** TTL retention (data_ttl.slt): drop rows older than `now - ttl`.
    * Time-partitioned layouts turn this into dropping whole partition
    * directories — the filter prunes, it does not scan.
    */
  def applyTtl(df: DataFrame, tsCol: String, now: Column, ttl: Column): DataFrame =
    df.filter(col(tsCol) >= now - ttl)

  /** MERGE / upsert as a lake rewrite — cnosdb's INSERT semantics
    * (writing an existing (time, tags) series key REPLACES its fields,
    * reference dml/insert tests): rows from `source` win on key match,
    * unmatched target rows survive, unmatched source rows insert. One
    * full-outer equijoin on the key, column-wise coalesce(source,
    * target) — no window, partial-pruning friendly when the key
    * includes the partition column (only touched partitions rewrite).
    */
  def upsert(target: DataFrame, source: DataFrame, keyCols: Seq[String]): DataFrame = {
    val dataCols = target.columns.filterNot(keyCols.contains)
    require(source.columns.sorted.sameElements(target.columns.sorted),
      "upsert requires identical schemas")
    // row-presence marker, not per-column coalesce: a source row whose
    // field is legitimately NULL must still overwrite the target field
    val s = dataCols.foldLeft(source) { (d, c) => d.withColumnRenamed(c, s"__s_$c") }
      .withColumn("__hit", lit(true))
    target.join(s, keyCols, "full_outer")
      .select(keyCols.map(col) ++
        dataCols.map(c =>
          when(col("__hit").isNotNull, col(s"__s_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** Result of [[expireDays]]: whole day directories dropped, whether
    * the boundary day was rewritten, and the boundary rows kept.
    */
  final case class ExpireStats(droppedDays: Int, boundaryRewritten: Boolean,
                               boundaryRowsKept: Long)

  /** TTL retention as day-directory LIFECYCLE on a day-partitioned lake
    * (reference: data_tests/data_ttl.slt — tskv enforces retention by
    * dropping whole time-level files past the boundary). [[applyTtl]]
    * expresses the semantics as a generic rewrite; THIS is the actual
    * 100 TB mechanism: every fully-expired `day=` directory is an O(1)
    * metadata drop — no rows read, no rows written — and only the ONE
    * day straddling `cutoffNs` is rewritten (rows with `ts >= cutoffNs`
    * kept, written aside then atomically swapped in). A day-aligned
    * cutoff rewrites nothing at all.
    *
    * The lake at `root` must be the floor-day layout
    * ([[graft.Tables.dayOfNsSql]]): `day=YYYY-MM-DD/` directories whose
    * files hold `ts` as BIGINT nanos.
    */
  def expireDays(spark: org.apache.spark.sql.SparkSession, root: String,
                 cutoffNs: Long): ExpireStats = {
    val nsPerDay = graft.Tables.NsPerDay
    val cutDay = Math.floorDiv(cutoffNs, nsPerDay)
    val rootF = new java.io.File(root)
    val dayDirs = Option(rootF.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
    require(dayDirs.nonEmpty, s"no day= partition directories under $root")
    var dropped = 0
    var rewritten = false
    var boundaryKept = 0L
    dayDirs.foreach { dir =>
      val day = java.time.LocalDate.parse(dir.getName.stripPrefix("day=")).toEpochDay
      if (day < cutDay) {
        deleteTree(dir.toPath); dropped += 1
      } else if (day == cutDay && Math.floorMod(cutoffNs, nsPerDay) != 0L) {
        // the straddling day: materialize the kept half BESIDE the dir
        // (never read-after-delete), then swap via rename-ASIDE — the
        // original is moved out of the way, the rewrite moved in, and
        // only then is the original deleted, so no crash point loses
        // data irrecoverably (a crash between the two moves leaves the
        // kept rows in .ttl-tmp-* and the originals in .ttl-old-*, both
        // recoverable; delete-then-move would drop the day on a crash
        // in between)
        val dayName = dir.getName.stripPrefix("day=")
        val tmp = new java.io.File(rootF, s".ttl-tmp-$dayName")
        val old = new java.io.File(rootF, s".ttl-old-$dayName")
        val kept = spark.read.parquet(dir.toString).filter(col("ts") >= cutoffNs)
        kept.write.mode("overwrite").parquet(tmp.toString)
        boundaryKept = spark.read.parquet(tmp.toString).count()
        deleteTree(old.toPath) // clear any previous crashed attempt
        java.nio.file.Files.move(dir.toPath, old.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        java.nio.file.Files.move(tmp.toPath, dir.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        deleteTree(old.toPath)
        rewritten = true
      }
    }
    ExpireStats(dropped, rewritten, boundaryKept)
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = Files.list(p)
      try s.iterator().forEachRemaining(deleteTree) finally s.close()
    }
    Files.deleteIfExists(p)
  }

  /** Small-file compaction — the lake-maintenance pass every streaming
    * ingest needs (micro-batches write a file per trigger per
    * partition; a year of 1-minute triggers is half a million tiny
    * files and footer-open dominated scans). Sizes the output file
    * count from the INPUT BYTES (listed from the filesystem, no data
    * pass), then rewrites once:
    *   - with `sortCols`, `repartitionByRange` + in-partition sort —
    *     restores zone-map clustering (pair with `zorder_key` for 2-D)
    *     so min/max pruning works again after compaction;
    *   - without, round-robin `repartition` for pure size leveling.
    * Returns the target file count. At 100 TB this runs per partition
    * directory (compact only partitions whose file count or avg size
    * crossed a threshold), never the whole table at once.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
              outDir: String, targetBytesPerFile: Long = 128L << 20,
              sortCols: Seq[String] = Seq.empty): Int = {
    require(targetBytesPerFile > 0, "targetBytesPerFile must be positive")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(path).filter(_.isFile)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytesPerFile).toInt)
    val df = spark.read.parquet(inDir)
    val out =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nFiles)
    out.write.mode("overwrite").parquet(outDir)
    nFiles
  }
}
