package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.Tables

/** Lake schema contract, checked as a first-class driver entry.
  *
  * Round-6 failure mode: the driver re-provisioned `events.ts` from
  * INT64 nanos to `timestamp[us]` and 63 queries died at analysis time
  * with the same opaque `DATATYPE_MISMATCH` — nothing in the artifact
  * named the drifted column. `q_lake_contract` turns that class of env
  * change into ONE clear error: it projects every table's columns
  * against the expected contract and throws a readable message naming
  * each drifted/missing column before any operator lane has to crash.
  *
  * Canonicalization keeps the contract meaningful without over-pinning:
  * integer widths collapse to `integral` (benign width drift tolerated;
  * every operator lane coerces), timestamp and timestamp_ntz collapse
  * to `timestamp` (the lake writes TZ-less parquet; sessions run UTC),
  * everything else must match `simpleString` exactly. `events` is
  * checked through [[Tables.events]] — i.e. the contract validates the
  * NORMALIZED view (µs `ts` + BIGINT `ts_ns`) that both physical time
  * encodings must load to, and Tables.events itself throws readably on
  * an encoding it cannot normalize.
  */
object LakeContract {

  /** table → required (column → canonical type); extra columns in the
    * lake are additive evolution and pass.
    */
  private[graft] val expected: Seq[(String, Seq[(String, String)])] = Seq(
    "region" -> Seq("r_regionkey" -> "integral", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "integral", "n_name" -> "string",
      "n_regionkey" -> "integral"),
    "customer" -> Seq("c_custkey" -> "integral", "c_name" -> "string",
      "c_nationkey" -> "integral", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "integral", "s_name" -> "string",
      "s_nationkey" -> "integral", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "integral", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "integral",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "integral", "o_custkey" -> "integral",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "integral", "l_partkey" -> "integral",
      "l_suppkey" -> "integral", "l_linenumber" -> "integral",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "events" -> Seq("event_id" -> "integral", "ts" -> "timestamp",
      "user_id" -> "integral", "event_type" -> "string",
      "value" -> "double", "props" -> "string", "ts_ns" -> "integral"),
    "documents" -> Seq("doc_id" -> "integral", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "integral"),
    "embeddings" -> Seq("vec_id" -> "integral",
      "embedding" -> "array<float>", "label" -> "integral")
  )

  private[graft] def canon(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "integral"
    case TimestampType | TimestampNTZType              => "timestamp"
    case t                                             => t.simpleString
  }

  /** Violations for one table's frame vs its contract — empty = ok. */
  private[graft] def tableViolations(table: String, df: DataFrame): Seq[String] = {
    val cols = expected.find(_._1 == table).getOrElse(
      throw new IllegalArgumentException(s"no contract for table $table"))._2
    val actual = df.schema.fields.map(f => f.name -> canon(f.dataType)).toMap
    cols.flatMap { case (name, want) =>
      actual.get(name) match {
        case None => Some(s"$table.$name: MISSING (expected $want)")
        case Some(got) if got != want =>
          Some(s"$table.$name: expected $want, lake has $got")
        case _ => None
      }
    }
  }

  /** Day-partitioned rewrite of the events lake, staged once per lake
    * dir — the executable form of SURVEY §1's "time-partitioned
    * directories replace the reference's TSM time levels" claim
    * (cnosdb tskv levels cluster files by time range so a time-bounded
    * scan opens only overlapping files). One file per day directory
    * (repartition on the partition column), so the pruning arithmetic
    * below is exact.
    */
  private val prunedLakes = scala.collection.concurrent.TrieMap.empty[String, String]
  private def dayPartitionedEvents(s: SparkSession, dir: String): String =
    prunedLakes.getOrElseUpdate(dir, {
      val hash = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val root = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_day_lake", hash)
      if (!java.nio.file.Files.exists(root.resolve("_SUCCESS"))) {
        import org.apache.spark.sql.functions._
        Tables.eventsNanos(s, dir)
          .withColumn("day",
            date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd"))
          .repartition(col("day"))
          .write.partitionBy("day").mode("overwrite").parquet(root.toString)
      }
      root.toString
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Partition pruning, PROVEN at plan time, not claimed: a one-day
    // predicate against the day-partitioned events lake must touch
    // exactly one partition directory — the Spark replacement for the
    // reference's TSM time-level pruning (tskv arranges files in
    // time-range levels so a bounded query never opens cold files;
    // here Catalyst's PartitionFilters skip every other day's files at
    // FILE LISTING time, before any IO). The lane inspects its own
    // executed plan's FileSourceScan listing and throws unless
    // (pruned partitions == 1) < (total days in the lake), so the
    // green row IS the executable claim; the data answer (per-type
    // count + cents-exact sum for the lake's first day) is
    // oracle-checked against the same predicate over the raw lake.
    "ts_partition_prune" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val root = dayPartitionedEvents(s, dir)
      val lake = s.read.parquet(root)
      // deterministic target day: the lake's first UTC day (tiny
      // aggregate over the partition column — metadata-only scan;
      // toString because partition-column inference reads the
      // yyyy-MM-dd directory names back as DATE)
      val day0 = lake.agg(min(col("day"))).head.get(0).toString
      val nDays = lake.select(col("day")).distinct().count()
      val q = lake.filter(col("day") === day0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0)
            .as("sum_value"))
        .withColumn("day", lit(day0))
        .select("day", "event_type", "n", "sum_value")
        .orderBy("event_type")
      // AQE wraps the whole plan in a leaf AdaptiveSparkPlanExec;
      // inspect its initial physical plan (partition pruning is static
      // — decided at file-listing time, before any adaptive re-plan)
      val phys = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan
        case p => p
      }
      val scan = phys.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(throw new IllegalStateException(
        "ts_partition_prune: no FileSourceScan in the executed plan"))
      val scanned = scan.selectedPartitions.partitionCount
      require(nDays > 1 && scanned == 1,
        s"partition pruning failed: one-day predicate scanned $scanned of " +
          s"$nDays day partitions (${scan.selectedPartitions.totalNumberOfFiles} files)")
      q
    }),

    "q_lake_contract" -> ((s, dir) => {
      val bad = expected.flatMap { case (table, _) =>
        val df = Tables(s, dir, table) // events → normalized view (or its readable error)
        tableViolations(table, df)
      }
      if (bad.nonEmpty) throw new IllegalStateException(
        s"lake contract violated at $dir — ${bad.size} drifted column(s):\n  " +
          bad.mkString("\n  "))
      import s.implicits._
      expected.flatMap { case (t, cols) => cols.map { case (c, ty) => (t, c, ty) } }
        .toDF("table_name", "column_name", "lake_type")
        .orderBy("table_name", "column_name")
    })
  )

  /** The validated contract as constants: hash-green ⟺ the Spark side
    * validated every table without throwing.
    */
  def oracleSql: Map[String, String] = {
    val rows = expected.flatMap { case (t, cols) =>
      cols.map { case (c, ty) => s"('$t', '$c', '$ty')" }
    }.mkString(", ")
    Map(
      "q_lake_contract" ->
        s"""SELECT * FROM (VALUES $rows)
           |  AS t(table_name, column_name, lake_type)
           |ORDER BY table_name, column_name""".stripMargin,
      // same one-day predicate over the RAW lake: the Spark side reads
      // only the pruned day directory, so matching hashes prove the
      // pruned scan loses no rows
      "ts_partition_prune" ->
        """WITH e AS (
          |  SELECT event_type,
          |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
          |    CAST(round(value * 100) AS BIGINT) AS cents
          |  FROM events),
          |d AS (SELECT min(day) AS d0 FROM e)
          |SELECT d0 AS day, event_type, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(cents) AS DOUBLE) / 100.0 AS sum_value
          |FROM e, d WHERE day = d0
          |GROUP BY d0, event_type ORDER BY event_type""".stripMargin)
  }
}
