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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    Map("q_lake_contract" ->
      s"""SELECT * FROM (VALUES $rows)
         |  AS t(table_name, column_name, lake_type)
         |ORDER BY table_name, column_name""".stripMargin)
  }
}
