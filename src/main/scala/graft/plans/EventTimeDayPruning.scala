package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Hidden time partitioning: derive day-partition predicates from
  * event-time predicates.
  *
  * The day-partitioned events lake stores `ts` (BIGINT nanoseconds) as a
  * data column and `day = epoch_date(ts div NsPerDay)` as its partition
  * directory key. Queries, though, filter on TIME — `ts_ns >= L`, or the
  * normalized µs timestamp `timestamp_micros(ts div 1000) < T` — and
  * plain-parquet Spark has no idea those bounds imply partition bounds,
  * so without help a one-day query still lists and scans every day
  * (exactly the class of full-lake scan the reference's TSM time levels
  * exist to prevent: a time-bounded scan must never open cold files —
  * tskv arranges files in time-range levels for this reason).
  *
  * This rule is the missing inference, the plain-parquet form of
  * Iceberg's hidden-partitioning transform pruning / Delta's
  * generated-column partition filters: for a Filter over a relation
  * whose partition schema has `day: DATE` and whose data schema has
  * `ts: BIGINT` (nanos), every conjunct that bounds `ts` — directly, or
  * through the µs-timestamp view `timestamp_micros(ts div 1000)` — is
  * mirrored as a bound on `day`, injected as a new Filter directly above
  * the relation. FileSourceStrategy then splits that conjunct out as a
  * partition-key filter and prunes at FILE LISTING time, before any IO.
  * Day arithmetic is pure integer floor-division on the ns value — the
  * exact inverse of the arithmetic the lake writer uses — so the derived
  * bound is always a (possibly one-day-conservative) superset of the
  * data bound: rows are never lost, only cold files skipped.
  *
  * Registered through `spark.experimental.extraOptimizations` (installed
  * by [[graft.Tables]] on first events read — the per-session form) and
  * via `GraftExtensions.injectOptimizerRule` (the cluster deployment
  * form). Negative control: excluding the rule (ContractSpec) makes the
  * same one-day query list every partition again.
  */
object EventTimeDayPruning extends Rule[LogicalPlan] with PredicateHelper {
  private val NsPerDay = graft.Tables.NsPerDay

  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, lr: LogicalRelation) =>
      derive(cond, lr).map(p => Filter(cond, Filter(p, lr))).getOrElse(f)
    // column pruning may interpose an attribute-only Project that drops
    // `day`; the injected filter goes BELOW it, where day is in scope
    case f @ Filter(cond, proj @ Project(list, lr: LogicalRelation))
        if list.forall(_.isInstanceOf[AttributeReference]) =>
      derive(cond, lr).map(p =>
        Filter(cond, Project(list, Filter(p, lr)))).getOrElse(f)
  }

  /** The day-bound predicate implied by `cond`, if any conjunct bounds
    * the relation's ns event-time column and `cond` does not already
    * constrain the partition column.
    */
  private def derive(cond: Expression, lr: LogicalRelation): Option[Expression] = {
    for {
      day <- dayPartitionAttr(lr)
      if !cond.references.contains(day)
      ts <- lr.output.find(a =>
        a.name == "ts" && a.dataType == LongType && a.exprId != day.exprId)
      pred <- dayBoundsPredicate(cond, ts, day)
    } yield pred
  }

  private def dayPartitionAttr(lr: LogicalRelation): Option[Attribute] =
    lr.relation match {
      case fs: HadoopFsRelation
          if fs.partitionSchema.exists(c => c.name == "day" && c.dataType == DateType) =>
        lr.output.find(a => a.name == "day" && a.dataType == DateType)
      case _ => None
    }

  /** ns value of a literal compared against the event-time column, for
    * the two shapes predicate pushdown produces at the scan:
    *   - `ts` itself (BIGINT nanos) vs a LONG literal;
    *   - `timestamp_micros(ts div 1000)` (the normalized µs view, its
    *     alias substituted by PushDownPredicates) vs a TIMESTAMP literal.
    */
  private def litNs(side: Expression, l: Literal, ts: Attribute): Option[Long] =
    side match {
      case a: Attribute
          if a.semanticEquals(ts) && l.dataType == LongType && l.value != null =>
        Some(l.value.asInstanceOf[Long])
      case m: MicrosToTimestamp
          if (l.dataType == TimestampType || l.dataType == TimestampNTZType) &&
            l.value != null =>
        m.child match {
          case d: IntegralDivide =>
            val divBy1000 = d.right match {
              case Literal(v: Long, LongType)   => v == 1000L
              case Literal(v: Int, IntegerType) => v == 1000
              case _                            => false
            }
            d.left match {
              case a: Attribute if divBy1000 && a.semanticEquals(ts) =>
                // a µs literal past ±year 292471 would overflow the ns
                // domain — no admissible bound, never a planning crash
                val us = l.value.asInstanceOf[Long]
                if (math.abs(us) <= Long.MaxValue / 1000L) Some(us * 1000L) else None
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }

  private def dayBoundsPredicate(cond: Expression, ts: Attribute,
                                 day: Attribute): Option[Expression] = {
    var lo: Option[Long] = None // epoch-day lower bound
    var hi: Option[Long] = None
    def addLo(d: Long): Unit = lo = Some(lo.fold(d)(math.max(_, d)))
    def addHi(d: Long): Unit = hi = Some(hi.fold(d)(math.min(_, d)))
    def epochDay(ns: Long): Long = Math.floorDiv(ns, NsPerDay)
    splitConjunctivePredicates(cond).foreach {
      case GreaterThanOrEqual(e, l: Literal) => litNs(e, l, ts).foreach(n => addLo(epochDay(n)))
      case GreaterThan(e, l: Literal)        => litNs(e, l, ts).foreach(n => addLo(epochDay(n)))
      case LessThanOrEqual(e, l: Literal)    => litNs(e, l, ts).foreach(n => addHi(epochDay(n)))
      // strict upper: the largest admissible instant is one granule
      // below the literal, which matters exactly at a day boundary
      case LessThan(e, l: Literal)           => litNs(e, l, ts).foreach(n => addHi(epochDay(n - 1)))
      case EqualTo(e, l: Literal)            => litNs(e, l, ts).foreach { n => addLo(epochDay(n)); addHi(epochDay(n)) }
      // literal-on-the-left mirror images
      case GreaterThanOrEqual(l: Literal, e) => litNs(e, l, ts).foreach(n => addHi(epochDay(n)))
      case GreaterThan(l: Literal, e)        => litNs(e, l, ts).foreach(n => addHi(epochDay(n - 1)))
      case LessThanOrEqual(l: Literal, e)    => litNs(e, l, ts).foreach(n => addLo(epochDay(n)))
      case LessThan(l: Literal, e)           => litNs(e, l, ts).foreach(n => addLo(epochDay(n)))
      case EqualTo(l: Literal, e)            => litNs(e, l, ts).foreach { n => addLo(epochDay(n)); addHi(epochDay(n)) }
      case _                                 => ()
    }
    def dayLit(d: Long): Literal = {
      val clamped = math.max(Int.MinValue.toLong, math.min(Int.MaxValue.toLong, d)).toInt
      Literal(clamped, DateType)
    }
    val preds = lo.map(d => GreaterThanOrEqual(day, dayLit(d)): Expression).toSeq ++
      hi.map(d => LessThanOrEqual(day, dayLit(d)): Expression)
    preds.reduceOption(And)
  }
}
