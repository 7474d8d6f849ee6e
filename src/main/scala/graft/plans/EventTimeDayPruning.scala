package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, StringType, TimestampNTZType, TimestampType}

/** Hidden time partitioning: derive day-partition predicates from
  * event-time predicates.
  *
  * The day-partitioned events lake stores `ts` (BIGINT nanoseconds) as a
  * data column and `day = epoch_date(floorDiv(ts, NsPerDay))` as its
  * partition directory key. Queries, though, filter on TIME — and
  * plain-parquet Spark has no idea time bounds imply partition bounds,
  * so without help a one-day query still lists and scans every day
  * (exactly the class of full-lake scan the reference's TSM time levels
  * exist to prevent: a time-bounded scan must never open cold files —
  * tskv arranges files in time-range levels for this reason).
  *
  * This rule is the missing inference, the plain-parquet form of
  * Iceberg's hidden-partitioning transform pruning / Delta's
  * generated-column partition filters. For a Filter over a relation
  * whose partition schema has `day: DATE` and whose data schema has
  * `ts: BIGINT` (nanos), the condition is folded into a union of
  * epoch-day ranges (conjunction = range intersection, disjunction =
  * range union) and mirrored as a predicate on `day`, injected as a new
  * Filter directly above the relation. FileSourceStrategy then splits
  * that conjunct out as a partition-key filter and prunes at FILE
  * LISTING time, before any IO.
  *
  * Predicate shapes recognized (r12 widened these to what dashboards
  * actually emit — the reference's own date_bin/TSBS idiom,
  * tsbench/avg_daily_driving_duration.slt):
  *   - comparisons/equality on `ts` itself (BIGINT nanos);
  *   - on `ts div D` for any positive literal granule D — raw epoch
  *     arithmetic (`ts_ns div 1000000000 >= epochSec`, ms/µs forms);
  *   - on the normalized µs view `timestamp_micros(ts div 1000)`, and
  *     on `unix_seconds/unix_millis/unix_micros` of it (floor-granule
  *     epoch arithmetic);
  *   - on `date_trunc(unit, µs-view)` for microsecond..year units and
  *     on `CAST(µs-view AS DATE)`, in UTC sessions;
  *   - `IN`-lists / `InSet`s of literals over any of those;
  *   - arbitrary AND/OR nesting of the above (per-disjunct ranges are
  *     unioned, then coalesced; >32 surviving ranges collapse to their
  *     hull so plan size stays bounded).
  *
  * Every derived bound is a SUPERSET of the data bound — rows are never
  * lost, only cold files skipped: day arithmetic is Math.floorDiv on the
  * ns value (the exact inverse of the lake writers' floor-day partition
  * expression, [[graft.Tables.dayOfNsSql]], including pre-1970 negative
  * instants — ADVICE r11), the µs view's truncation-toward-zero is
  * widened by <1 µs only where it disagrees with floor (the negative
  * domain), and unaligned date_trunc literals widen to the enclosing
  * unit. A derived contradiction (disjoint ranges) injects nothing
  * rather than an always-false filter, so an arithmetic corner can only
  * cost pruning, never rows.
  *
  * Registered through `spark.experimental.extraOptimizations` (installed
  * by [[graft.Tables]] on first events read — the per-session form) and
  * via `GraftExtensions.injectOptimizerRule` (the cluster deployment
  * form). Negative control: excluding the rule (ContractSpec) makes the
  * same one-day query list every partition again.
  */
object EventTimeDayPruning extends Rule[LogicalPlan] with PredicateHelper {
  private val NsPerDay = graft.Tables.NsPerDay
  private val UsPerDay = 86400000000L
  private val MaxUs = (Long.MaxValue - 999L) / 1000L // µs whose ns image fits a Long
  private val MaxRanges = 32

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

  /** The day-bound predicate implied by `cond`, if it bounds the
    * relation's ns event-time column and does not already constrain the
    * partition column.
    */
  private def derive(cond: Expression, lr: LogicalRelation): Option[Expression] = {
    for {
      day <- dayPartitionAttr(lr)
      if !cond.references.contains(day)
      ts <- lr.output.find(a =>
        a.name == "ts" && a.dataType == LongType && a.exprId != day.exprId)
      ranges <- dayRanges(cond, ts)
      pred <- emit(ranges, day)
    } yield pred
  }

  private def dayPartitionAttr(lr: LogicalRelation): Option[Attribute] =
    lr.relation match {
      case fs: HadoopFsRelation
          if fs.partitionSchema.exists(c => c.name == "day" && c.dataType == DateType) =>
        lr.output.find(a => a.name == "day" && a.dataType == DateType)
      case _ => None
    }

  // ---------------------------------------------------------------- //
  // Interval algebra: a condition folds to a union of inclusive       //
  // epoch-day ranges (None end = unbounded); None overall = the       //
  // condition does not constrain event time.                          //
  // ---------------------------------------------------------------- //

  private type DayRange = (Option[Long], Option[Long])

  private def dayRanges(cond: Expression, ts: Attribute): Option[Seq[DayRange]] =
    cond match {
      case And(l, r) => (dayRanges(l, ts), dayRanges(r, ts)) match {
        case (Some(a), Some(b)) => Some(intersect(a, b))
        case (a, b)             => a.orElse(b) // one side unconstrained: keep the other
      }
      case Or(l, r) => // prune only if EVERY disjunct is time-bounded
        for { a <- dayRanges(l, ts); b <- dayRanges(r, ts) } yield a ++ b
      case e => leaf(e, ts)
    }

  private def intersect(a: Seq[DayRange], b: Seq[DayRange]): Seq[DayRange] = {
    def maxOpt(x: Option[Long], y: Option[Long]): Option[Long] =
      (x.toSeq ++ y.toSeq).reduceOption(_ max _)
    def minOpt(x: Option[Long], y: Option[Long]): Option[Long] =
      (x.toSeq ++ y.toSeq).reduceOption(_ min _)
    // coalesce-and-cap BOTH sides before the product: two 1000-literal
    // IN-lists would otherwise materialize 10^6 intermediate ranges at
    // PLANNING time — each side collapses to at most MaxRanges
    // (coalesced, then hulled), so the product is bounded by MaxRanges².
    val (ca, cb) = (capped(a), capped(b))
    for {
      (l1, h1) <- ca; (l2, h2) <- cb
      lo = maxOpt(l1, l2)
      hi = minOpt(h1, h2)
      if !lo.exists(l => hi.exists(_ < l)) // drop empty intersections
    } yield (lo, hi)
  }

  /** Sort + merge overlapping/adjacent ranges; hull if still too many.
    * Always a superset of the union — pruning-safe by construction.
    */
  private def capped(ranges: Seq[DayRange]): Seq[DayRange] = {
    if (ranges.size <= 1) return ranges
    val closed = ranges.map { case (lo, hi) =>
      (lo.getOrElse(Long.MinValue), hi.getOrElse(Long.MaxValue))
    }.sortBy(_._1)
    val merged = closed.tail.foldLeft(Vector(closed.head)) { case (acc, (lo, hi)) =>
      val (plo, phi) = acc.last
      if (lo <= saturatingInc(phi)) acc.init :+ (plo, math.max(phi, hi))
      else acc :+ (lo, hi)
    }
    val hulled =
      if (merged.size <= MaxRanges) merged
      else Vector((merged.head._1, merged.last._2))
    hulled.map { case (lo, hi) =>
      (if (lo == Long.MinValue) None else Some(lo),
        if (hi == Long.MaxValue) None else Some(hi))
    }
  }

  /** One comparison/equality/IN leaf → its day-range union, if the leaf
    * compares a recognized time view of `ts` against literal(s).
    */
  private def leaf(e: Expression, ts: Attribute): Option[Seq[DayRange]] = e match {
    case GreaterThanOrEqual(v, l: Literal) => lower(v, l, ts, strict = false)
    case GreaterThan(v, l: Literal)        => lower(v, l, ts, strict = true)
    case LessThanOrEqual(v, l: Literal)    => upper(v, l, ts, strict = false)
    case LessThan(v, l: Literal)           => upper(v, l, ts, strict = true)
    case EqualTo(v, l: Literal)            => equal(v, l, ts)
    case EqualNullSafe(v, l: Literal)      => equal(v, l, ts)
    // literal-on-the-left mirror images
    case GreaterThanOrEqual(l: Literal, v) => upper(v, l, ts, strict = false)
    case GreaterThan(l: Literal, v)        => upper(v, l, ts, strict = true)
    case LessThanOrEqual(l: Literal, v)    => lower(v, l, ts, strict = false)
    case LessThan(l: Literal, v)           => lower(v, l, ts, strict = true)
    case EqualTo(l: Literal, v)            => equal(v, l, ts)
    case EqualNullSafe(l: Literal, v)      => equal(v, l, ts)
    case In(v, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
      inList(v, list.map(_.asInstanceOf[Literal]), ts)
    case InSet(v, hset) if hset.nonEmpty =>
      inList(v, hset.toSeq.map(Literal(_, v.dataType)), ts)
    case _ => None
  }

  private def lower(v: Expression, l: Literal, ts: Attribute,
                    strict: Boolean): Option[Seq[DayRange]] =
    nsInterval(v, l, ts).map { case (lo, hi, _) =>
      // Smallest matching instant. `>=`: the interval start (safe for
      // widened intervals too — lo ≤ the true start). `>`: one past the
      // interval END — exact for every view, INCLUDING unaligned
      // date_trunc, where `trunc(v) > L ⟺ µs-view ≥ nextUnit` and
      // usEqHi(nextUnit-1)+1 == usEqLo(nextUnit) on both sign domains.
      val start = if (!strict) lo
      else if (hi == Long.MaxValue) return Some(Seq.empty) // > max: no rows
      else saturatingInc(hi)
      Seq((Some(Math.floorDiv(start, NsPerDay)), None))
    }

  private def upper(v: Expression, l: Literal, ts: Attribute,
                    strict: Boolean): Option[Seq[DayRange]] =
    nsInterval(v, l, ts).map { case (lo, hi, exact) =>
      // Largest matching instant. `<=`: the interval end (exact for
      // unaligned date_trunc too: trunc(v) ≤ L ⟺ µs-view ≤ nextUnit-1).
      // `<`: one before the interval START when the interval is the
      // exact literal preimage; for a WIDENED interval (unaligned
      // date_trunc literal) the whole enclosing unit still satisfies
      // `trunc(v) < L`, so the end stays hi — dec(lo) there would drop
      // matching rows, the one genuinely unsafe corner of this algebra.
      val end = if (!strict) hi
      else if (!exact) hi
      else if (lo == Long.MinValue) return Some(Seq.empty) // < min: no rows
      else saturatingDec(lo)
      Seq((None, Some(Math.floorDiv(end, NsPerDay))))
    }

  private def equal(v: Expression, l: Literal, ts: Attribute): Option[Seq[DayRange]] =
    nsInterval(v, l, ts).map { case (lo, hi, _) =>
      Seq((Some(Math.floorDiv(lo, NsPerDay)), Some(Math.floorDiv(hi, NsPerDay))))
    }

  private def inList(v: Expression, lits: Seq[Literal],
                     ts: Attribute): Option[Seq[DayRange]] = {
    val intervals = lits.map(l => nsInterval(v, l, ts))
    // all-or-nothing: one unsupported element leaves the list's row set
    // unbounded by the elements we DID understand
    if (intervals.exists(_.isEmpty)) None
    else Some(intervals.flatten.map { case (lo, hi, _) =>
      (Some(Math.floorDiv(lo, NsPerDay)), Some(Math.floorDiv(hi, NsPerDay)))
    })
  }

  private def saturatingInc(x: Long): Long = if (x == Long.MaxValue) x else x + 1
  private def saturatingDec(x: Long): Long = if (x == Long.MinValue) x else x - 1

  // ---------------------------------------------------------------- //
  // Per-view ns intervals: (lo, hi, exact) where [lo, hi] = every      //
  // instant (ns) whose view value compares EQUAL to the literal, and   //
  // exact=false marks a widened superset (an unaligned date_trunc      //
  // literal, whose true preimage is empty within the enclosing unit).  //
  // ---------------------------------------------------------------- //

  /** The exact ns preimage of one µs-view value: `ts div 1000` truncates
    * toward zero, so 0 µs renders ts ∈ [-999, 999] and negative values
    * sit LEFT of their positive-domain mirror (ADVICE r11's negative-
    * domain inversion bug, fixed by casing on sign).
    */
  private def usEqLo(us: Long): Long = if (us <= 0) us * 1000L - 999L else us * 1000L
  private def usEqHi(us: Long): Long = if (us >= 0) us * 1000L + 999L else us * 1000L

  private def nsInterval(v: Expression, l: Literal,
                         ts: Attribute): Option[(Long, Long, Boolean)] =
    if (l.value == null) None
    else v match {
      // `ts` itself: BIGINT nanos vs a LONG literal — exact
      case a: Attribute if a.semanticEquals(ts) && l.dataType == LongType =>
        Some((l.value.asInstanceOf[Long], l.value.asInstanceOf[Long], true))
      // `ts div D` for any positive literal granule D — the raw epoch
      // arithmetic dashboards write (`ts_ns div 1000000000 >= epochSec`,
      // ms/µs variants): a truncating-division view, same sign-cased
      // inversion as the µs view but with granule D
      case d: IntegralDivide if l.dataType == LongType =>
        val granule = d.right match {
          case Literal(g: Long, LongType)   => g
          case Literal(g: Int, IntegerType) => g.toLong
          case _                            => 0L
        }
        d.left match {
          case a: Attribute if granule > 0 && a.semanticEquals(ts) =>
            val w = l.value.asInstanceOf[Long]
            if (w == Long.MinValue ||
              math.abs(w) > (Long.MaxValue - (granule - 1)) / granule) None
            else Some((
              if (w <= 0) w * granule - (granule - 1) else w * granule,
              if (w >= 0) w * granule + (granule - 1) else w * granule,
              true))
          case _ => None
        }
      // the normalized µs view vs a TIMESTAMP literal
      case UsView(a) if a.semanticEquals(ts) && isTimestamp(l.dataType) =>
        val us = l.value.asInstanceOf[Long]
        if (us == Long.MinValue || math.abs(us) > MaxUs) None
        else Some((usEqLo(us), usEqHi(us), true))
      // epoch arithmetic over the µs view — unix_seconds/millis/micros(ts)
      // vs a LONG literal: each is a FLOOR-granule view (Spark's unix_*
      // use floorDiv), so literal w's µs preimage is [w·g, w·g + g - 1]
      // exactly, then the µs view's sign-cased ns preimage composes
      case UnixMicros(UsView(a))
          if a.semanticEquals(ts) && l.dataType == LongType =>
        epochView(l.value.asInstanceOf[Long], 1L)
      case UnixMillis(UsView(a))
          if a.semanticEquals(ts) && l.dataType == LongType =>
        epochView(l.value.asInstanceOf[Long], 1000L)
      case UnixSeconds(UsView(a))
          if a.semanticEquals(ts) && l.dataType == LongType =>
        epochView(l.value.asInstanceOf[Long], 1000000L)
      // date_trunc(unit, µs-view) vs a TIMESTAMP literal, fixed-offset
      // session (r13: any fixed offset, not just UTC — the truncation
      // happens in LOCAL wall time, so the local floor/next bounds are
      // shifted back by the offset to instant µs before taking the ns
      // preimage)
      case TruncTimestamp(fmt: Literal, UsView(a), tz)
          if a.semanticEquals(ts) && fmt.dataType == StringType &&
            fmt.value != null && isTimestamp(l.dataType) =>
        for {
          off <- fixedOffsetUs(tz)
          us = l.value.asInstanceOf[Long]
          if us != Long.MinValue && math.abs(us) <= MaxUs - math.abs(off)
          f <- floorUnit(us + off, fmt.value.toString)
          n <- nextUnit(f, fmt.value.toString)
          if math.abs(f - off) <= MaxUs && math.abs(n - 1 - off) <= MaxUs
        } yield (usEqLo(f - off), usEqHi(n - 1 - off), f == us + off)
      // CAST(µs-view AS DATE) vs a DATE literal, fixed-offset session:
      // local date d covers local µs [d·day, (d+1)·day), i.e. instants
      // shifted back by the offset
      case c: Cast
          if c.dataType == DateType &&
            UsView.unapply(c.child).exists(_.semanticEquals(ts)) &&
            l.dataType == DateType =>
        for {
          off <- fixedOffsetUs(c.timeZoneId)
          d = l.value.asInstanceOf[Int].toLong
          if math.abs(d) + 2 <= (MaxUs - math.abs(off)) / UsPerDay
        } yield (usEqLo(d * UsPerDay - off), usEqHi((d + 1) * UsPerDay - 1 - off), true)
      // date_format(µs-view, 'yyyy-MM-dd') vs a STRING literal — the
      // string-equality dashboard idiom (r13). A literal that parses as
      // a strict ISO date in [1000, 9999] names one LOCAL day; within
      // that year range the format is fixed-width, so lexicographic
      // string order equals day order and inequalities are exact too. A
      // non-parsing literal derives nothing (the equality can still
      // only be decided by the data filter — pruning-safe).
      case DateFormatClass(UsView(a), fmt: Literal, tz)
          if a.semanticEquals(ts) && fmt.dataType == StringType &&
            fmt.value != null && fmt.value.toString == "yyyy-MM-dd" &&
            l.dataType == StringType =>
        for {
          off <- fixedOffsetUs(tz)
          d <- parseIsoDay(l.value.toString)
          if math.abs(d) + 2 <= (MaxUs - math.abs(off)) / UsPerDay
        } yield (usEqLo(d * UsPerDay - off), usEqHi((d + 1) * UsPerDay - 1 - off), true)
      case _ => None
    }

  /** Epoch day of a strict `yyyy-MM-dd` literal with a 4-digit year in
    * [1000, 9999] — the range where the format is fixed-width and
    * lexicographic order equals chronological order (negative and
    * 5-digit years break that, so they derive nothing).
    */
  private def parseIsoDay(s: String): Option[Long] =
    if (!s.matches("[1-9]\\d{3}-\\d{2}-\\d{2}")) None
    else try {
      Some(java.time.LocalDate.parse(s).toEpochDay)
    } catch { case _: java.time.format.DateTimeParseException => None }

  private def isTimestamp(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  /** ns interval for `floor(µs-view / g) = w` — unix_seconds (g=1e6),
    * unix_millis (g=1e3), unix_micros (g=1).
    */
  private def epochView(w: Long, g: Long): Option[(Long, Long, Boolean)] = {
    // w == Long.MinValue would slip the abs guard (abs of it is negative)
    // and wrap the multiplication into a bound that DROPS rows
    if (w == Long.MinValue || math.abs(w) > (MaxUs - (g - 1)) / g) None
    else Some((usEqLo(w * g), usEqHi(w * g + g - 1), true))
  }

  /** `timestamp_micros(ts div 1000)` over the relation's ns column — the
    * shape predicate pushdown leaves after substituting the normalized
    * view's alias.
    */
  private object UsView {
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosToTimestamp(d: IntegralDivide) =>
        val by1000 = d.right match {
          case Literal(v: Long, LongType)   => v == 1000L
          case Literal(v: Int, IntegerType) => v == 1000
          case _                            => false
        }
        d.left match {
          case a: Attribute if by1000 && a.dataType == LongType => Some(a)
          case _ => None
        }
      case _ => None
    }
  }

  /** The expression's resolved time zone as a FIXED offset in µs (0 for
    * UTC/GMT/Z, +8h·1e6·3600 for '+08:00', …), or None for a region
    * zone with DST/historic transitions — there local wall time is not
    * a constant shift of the instant, so date_trunc/cast-to-date derive
    * nothing (r12 refused everything non-UTC; r13 shifts fixed-offset
    * sessions instead, VERDICT r12 #5a).
    */
  private def fixedOffsetUs(tz: Option[String]): Option[Long] = tz.flatMap { id =>
    try {
      val rules = java.time.ZoneId.of(id).getRules
      if (rules.isFixedOffset)
        Some(rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds * 1000000L)
      else None
    } catch { case _: Exception => None }
  }.orElse(if (tz.isEmpty) Some(0L) else None)

  // ---- date_trunc unit arithmetic (µs, UTC, proleptic Gregorian) ---- //

  private def fixedGranuleUs(unit: String): Option[Long] = unit match {
    case "microsecond" => Some(1L)
    case "millisecond" => Some(1000L)
    case "second"      => Some(1000000L)
    case "minute"      => Some(60000000L)
    case "hour"        => Some(3600000000L)
    case "day" | "dd"  => Some(UsPerDay)
    case _             => None
  }

  private def floorUnit(us: Long, rawUnit: String): Option[Long] = {
    val unit = rawUnit.toLowerCase(java.util.Locale.ROOT)
    fixedGranuleUs(unit) match {
      case Some(g) => Some(us - Math.floorMod(us, g))
      case None => unit match {
        case "week" => // ISO Monday start; epoch day -3 (1969-12-29) was a Monday
          val day = Math.floorDiv(us, UsPerDay)
          Some((day - Math.floorMod(day + 3, 7)) * UsPerDay)
        case "month" | "mon" | "mm" => calFloor(us)(_.withDayOfMonth(1))
        case "quarter" => calFloor(us)(d =>
          d.withDayOfMonth(1).withMonth(((d.getMonthValue - 1) / 3) * 3 + 1))
        case "year" | "yyyy" | "yy" => calFloor(us)(_.withDayOfYear(1))
        case _ => None // decade/century/era: not derived, never wrong
      }
    }
  }

  private def nextUnit(floorUs: Long, rawUnit: String): Option[Long] = {
    val unit = rawUnit.toLowerCase(java.util.Locale.ROOT)
    fixedGranuleUs(unit) match {
      case Some(g) => try Some(Math.addExact(floorUs, g)) catch { case _: ArithmeticException => None }
      case None => unit match {
        case "week" => try Some(Math.addExact(floorUs, 7 * UsPerDay)) catch { case _: ArithmeticException => None }
        case "month" | "mon" | "mm"  => calShift(floorUs)(_.plusMonths(1))
        case "quarter"               => calShift(floorUs)(_.plusMonths(3))
        case "year" | "yyyy" | "yy"  => calShift(floorUs)(_.plusYears(1))
        case _ => None
      }
    }
  }

  private def calFloor(us: Long)(f: java.time.LocalDate => java.time.LocalDate): Option[Long] =
    try {
      val day = Math.floorDiv(us, UsPerDay)
      Some(Math.multiplyExact(f(java.time.LocalDate.ofEpochDay(day)).toEpochDay, UsPerDay))
    } catch { case _: Exception => None }

  private def calShift(us: Long)(f: java.time.LocalDate => java.time.LocalDate): Option[Long] =
    calFloor(us)(f) // floorUs is day-aligned already; shift then re-scale

  // ---------------------------------------------------------------- //
  // Emission: coalesce the union, then build the day predicate.       //
  // ---------------------------------------------------------------- //

  private def emit(ranges: Seq[DayRange], day: Attribute): Option[Expression] = {
    // a derived contradiction (no range can match) means the ORIGINAL
    // predicate is unsatisfiable if our algebra is exact — but it is
    // deliberately a superset in places, so inject nothing and let the
    // data filter answer; pruning-only, never row-dropping
    if (ranges.isEmpty) return None
    val merged = capped(ranges)
    // an unbounded range (directly, or as the hull of mixed-sided
    // bounds) prunes nothing
    if (merged.exists { case (None, None) => true; case _ => false }) return None
    def dayLit(d: Long): Literal = {
      val c = math.max(Int.MinValue.toLong, math.min(Int.MaxValue.toLong, d)).toInt
      Literal(c, DateType)
    }
    if (merged.size > 1 && merged.forall { case (lo, hi) => lo == hi })
      Some(In(day, merged.map(r => dayLit(r._1.get))))
    else {
      val preds = merged.map {
        case (Some(a), Some(b)) if a == b => EqualTo(day, dayLit(a))
        case (Some(a), Some(b)) =>
          And(GreaterThanOrEqual(day, dayLit(a)), LessThanOrEqual(day, dayLit(b)))
        case (Some(a), None) => GreaterThanOrEqual(day, dayLit(a))
        case (None, Some(b)) => LessThanOrEqual(day, dayLit(b))
        case (None, None)    => return None // unreachable: filtered above
      }
      preds.reduceOption[Expression](Or)
    }
  }
}
