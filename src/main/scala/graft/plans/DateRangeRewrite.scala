package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Derives timestamp RANGES from day-level predicates so they reach the
  * scan as plain source-column comparisons:
  *
  *   to_date(ts) = DATE'2026-08-15'       (analyzes to CAST(ts AS DATE))
  *     ⇒ ts >= TIMESTAMP'2026-08-15 00:00' AND ts < TIMESTAMP'2026-08-16 00:00'
  *   CAST(ts AS DATE) >= D  ⇒  ts >= startOf(D)
  *   year(d) = 2026         ⇒  d >= DATE'2026-01-01' AND d < DATE'2027-01-01'
  *
  * Without this, a day-level filter is an opaque expression: no V2
  * pushdown, no chunk skipping, no `days(ts)` directory pruning — the
  * scan reads everything. With it, the derived comparisons push down and
  * a 100 TB `days(ts)`-partitioned table prunes to the touched days.
  *
  * The rewrites are VALUE-EXACT (same boolean/null result for every
  * input, including null inputs — each derived conjunct/disjunct is null
  * exactly when the original is), so rewriting inside any filter or join
  * condition is safe. `<=>` is deliberately not rewritten (its
  * null-handling differs). Zone-aware: CAST(timestamp AS DATE) truncates
  * in the cast's session zone, so the derived range uses that zone's
  * day boundaries (DST-correct via `atStartOfDay(zone)`);
  * timestamp_ntz is zone-free. Registered by [[graft.GraftExtensions]]
  * into the operator-optimization fixpoint, so chained forms
  * (`year(to_date(ts))`) converge across iterations.
  *
  * Ordering matters: V2 pushdown runs ONCE, early — only build-time
  * injection (`injectOptimizerRule`, i.e. `.withExtensions` /
  * `spark.sql.extensions`) places this rule before it. The post-hoc
  * `GraftExtensions.register` fallback appends to the User-Provided
  * batch, which runs after pushdown: still value-exact, but the derived
  * range only helps the post-scan filter. (Spark 4's own
  * UnwrapCastInBinaryComparison already unwraps the plain
  * CAST(ts AS DATE) comparisons; this rule's unique coverage is
  * `date_trunc`, `year`, and date IN-lists.)
  */
object DateRangeRewrite extends Rule[LogicalPlan] {
  private val MicrosPerDay = 86_400_000_000L

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter =>
      val c = rewriteCondition(f.condition)
      if (c eq f.condition) f else f.copy(condition = c)
    case j: Join if j.condition.isDefined =>
      val c = rewriteCondition(j.condition.get)
      if (c eq j.condition.get) j else j.copy(condition = Some(c))
  }

  private def rewriteCondition(cond: Expression): Expression =
    cond.transformUp {
      case cmp: BinaryComparison => rewriteCmp(cmp).getOrElse(cmp)
      case in @ In(value, list) if list.nonEmpty && list.length <= 16 &&
        list.forall(_.isInstanceOf[Literal]) =>
        dayCastOf(value) match {
          case Some((ts, zone)) =>
            val ranges = list.flatMap {
              case Literal(days: Int, DateType) =>
                Some(dayRange(ts, zone, days))
              case Literal(null, _) =>
                // IN's null element contributes null-or-true semantics; a
                // range can't express it — bail on the whole rewrite
                None
              case _ => None
            }
            if (ranges.length == list.length) ranges.reduce(Or) else in
          case None => in
        }
    }

  /** value side = CAST(ts AS DATE) over a timestamp column?  Returns the
    * timestamp child and its zone (None = timestamp_ntz, zone-free).
    */
  private def dayCastOf(e: Expression): Option[(Expression, Option[java.time.ZoneId])] =
    e match {
      case c @ Cast(child, DateType, _, _) if child.deterministic =>
        child.dataType match {
          case TimestampType =>
            val zid = c.timeZoneId.getOrElse(conf.sessionLocalTimeZone)
            Some((child, Some(java.time.ZoneId.of(zid))))
          case TimestampNTZType => Some((child, None))
          case _ => None
        }
      case _ => None
    }

  private def startMicros(zone: Option[java.time.ZoneId], epochDay: Long): Long =
    zone match {
      case Some(z) =>
        val i = java.time.LocalDate.ofEpochDay(epochDay).atStartOfDay(z).toInstant
        i.getEpochSecond * 1_000_000L + i.getNano / 1000L
      case None => epochDay * MicrosPerDay
    }

  private def tsLit(ts: Expression, v: Long): Literal = Literal(v, ts.dataType)

  private def dayRange(ts: Expression, zone: Option[java.time.ZoneId], days: Int): Expression =
    And(
      GreaterThanOrEqual(ts, tsLit(ts, startMicros(zone, days.toLong))),
      LessThan(ts, tsLit(ts, startMicros(zone, days + 1L))))

  private def rewriteCmp(cmp: BinaryComparison): Option[Expression] = {
    // orient as (expr cmp literal)
    val oriented: Option[(Expression, Literal, String)] = (cmp, cmp.left, cmp.right) match {
      case (_, l, lit: Literal) if !l.isInstanceOf[Literal] => Some((l, lit, opOf(cmp, flipped = false)))
      case (_, lit: Literal, r) if !r.isInstanceOf[Literal] => Some((r, lit, opOf(cmp, flipped = true)))
      case _ => None
    }
    oriented.flatMap {
      case (_, Literal(null, _), _) => None
      case (_, _, "?") => None // EqualNullSafe: null semantics differ under NOT
      case (e, lit, op) =>
        dayCastOf(e).flatMap { case (ts, zone) =>
          lit match {
            case Literal(days: Int, DateType) => Some(castDateCmp(ts, zone, days, op))
            case _ => None
          }
        }.orElse(yearCmp(e, lit, op)).orElse(truncCmp(e, lit, op))
    }
  }

  // ---- date_trunc(unit, ts) cmp timestamp-literal ----------------------

  private val TruncUnits: Map[String, java.time.temporal.ChronoUnit] = {
    import java.time.temporal.ChronoUnit._
    Map(
      "second" -> SECONDS, "minute" -> MINUTES,
      "hour" -> HOURS, "hh" -> HOURS,
      "day" -> DAYS, "dd" -> DAYS,
      "week" -> WEEKS,
      "month" -> MONTHS, "mon" -> MONTHS, "mm" -> MONTHS,
      "quarter" -> MONTHS /* handled specially */,
      "year" -> YEARS, "yyyy" -> YEARS, "yy" -> YEARS)
  }

  private def zdtOf(micros: Long, zone: java.time.ZoneId): java.time.ZonedDateTime =
    java.time.Instant.ofEpochSecond(
      java.lang.Math.floorDiv(micros, 1_000_000L),
      java.lang.Math.floorMod(micros, 1_000_000L) * 1000L).atZone(zone)

  private def microsOf(z: java.time.ZonedDateTime): Long = {
    val i = z.toInstant
    i.getEpochSecond * 1_000_000L + i.getNano / 1000L
  }

  private def truncTo(micros: Long, unit: String, zone: java.time.ZoneId): Long = {
    import java.time.temporal.{ChronoUnit, TemporalAdjusters}
    val z = zdtOf(micros, zone)
    val t = unit match {
      case "second" | "minute" | "hour" | "hh" =>
        z.truncatedTo(TruncUnits(unit))
      case "day" | "dd" => z.toLocalDate.atStartOfDay(zone)
      case "week" =>
        z.toLocalDate.`with`(TemporalAdjusters.previousOrSame(java.time.DayOfWeek.MONDAY))
          .atStartOfDay(zone)
      case "month" | "mon" | "mm" => z.toLocalDate.withDayOfMonth(1).atStartOfDay(zone)
      case "quarter" =>
        val m = ((z.getMonthValue - 1) / 3) * 3 + 1
        z.toLocalDate.withDayOfMonth(1).withMonth(m).atStartOfDay(zone)
      case "year" | "yyyy" | "yy" =>
        z.toLocalDate.withDayOfYear(1).atStartOfDay(zone)
      case other => throw new IllegalStateException(s"unit $other")
    }
    microsOf(t)
  }

  private def advance(micros: Long, unit: String, zone: java.time.ZoneId): Long = {
    val z = zdtOf(micros, zone)
    val n = unit match {
      case "second" => z.plusSeconds(1)
      case "minute" => z.plusMinutes(1)
      case "hour" | "hh" => z.plusHours(1)
      case "day" | "dd" => z.plusDays(1)
      case "week" => z.plusWeeks(1)
      case "month" | "mon" | "mm" => z.plusMonths(1)
      case "quarter" => z.plusMonths(3)
      case "year" | "yyyy" | "yy" => z.plusYears(1)
      case other => throw new IllegalStateException(s"unit $other")
    }
    microsOf(n)
  }

  /** `date_trunc(unit, ts) cmp L`: with `B = trunc(L)` every value of
    * the left side is a boundary, so the comparison collapses to a plain
    * range on `ts` — `= L` only when L is itself a boundary (off-boundary
    * equality is left untouched), order comparisons always (an
    * off-boundary L rounds to the next boundary for >/>=, and `< L` ≡
    * `<= B` ≡ `ts < next(B)`). Null-exact: every derived comparison is
    * null exactly when ts is null.
    */
  private def truncCmp(e: Expression, lit: Literal, op: String): Option[Expression] =
    (e, lit) match {
      case (t @ TruncTimestamp(Literal(fmt, StringType), ts, _), Literal(m: Long, TimestampType))
        if fmt != null && ts.dataType == TimestampType && ts.deterministic && op != "?" &&
          TruncUnits.contains(fmt.toString.toLowerCase(java.util.Locale.ROOT)) =>
        val unit = fmt.toString.toLowerCase(java.util.Locale.ROOT)
        val zone = java.time.ZoneId.of(t.timeZoneId.getOrElse(conf.sessionLocalTimeZone))
        val b = truncTo(m, unit, zone)
        val onBoundary = b == m
        def lt(v: Long) = LessThan(ts, Literal(v, TimestampType))
        def ge(v: Long) = GreaterThanOrEqual(ts, Literal(v, TimestampType))
        op match {
          case "=" if onBoundary => Some(And(ge(m), lt(advance(m, unit, zone))))
          case "=" => None
          case ">=" => Some(if (onBoundary) ge(m) else ge(advance(b, unit, zone)))
          case ">" => Some(ge(advance(b, unit, zone)))
          case "<" => Some(if (onBoundary) lt(m) else lt(advance(b, unit, zone)))
          case "<=" => Some(lt(advance(b, unit, zone)))
          case _ => None
        }
      case _ => None
    }

  private def opOf(cmp: BinaryComparison, flipped: Boolean): String = cmp match {
    case _: EqualTo => "="
    case _: GreaterThan => if (flipped) "<" else ">"
    case _: GreaterThanOrEqual => if (flipped) "<=" else ">="
    case _: LessThan => if (flipped) ">" else "<"
    case _: LessThanOrEqual => if (flipped) ">=" else "<="
    case _ => "?" // EqualNullSafe: different null semantics, never rewrite
  }

  private def castDateCmp(ts: Expression, zone: Option[java.time.ZoneId],
      days: Int, op: String): Expression = op match {
    case "=" => dayRange(ts, zone, days)
    case ">=" => GreaterThanOrEqual(ts, tsLit(ts, startMicros(zone, days.toLong)))
    case ">" => GreaterThanOrEqual(ts, tsLit(ts, startMicros(zone, days + 1L)))
    case "<" => LessThan(ts, tsLit(ts, startMicros(zone, days.toLong)))
    case "<=" => LessThan(ts, tsLit(ts, startMicros(zone, days + 1L)))
    case _ => dayRange(ts, zone, days) // unreachable: op comes from opOf
  }

  /** year(d) cmp int over a DATE column (timestamps reach here as
    * year(CAST(ts AS DATE)) — the cast rewrite picks the result up on
    * the next fixpoint iteration).
    */
  private def yearCmp(e: Expression, lit: Literal, op: String): Option[Expression] =
    (e, lit) match {
      case (Year(d), Literal(y: Int, IntegerType))
        if d.dataType == DateType && d.deterministic && op != "?" &&
          y >= 1 && y <= 9998 =>
        def jan1(year: Int): Literal =
          Literal(java.time.LocalDate.of(year, 1, 1).toEpochDay.toInt, DateType)
        Some(op match {
          case "=" => And(GreaterThanOrEqual(d, jan1(y)), LessThan(d, jan1(y + 1)))
          case ">=" => GreaterThanOrEqual(d, jan1(y))
          case ">" => GreaterThanOrEqual(d, jan1(y + 1))
          case "<" => LessThan(d, jan1(y))
          case "<=" => LessThan(d, jan1(y + 1))
        })
      case _ => None
    }
}
