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
      case (e, lit, op) =>
        dayCastOf(e).flatMap { case (ts, zone) =>
          lit match {
            case Literal(days: Int, DateType) => Some(castDateCmp(ts, zone, days, op))
            case _ => None
          }
        }.orElse(yearCmp(e, lit, op))
    }
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
