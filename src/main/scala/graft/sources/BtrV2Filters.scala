package graft.sources

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{And => V2And, Not => V2Not, Or => V2Or, Predicate}
import org.apache.spark.sql.sources._

/** V2 Predicate → V1 Filter translation, extended with NESTED column
  * references (dotted attribute names like `rec.a`), SOUND FOR PRUNING.
  *
  * The scan uses the translated Filters to SKIP data (chunk min/max,
  * blooms, partition pruning), so a translation may only ever match a
  * SUPERSET of the predicate's rows. Compound shapes are translated
  * here with explicit exactness tracking, because Spark's own
  * `PredicateUtils.toV1` partially translates disjunctions —
  * `toV1(Or(untranslatable, x = 5))` returns `EqualTo(x, 5)` — which is
  * fine for its re-applying callers but, used as a skip filter, drops
  * every row matching only the untranslatable side (a silent
  * wrong-results bug: `WHERE x % 10 = 0 OR x = 5` scanned only x=5's
  * chunks). Soundness rules:
  *
  *  - AND may drop an untranslatable side (superset — a conjunct subset
  *    is implied by the whole), marking the result INEXACT;
  *  - OR requires BOTH sides (a disjunct subset is implied-BY, not
  *    implying); a superset-of-either side still yields a superset, so
  *    inexact children are fine;
  *  - NOT requires an EXACT child (negating a superset gives a subset —
  *    precisely the unsound direction).
  *
  * Spark's translator is consulted for LEAF shapes only; leaves either
  * translate exactly or not at all. Anything untranslated simply isn't
  * pushed — every predicate stays a residual above the scan.
  */
object BtrV2Filters {

  def toV1(p: Predicate): Option[Filter] = translate(p).map(_._1)

  /** (filter, exact): inexact means the filter matches a superset of
    * the predicate's rows — sound for skipping under positive polarity,
    * rejected under NOT.
    */
  private def translate(p: Predicate): Option[(Filter, Boolean)] = p match {
    case a: V2And =>
      (translate(a.left()), translate(a.right())) match {
        case (Some((l, le)), Some((r, re))) => Some((And(l, r), le && re))
        case (Some((l, _)), None) => Some((l, false))
        case (None, Some((r, _))) => Some((r, false))
        case _ => None
      }
    case o: V2Or =>
      for ((l, le) <- translate(o.left()); (r, re) <- translate(o.right()))
        yield (Or(l, r), le && re)
    case n: V2Not =>
      translate(n.child()).collect { case (f, true) => (Not(f), true) }
    case _ if p.name() == "AND" || p.name() == "OR" || p.name() == "NOT" =>
      None // compound by NAME but not by class: never hand it to a
           // translator that may partial-translate it
    case _ =>
      leaf(p).map((_, true))
  }

  private def leaf(p: Predicate): Option[Filter] =
    org.apache.spark.sql.graft.ColumnShim.predicateToV1(p).orElse(nested(p))

  private def refName(e: V2Expr): Option[String] = e match {
    case r: NamedReference => Some(r.fieldNames.mkString("."))
    case _ => None
  }

  private def litValue(e: V2Expr): Option[Any] = e match {
    case l: V2Literal[_] =>
      Some(CatalystTypeConverters.convertToScala(l.value, l.dataType))
    case _ => None
  }

  private def sequence(xs: Array[Option[Any]]): Option[Array[Any]] =
    if (xs.contains(None)) None else Some(xs.map(_.get))

  private def mk(op: String, a: String, v: Any): Filter = op match {
    case "=" => EqualTo(a, v)
    case "<=>" => EqualNullSafe(a, v)
    case ">" => GreaterThan(a, v)
    case ">=" => GreaterThanOrEqual(a, v)
    case "<" => LessThan(a, v)
    case "<=" => LessThanOrEqual(a, v)
  }

  private def flip(op: String): String = op match {
    case ">" => "<"
    case ">=" => "<="
    case "<" => ">"
    case "<=" => ">="
    case other => other // = and <=> are symmetric
  }

  /** LEAF translation with nested (dotted) references — compound shapes
    * never reach here ([[translate]] intercepts them).
    */
  private def nested(p: Predicate): Option[Filter] = p match {
    case _ =>
      val ch = p.children()
      p.name() match {
        case "IS_NULL" if ch.length == 1 => refName(ch(0)).map(IsNull)
        case "IS_NOT_NULL" if ch.length == 1 => refName(ch(0)).map(IsNotNull)
        case "STARTS_WITH" if ch.length == 2 =>
          for (a <- refName(ch(0)); v <- litValue(ch(1)) if v != null)
            yield StringStartsWith(a, v.toString)
        case "IN" if ch.length >= 2 =>
          for (a <- refName(ch(0)); vs <- sequence(ch.drop(1).map(litValue))
               if !vs.contains(null))
            yield In(a, vs)
        // null comparison literals never build a Filter: EqualTo(a, null)
        // etc. are invalid by V1 convention (only <=> is null-safe) — the
        // predicate stays a residual above the scan
        case op @ ("=" | "<=>" | ">" | ">=" | "<" | "<=") if ch.length == 2 =>
          (refName(ch(0)), litValue(ch(1)), refName(ch(1)), litValue(ch(0))) match {
            case (Some(a), Some(v), _, _) if v != null || op == "<=>" => Some(mk(op, a, v))
            case (_, _, Some(a), Some(v)) if v != null || op == "<=>" =>
              Some(mk(flip(op), a, v))
            case _ => None
          }
        case _ => None
      }
  }
}
