package graft.sources

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{And => V2And, Not => V2Not, Or => V2Or, Predicate}
import org.apache.spark.sql.sources._

/** V2 Predicate → V1 Filter translation, extended with NESTED column
  * references (dotted attribute names like `rec.a`). Spark's own
  * `PredicateUtils.toV1` covers every top-level shape the engine already
  * pushes; it declines multi-part references, so struct-leaf predicates
  * fall through to the translation below and reach late materialization
  * as ordinary Filters. Anything neither translator understands simply
  * isn't pushed — every predicate stays a residual above the scan.
  */
object BtrV2Filters {

  def toV1(p: Predicate): Option[Filter] =
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

  private def nested(p: Predicate): Option[Filter] = p match {
    case a: V2And => for (l <- toV1(a.left()); r <- toV1(a.right())) yield And(l, r)
    case o: V2Or => for (l <- toV1(o.left()); r <- toV1(o.right())) yield Or(l, r)
    case n: V2Not => toV1(n.child()).map(Not)
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
