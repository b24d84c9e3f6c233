package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between catalyst [[Expression]]s and the public [[Column]] API.
  * `ExpressionUtils` is `private[sql]` in Spark 4, so this lives under
  * `org.apache.spark.sql` — the standard shim shape used by DSv2
  * connector libraries that ship custom codegen'd expressions.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Spark's V2 Predicate → V1 Filter translation (`PredicateUtils` is
    * `private[sql]`): the engine's V2 pushdown delegates every top-level
    * shape here and adds its own nested-reference translation on top.
    */
  def predicateToV1(p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(p)

  /** Spark's own ARITHMETIC_OVERFLOW error (`SparkArithmeticException`
    * with the error class), so error-class-sensitive callers see the
    * same failure from pushed aggregates as from the unpushed data
    * path. `ExecutionErrors` is `private[sql]`, hence the shim.
    */
  def arithmeticOverflow(message: String, hint: String = ""): ArithmeticException =
    org.apache.spark.sql.errors.ExecutionErrors.arithmeticOverflowError(message, hint, null)
}
