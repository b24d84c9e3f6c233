package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Z-value (Morton order) kernel for multi-dimensional clustering — the
  * public Delta/Iceberg OPTIMIZE ZORDER technique: each column quantizes
  * into a 2^bits-bucket rank via its (driver-sampled) quantile
  * boundaries, and the bucket bits of all columns interleave into one
  * long. Sorting by the z-value keeps rows close in EVERY clustered
  * dimension, so per-chunk min/max windows shrink on all of them at once
  * (single-column range clustering only serves its leading column).
  */
object ZUtil {
  /** bucket = #boundaries <= v (binary search), i.e. quantile rank. */
  private def bucketOf(bounds: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def zValue(arr: ArrayData, bounds: Array[Array[Double]], bits: Int): Long = {
    val k = bounds.length
    var z = 0L
    var c = 0
    while (c < k) {
      // nulls cluster at bucket 0 (they sort together, which is what a
      // null-heavy dimension wants)
      val bucket =
        if (arr.isNullAt(c)) 0
        else bucketOf(bounds(c), arr.getDouble(c))
      var b = 0
      while (b < bits) {
        z |= ((bucket >> b) & 1L) << (b * k + c)
        b += 1
      }
      c += 1
    }
    z
  }
}

/** `z_value(array(col1, col2, ...))`: interleaved quantile-bucket bits of
  * the (double-cast) clustering columns, with the per-column boundaries
  * carried as a codegen reference object.
  */
case class ZValueExpr(child: Expression, bounds: Seq[Seq[Double]], bits: Int)
    extends UnaryExpression {
  require(bounds.nonEmpty && bits >= 1 && bounds.length * bits <= 63,
    s"z_value: need 1..63 total bits, got ${bounds.length} cols x $bits bits")

  private lazy val boundsArr: Array[Array[Double]] = bounds.map(_.toArray).toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"z_value needs array<double>, got $other")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    ZUtil.zValue(input.asInstanceOf[ArrayData], boundsArr, bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zBounds", boundsArr, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.ZUtil.zValue($c, $ref, $bits)")
  }

  override protected def withNewChildInternal(newChild: Expression): ZValueExpr =
    copy(child = newChild)

  override def prettyName: String = "z_value"
}

object ZValueExpr {
  def of(arr: Column, bounds: Seq[Seq[Double]], bits: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      ZValueExpr(org.apache.spark.sql.graft.ColumnShim.expression(arr), bounds, bits))
}
