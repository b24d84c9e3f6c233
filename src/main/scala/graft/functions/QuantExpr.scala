package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Scalar (int8) vector quantization for embedding columns and the
  * IVF-flat index — the format's compression DNA applied to the engine's
  * own hottest serving surface (VERDICT r18 top item). Per-VECTOR affine
  * quantization: each vector carries its own `(scale, offset)` so
  * quantization is a pure row-local function — appends and on-the-fly
  * stale-row assignment need no global codebook, and any vector
  * round-trips within `scale/2` per element.
  *
  *   u_i   = round((v_i - min(v)) / s), s = (max(v) - min(v)) / 255
  *   byte  = u_i - 128 (stored as BinaryType, 1 byte/dim vs 8 for f64)
  *   qnorm = the EXACT L2 norm of v (so ranking divides by the true
  *           magnitude, not the quantized one)
  *
  * Approximate cosine against a float/double query vector q:
  *
  *   dot(q, v̂) = qo·Σq_i + qs·Σ q_i·u_i   (v̂_i = qo + qs·u_i)
  *   qcos      = dot(q, v̂) / (|q| · qnorm)
  *
  * which a two-stage ANN rank uses as the shortlist score before an
  * exact re-rank over the float copy (see SimilarityOps.rankTopKQuant).
  */
object QuantVecUtil {
  val Dim = 255 // code points per vector range

  /** (codes, scale, offset, norm); elemKind: 0 = float, 1 = double.
    * Null elements null the whole result (same contract as CosineUtil).
    */
  def quantize(vec: ArrayData, elemKind: Int): Array[AnyRef] = {
    val n = vec.numElements()
    var mn = java.lang.Double.POSITIVE_INFINITY
    var mx = java.lang.Double.NEGATIVE_INFINITY
    var norm2 = 0.0
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      val v = if (elemKind == 0) vec.getFloat(i).toDouble else vec.getDouble(i)
      if (java.lang.Double.isNaN(v)) return null
      if (v < mn) mn = v
      if (v > mx) mx = v
      norm2 += v * v
      i += 1
    }
    if (n == 0) return null
    val s = (mx - mn) / Dim
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      val v = if (elemKind == 0) vec.getFloat(i).toDouble else vec.getDouble(i)
      val u = if (s == 0.0) 0 else {
        val r = Math.round((v - mn) / s).toInt
        if (r < 0) 0 else if (r > Dim) Dim else r
      }
      out(i) = (u - 128).toByte
      i += 1
    }
    Array(out, java.lang.Double.valueOf(s), java.lang.Double.valueOf(mn),
      java.lang.Double.valueOf(math.sqrt(norm2)))
  }

  /** Approximate cosine of a quantized vector against a float/double
    * query; null on length mismatch or null query elements (the
    * CosineUtil conventions), and null when either norm is zero — a
    * 0/0 here would surface as NaN, which Spark's descending sort
    * ranks ABOVE every real score, so zero vectors would hijack the
    * two-stage shortlist's `rerankFactor × k` slots (pure recall loss:
    * the exact re-rank agrees they are not neighbors).
    */
  def quantCos(codes: Array[Byte], qs: Double, qo: Double, qn: Double,
      query: ArrayData, queryKind: Int): Any = {
    val n = codes.length
    if (query.numElements() != n) return null
    if (qn == 0.0) return null
    var sumQ = 0.0
    var dotU = 0.0
    var nq = 0.0
    var i = 0
    while (i < n) {
      if (query.isNullAt(i)) return null
      val q = if (queryKind == 0) query.getFloat(i).toDouble else query.getDouble(i)
      sumQ += q
      dotU += q * (codes(i) + 128)
      nq += q * q
      i += 1
    }
    if (nq == 0.0) return null
    java.lang.Double.valueOf((qo * sumQ + qs * dotU) / (math.sqrt(nq) * qn))
  }
}

/** `quantize_vec(vec)` → struct<qvec: binary, qs: double, qo: double,
  * qn: double> — codegen'd per-vector int8 scalar quantization.
  */
case class QuantizeVecExpr(child: Expression) extends UnaryExpression {

  private def kind: Int = child.dataType match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(DoubleType, _) => 1
    case _ => -1
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (kind >= 0) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"quantize_vec needs an array<float|double> input, got ${child.dataType}")

  override def dataType: DataType = QuantizeVecExpr.Schema

  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val r = QuantVecUtil.quantize(v.asInstanceOf[ArrayData], kind)
    if (r == null) null
    else InternalRow(r(0), r(1), r(2), r(3))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = kind
    val cg = child.genCode(ctx)
    val parts = ctx.freshName("quantParts")
    ev.copy(code = code"""
      ${cg.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
      if (!${cg.isNull}) {
        Object[] $parts = graft.functions.QuantVecUtil.quantize(${cg.value}, $k);
        if ($parts != null) {
          ${ev.isNull} = false;
          ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($parts);
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeVecExpr =
    copy(child = newChild)

  override def prettyName: String = "quantize_vec"
}

object QuantizeVecExpr {
  val Schema: StructType = StructType(Seq(
    StructField("qvec", BinaryType, nullable = false),
    StructField("qs", DoubleType, nullable = false),
    StructField("qo", DoubleType, nullable = false),
    StructField("qn", DoubleType, nullable = false)))

  def of(vec: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      QuantizeVecExpr(org.apache.spark.sql.graft.ColumnShim.expression(vec)))
}

/** `quant_cos(qvec, qs, qo, qn, query)` → the approximate cosine of an
  * int8-quantized vector against a float/double query vector.
  */
case class QuantCosExpr(qvec: Expression, qs: Expression, qo: Expression,
    qn: Expression, query: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(qvec, qs, qo, qn, query)

  private def queryKind: Int = query.dataType match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(DoubleType, _) => 1
    case _ => -1
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (qvec.dataType == BinaryType && qs.dataType == DoubleType &&
      qo.dataType == DoubleType && qn.dataType == DoubleType && queryKind >= 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "quant_cos needs (binary, double, double, double, array<float|double>), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val c = qvec.eval(input)
    val s = qs.eval(input)
    val o = qo.eval(input)
    val n = qn.eval(input)
    val q = query.eval(input)
    if (c == null || s == null || o == null || n == null || q == null) null
    else QuantVecUtil.quantCos(c.asInstanceOf[Array[Byte]],
      s.asInstanceOf[Double], o.asInstanceOf[Double], n.asInstanceOf[Double],
      q.asInstanceOf[ArrayData], queryKind)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = queryKind
    val gs = children.map(_.genCode(ctx))
    val boxed = ctx.freshName("qcosBoxed")
    val childCode = gs.map(_.code).reduce(_ + _)
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (${gs.map(g => s"!${g.isNull}").mkString(" && ")}) {
        Object $boxed = graft.functions.QuantVecUtil.quantCos(
          ${gs(0).value}, ${gs(1).value}, ${gs(2).value}, ${gs(3).value}, ${gs(4).value}, $k);
        if ($boxed != null) {
          ${ev.isNull} = false;
          ${ev.value} = ((java.lang.Double) $boxed).doubleValue();
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantCosExpr =
    copy(qvec = newChildren(0), qs = newChildren(1), qo = newChildren(2),
      qn = newChildren(3), query = newChildren(4))

  override def prettyName: String = "quant_cos"
}

object QuantCosExpr {
  def of(qvec: Column, qs: Column, qo: Column, qn: Column, query: Column): Column = {
    val e = org.apache.spark.sql.graft.ColumnShim.expression _
    org.apache.spark.sql.graft.ColumnShim.column(
      QuantCosExpr(e(qvec), e(qs), e(qo), e(qn), e(query)))
  }
}
