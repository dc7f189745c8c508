package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector arithmetic (SURVEY.md §2.E5-E7 hot path).
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) evaluate
  * INTERPRETED — per-row closure dispatch plus an intermediate array
  * allocation per pair. For pairwise similarity that's the entire
  * runtime. These expressions do one allocation-free pass inside
  * whole-stage codegen, with the SAME left-fold IEEE operation order
  * as the higher-order formulation (and the DuckDB `list_reduce`
  * oracle), so results are bit-identical — asserted in NativeExprSpec.
  */
object NativeVec {

  /** Σ a(i)·b(i), index order; null if any element is null or lengths
    * differ (matching zip_with's null-padding → null-result semantics).
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Σ (a(i)−b(i))², index order; null semantics as [[dot]]. */
  def sqDist(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

abstract class VecBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // Null is produced even on non-null inputs (length mismatch, null
  // element) — without this, non-nullable children would let codegen
  // elide ev.isNull and the optimizer fold IsNull(this) to false.
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<double>, got $other")
    }
}

/** dot_product(array<double>, array<double>) → double. */
case class DotProduct(left: Expression, right: Expression)
    extends VecBinaryExpression {
  override def prettyName: String = "dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeVec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, NOT a fixed name: two dot/sq_dist calls in one
      // generated function would otherwise redeclare the same local,
      // janino rejects it, and the whole projection silently falls
      // back to interpreted mode
      val r = ctx.freshName("vecRes")
      s"""
      java.lang.Double $r = graft.plans.NativeVec.dot($a, $b);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
    """})
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** sq_dist(array<double>, array<double>) → double. */
case class SqDist(left: Expression, right: Expression)
    extends VecBinaryExpression {
  override def prettyName: String = "sq_dist"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeVec.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecRes") // see DotProduct: fixed names collide
      s"""
      java.lang.Double $r = graft.plans.NativeVec.sqDist($a, $b);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
    """})
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorFunctions {
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a),
      GraftBridge.expression(b)))

  def sqDist(a: Column, b: Column): Column =
    GraftBridge.column(SqDist(GraftBridge.expression(a),
      GraftBridge.expression(b)))
}
