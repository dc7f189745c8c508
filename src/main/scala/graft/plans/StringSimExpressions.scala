package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity (record-linkage scoring).
  *
  * Spark ships levenshtein but no Jaro-Winkler; the DataFrame-composable
  * alternatives (UDF, or an exploded character model) are either
  * non-codegen or absurd. This is a single-pass native expression:
  * static helper + nullSafeCodeGen like every graft expression.
  *
  * Semantics are EXACTLY DuckDB's `jaro_winkler_similarity` (rapidfuzz
  * lineage), fuzz-validated against it on 5000 random pairs to 1e-12:
  *  - either string empty → 0.0 (both-empty included);
  *  - match window = max(len)/2 − 1 (floor, min 0);
  *  - transpositions halved with INTEGER division;
  *  - Winkler prefix boost (≤4 chars, weight 0.1) only when jaro > 0.7.
  * Operates on UTF-16 code units (parity with the oracle validated on
  * ASCII data; both engines agree wherever strings are BMP-only).
  */
object NativeStringSim {

  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    var window = math.max(l1, l2) / 2 - 1
    if (window < 0) window = 0
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!f2(j) && b.charAt(j) == a.charAt(i)) {
          f1(i) = true; f2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var trans = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val t = (trans / 2).toDouble // integer halving (rapidfuzz/DuckDB)
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val pmax = math.min(4, math.min(l1, l2))
      while (l < pmax && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** jaro_winkler(string, string) → double. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two strings, got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeStringSim.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.NativeStringSim.jaroWinkler($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object StringSimFunctions {
  def jaroWinkler(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinkler(GraftBridge.expression(a),
      GraftBridge.expression(b)))
}
