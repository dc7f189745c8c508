package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Data-layout + canonicalization expressions (SURVEY.md §2.H).
  *
  * [[ZOrder2]]: 32-bit Morton (Z-order) interleave of two 16-bit
  * dimensions — the space-filling-curve key that makes MULTI-column
  * min/max pruning work. A table sorted by (a, b) prunes scans on `a`
  * only; a table sorted by zorder2(a, b) gives every parquet row group
  * a tight bounding box in BOTH dimensions, so filters on either
  * column (or both) skip row groups. This is the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`, here as a plain codegen'd
  * expression feeding an ordinary sort-before-write.
  *
  * [[NfcNormalize]]: Unicode NFC canonicalization — the first step of
  * any text-dedup pipeline ("é" as U+00E9 vs e+U+0301 must hash
  * identically). JDK `java.text.Normalizer` under codegen; DuckDB's
  * `nfc_normalize` computes the identical canonical form, which is
  * what lets the q_text_clean oracle hash-match.
  */
object LayoutOps {

  /** Spread the low 16 bits of v to even bit positions (0,2,..,30). */
  def spread16(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Morton code of the low 16 bits of (x, y): x bits at even
    * positions, y at odd. Negative / oversized inputs are masked to
    * their low 16 bits (callers bucketize first).
    */
  def morton16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is O(n) with no allocation
    // and true for all-ASCII, the overwhelming case in web corpora
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** zorder2(long, long) → long: 32-bit Morton interleave. */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"zorder2 needs (bigint, bigint), got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    LayoutOps.morton16(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.plans.LayoutOps.morton16($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

/** nfc_normalize(string) → string: Unicode NFC canonical form. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize needs string, got ${other.catalogString}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    LayoutOps.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.LayoutOps.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object LayoutFunctions {
  def zorder2(x: Column, y: Column): Column =
    GraftBridge.column(ZOrder2(GraftBridge.expression(x),
      GraftBridge.expression(y)))

  def nfcNormalize(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
