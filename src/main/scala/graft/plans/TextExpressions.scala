package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingling (SURVEY.md §2.E2/E3 hot path).
  *
  * The composed form — `transform(sequence(...), i => concat_ws(" ",
  * slice(words, i, n)))` — evaluates interpreted and allocates a slice
  * array per shingle; profiling showed it dominates the dedup pipelines
  * (~4.6s of a 7s query at sf0.1). This expression emits all shingles
  * in one pass with a single output allocation.
  */
object NativeText {
  private val SPACE = UTF8String.fromString(" ")

  /** Count of array elements equal to any marker (duplicates counted).
    * Marker sets are tiny (≤ a few dozen stopwords) so a linear probe
    * over a UTF8String array beats hashing — no per-row allocation.
    */
  def markerCount(words: ArrayData, markers: Array[UTF8String]): Int = {
    var c = 0
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        var j = 0
        while (j < markers.length) {
          if (markers(j).equals(w)) { c += 1; j = markers.length }
          else j += 1
        }
      }
      i += 1
    }
    c
  }

  def shingles(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (words.isNullAt(i + j)) null
          else words.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(SPACE, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** word_shingles(array<string>, n) → array<string> of word n-grams. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "word_shingles"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingles needs array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    NativeText.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NativeText.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** marker_count(array<string>, markers…) → int: occurrences of any
  * marker word in the array. The composed form — `size(filter(words,
  * w => w = m1 OR …))` — is a higher-order function: interpreted
  * per-element AND a whole-stage-codegen fence, so every query using
  * language ID / quality scoring lost codegen for its entire project.
  * This is the SURVEY §2.E8/E9 hot path (langScore is evaluated 5× per
  * row in the curation flagship).
  */
case class MarkerCount(child: Expression, markers: Seq[String])
    extends UnaryExpression {
  require(markers.nonEmpty, "marker_count needs at least one marker")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "marker_count"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"marker_count needs array<string>, got ${other.catalogString}")
    }

  @transient private lazy val utf8Markers: Array[UTF8String] =
    markers.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(input: Any): Any =
    NativeText.markerCount(input.asInstanceOf[ArrayData], utf8Markers)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markers", utf8Markers,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NativeText.markerCount($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCount =
    copy(child = newChild)
}

object TextNativeFunctions {
  def wordShingles(words: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(words), n))

  def markerCount(words: Column, markers: Seq[String]): Column =
    GraftBridge.column(MarkerCount(GraftBridge.expression(words), markers))
}
