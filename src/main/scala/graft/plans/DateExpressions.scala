package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DateType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-format date parser (reference transform.py:181-208
  * `safe_date`, SURVEY §2.B2 fast path).
  *
  * The composed-Column ladder (Cleaning.parseDateMultiComposed) is
  * three `regexp_extract`s plus ~5 branch-duplicated
  * make_date/last_day subtrees — ~2 KB of generated code PER
  * REFERENCE. That is fine in a lone projection, but Catalyst's
  * filter pushdown and project collapse freely re-inline a derived
  * column's defining tree at every use site: `age`'s six reads of the
  * parsed dob put six ladders under one fused no-key aggregate, the
  * generated method passed janino's 64 KB limit, and the stage
  * silently ran interpreted (r8 VERDICT #1). A native expression is
  * immune by construction: however many times the optimizer copies
  * it, each copy is ONE static call — and it's faster (one compiled
  * regex pass instead of three `regexp_extract`s).
  *
  * Semantics are bit-identical to the composed ladder (NativeExprSpec
  * asserts equality over the generator corpus + adversarial cases,
  * and the q_safe_date DuckDB oracle is unchanged):
  *  - `d-m-yyyy` / `yyyy-m-d` / `d-m-yy`, separators `-` `/` `.`;
  *  - 4-digit-year x-y-yyyy: month-first when x ≤ 12, else day-first;
  *  - 2-digit year: century pivot (yy > refYear%100 → 19xx else 20xx),
  *    day-first with swap when the month slot can't be a month;
  *  - years outside [1900, refYear] and invalid calendar days → null.
  */
object DateParse {
  private val Pat = java.util.regex.Pattern.compile(
    "^(\\d{1,4})[-/.](\\d{1,2})[-/.](\\d{1,4})$")

  /** Spark `trim` semantics: strip ASCII space (0x20) only — NOT
    * Java String.trim's ≤0x20 sweep, which would also eat tabs and
    * diverge from the composed ladder on adversarial input.
    */
  private def sparkTrim(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  private def mk(refYear: Int, y: Int, m: Int, d: Int): Integer =
    if (y >= 1900 && y <= refYear && m >= 1 && m <= 12 &&
        d >= 1 && d <= java.time.YearMonth.of(y, m).lengthOfMonth())
      Int.box(java.time.LocalDate.of(y, m, d).toEpochDay.toInt)
    else null

  /** Epoch days (Spark DateType internal value) or null. */
  def parseMultiDays(s: UTF8String, refYear: Int): Integer = {
    val str = sparkTrim(s.toString)
    val m = Pat.matcher(str)
    if (!m.matches()) return null
    val p1 = m.group(1); val p3 = m.group(3)
    val a = p1.toInt; val b = m.group(2).toInt; val e = p3.toInt
    if (p1.length == 4) mk(refYear, a, b, e) // yyyy-m-d
    else if (p3.length == 4) { // x-y-yyyy: month-first, else day-first
      if (a <= 12) mk(refYear, e, a, b) else mk(refYear, e, b, a)
    } else if (p3.length <= 2) { // 2-digit year: pivot + swap
      val y2 = if (e > refYear % 100) e + 1900 else e + 2000
      if (b > 12 && a <= 12) mk(refYear, y2, a, b)
      else mk(refYear, y2, b, a)
    } else null // 3-digit year
  }
}

/** parse_date_multi(string) → date (null on any unparseable input). */
case class ParseDateMulti(child: Expression, refYear: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"parse_date_multi needs string, got ${other.catalogString}")
    }
  override def dataType: DataType = DateType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_date_multi"

  override protected def nullSafeEval(input: Any): Any =
    DateParse.parseMultiDays(input.asInstanceOf[UTF8String], refYear)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("parsedDays")
      s"""java.lang.Integer $r = graft.plans.DateParse.parseMultiDays($c, $refYear);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.intValue(); }""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ParseDateMulti = copy(child = newChild)
}

object DateFunctions {
  def parseDateMulti(c: Column, refYear: Int): Column =
    GraftBridge.column(ParseDateMulti(GraftBridge.expression(c), refYear))
}
