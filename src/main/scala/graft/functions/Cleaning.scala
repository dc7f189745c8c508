package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cleaning / enrichment column expressions — the Spark re-expression of
  * the reference transform semantics (reference: src/transform.py:171-219
  * `safe_val` / `safe_date` / `safe_num`, :251 region map, :316 segment,
  * :397 risk, :462 txn category).
  *
  * Everything here is a pure `Column` expression: whole-stage-codegen
  * friendly, no UDFs, so Catalyst can constant-fold, push down, and
  * pipeline these inside a single stage even at 100 TB scan width.
  */
object Cleaning {

  /** Strings the reference treats as missing (transform.py:172,182). */
  private val NullSentinels =
    Seq("", "None", "NaN", "nan", "NULL", "null", "N/A", "n/a")

  private def isMissing(c: Column): Column =
    c.isNull || trim(c).isin(NullSentinels: _*) ||
      lower(trim(c)) === "nan"

  /** safe_val: null-normalize + trim (+ optional casing).
    * Case note: `titleCase` follows Spark `initcap` (first letter of each
    * whitespace word upper, rest lower) rather than Python `str.title`
    * (which also breaks on apostrophes); documented divergence.
    */
  def cleanText(c: Column, default: String = "NA"): Column =
    when(isMissing(c), lit(default)).otherwise(trim(c))

  def cleanTextTitle(c: Column, default: String = "NA"): Column =
    when(isMissing(c), lit(default)).otherwise(initcap(trim(c)))

  def cleanTextUpper(c: Column, default: String = "NA"): Column =
    when(isMissing(c), lit(default)).otherwise(upper(trim(c)))

  def cleanTextLower(c: Column, default: String = "NA"): Column =
    when(isMissing(c), lit(default)).otherwise(lower(trim(c)))

  /** safe_num: strip currency symbols / thousands separators / spaces,
    * cast to double, garbage → default (transform.py:210).
    */
  def parseNumber(c: Column, default: Double = 0.0): Column = {
    val cleaned = regexp_replace(trim(c), "[₹$, ]", "")
    // Explicit numeric-shape guard (not a bare cast): ANSI-mode safe, and
    // the DuckDB oracle mirrors the same regex so parity is exact.
    val parsed = when(cleaned.rlike("^-?\\d+(\\.\\d+)?$"), cleaned.cast("double"))
    coalesce(parsed, lit(default))
  }

  /** safe_date: multi-format date parser (transform.py:181-208).
    * Accepts `d-m-yyyy`, `yyyy-m-d`, `d-m-yy` with separators -/., with:
    *  - 4-digit-year d/m order: month-first when ambiguous (first ≤ 12),
    *    else day-first — matches pandas' default-then-fallback behavior;
    *  - 2-digit year: day-first, day/month swapped when month > 12,
    *    century pivot `yy > refYear%100 → 1900+yy else 2000+yy`;
    *  - reject years outside [1900, refYear] and invalid calendar days.
    * All arithmetic is explicit (`make_date`) so the DuckDB oracle can
    * reproduce it bit-for-bit — no reliance on engine format quirks.
    */
  def parseDateMulti(c: Column, refYear: Int = 2026): Column =
    graft.plans.DateFunctions.parseDateMulti(c, refYear)

  /** The same parser as a composed Column ladder — kept as the
    * executable spec of [[parseDateMulti]] (NativeExprSpec asserts
    * bit-equality). Not used in pipelines: Catalyst re-inlines the
    * ~2 KB tree at every derived-column use site, which fused six
    * copies under one aggregate method and tripped janino's 64 KB
    * limit → silent interpreted fallback (r8 VERDICT #1).
    */
  def parseDateMultiComposed(c: Column, refYear: Int = 2026): Column = {
    val s = trim(c)
    val pat = "^(\\d{1,4})[-/.](\\d{1,2})[-/.](\\d{1,4})$"
    val p1 = regexp_extract(s, pat, 1)
    val p2 = regexp_extract(s, pat, 2)
    val p3 = regexp_extract(s, pat, 3)
    val a = p1.cast("int"); val b = p2.cast("int"); val e = p3.cast("int")

    def valid(y: Column, m: Column, d: Column): Column =
      y.geq(1900) && y.leq(refYear) && m.between(1, 12) &&
        d.geq(1) && d.leq(dayofmonth(last_day(make_date(y, m, lit(1)))))

    def mk(y: Column, m: Column, d: Column): Column =
      when(valid(y, m, d), make_date(y, m, d))

    // 2-digit year: pivot century, then day-first with swap when the
    // middle field can't be a month.
    val y2 = when(e > lit(refYear % 100), e + 1900).otherwise(e + 2000)
    val twoDigit =
      when(b > 12 && a <= 12, mk(y2, a, b)) // swap: d-m impossible, m-d ok
        .otherwise(mk(y2, b, a))            // day-first

    val parsed =
      when(p1 === "" || p2 === "", lit(null).cast("date"))
        .when(length(p1) === 4, mk(a, b, e))                    // yyyy-m-d
        .when(length(p3) === 4,                                  // x-y-yyyy
          when(a <= 12, mk(e, a, b)).otherwise(mk(e, b, a)))     // month-first, fallback day-first
        .when(length(p3) <= 2, twoDigit)
        .otherwise(lit(null).cast("date"))
    parsed
  }

  /** Calendar-exact age at `ref` (transform.py:216 calc_age): 0 when null
    * or born after ref.
    */
  def ageAt(dob: Column, ref: Column): Column = {
    val had = (month(ref) < month(dob)) ||
      (month(ref) === month(dob) && dayofmonth(ref) < dayofmonth(dob))
    val raw = year(ref) - year(dob) - when(had, 1).otherwise(0)
    when(dob.isNull || dob > ref, 0).otherwise(raw)
  }

  /** Tenure in days, null → 0, clamped ≥ 0 (transform.py:313). */
  def tenureDays(start: Column, ref: Column): Column =
    greatest(coalesce(datediff(ref, start), lit(0)), lit(0))

  /** Customer segment bucket (transform.py:316): ≥730 VIP, ≥180 Regular,
    * >0 New, else NA.
    */
  def customerSegment(tenure: Column): Column =
    when(tenure >= 730, "VIP")
      .when(tenure >= 180, "Regular")
      .when(tenure > 0, "New")
      .otherwise("NA")

  /** State → region keyword map (transform.py:251-258). Input is matched
    * case-insensitively by substring, as the reference does on the
    * upper-cased state.
    */
  def regionOf(state: Column): Column = {
    val s = upper(state)
    def anyOf(kw: Seq[String]): Column =
      kw.map(k => s.contains(k)).reduce(_ || _)
    when(anyOf(Seq("DELHI", "PUNJAB", "UP")), "North")
      .when(anyOf(Seq("MAHARASHTRA", "GUJARAT")), "West")
      .when(anyOf(Seq("KARNATAKA", "TAMIL")), "South")
      .when(anyOf(Seq("BENGAL", "BIHAR")), "East")
      .otherwise("NA")
  }

  /** Loan risk bucket (transform.py:397). */
  def riskCategory(amount: Column): Column =
    when(amount > 500000, "High")
      .when(amount > 100000, "Medium")
      .otherwise("Low")

  /** Transaction size bucket (transform.py:462). */
  def txnCategory(amount: Column): Column =
    when(amount > 10000, "Large")
      .when(amount > 1000, "Medium")
      .otherwise("Small")

  /** String → boolean flag (transform.py:459): true/1/yes/y (any case). */
  def parseBool(c: Column): Column =
    lower(trim(c)).isin("true", "1", "yes", "y")

  /** Gender normalization (transform.py:326): m/f/male/female → M/F else N. */
  def normalizeGender(c: Column): Column =
    when(lower(trim(c)).isin("m", "male"), "M")
      .when(lower(trim(c)).isin("f", "female"), "F")
      .otherwise("N")

  /** Whole-month difference end−start, null → 0, clamped ≥ 0
    * (transform.py:394 loan_duration_months, pandas Period('M') diff).
    */
  def monthsBetweenWhole(start: Column, end: Column): Column = {
    val m = (year(end) - year(start)) * 12 + (month(end) - month(start))
    greatest(coalesce(m, lit(0)), lit(0))
  }
}
