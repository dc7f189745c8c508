package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the reference enforces these
  * implicitly via NOT NULL / UNIQUE constraints and its cleaning
  * defaults; at 100 TB you want them as a REPORT, not row-by-row
  * rejects).
  *
  * One pass over the data produces one row per rule with its violation
  * count — all rules evaluate inside a single aggregate (conditional
  * counts), so N rules still cost one scan and no shuffle beyond the
  * final 1-row combine.
  */
object Validate {

  final case class Rule(name: String, holds: Column)

  /** A17: rule-based row QUARANTINE — the routing counterpart of
    * [[report]]: where report counts violations, quarantine RETURNS
    * the offending rows tagged with every rule they break, the
    * "bad-rows table + reason codes" every production loader keeps
    * beside its clean output (the reference silently coerces bad
    * values; at 100 TB you want the rejects auditable, re-playable,
    * and attributable to a rule).
    *
    * All rules evaluate in ONE projection over one scan: the reason
    * string is the comma-join of failing rule names in DECLARATION
    * order (deterministic, partition-independent — no set semantics).
    * The rule array is rule-cardinality, so the interpreted HOF
    * filter is bounded and off the per-byte hot path. Null rule
    * results do NOT flag ([[report]]'s `count(when(!holds, 1))`
    * convention) — write explicit isNotNull rules for null checks.
    */
  def quarantine(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "quarantine: no rules")
    val reasons = array(rules.map(r =>
      when(!coalesce(r.holds, lit(true)), lit(r.name))): _*)
    df.withColumn("reasons",
        array_join(filter(reasons, x => x.isNotNull), ","))
      .filter(length(col("reasons")) > 0)
  }

  /** One row per rule: (rule, n_rows, n_violations, pass). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = count(lit(1)).as("__total") +:
      rules.map(r => count(when(!r.holds, 1)).as(s"__v_${r.name}"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    // inline(array(struct…)) — not a UNION of selects, which would
    // recompute the aggregate (one table scan per rule)
    val perRule = rules.map { r =>
      struct(lit(r.name).as("rule"),
        col("__total").as("n_rows"),
        col(s"__v_${r.name}").as("n_violations"),
        (col(s"__v_${r.name}") === 0).as("pass"))
    }
    one.select(inline(array(perRule: _*)))
  }

  /** Data profiling — per-column null count, exact distinct count, and
    * min/max, over the columns named in `strCols` / `numCols`. ALL
    * measures for ALL columns evaluate in one aggregate (one scan; the
    * exact distinct counts expand the aggregate internally, which is
    * the price of exactness — the 100 TB variant swaps in
    * approx_count_distinct per §4, same plan shape). Output is one row
    * per column: string columns carry min/max in vmin_str/vmax_str,
    * numeric columns in vmin_num/vmax_num (no double→string casts —
    * engines disagree on float formatting).
    */
  def profile(df: DataFrame, strCols: Seq[String],
              numCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__n") +:
      ((strCols ++ numCols).flatMap { c =>
        Seq(count(when(col(c).isNull, 1)).as(s"__null_$c"),
          countDistinct(col(c)).as(s"__nd_$c"),
          min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))
      })
    val one = df.agg(aggs.head, aggs.tail: _*)
    // one row per column via inline(array(struct…)) — a UNION of
    // per-column selects would recompute the aggregate (and rescan the
    // table) once per branch; this shape keeps the plan at ONE scan
    val rows = strCols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n"),
        col(s"__null_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").cast("string").as("vmin_str"),
        col(s"__max_$c").cast("string").as("vmax_str"),
        lit(null).cast("double").as("vmin_num"),
        lit(null).cast("double").as("vmax_num"))
    } ++ numCols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n"),
        col(s"__null_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
        lit(null).cast("string").as("vmin_str"),
        lit(null).cast("string").as("vmax_str"),
        col(s"__min_$c").cast("double").as("vmin_num"),
        col(s"__max_$c").cast("double").as("vmax_num"))
    }
    one.select(inline(array(rows: _*)))
  }

  /** A9: profile drift between a reference batch and the current
    * batch — the data-contract monitor that catches schema-compatible
    * but DISTRIBUTION-breaking changes (null-rate spikes, cardinality
    * collapse, numeric range escape) before they poison downstream
    * aggregates. Joins two [[profile]] outputs on the column name
    * (profile-cardinality rows — trivially broadcastable at any table
    * size).
    *
    * All drift tests are EXACT integer arithmetic: null-rate drift in
    * basis points via cross-multiplication (|nullc·nr − nullr·nc|·10⁴
    * > tol·nc·nr), distinct-count drift relative to the reference
    * (|ndc − ndr|·10⁴ > tol·ndr), numeric range escape as plain
    * comparisons — no engine-specific float rounding anywhere.
    */
  def profileDrift(ref: DataFrame, cur: DataFrame,
                   nullBpTol: Int, distinctBpTol: Int): DataFrame = {
    val r = ref.select(col("col_name"), col("n").as("n_ref"),
      col("n_null").as("null_ref"), col("n_distinct").as("nd_ref"),
      col("vmin_num").as("min_ref"), col("vmax_num").as("max_ref"))
    val c = cur.select(col("col_name"), col("n").as("n_cur"),
      col("n_null").as("null_cur"), col("n_distinct").as("nd_cur"),
      col("vmin_num").as("min_cur"), col("vmax_num").as("max_cur"))
    val nullDrift =
      abs(col("null_cur") * col("n_ref") - col("null_ref") * col("n_cur")) *
        10000 > lit(nullBpTol) * col("n_cur") * col("n_ref")
    val ndDrift =
      abs(col("nd_cur") - col("nd_ref")) * 10000 >
        lit(distinctBpTol) * col("nd_ref")
    val rangeEscape = coalesce(
      col("min_cur") < col("min_ref") || col("max_cur") > col("max_ref"),
      lit(false))
    r.join(c, "col_name")
      .select(col("col_name"), col("n_ref"), col("n_cur"),
        col("null_ref"), col("null_cur"), col("nd_ref"), col("nd_cur"),
        nullDrift.as("null_drift"), ndDrift.as("nd_drift"),
        rangeEscape.as("range_escape"),
        (nullDrift || ndDrift || rangeEscape).as("any_drift"))
  }

  /** Functional-dependency audit: for each declared dependency
    * lhs → rhs, how many lhs values map to MORE than one distinct rhs —
    * the constraint class (natural keys, code→description lookups,
    * denormalized copies) that schema DDL can't express and
    * [[profile]]'s per-column stats can't see.
    *
    * Plan shape: one groupBy(lhs) + distinct-rhs count per dependency,
    * collapsed to a single row each — the per-key frame never leaves
    * the executors, and N dependencies are N independent keyed aggs
    * over the same scan (Catalyst reuses the exchange where keys
    * match). `violation_rate` is ONE double division of exact integers
    * (raw, unrounded — the keySkewProfile rule).
    *
    * @param fds (name, lhsCol, rhsCol) per dependency.
    * @return one row per fd: (fd, n_lhs, n_violating, max_rhs_per_lhs,
    *         violation_rate).
    */
  def fdViolations(df: DataFrame, fds: Seq[(String, String, String)]): DataFrame =
    fds.map { case (name, lhs, rhs) =>
      df.groupBy(col(lhs))
        .agg(countDistinct(col(rhs)).as("__nd"))
        .agg(count(lit(1)).as("n_lhs"),
          count(when(col("__nd") > 1, 1)).as("n_violating"),
          max(col("__nd")).as("max_rhs_per_lhs"))
        .select(lit(name).as("fd"), col("n_lhs"), col("n_violating"),
          col("max_rhs_per_lhs"),
          (col("n_violating").cast("double") / col("n_lhs").cast("double"))
            .as("violation_rate"))
    }.reduce(_ unionByName _)

  /** A13: k-anonymity ENFORCEMENT by suppression — the release-side
    * companion of the A7 audit: rows whose quasi-identifier group has
    * fewer than k members are DROPPED, so every surviving row is
    * indistinguishable from ≥ k−1 others on the quasi columns (the
    * standard pre-publication suppression pass; generalization-based
    * schemes trade recall for it). One per-group window count — no
    * second scan, no join; group-cardinality state at any table size.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String],
                 k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
    df.withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") >= k)
      .drop("__n")
  }

  /** A14: l-diversity ENFORCEMENT — suppress quasi groups whose
    * SENSITIVE attribute shows fewer than l distinct values (the A10
    * audit's blind-spot fix applied to the release itself: a k-large
    * group that is sensitive-homogeneous still leaks). Distinct counts
    * need a grouped aggregate (no distinct window agg in Spark), then
    * one semi join back.
    */
  def lDiversify(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty && l >= 1)
    val ok = df.groupBy(quasiCols.map(col): _*)
      .agg(count_distinct(col(sensitiveCol)).as("__d"))
      .filter(col("__d") >= l)
      .drop("__d")
    df.join(ok, quasiCols, "left_semi")
  }

  /** A15: random rounding to base 3 (RR3) — the disclosure-control
    * technique national statistics offices publish under (Stats NZ's
    * standard confidentiality method; ABS uses base-3/base-10
    * variants): every released group count is perturbed to a multiple
    * of 3, the NEARER multiple with probability 2/3, so no table cell
    * reveals an exact small count yet totals stay unbiased. Counts
    * below `suppressBelow` are suppressed outright (NULL), the
    * standard pairing.
    *
    * The coin is CONTENT-KEYED, not RNG: the first 8 hex chars of
    * md5(quasi key) drive the 2/3-1/3 choice ([[Sampling.hashGate]]'s
    * determinism argument — same release on any engine, run, or
    * partitioning, which is also what makes the operator
    * oracle-checkable). Pure integer arithmetic: r = n mod 3; r = 0
    * keeps n; otherwise h mod 3 ∈ {0,1} picks the nearer multiple,
    * 2 the farther. One aggregate + per-row expressions — no second
    * scan at any scale.
    *
    * @return one row per group: (quasiCols..., n_rr3) with n_rr3 NULL
    *         when the true count is below `suppressBelow`.
    */
  def randomRound3(df: DataFrame, quasiCols: Seq[String],
                   suppressBelow: Long = 6L): DataFrame = {
    require(quasiCols.nonEmpty && suppressBelow >= 0)
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val h = conv(substring(md5(concat_ws("|", quasiCols.map(c =>
        col(c).cast("string")): _*).cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val r = col("__n") % 3
    val nearer = when(r === 1, col("__n") - 1).otherwise(col("__n") + 1)
    val farther = when(r === 1, col("__n") + 2).otherwise(col("__n") - 2)
    val rr3 = when(r === 0, col("__n"))
      .when(h % 3 < 2, nearer)
      .otherwise(farther)
    counts.select(quasiCols.map(col) :+
      when(col("__n") >= suppressBelow, rr3).as("n_rr3"): _*)
  }

  /** Deterministic split assignment by content hash — reproducible
    * train/val/test partitioning with no RNG state (md5 is stable
    * across engines, versions, and cluster sizes; never use rand()
    * for splits that must be reproducible).
    * 16 hex buckets: 0-b train (75%), c-d val (12.5%), e-f test (12.5%).
    */
  def splitAssign(keyCol: Column): Column = {
    val h = substring(md5(keyCol.cast("string").cast("binary")), 1, 1)
    when(h.isin("c", "d"), "val")
      .when(h.isin("e", "f"), "test")
      .otherwise("train")
  }
}
