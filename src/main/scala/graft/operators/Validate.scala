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

  /** One row per rule: (rule, n_rows, n_violations, pass). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = count(lit(1)).as("__total") +:
      rules.map(r => count(when(!r.holds, 1)).as(s"__v_${r.name}"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perRule = rules.map { r =>
      one.select(lit(r.name).as("rule"),
        col("__total").as("n_rows"),
        col(s"__v_${r.name}").as("n_violations"),
        (col(s"__v_${r.name}") === 0).as("pass"))
    }
    perRule.reduce(_ unionByName _)
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
