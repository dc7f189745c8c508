package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust-statistics operators built on EXACT integer rank arithmetic —
  * no interpolating percentiles, so results are bit-identical across
  * engines, partitionings, and scale factors.
  */
object Stats {

  /** Exact discrete quantile bounds per group over an integer column:
    * for each p in `ps` (per-10000 to keep the rank threshold in pure
    * integer math), the smallest value whose cumulative count reaches
    * `ceil(p/10000 · n)`.
    *
    * Plan shape: groupBy (keys, value) collapses the data to distinct
    * values per group BEFORE any window — the running-count window then
    * runs over value-cardinality rows only (bounded for integer-cent /
    * bucketed data), partitioned by group. No global sort, no
    * interpolation, no doubles.
    */
  def discreteQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
                        ps: Seq[Int]): DataFrame = {
    val k = keys.map(col)
    val counts = df.groupBy((k :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__c"))
    val cum = sum(col("__c")).over(
      Window.partitionBy(k: _*).orderBy(col(valueCol)))
    val tot = sum(col("__c")).over(Window.partitionBy(k: _*))
    val withCum = counts.select((k :+ col(valueCol) :+ cum.as("__cum")
      :+ tot.as("__n")): _*)
    // cum ≥ ceil(p·n/10000) ⟺ cum·10000 ≥ p·n (cum integral) — pure
    // integer comparison, no division at all
    val aggs = ps.map { p =>
      min(when(col("__cum") * 10000 >= col("__n") * p,
        col(valueCol))).as(s"q$p")
    }
    withCum.groupBy(k: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact heavy hitters: values whose frequency share reaches
    * `phiBp`/10000. One keyed aggregate + a 1-row broadcast total; the
    * threshold test is pure integer arithmetic (`n·10⁴ ≥ total·φ`), so
    * membership is bit-stable across engines. The approximate
    * counterpart for streams/unioned sketches is `df.stat.freqItems`
    * (superset guarantee — asserted against this exact operator in
    * StatsProfileSpec).
    */
  def heavyHitters(df: DataFrame, valueCol: String, phiBp: Int): DataFrame = {
    val counts = df.groupBy(col(valueCol)).agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).as("__total"))
    counts.crossJoin(broadcast(total))
      .filter(col("n") * 10000 >= col("__total") * phiBp)
      .select(col(valueCol), col("n"),
        round(col("n").cast("double") / col("__total").cast("double"), 4)
          .as("share"))
  }

  /** Winsorization (outlier clamping) of an integer-valued column per
    * group: values clamped to the exact discrete [pLo, pHi] quantile
    * bounds (per-10000). Bounds come from [[discreteQuantiles]] and
    * join back as a broadcast (group-cardinality rows); the clamp is
    * two codegen'd comparisons per row. Everything stays integral —
    * aggregates over the clamped column are exact.
    */
  def winsorize(df: DataFrame, keys: Seq[String], valueCol: String,
                pLo: Int, pHi: Int): DataFrame = {
    val bounds = discreteQuantiles(df, keys, valueCol, Seq(pLo, pHi))
      .withColumnRenamed(s"q$pLo", "__lo")
      .withColumnRenamed(s"q$pHi", "__hi")
    df.join(broadcast(bounds), keys)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }
}
