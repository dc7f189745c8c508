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

  /** Weighted discrete quantiles — [[discreteQuantiles]] with the
    * count measure replaced by an EXACT INTEGER weight sum: q_p =
    * smallest value whose cumulative weight w(≤v) reaches p·W/10⁴
    * (`cum·10⁴ ≥ p·W`, pure integer comparison — no interpolation, no
    * doubles, bit-stable at any parallelism). The ops-and-finance
    * question discreteQuantiles can't answer: "the median ORDER takes
    * 20 units, but the median DOLLAR is spent on 35-unit orders."
    *
    * Scale shape unchanged: one keyed collapse to distinct (key,
    * value) rows with summed weights, window over value-cardinality
    * rows only, then one keyed min per requested p. Weights must be
    * exact integers (cents, counts); cum·10⁴ needs Σw < 9.2e14 per
    * group (long headroom) — pre-scale the weight unit above that.
    */
  def weightedQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
                        weightCol: String, ps: Seq[Int]): DataFrame = {
    val k = keys.map(col)
    val counts = df.groupBy((k :+ col(valueCol)): _*)
      .agg(sum(col(weightCol)).as("__w"))
    val cum = sum(col("__w")).over(
      Window.partitionBy(k: _*).orderBy(col(valueCol)))
    val tot = sum(col("__w")).over(Window.partitionBy(k: _*))
    val withCum = counts.select((k :+ col(valueCol) :+ cum.as("__cum")
      :+ tot.as("__n")): _*)
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

  /** MAD-based outlier detection per group, entirely in integer
    * arithmetic: med = exact discrete median of the integer column,
    * MAD = exact discrete median of |x − med|, and x is an outlier
    * when |x − med| > k·MAD (k integral). No interpolation, no
    * doubles — the flag is bit-stable across engines and partitionings,
    * unlike stddev-based z-scores which both accumulate floats AND
    * get dragged by the very outliers they're hunting.
    *
    * Two quantile passes (each a groupBy collapse to distinct values +
    * a group-partitioned window) and two broadcast joins back; the
    * fact table never shuffles beyond its one groupBy.
    */
  def madOutliers(df: DataFrame, keys: Seq[String], valueCol: String,
                  k: Int): DataFrame = {
    val med = discreteQuantiles(df, keys, valueCol, Seq(5000))
      .withColumnRenamed("q5000", "__med")
    val withMed = df.join(broadcast(med), keys)
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val mad = discreteQuantiles(withMed, keys, "__dev", Seq(5000))
      .withColumnRenamed("q5000", "__mad")
    withMed.join(broadcast(mad), keys)
      .withColumn("is_outlier", col("__dev") > col("__mad") * k)
      .withColumnRenamed("__med", "med")
      .withColumnRenamed("__mad", "mad")
      .drop("__dev")
  }

  /** Robust scaling (x − median) / IQR per group — the feature-scaling
    * form that survives heavy tails. Median and the exact discrete
    * [p25, p75] come from [[discreteQuantiles]] (integer arithmetic,
    * broadcast back); the ONLY float operation is one division per
    * row, identical order on every engine. Groups with IQR = 0 yield
    * null (constant features carry no scale).
    */
  def robustScale(df: DataFrame, keys: Seq[String], valueCol: String,
                  outCol: String): DataFrame = {
    val q = discreteQuantiles(df, keys, valueCol, Seq(2500, 5000, 7500))
    df.join(broadcast(q), keys)
      .withColumn(outCol,
        when(col("q7500") =!= col("q2500"),
          (col(valueCol) - col("q5000")).cast("double") /
            (col("q7500") - col("q2500")).cast("double")))
      .drop("q2500", "q5000", "q7500")
  }

  /** Count-min-sketch frequency estimates for a candidate value set —
    * the streaming/mergeable counterpart of exact [[heavyHitters]].
    * ONE pass builds the sketch (`df.stat.countMinSketch`, mergeable
    * across partitions/streams/days — how per-hour sketches roll into
    * per-day counts without re-reading 100 TB); candidates are then
    * estimated driver-side in O(1) each.
    *
    * Guarantees (classic CMS, never under-counts): for every value,
    * `true ≤ estimate ≤ true + eps·N` with confidence `1 − 1/2^d`.
    * Asserted against exact counts in SkewApproxSpec.
    */
  def cmsEstimates(df: DataFrame, valueCol: String, candidates: Seq[String],
                   eps: Double = 0.001, confidence: Double = 0.99,
                   seed: Int = 42): Seq[(String, Long)] = {
    val sketch = df.stat.countMinSketch(col(valueCol), eps, confidence, seed)
    candidates.map(v => v -> sketch.estimateCount(v))
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

  /** Global dense 1..n rank by (value, tie) WITHOUT the bare
    * `Window.orderBy` that serializes the whole table onto one
    * partition — the E49 two-level trick applied to VALUE order:
    * coarse value bucket (integer div — deterministic, unlike a
    * sampled range partitioner), per-bucket counts, prefix offsets
    * over the BUCKET-cardinality frame (that window being
    * single-partition is immaterial), within-bucket rank as a KEYED
    * window. rank = bucket offset + within-bucket row_number — the
    * identical total order at any parallelism, all integer
    * arithmetic. Skewed value distributions skew the bucket window's
    * partitions, not a single global one; shrink `bucketWidth` to
    * spread them.
    *
    * @return df plus `rankCol` (long, 1-based).
    */
  /** Corpus-percentile calibration of a per-row integer score — the
    * curation gate "keep the top X% by quality/length/score" expressed
    * as EXACT rank arithmetic: global ascending rank via
    * [[globalValueRank]]'s two-level plan (no single-partition window
    * ever sees data-sized frames), percentile in basis points
    * `rank·10⁴ div n`, keep ⟺ `rank·10⁴ > n·(10⁴ − keepTopBp)` — all
    * integers, no float percentile to disagree on. Threshold-free by
    * construction: a corpus-wide score distribution shift moves the
    * cut with it, which is why production curation gates are
    * percentile-based rather than absolute.
    *
    * @return (idCol, scoreCol, rank, pct_bp, keep).
    */
  def percentileCalibrate(df: DataFrame, idCol: String, scoreCol: String,
                          keepTopBp: Long): DataFrame = {
    require(keepTopBp >= 0 && keepTopBp <= 10000)
    val ranked = globalValueRank(df.select(col(idCol), col(scoreCol)),
      scoreCol, idCol, "rank")
    val n = df.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(n))
      .select(col(idCol), col(scoreCol), col("rank"),
        expr("rank * 10000 div __n").as("pct_bp"),
        (col("rank") * lit(10000L) >
          col("__n") * lit(10000L - keepTopBp)).as("keep"))
  }

  /** C53: Q-Q table between two groups — the distribution-shift
    * diagnostic read as a table instead of a plot: for each quantile
    * q/nq, the exact discrete value each group attains at rank
    * ⌈q·n_g/nq⌉. Points on y=x ⇒ same distribution; a parallel offset
    * ⇒ location shift; a fan ⇒ scale/tail shift. Pure integer rank
    * arithmetic (per-group windows, a tiny broadcast quantile spine),
    * engine-exact.
    *
    * @return one row per quantile point: (q, v_a, v_b).
    */
  def qqTable(df: DataFrame, groupCol: String, valueCol: String,
              tieCol: String, groupA: String, groupB: String,
              nq: Int): DataFrame = {
    require(nq >= 2, s"nq must be ≥ 2: $nq")
    val spark = df.sparkSession
    import spark.implicits._
    val two = df.filter(col(groupCol).isin(groupA, groupB))
    val wg = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tieCol))
    val ranked = two
      .withColumn("__r", row_number().over(wg).cast("long"))
      .withColumn("__ng",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val spine = (1 until nq).map(_.toLong).toDF("q")
    val points = ranked.join(broadcast(spine),
        col("__r") === expr(s"(q * __ng + ${nq - 1}) div $nq"))
      .select(col("q"), col(groupCol), col(valueCol))
    points.groupBy(col("q")).agg(
        max(when(col(groupCol) === groupA, col(valueCol))).as("v_a"),
        max(when(col(groupCol) === groupB, col(valueCol))).as("v_b"))
  }

  /** C52: quantile normalization across groups — map each group's
    * values onto the GLOBAL empirical quantile function, the classic
    * batch-effect remover (microarray lineage) and distribution-
    * matching feature transform: after it, every group has (as close
    * as ranks allow) the same marginal distribution.
    *
    * Pure integer rank arithmetic, engine-exact: within-group rank r
    * (window per GROUP — never data-sized single-partition), group
    * size n_g, global rank via [[globalValueRank]] (two-level, same
    * discipline), target = the global value at rank
    * ⌈r·N / n_g⌉ = (r·N + n_g − 1) div n_g, fetched with ONE
    * rank-keyed equi join.
    *
    * @return input keys + (value, q_value) — q_value is the
    *         quantile-normalized value.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
                        tieCol: String): DataFrame = {
    val n = df.count()
    val wg = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tieCol))
    val ranked = df
      .withColumn("__r", row_number().over(wg).cast("long"))
      .withColumn("__ng",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .withColumn("__t",
        expr(s"(__r * ${n}L + __ng - 1) div __ng"))
    val globalRanks = globalValueRank(
        df.select(col(valueCol), col(tieCol)), valueCol, tieCol, "__gr")
      .select(col("__gr").as("__t"), col(valueCol).as("q_value"))
    ranked.join(globalRanks, "__t")
      .drop("__r", "__ng", "__t")
  }

  def globalValueRank(df: DataFrame, valueCol: String, tieCol: String,
                      rankCol: String,
                      bucketWidth: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0)
    val d = df.withColumn("__bkt",
      floor(col(valueCol).cast("long") / bucketWidth).cast("long"))
    val totals = d.groupBy(col("__bkt")).agg(count(lit(1)).as("__bn"))
    val prefix = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__boff", coalesce(sum(col("__bn")).over(prefix), lit(0L)))
      .select(col("__bkt"), col("__boff"))
    val within = Window.partitionBy(col("__bkt"))
      .orderBy(col(valueCol), col(tieCol))
    d.join(broadcast(offsets), "__bkt")
      .withColumn(rankCol,
        (col("__boff") + row_number().over(within)).cast("long"))
      .drop("__bkt", "__boff")
  }
}
