package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling + mixture planning (SURVEY.md §2.E23/E24).
  *
  * Training-data pipelines need samples that are REPRODUCIBLE — the
  * same rows selected across reruns, engines, partitionings and
  * cluster sizes. RNG-based sampling (`df.sample`) is none of those:
  * it depends on partition layout and seed plumbing. The hash-gate
  * alternative keys the decision on content: a row is kept iff a
  * prefix of md5(key) falls below a threshold. That is a pure,
  * codegen'd per-row predicate — map-side in the scan stage, no
  * shuffle, no state — and the SAME rows are selected by any engine
  * that can compute md5 (which is how the DuckDB oracle mirrors it).
  */
object Sampling {

  /** 16-bit hash-gate threshold: keep iff the first 4 hex chars of
    * md5(key) sort below floor(rate · 65536) in hex. Granularity is
    * 1/65536; rate ≥ 1 keeps everything, rate ≤ 0 nothing.
    */
  def hashGate(key: Column, rate: Double): Column = {
    if (rate >= 1.0) lit(true)
    else if (rate <= 0.0) lit(false)
    else {
      val threshold = f"${math.floor(rate * 65536).toLong}%04x"
      substring(md5(key.cast("string").cast("binary")), 1, 4) < threshold
    }
  }

  /** Stratified sample: per-stratum keep rates, applied as one
    * hash-gate predicate (a `when` ladder over the stratum column —
    * still a single map-side filter, zero shuffles). Strata absent
    * from `rates` are dropped.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, key: Column,
                       rates: Map[String, Double]): DataFrame = {
    val gate = rates.foldLeft(lit(false)) { case (acc, (stratum, rate)) =>
      when(col(stratumCol) === stratum, hashGate(key, rate)).otherwise(acc)
    }
    df.filter(gate)
  }

  /** Deterministic weighted sampling (Sequential Poisson / Ohlsson):
    * each row gets priority u/w where u is a hash-derived uniform and
    * w its weight; the bottom-k priorities are an (approximately
    * πps) weighted sample WITHOUT replacement. Like [[hashGate]], the
    * randomness is content-keyed — same rows selected on any engine,
    * run, or partitioning — and every arithmetic step is exactly
    * portable: u is a dyadic rational ((h+1)/2^32) and u/w is one
    * correctly-rounded IEEE division, so the DuckDB oracle reproduces
    * priorities bit-for-bit.
    *
    * Scale: the bottom-k runs as TakeOrderedAndProject — per-partition
    * top-k heaps, k rows per partition to the driver, NO total sort.
    * Fine for k up to ~10⁵; beyond that, two-pass: approx-quantile the
    * priority threshold, filter, exact top-k on the survivors.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     k: Int): DataFrame = {
    val h = conv(substring(md5(key.cast("string").cast("binary")), 1, 8),
      16, 10).cast("long")
    df.filter(weight > 0)
      .withColumn("priority", (h + 1) / lit(4294967296.0) / weight)
      .orderBy(col("priority"), key)
      .limit(k)
  }

  /** Mixture planner: given target class weights, compute the largest
    * feasible corpus obeying the mixture exactly and the per-class
    * take counts. Pure aggregate arithmetic — counts shrink to one row
    * per class before any math, so the plan costs one groupBy at any
    * corpus size; the taker is then [[stratifiedSample]] with
    * rate = n_take / n_avail per class.
    *
    * feasible total M = min over classes of floor(n_c / w_c);
    * n_take(c) = floor(w_c · M).
    */
  /** E78: temperature-flattened mixture plan — the multilingual-LM
    * standard (sample class c ∝ n_c^α, α = 1/2 here: big corpora
    * flattened, small ones boosted; Conneau & Lample 2019 / mT5 use
    * exactly this shape). The weight is QUANTIZED to exact integers so
    * the plan is engine-deterministic with no fold-order exposure:
    *
    *   w_c = ⌊√n_c · 10⁶⌋   (IEEE-754 sqrt is correctly rounded —
    *                          bit-identical on any conforming engine;
    *                          the ·10⁶ product and floor likewise)
    *   take_c = min(n_c, (budget · w_c) div Σw_c)   (all integers)
    *
    * Σw_c is an integer sum — order-free, unlike the Σ√n_c double sum
    * a naive formulation would shuffle-order. One count aggregate +
    * one tiny cross-joined total; nothing collects.
    *
    * @return (class, n_avail, w_micro, n_take), one row per class.
    */
  def temperatureMix(df: DataFrame, classCol: String,
                     budget: Long): DataFrame = {
    val counts = df.groupBy(col(classCol))
      .agg(count(lit(1)).as("n_avail"))
      .withColumn("w_micro",
        floor(sqrt(col("n_avail").cast("double")) * 1000000.0).cast("long"))
    val total = counts.agg(sum(col("w_micro")).as("__wt"))
    counts.crossJoin(broadcast(total))
      .select(col(classCol), col("n_avail"), col("w_micro"),
        least(col("n_avail"),
          expr(s"($budget * w_micro) div __wt")).as("n_take"))
  }

  def mixturePlan(df: DataFrame, classCol: String,
                  weights: Map[String, Double]): DataFrame = {
    val weightExpr = weights.foldLeft(lit(null).cast("double")) {
      case (acc, (cls, w)) => when(col(classCol) === cls, lit(w)).otherwise(acc)
    }
    val counts = df.filter(col(classCol).isInCollection(weights.keys.toSeq))
      .groupBy(col(classCol))
      .agg(count(lit(1)).as("n_avail"))
      .withColumn("weight", weightExpr)
    val feasible = counts
      .agg(min(floor(col("n_avail") / col("weight"))).as("m_total"))
    counts.crossJoin(broadcast(feasible))
      .select(col(classCol), col("n_avail"), col("weight"),
        floor(col("weight") * col("m_total")).cast("long").as("n_take"))
  }
}
