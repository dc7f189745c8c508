import org.apache.spark.sql.{DataFrame, SparkSession}

/** graft — a Spark-native analytics/ETL engine with the capabilities of
  * the reference banking ETL pipeline (see SURVEY.md), re-expressed as
  * declarative DataFrame operators so Catalyst/Tungsten handle physical
  * planning, pushdown, and codegen.
  */
package object graft {

  /** All "today"-relative derivations (age, tenure) are pinned to a fixed
    * reference date so results are deterministic and oracle-checkable.
    * The reference pipeline uses `date.today()` (transform.py:217) which
    * is unreproducible; a production deployment passes the batch date.
    */
  val BatchDate = "2026-08-12"

  /** Load one of the driver-generated parquet tables from an sf dir.
    *
    * Some generations of `events.parquet` carry TIMESTAMP(NANOS), which
    * Spark's parquet reader only accepts as a long
    * (spark.sql.legacy.parquet.nanosAsLong) — in that case we
    * re-materialize `ts` as a proper microsecond timestamp with exact
    * integer division (`div`), no double round-trip. Other generations
    * use TIMESTAMP(MICROS), which Spark reads natively; detect which by
    * the type `ts` actually arrives as rather than assuming either.
    */
  /** Operator-internal cache discipline (Graph.scala's pattern applied
    * library-wide — VERDICT r5 §wrong.1): eagerly materialize `result`
    * via `localCheckpoint(true)` — truncating its lineage off every
    * persisted intermediate — then release those intermediates. A
    * caller composing several operators in one job therefore never
    * accretes dead cached datasets: each result is self-contained, and
    * its ONLY storage is its own checkpoint, freed by [[release]] (or
    * by the ContextCleaner once the result is garbage-collected).
    */
  private[graft] def sealResult(result: DataFrame,
      intermediates: org.apache.spark.sql.Dataset[_]*): DataFrame = {
    val out = result.localCheckpoint(eager = true)
    intermediates.foreach(_.unpersist())
    out
  }

  /** Release the block-manager storage a graft operator result carries:
    * the result's own `localCheckpoint` blocks (plus any checkpointed
    * aggregates embedded in its plan) and its CacheManager entry if the
    * caller persisted it. Call once the result is consumed (written to
    * a sink / collected); afterwards the DataFrame must not be reused.
    * Long-lived sessions that skip this still drain via Spark's
    * ContextCleaner when the result object is garbage-collected.
    */
  def release(df: org.apache.spark.sql.Dataset[_]): Unit = {
    org.apache.spark.sql.GraftBridge.unpersistPlanRdds(df)
    df.unpersist()
  }

  /** Spread an under-parallelized input across the session's cores
    * before a heavy map-side stage (guide-§2.5 "unsplittable input"
    * fix, made scale-adaptive per the round-12 optimization brief):
    * a small table often arrives as ONE parquet row group, so every
    * scan-stage kernel (pair joins, shingling, quantization) runs on
    * one core no matter how many the session has. When the input's
    * scan parallelism is already ≥ the session's core count — any
    * real 100 TB table — this is a NO-OP: no exchange is added, the
    * "corpus never shuffles" discipline is preserved exactly where it
    * matters. When it fires, the exchange moves at most the
    * under-parallelized stage's input once (bounded by
    * partitions·maxPartitionBytes, i.e. small by construction).
    *
    * Keyed form hash-partitions on the given columns (no local sort);
    * keyless form round-robins. The partition-count probe is
    * plan-time only (no job). Results are partitioning-independent by
    * the repo's exactness discipline (order-free integer folds,
    * packed tie-breaks) — every fanned-out gate re-verified against
    * its DuckDB oracle at sf0.001 + sf0.01 (round 12).
    */
  private[graft] def fanOut(df: DataFrame,
      keys: org.apache.spark.sql.Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }

  /** [[fanOut]] for a frame DERIVED through a shuffle (groupBy /
    * join) from `input`, where probing the derived frame's own
    * partition count would materialize its AQE query stages (i.e.
    * run the upstream shuffles as a side effect). AQE's partition
    * coalescing correctly shrinks a tiny shuffle's output — but a
    * heavy per-row kernel stage over that output (Lloyd assignment,
    * ADC scans) then runs on ~one core. Probe the INPUT's scan
    * instead (pre-shuffle, plan-time only): if the input was
    * under-parallelized, pin the derived frame's width to the
    * session's cores; at scale (wide input scan) this is a NO-OP —
    * no exchange is added and AQE keeps sizing the shuffle.
    */
  private[graft] def fanOutDerived(derived: DataFrame, input: DataFrame,
      keys: org.apache.spark.sql.Column*): DataFrame = {
    val target = input.sparkSession.sparkContext.defaultParallelism
    if (input.rdd.getNumPartitions >= target) derived
    else if (keys.nonEmpty) derived.repartition(target, keys: _*)
    else derived.repartition(target)
  }

  /** Width to pin a derived heavy stage to, probed from a RAW (scan-
    * stage, shuffle-free) input: 0 = input already wide, leave the
    * derived plan to AQE (the 100 TB case); > 0 = the session's core
    * count, for explicitly repartitioning a kernel stage whose
    * coalesced width would otherwise be ~1 on a small input. Use when
    * the derived frame itself cannot be probed (probing a shuffled
    * plan materializes its AQE stages).
    */
  private[graft] def spreadWidth(input: DataFrame): Int = {
    val target = input.sparkSession.sparkContext.defaultParallelism
    if (input.rdd.getNumPartitions >= target) 0 else target
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ =>
        // TIMESTAMP(MICROS) arrives as TIMESTAMP_NTZ; cast to the
        // session-UTC TimestampType every downstream operator was built
        // against (identity on the underlying micros under UTC)
        df.withColumn("ts", df("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
    }
  }
}
