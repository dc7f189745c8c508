package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join (SURVEY.md §2.H) — both sides are interval
  * sets; emit pairs whose spans intersect. The relational-textbook
  * form is a θ-join (`l.start <= r.end AND r.start <= l.end`), which
  * Spark can only execute as a broadcast-nested-loop or cartesian —
  * O(|L|·|R|) and a guaranteed 100 TB death.
  *
  * Bucket decomposition makes it an EQUI-join: explode each interval
  * to the fixed-width buckets it covers (`sequence()` — distributed,
  * no driver loop), hash-join on bucket id, then apply the exact
  * overlap predicate. Each true overlap is found once per SHARED
  * bucket, so instead of a `distinct` shuffle to dedupe, a pair is
  * kept only in its FIRST shared bucket (`bucket == floor(
  * max(starts)/width)`) — dedup by construction, zero extra shuffles.
  *
  * Cost model: join fan-in is Σ interval_len/width per side; width
  * should be ~ the typical interval length (too small → many bucket
  * copies; too large → many false candidates per bucket). Skewed
  * hot buckets are AQE's skew-join case.
  */
object Intervals {

  /** Overlap-join two interval tables on bucketized time.
    *
    * @param left  columns: key cols + `startL`/`endL` (epoch micros)
    * @param right columns: key cols + `startR`/`endR`
    * @param widthUs bucket width in micros
    * @return left row ++ right row for every overlapping pair
    *         (closed intervals: touching endpoints DO overlap).
    */
  /** @param width when > 0, explicitly repartition both bucketized
    *        sides to this many partitions on `__bucket` (round-12:
    *        pins the pair-explosion stage's parallelism where AQE
    *        would coalesce a tiny bucket shuffle to ~1 task; callers
    *        derive it from the RAW input's scan width —
    *        [[graft.spreadWidth]] — so it stays 0 at scale and AQE
    *        keeps sizing the join).
    */
  def overlapJoin(left: DataFrame, startL: String, endL: String,
                  right: DataFrame, startR: String, endR: String,
                  widthUs: Long, width: Int = 0): DataFrame = {
    def pin(df: DataFrame) =
      if (width > 0) df.repartition(width, col("__bucket")) else df
    val l = pin(left.withColumn("__bucket",
      explode(sequence(floor(col(startL) / widthUs),
        floor(col(endL) / widthUs)))))
    val r = pin(right.withColumn("__bucket",
      explode(sequence(floor(col(startR) / widthUs),
        floor(col(endR) / widthUs)))))
    l.join(r, Seq("__bucket"))
      .filter(col(startL) <= col(endR) && col(startR) <= col(endL))
      // first-shared-bucket gate: dedup without a distinct
      .filter(col("__bucket") ===
        floor(greatest(col(startL), col(startR)) / widthUs))
      .drop("__bucket")
  }

  /** Interval coalescing (gaps-and-islands): merge overlapping or
    * touching [start, end] intervals per key into maximal islands —
    * validity-interval cleanup for SCD tables, session repair,
    * time-range dedup. The declarative classic:
    *
    *   island boundary ⟺ start > max(end) over all EARLIER intervals
    *
    * one prefix-max window + one running-sum window over the same
    * (key, start, tie) sort — a single keyed shuffle, O(1) state,
    * no self-join (the naive "which intervals overlap mine"
    * formulation is quadratic per key). All comparisons on integer
    * microseconds — no float anywhere.
    *
    * Zero-length and contained intervals fold in naturally; touching
    * intervals (start == previous max end) MERGE (closed-interval
    * semantics; pre-shrink ends by 1µs for half-open).
    *
    * @return one row per island: key, island_start, island_end,
    *         n_intervals.
    */
  def coalesceIntervals(df: DataFrame, keyCol: String, startCol: String,
                        endCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byStart = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(tieCol))
    val prevMax = max(col(endCol))
      .over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    val runSum = byStart.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    df.withColumn("__new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("__new")).over(runSum))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
  }
}
