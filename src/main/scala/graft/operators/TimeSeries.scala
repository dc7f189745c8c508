package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential per-key time-series scans (SURVEY.md §2.F6).
  *
  * EWMA (and any recurrence x_t = f(x_t, state_{t-1})) cannot be
  * expressed as a window aggregate without numerically-explosive
  * closed forms ((1-α)^(-j) overflows double past ~700 steps), so this
  * is the one operator family where the brief's LAST-resort rung —
  * `mapPartitions` — is genuinely the right tool: repartition by key,
  * sort within partitions by (key, time), then a single forward pass
  * carrying O(1) state per key.
  *
  * Scale design: one keyed shuffle + per-partition sort (exactly what
  * any window aggregate would cost); the scan itself is streaming,
  * allocation-free, and spill-friendly (Spark's external sorter feeds
  * the iterator). Determinism: hash partitioning puts each key in
  * exactly one partition; (ts, tiebreak) ordering makes the fold order
  * total, so results are bit-identical at any parallelism — which is
  * how the DuckDB oracle (list_reduce over the same ordered fold)
  * matches it hash-for-hash.
  */
object TimeSeries {

  /** Loud data guard (the knn/silhouette validation discipline): the
    * split floor divisions in [[pageHinkley]] / [[classicalDecompose]]
    * are exact only while their running/window sums stay nonnegative —
    * a negative value (refund cents) would silently flip the quotient
    * truncation direction and diverge from the documented floor
    * semantics (and from the oracle). One cheap min aggregate; fail
    * with the remedy instead of producing plausible wrong numbers.
    */
  private def requireNonNegative(df: DataFrame, valCol: String,
                                 op: String, why: String): Unit = {
    val mn = df.agg(min(col(valCol).cast("long"))).head
    require(mn.isNullAt(0) || mn.getLong(0) >= 0L,
      s"$op: negative value ${mn.getLong(0)} in '$valCol' — $why; " +
        "shift the series to a nonnegative base (or negate and re-run " +
        "for a downward test) before calling")
  }

  /** Final EWMA per key over (tsCol, tieCol)-ordered values:
    * ewma := value*alpha + ewma*(1-alpha), seeded with the first value.
    *
    * @return (key, n_events, ewma) — one row per key.
    */
  def ewmaPerKey(spark: SparkSession, df: DataFrame, keyCol: String,
                 tsCol: String, tieCol: String, valueCol: String,
                 alpha: Double): DataFrame = {
    import spark.implicits._
    val beta = 1.0 - alpha
    val sorted = df
      .select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("t"),
        col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("double").as("v"))
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("t"), col("tie"))
      .as[(Long, Long, Long, Double)]
    sorted.mapPartitions { rows =>
      new Iterator[(Long, Long, Double)] {
        private var pending: Option[(Long, Long, Double)] = None
        private var lookahead: Option[(Long, Long, Long, Double)] = None
        def hasNext: Boolean = pending.isDefined || rows.hasNext ||
          lookahead.isDefined
        def next(): (Long, Long, Double) = {
          if (pending.isEmpty) advance()
          val out = pending.get
          pending = None
          out
        }
        private def advance(): Unit = {
          val first = lookahead.getOrElse(rows.next())
          lookahead = None
          var (key, _, _, acc) = first
          var n = 1L
          var done = false
          while (!done && rows.hasNext) {
            val r = rows.next()
            if (r._1 == key) { acc = r._4 * alpha + acc * beta; n += 1 }
            else { lookahead = Some(r); done = true }
          }
          pending = Some((key, n, acc))
        }
      }
    }.toDF(keyCol, "n_events", "ewma")
  }

  /** Holt linear-trend smoothing (double exponential smoothing) per
    * key — the trend-aware upgrade of [[ewmaPerKey]], and the basic
    * one-step forecaster:
    * {{{
    *   s      = level + trend            // prior one-step prediction
    *   level' = v·α + s·(1−α)
    *   trend' = (level' − level)·β + trend·(1−β)
    * }}}
    * seeded (level, trend) = (v₁, 0). Same scale shape as the EWMA
    * scan: one keyed shuffle + in-partition sort, O(1) state,
    * allocation-free forward pass, bit-identical at any parallelism
    * (total fold order). The oracle replays the IDENTICAL IEEE
    * operation sequence via a recursive CTE.
    *
    * @return (key, n_events, level, trend, forecast) — one row per
    *         key; forecast = level + trend (next-step prediction).
    */
  def holtPerKey(spark: SparkSession, df: DataFrame, keyCol: String,
                 tsCol: String, tieCol: String, valueCol: String,
                 alpha: Double, beta: Double): DataFrame = {
    import spark.implicits._
    val a1 = 1.0 - alpha
    val b1 = 1.0 - beta
    val sorted = df
      .select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("t"),
        col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("double").as("v"))
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("t"), col("tie"))
      .as[(Long, Long, Long, Double)]
    sorted.mapPartitions { rows =>
      new Iterator[(Long, Long, Double, Double, Double)] {
        private var pending: Option[(Long, Long, Double, Double, Double)] = None
        private var lookahead: Option[(Long, Long, Long, Double)] = None
        def hasNext: Boolean = pending.isDefined || rows.hasNext ||
          lookahead.isDefined
        def next(): (Long, Long, Double, Double, Double) = {
          if (pending.isEmpty) advance()
          val out = pending.get
          pending = None
          out
        }
        private def advance(): Unit = {
          val first = lookahead.getOrElse(rows.next())
          lookahead = None
          val key = first._1
          var level = first._4
          var trend = 0.0
          var n = 1L
          var done = false
          while (!done && rows.hasNext) {
            val r = rows.next()
            if (r._1 == key) {
              val s = level + trend
              val lNew = r._4 * alpha + s * a1
              trend = (lNew - level) * beta + trend * b1
              level = lNew
              n += 1
            } else { lookahead = Some(r); done = true }
          }
          pending = Some((key, n, level, trend, level + trend))
        }
      }
    }.toDF(keyCol, "n_events", "level", "trend", "forecast")
  }

  /** F41: Croston's intermittent-demand method (Croston, Op. Res. Q.
    * 1972) — the forecaster for series that are MOSTLY ZERO (spare
    * parts, rare-event load, long-tail SKUs), where SES/Holt smear
    * the zeros into a meaningless small mean: two coupled EWMAs,
    * demand SIZE z and inter-demand INTERVAL p, updated ONLY on
    * non-zero demand; the rate forecast is z/p.
    *
    * {{{
    *   on demand v at period t (q = t − t_prev_demand):
    *     first:  z = v,            p = q
    *     later:  z = v·α + z·(1−α); p = q·α + p·(1−α)
    * }}}
    *
    * Same mapPartitions rung as [[holtPerKey]] (recurrences have no
    * window form): one keyed shuffle + sort, O(1) state, total fold
    * order → bit-identical at any parallelism; the oracle replays the
    * IDENTICAL IEEE op sequence via a recursive CTE over the non-zero
    * demand rows only, with (1−α) computed as 1 − CAST(α) at runtime
    * (the holt literal-folding rule). Keys with zero demand emit no
    * row (nothing to forecast). Forecast = z/p, one IEEE division.
    *
    * Null handling mirrors the oracle exactly: a null demand value is
    * NOT a demand (the oracle's `v <> 0` skips it) but its period
    * still counts toward the interval — so v is coalesced to 0, never
    * filtered; rows with a null key/ts/tie carry no usable sequence
    * position and are dropped (they'd be absent from the oracle's
    * final equi-join on k anyway).
    */
  def crostonPerKey(spark: SparkSession, df: DataFrame, keyCol: String,
                    tsCol: String, tieCol: String, valueCol: String,
                    alpha: Double): DataFrame = {
    import spark.implicits._
    val a1 = 1.0 - alpha
    val sorted = df
      .select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("t"),
        col(tieCol).cast("long").as("tie"),
        coalesce(col(valueCol).cast("double"), lit(0.0)).as("v"))
      .filter(col("k").isNotNull && col("t").isNotNull &&
        col("tie").isNotNull)
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("t"), col("tie"))
      .as[(Long, Long, Long, Double)]
    sorted.mapPartitions { rows =>
      new Iterator[(Long, Long, Long, Double, Double, Double)] {
        private var pending:
          Option[(Long, Long, Long, Double, Double, Double)] = None
        private var lookahead: Option[(Long, Long, Long, Double)] = None
        def hasNext: Boolean = {
          while (pending.isEmpty && (rows.hasNext || lookahead.isDefined))
            advance()
          pending.isDefined
        }
        def next(): (Long, Long, Long, Double, Double, Double) = {
          if (!hasNext) throw new NoSuchElementException
          val out = pending.get
          pending = None
          out
        }
        private def advance(): Unit = {
          val first = lookahead.getOrElse(rows.next())
          lookahead = None
          val key = first._1
          var idx = 0L
          var lastDemand = 0L
          var nd = 0L
          var z = 0.0
          var p = 0.0
          def step(v: Double): Unit = {
            idx += 1
            if (v != 0.0) {
              val q = idx - lastDemand
              lastDemand = idx
              if (nd == 0) { z = v; p = q.toDouble }
              else { z = v * alpha + z * a1; p = q * alpha + p * a1 }
              nd += 1
            }
          }
          step(first._4)
          var done = false
          while (!done && rows.hasNext) {
            val r = rows.next()
            if (r._1 == key) step(r._4)
            else { lookahead = Some(r); done = true }
          }
          // zero-demand key: nothing to forecast, emit no row
          if (nd > 0) pending = Some((key, idx, nd, z, p, z / p))
        }
      }
    }.toDF(keyCol, "n_periods", "n_demands", "z_level", "p_interval",
      "forecast")
  }

  /** F14: additive Holt-Winters (level + trend + seasonal, Hyndman
    * formulation) — completes the EWMA → Holt → Holt-Winters ladder
    * on the same mapPartitions rung:
    * {{{
    *   lb  = level + trend
    *   l'  = (v − s[p])·α + lb·(1−α)        p = (t−1) mod m, 0-based
    *   b'  = (l' − level)·β + trend·(1−β)
    *   s'[p] = (v − lb)·γ + s[p]·(1−γ)
    * }}}
    * seeded (level, trend, s[0..m)) = (v₁, 0, 0…0); the first
    * observation initializes only, like [[holtPerKey]]. State is a
    * fixed m-slot ring — still O(1) per key, allocation-free per row,
    * total fold order ⇒ bit-identical at any parallelism. The oracle
    * replays the IDENTICAL IEEE op sequence via a recursive CTE whose
    * seasonal ring rides a LIST column.
    *
    * @return one row per key: (key, n_events, level, trend,
    *         season_next = s[n mod m], forecast = level + trend +
    *         season_next).
    */
  def holtWintersPerKey(spark: SparkSession, df: DataFrame, keyCol: String,
                        tsCol: String, tieCol: String, valueCol: String,
                        alpha: Double, beta: Double, gamma: Double,
                        period: Int): DataFrame = {
    import spark.implicits._
    require(period > 1, s"seasonal period must be > 1: $period")
    val a1 = 1.0 - alpha
    val b1 = 1.0 - beta
    val g1 = 1.0 - gamma
    val sorted = df
      .select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("t"),
        col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("double").as("v"))
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("t"), col("tie"))
      .as[(Long, Long, Long, Double)]
    sorted.mapPartitions { rows =>
      new Iterator[(Long, Long, Double, Double, Double, Double)] {
        private var pending: Option[(Long, Long, Double, Double, Double, Double)] = None
        private var lookahead: Option[(Long, Long, Long, Double)] = None
        def hasNext: Boolean = pending.isDefined || rows.hasNext ||
          lookahead.isDefined
        def next(): (Long, Long, Double, Double, Double, Double) = {
          if (pending.isEmpty) advance()
          val out = pending.get
          pending = None
          out
        }
        private def advance(): Unit = {
          val first = lookahead.getOrElse(rows.next())
          lookahead = None
          val key = first._1
          var level = first._4
          var trend = 0.0
          val season = new Array[Double](period)
          var n = 1L
          var done = false
          while (!done && rows.hasNext) {
            val r = rows.next()
            if (r._1 == key) {
              val p = (n % period).toInt // phase of this observation
              val sPrev = season(p)
              val lb = level + trend
              val lNew = (r._4 - sPrev) * alpha + lb * a1
              trend = (lNew - level) * beta + trend * b1
              season(p) = (r._4 - lb) * gamma + sPrev * g1
              level = lNew
              n += 1
            } else { lookahead = Some(r); done = true }
          }
          val sNext = season((n % period).toInt)
          pending = Some((key, n, level, trend, sNext,
            level + trend + sNext))
        }
      }
    }.toDF(keyCol, "n_events", "level", "trend", "season_next", "forecast")
  }

  /** LOCF (last observation carried forward): per-key forward fill of
    * a sparse column in (order, tie) order. UNLIKE the EWMA recurrence
    * this IS a window aggregate — `last(ignoreNulls)` over an
    * unbounded-preceding frame — so it stays declarative: one keyed
    * shuffle + in-partition sort, running state O(1) per key, and
    * Catalyst/AQE keep full visibility of the plan. Rows before the
    * key's first observation keep null (no look-ahead leakage).
    */
  def locf(df: DataFrame, keyCol: String, orderCol: String,
           tieCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(s"${valueCol}_filled",
      last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** F19: time-weighted average of an irregularly-sampled gauge — each
    * sample holds until the next one (step interpolation), so
    * TWA = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first); the metering/billing
    * average a plain mean gets WRONG whenever sampling is bursty
    * (a gauge polled 100× during one spike would dominate the
    * unweighted mean).
    *
    * One keyed shuffle+sort carries the single lead() pass; the
    * weighted sum folds cents·Δµs in decimal(38,0) (exact at any
    * parallelism — one spike term alone can pass 2⁵⁹), and the TWA is
    * ONE raw double division of exact integers. The last sample spans
    * zero time and contributes nothing; single-sample keys → null.
    *
    * @return per key: n_samples, span_us, twa (raw double).
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, usCol: String,
                      tieCol: String, centsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(usCol), col(tieCol))
    val dec = "decimal(38,0)"
    df.withColumn("__next", lead(col(usCol), 1).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_samples"),
        (max(col(usCol)) - min(col(usCol))).as("span_us"),
        sum(when(col("__next").isNotNull,
          col(centsCol).cast(dec) *
            (col("__next") - col(usCol)).cast(dec))).as("__wsum"))
      .select(col(keyCol), col("n_samples"), col("span_us"),
        when(col("span_us") > 0,
          col("__wsum").cast("double") / col("span_us").cast("double"))
          .as("twa"))
  }

  /** F20: out-of-order lateness profile — the pre-flight numbers for
    * choosing a streaming WATERMARK delay: per key, how far behind the
    * running event-time high-water mark events actually arrive
    * (lateness of arrival i = max(0, max_{j<i} tⱼ − tᵢ) in ARRIVAL
    * order), and how many would be dropped at candidate delays. A
    * watermark guess without this table is folklore; with it, "1 min
    * covers 99.2% of events" is a measurement.
    *
    * One keyed shuffle+sort in arrival order (`arrivalCol` — ingest
    * sequence, not event time) carrying a prefix-max window; the
    * per-delay verdicts are conditional counts in ONE aggregate. All
    * exact integer µs.
    *
    * @return per key: n_events, n_late (lateness > 0), max_late_us,
    *         and n_late_gt_<delay> per requested delay.
    */
  def latenessProfile(df: DataFrame, keyCol: String, usCol: String,
                      arrivalCol: String,
                      delaysUs: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(arrivalCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = greatest(lit(0L),
      coalesce(max(col(usCol)).over(w) - col(usCol), lit(0L)))
    val aggs = Seq(
      count(lit(1)).as("n_events"),
      count(when(col("__late") > 0, 1)).as("n_late"),
      max(col("__late")).as("max_late_us")) ++
      delaysUs.map(d =>
        count(when(col("__late") > d, 1)).as(s"n_late_gt_$d"))
    df.withColumn("__late", late)
      .groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** OHLC down-sampling: per (keys, fixed bucket of the integer time
    * column) emit open/high/low/close/count/volume in ONE map-
    * combinable aggregate — `min_by`/`max_by` carry (value, time)
    * partial states, so no per-bucket sort, no window, one keyed
    * shuffle. The classic tick → bar resample, and generally the
    * "first/last per bucket" shape LOCF and gap-fill don't cover.
    *
    * `usCol` must be unique within a (keys, bucket) group for open/
    * close to be well-defined (true for event streams with µs/ns
    * timestamps; pre-disambiguate ties into the time value otherwise).
    * Keep `valueCol` integral (e.g. cents) so volume sums are exact.
    */
  def resampleOhlc(df: DataFrame, keys: Seq[String], usCol: String,
                   valueCol: String, bucketUs: Long): DataFrame = {
    val bucket = (col(usCol) - pmod(col(usCol), lit(bucketUs))).as("bucket_us")
    df.groupBy((keys.map(col) :+ bucket): _*)
      .agg(min_by(col(valueCol), col(usCol)).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), col(usCol)).as("close"),
        count(lit(1)).as("n"),
        sum(col(valueCol)).as("volume"))
  }

  /** F31: Shewhart individuals control chart (Shewhart 1931; the
    * I-MR chart) — per key, the daily series' center line, the
    * moving-range dispersion estimate, and how many days breach the
    * standard ±2.66·MR̄ control limits (2.66 = 3/d₂ for n=2): the SPC
    * monitoring readout ops dashboards put next to F13's CUSUM
    * (Shewhart catches big one-day shifts; CUSUM catches small
    * sustained drift).
    *
    * All integer: daily sums in cents, center = floor mean, MR̄ in
    * floor milli-cents, and the breach test cross-multiplied —
    * |x−center|·10⁶ > 2660·MR̄_milli ⟺ |x−center| > 2.66·MR̄ with no
    * floats anywhere. One keyed day-aggregate, one lag window, one
    * key-cardinality broadcast join back.
    *
    * @return per key: (key, n_days, center_cents, mrbar_milli,
    *         n_violations); mrbar_milli null for single-day keys.
    */
  def controlChart(df: DataFrame, keyCol: String, dayCol: String,
                   centsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(col(keyCol).as("k"), col(dayCol).as("day"))
      .agg(sum(col(centsCol)).as("x"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    val stats = daily
      .withColumn("__mr", abs(col("x") - lag(col("x"), 1).over(w)))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_days"),
        expr("sum(x) div count(1)").as("center_cents"),
        expr("case when count(1) > 1 then " +
          "sum(__mr) * 1000 div (count(1) - 1) end").as("mrbar_milli"))
    daily.join(broadcast(stats), "k")
      .groupBy(col("k").as(keyCol))
      .agg(max(col("n_days")).as("n_days"),
        max(col("center_cents")).as("center_cents"),
        max(col("mrbar_milli")).as("mrbar_milli"),
        sum(when(abs(col("x") - col("center_cents")) * 1000000 >
          col("mrbar_milli") * 2660, 1L).otherwise(0L))
          .as("n_violations"))
  }

  /** F13: one-sided CUSUM change-point detection (Page 1954) per key.
    *
    * The textbook form is a clamped recurrence — s_t = max(0,
    * s_{t−1} + (x_t − k)) — which looks like it needs the
    * mapPartitions rung EWMA/Holt use. It doesn't: with C_t the
    * running sum of the drifts (x−k),
    *
    *   s_t = C_t − min(0, min_{j ≤ t} C_j)
    *
    * (the clamp resets exactly at the prefix minimum), so CUSUM
    * DE-RECURSES into two unbounded-preceding window aggregates over
    * the same (key, order) spec — one keyed shuffle + one sort,
    * Catalyst keeps the whole plan declarative, and unlike the
    * mapPartitions rung the recurrence state never leaves Tungsten.
    * Everything is exact integer arithmetic on cents: bit-stable at
    * any parallelism and engine-portable with no rounding rule.
    *
    * Upper side flags upward level shifts (x persistently above
    * target + allowance); the symmetric lower side flags drops.
    * Output per key: n, final/max statistic both sides, alarm counts
    * (rows where the statistic exceeds `h`).
    */
  def cusumPerKey(df: DataFrame, keyCol: String, orderCol: String,
                  tieCol: String, centsCol: String,
                  targetCents: Long, allowanceCents: Long,
                  hCents: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val up = sum(col(centsCol) - lit(targetCents + allowanceCents)).over(w)
    val dn = sum(lit(targetCents - allowanceCents) - col(centsCol)).over(w)
    val rows = df
      .withColumn("__cu", up).withColumn("__cd", dn)
      .withColumn("s_up", col("__cu") - least(lit(0L), min(col("__cu")).over(w)))
      .withColumn("s_dn", col("__cd") - least(lit(0L), min(col("__cd")).over(w)))
    rows.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        max_by(col("s_up"), struct(col(orderCol), col(tieCol))).as("final_up"),
        max(col("s_up")).as("max_up"),
        sum(when(col("s_up") > hCents, 1L).otherwise(0L)).as("n_alarms_up"),
        max_by(col("s_dn"), struct(col(orderCol), col(tieCol))).as("final_dn"),
        max(col("s_dn")).as("max_dn"),
        sum(when(col("s_dn") > hCents, 1L).otherwise(0L)).as("n_alarms_dn"))
  }

  /** Classical additive seasonal decomposition (the moving-average
    * method, Macaulay 1931 lineage; STL's simpler ancestor) — splits a
    * per-key series into trend + seasonal + residual, the exploratory
    * view BEFORE committing to a Holt-Winters fit (F14) or a
    * seasonal-baseline anomaly rule (F15): trend = centered
    * period-length moving average (odd period; defined only where the
    * window is full — edges stay null, as the method prescribes),
    * seasonal = per-phase mean of the detrended series (uncentered
    * indices), residual = detrended − seasonal.
    *
    * Exactness: trend in micro-units via the overflow-free split
    * floor division of the (nonnegative) window sum; detrended values
    * can be negative so the per-phase seasonal mean factors the sign
    * out before its floor division (the silhouette discipline);
    * residual is a subtraction. All integers, hash-gateable.
    *
    * Plan shape: ONE keyed window chain (trend rides a single
    * exchange), then a (key × period)-cardinality seasonal table
    * broadcast back. The cusum/pageHinkley scale shape.
    *
    * @return per row: (key, ord, tie, cents, trend_micro,
    *         seasonal_micro, resid_micro) — trend/resid null at the
    *         half-window edges.
    */
  def classicalDecompose(df: DataFrame, keyCol: String, ordCol: String,
                         tieCol: String, centsCol: String,
                         period: Int): DataFrame = {
    require(period >= 3 && period % 2 == 1, "odd period >= 3")
    requireNonNegative(df, centsCol, "classicalDecompose",
      "the trend's split floor division needs nonnegative window sums")
    import org.apache.spark.sql.expressions.Window
    val h = period / 2
    val w = Window.partitionBy(col(keyCol)).orderBy(col(ordCol), col(tieCol))
    val wr = w.rowsBetween(-h, h)
    val rows = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wr))
      .withColumn("__sum", sum(col(centsCol)).over(wr))
      .withColumn("trend_micro", when(col("__cnt") === period,
        expr(s"(__sum div $period) * 1000000 + " +
          s"((__sum % $period) * 1000000) div $period")))
      .withColumn("__detr", col(centsCol) * 1000000L - col("trend_micro"))
      .withColumn("__phase", (col("__rn") - 1) % period)
    val seas = rows.filter(col("__detr").isNotNull)
      .groupBy(col(keyCol), col("__phase"))
      .agg(sum(col("__detr")).as("__ss"), count(lit(1)).as("__sc"))
      .select(col(keyCol), col("__phase"),
        expr("CASE WHEN __ss >= 0 THEN __ss div __sc " +
          "ELSE -((-__ss) div __sc) END").as("seasonal_micro"))
    rows.join(broadcast(seas), Seq(keyCol, "__phase"), "left")
      .select(col(keyCol), col(ordCol), col(tieCol), col(centsCol),
        col("trend_micro"), col("seasonal_micro"),
        (col("__detr") - col("seasonal_micro")).as("resid_micro"))
  }

  /** Page–Hinkley mean-shift detector (Page, Biometrika 1954) — the
    * drift test stream monitoring reaches for when [[cusumPerKey]]'s
    * KNOWN target doesn't exist: PH measures deviation from the
    * RUNNING mean, so it self-calibrates to each key's own level.
    *
    * Pure window algebra, all exact integers:
    * mean_i = ⌊cum_i·10⁶/i⌋ (overflow-free split floor division of the
    * nonnegative cumulative sum — quotient truncation direction never
    * in play), term_i = v_i·10⁶ − mean_i − δ, m_t = Σ_{i≤t} term_i,
    * PH_t = m_t − min_{i≤t} m_i, alarm where PH_t > λ. Detects UPWARD
    * level shifts; feed negated values for the downward test. One
    * keyed window chain — a single exchange carries the whole
    * computation, the [[cusumPerKey]] scale shape.
    *
    * @param deltaMicro  magnitude tolerance δ in micro-value units
    * @param lambdaMicro alarm threshold λ in micro-value units
    * @return per key: (key, n, n_alarms, first_alarm_idx, max_ph,
    *         final_ph) — idx 1-based in (orderCol, tieCol) order;
    *         first_alarm_idx null when no alarm fires.
    */
  def pageHinkley(df: DataFrame, keyCol: String, orderCol: String,
                  tieCol: String, centsCol: String,
                  deltaMicro: Long, lambdaMicro: Long): DataFrame = {
    requireNonNegative(df, centsCol, "pageHinkley",
      "the running-mean split floor division needs nonnegative " +
        "cumulative sums")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rows = df
      .withColumn("__i", count(lit(1)).over(w))
      .withColumn("__cum", sum(col(centsCol)).over(w))
      .withColumn("__mean",
        expr("(__cum div __i) * 1000000 + ((__cum % __i) * 1000000) div __i"))
      .withColumn("__term",
        col(centsCol) * 1000000L - col("__mean") - lit(deltaMicro))
      .withColumn("__m", sum(col("__term")).over(w))
      .withColumn("__ph", col("__m") - min(col("__m")).over(w))
    rows.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__ph") > lambdaMicro, 1L).otherwise(0L))
          .as("n_alarms"),
        min(when(col("__ph") > lambdaMicro, col("__i")))
          .as("first_alarm_idx"),
        max(col("__ph")).as("max_ph"),
        max_by(col("__ph"), struct(col(orderCol), col(tieCol)))
          .as("final_ph"))
  }

  /** Autocorrelation function at fixed lags (SURVEY.md §2.F17) — the
    * standard seasonality probe: r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²
    * over the `ordCol`-ordered series. A high r_7 on daily totals says
    * "weekly cycle" before any model is fit.
    *
    * Exact-moment discipline (the corr_stats rule): x̄ = S/n is never
    * materialized — deviations are scaled by n (dev_t = n·x_t − S,
    * exact decimal on integer inputs), so numerator and denominator
    * accumulate as EXACT integers at any parallelism and each r_k is
    * ONE double division at the end (raw-double safe, no rounding
    * rule).
    *
    * Scale shape: one aggregate for (n, S) broadcast back; the lag
    * alignment is a single-partition window — legitimate because it
    * runs over the AGGREGATED series (day/hour-cardinality rows, not
    * the fact table), the same rationale as discrete quantiles.
    *
    * @param series pre-aggregated series; `valCol` must be an exact
    *        integer column (cents, counts).
    * @return one row per lag: (lag, n_pairs, acf).
    */
  /** F22: maximum drawdown per key over a cumulative integer-cents
    * series — the standard risk/health metric (largest peak-to-trough
    * drop of running P&L); on an ops dashboard the same statistic over
    * a success−failure ledger flags the worst degradation window.
    *
    * All arithmetic is exact integers under a TOTAL per-key order
    * (tsCol, tieCol): cum = running sum of cents, peak = running max,
    * drawdown = peak − cum, then one per-key aggregate. Windows are
    * per-key (never a global single-partition sort) and cents come
    * from the floor(+0.5) idiom — engine-deterministic end to end.
    *
    * @return (key, n_events, final_cents, peak_cents, max_drawdown_cents)
    */
  def maxDrawdown(events: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cents = floor(col(valueCol) * 100 + 0.5).cast("long")
    events
      .withColumn("__cum", sum(cents).over(w))
      .withColumn("__peak", max(col("__cum")).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        max(col("__cum")).as("peak_cents"),
        sum(cents).as("final_cents"),
        max(col("__peak") - col("__cum")).as("max_drawdown_cents"))
      .select(col(keyCol), col("n_events"), col("final_cents"),
        col("peak_cents"), col("max_drawdown_cents"))
  }

  /** F23: cross-correlation at fixed lags — the lead-lag probe ("do
    * clicks predict purchases k days out") completing [[acf]]'s
    * self-correlation. Same exactness discipline: deviations scaled
    * by n (dev = n·x − Σx, exact DECIMAL(38,0)), numerators and both
    * denominators exact integer sums; each ccf is then
    * num / (√dx²·√dy²) evaluated in one fixed double-op order — the
    * denominators' PRODUCT would overflow 38 digits, so each is
    * cast-to-double (correctly rounded) and √'d (IEEE sqrt, correctly
    * rounded) first. Lag window over ord-cardinality rows only.
    *
    * @return one row per lag: (lag, n_pairs, ccf) — ccf of x_t
    *         against y_{t+lag}; null for a zero-variance side.
    */
  def crossCorrelation(series: DataFrame, ordCol: String, xCol: String,
                       yCol: String, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 0), s"lags must be ≥ 0: $lags")
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val tot = series.agg(count(lit(1)).cast(dec).as("__n"),
      sum(col(xCol).cast(dec)).cast(dec).as("__sx"),
      sum(col(yCol).cast(dec)).cast(dec).as("__sy"))
    val v = series.crossJoin(broadcast(tot))
      .select(col(ordCol).as("__o"),
        (col("__n") * col(xCol).cast(dec) - col("__sx")).cast(dec).as("dx"),
        (col("__n") * col(yCol).cast(dec) - col("__sy")).cast(dec).as("dy"))
    val w = Window.orderBy(col("__o"))
    val withLeads = v.select(col("dx") +: col("dy") +:
      lags.map(k => lead(col("dy"), k).over(w).as(s"__y$k")): _*)
    val aggs = Seq(count(lit(1)).as("__nd"),
      sum((col("dx") * col("dx")).cast(dec)).as("__dx2"),
      sum((col("dy") * col("dy")).cast(dec)).as("__dy2")) ++
      lags.map(k => sum((col("dx") * col(s"__y$k")).cast(dec)).as(s"__n$k"))
    val one = withLeads.agg(aggs.head, aggs.tail: _*)
    val rows = lags.map(k => struct(lit(k.toLong).as("lag"),
      (col("__nd") - k).cast("long").as("n_pairs"),
      when(col("__dx2") =!= 0 && col("__dy2") =!= 0,
        col(s"__n$k").cast("double") /
          (sqrt(col("__dx2").cast("double")) *
            sqrt(col("__dy2").cast("double"))))
        .as("ccf")))
    one.select(inline(array(rows: _*)))
  }

  def acf(series: DataFrame, ordCol: String, valCol: String,
          lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"lags must be ≥ 1: $lags")
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val tot = series.agg(count(lit(1)).cast(dec).as("__n"),
      sum(col(valCol).cast(dec)).cast(dec).as("__s"))
    val v = series.crossJoin(broadcast(tot))
      .select(col(ordCol).as("__o"),
        (col("__n") * col(valCol).cast(dec) - col("__s")).cast(dec).as("dev"))
    val w = Window.orderBy(col("__o"))
    val withLeads = v.select(col("dev") +:
      lags.map(k => lead(col("dev"), k).over(w).as(s"__d$k")): _*)
    val aggs = Seq(count(lit(1)).as("__nd"),
      sum((col("dev") * col("dev")).cast(dec)).as("__den")) ++
      lags.map(k => sum((col("dev") * col(s"__d$k")).cast(dec)).as(s"__num$k"))
    val one = withLeads.agg(aggs.head, aggs.tail: _*)
    // zero-variance (constant) series → null, not a divide-by-zero
    // (ANSI mode throws even on double division)
    val rows = lags.map(k => struct(lit(k.toLong).as("lag"),
      (col("__nd") - k).cast("long").as("n_pairs"),
      when(col("__den") =!= 0,
        col(s"__num$k").cast("double") / col("__den").cast("double"))
        .as("acf")))
    one.select(inline(array(rows: _*)))
  }

  /** C63: Wald–Wolfowitz runs test — "is the series random around its
    * median, or does it trend/oscillate": runs of above/below-median
    * values counted exactly (ties to the median dropped, the standard
    * convention), z-score against the run-count null in fixed IEEE op
    * order (6dp). Too FEW runs ⇒ trending/sticky regimes; too MANY ⇒
    * oscillation. The median is an exact discrete quantile (integer
    * rank arithmetic), the lag pass runs over the AGGREGATED
    * day-cardinality series only (the acf rationale).
    *
    * @return one row: (n_pos, n_neg, n_runs, z).
    */
  def runsTest(series: DataFrame, ordCol: String,
               valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val med = graft.operators.Stats.discreteQuantiles(
      series.select(col(valCol)).withColumn("__g", lit(1)),
      Seq("__g"), valCol, Seq(5000)).drop("__g")
    val signed = series.crossJoin(broadcast(med))
      .filter(col(valCol) =!= col("q5000"))
      .select(col(ordCol).as("__o"),
        (col(valCol) > col("q5000")).as("__up"))
    val w = Window.orderBy(col("__o"))
    val runs = signed
      .withColumn("__new",
        when(lag(col("__up"), 1).over(w).isNull, 1L)
          .when(lag(col("__up"), 1).over(w) =!= col("__up"), 1L)
          .otherwise(0L))
      .agg(sum(when(col("__up"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("__up"), 0L).otherwise(1L)).as("n_neg"),
        sum(col("__new")).as("n_runs"))
    // z = (R − μ)/σ, μ = 2ab/(a+b) + 1,
    // σ² = 2ab(2ab − a − b) / ((a+b)²(a+b−1)) — fixed op order
    val a = col("n_pos").cast("double")
    val b = col("n_neg").cast("double")
    val mu = lit(2.0) * a * b / (a + b) + 1.0
    val s2 = lit(2.0) * a * b * (lit(2.0) * a * b - a - b) /
      ((a + b) * (a + b) * (a + b - 1.0))
    runs.select(col("n_pos"), col("n_neg"), col("n_runs"),
      round(when(col("n_pos") > 0 && col("n_neg") > 0 && s2 > 0,
        (col("n_runs").cast("double") - mu) / sqrt(s2)), 6).as("z"))
  }

  /** Mann–Kendall trend test (Mann 1945, Kendall 1975) — the
    * significance half of the robust-trend pair: [[theilSen]] gives
    * the MAGNITUDE, this gives the p-backing z for "is there a
    * monotone trend at all", with no distribution assumption. S =
    * Σ_{i<j} sign(y_j − y_i) is an exact integer over the AGGREGATED
    * series (day-cardinality² pairs — the theilSen rationale); the
    * variance applies the standard tie correction
    * (n(n−1)(2n+5) − Σt(t−1)(2t+5))/18 from exact integer carriers;
    * z uses the ±1 continuity correction, fixed IEEE op order (6dp).
    *
    * @return one row: (n, s_stat, n_pairs, z).
    */
  def mannKendall(series: DataFrame, ordCol: String,
                  valCol: String): DataFrame = {
    val a = series.select(col(ordCol).as("xi"), col(valCol).as("yi"))
    val b = series.select(col(ordCol).as("xj"), col(valCol).as("yj"))
    val s = a.join(b, col("xi") < col("xj"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(signum((col("yj") - col("yi")).cast("double")).cast("long"))
          .as("s_stat"))
    val ties = series.groupBy(col(valCol).as("y"))
      .agg(count(lit(1)).as("t"))
      .agg(sum(col("t")).as("n"),
        sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tsum"))
    val nD = col("n").cast("double")
    val varS = (nD * (nD - 1.0) * (nD * 2 + 5.0) -
      col("tsum").cast("double")) / 18.0
    val sD = col("s_stat").cast("double")
    s.crossJoin(broadcast(ties))
      .select(col("n"), col("s_stat"), col("n_pairs"),
        round(when(varS > 0,
          when(col("s_stat") > 0, (sD - 1.0) / sqrt(varS))
            .when(col("s_stat") < 0, (sD + 1.0) / sqrt(varS))
            .otherwise(lit(0.0))), 6).as("z"))
  }

  /** C59: Theil–Sen robust trend slope (Theil 1950, Sen 1968) — the
    * median of all pairwise slopes over an AGGREGATED series: up to
    * ~29% contamination (outlier days, ingestion spikes) leaves the
    * estimate untouched, where OLS follows every excursion. Pairs and
    * the ranking window are day-cardinality² (the series is the
    * aggregate, the corpus is not — the acf rationale squared);
    * each slope is ONE IEEE division of exact ints and the median is
    * picked by integer rank arithmetic under a total (slope, xi, xj)
    * order — deterministic, raw-double safe, no interpolation.
    *
    * @return one row: (n_pairs, slope).
    */
  def theilSen(series: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = series.select(col(xCol).as("xi"), col(yCol).as("yi"))
    val b = series.select(col(xCol).as("xj"), col(yCol).as("yj"))
    val pairs = a.join(b, col("xi") < col("xj"))
      .select(col("xi"), col("xj"),
        ((col("yj") - col("yi")).cast("double") /
          (col("xj") - col("xi")).cast("double")).as("slope"))
    val w = Window.orderBy(col("slope"), col("xi"), col("xj"))
    val ranked = pairs
      .withColumn("__rk", row_number().over(w).cast("long"))
    ranked.crossJoin(broadcast(pairs.agg(count(lit(1)).as("__m"))))
      // lower median: rk = ⌈m/2⌉ ⟺ 2·rk − m ∈ {0, 1}
      .filter(col("__rk") * 2 === col("__m") ||
        col("__rk") * 2 === col("__m") + 1)
      .select(col("__m").as("n_pairs"), col("slope"))
  }

  /** F26: Kaplan–Meier survival estimator (Kaplan & Meier, JASA 1958)
    * — retention/lifetime curves with CENSORING handled correctly,
    * which naive "average lifetime" aggregates cannot do (subjects
    * still alive at observation end would bias every mean downward).
    *
    * Input: one row per subject with an integer duration and an event
    * flag (false = right-censored at that duration). Output: one row
    * per distinct EVENT time t — (t, n_risk, d, s) with
    * n_risk = subjects with duration ≥ t (ties: events precede
    * censorings, the standard convention), d = events at t, and
    * S(t) = Π_{t_j ≤ t} (n_j − d_j)/n_j.
    *
    * Exactness discipline: counts are exact integers; each factor is
    * ONE IEEE division of exact ints; the survival products fold in
    * ascending-t order over an event-time-cardinality array (like the
    * acf/latency day-cardinality frames, event times are bounded —
    * durations in days — while subjects are not), via slice+fold so
    * every S(t) is a fixed-order product, bit-identical on both
    * engines. 6dp at output only for the product chain (documented
    * ulp hedge); n_risk/d are hash-exact.
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byT = df.groupBy(col(durationCol).as("t")).agg(
      count(lit(1)).as("__c"),
      sum(when(col(eventCol), 1L).otherwise(0L)).as("d"))
    val tot = byT.agg(sum(col("__c")).as("__nTot"))
    // event-time-cardinality window (durations are bounded units)
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val atRisk = byT.crossJoin(broadcast(tot))
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("n_risk", col("__nTot") - col("__cum") + col("__c"))
      .filter(col("d") >= 1)
      .select(col("t"), col("n_risk"), col("d"),
        ((col("n_risk") - col("d")).cast("double") /
          col("n_risk").cast("double")).as("__f"))
    val one = atRisk
      .agg(array_sort(collect_list(struct(col("t"), col("n_risk"),
        col("d"), col("__f")))).as("arr"))
    one.select(col("arr"), posexplode(col("arr")).as(Seq("__i", "__s")))
      .select(col("__s.t").as("t"), col("__s.n_risk").as("n_risk"),
        col("__s.d").as("d"),
        round(aggregate(
          transform(slice(col("arr"), lit(1), col("__i") + 1),
            x => x("__f")),
          lit(1.0), _ * _), 6).as("s"))
  }

  /** C100: two-group log-rank test (Mantel 1966; Peto & Peto 1972) —
    * the comparison the survival family was missing: [[kaplanMeier]]
    * and [[nelsonAalen]] DESCRIBE one cohort's survival; log-rank asks
    * whether two cohorts' survival curves DIFFER (treatment vs
    * control, segment vs segment), weighting every event time by its
    * at-risk population. O₁ = Σ d₁(t); E₁ = Σ d·n₁/n;
    * V = Σ d·(n₁/n)·((n−n₁)/n)·((n−d)/(n−1)); z = (O₁−E₁)/√V,
    * χ² = z².
    *
    * Exactness: the same exact-integer at-risk frame as KM (counts,
    * events at tied times), O₁ an exact long; E₁ and V are folds of
    * per-event-time terms — each term a FIXED expression of exact
    * ints — accumulated in event-time order via the q_ewma
    * list-fold discipline, 6dp. V = 0 (degenerate: one group empty
    * at every event time) → null z/χ².
    *
    * Plan: one (time)-keyed agg, one event-time-cardinality window,
    * one 1-row fold. Nothing data-sized after the first agg.
    *
    * @param groupCol integer; group 1 is the "treatment" arm, any
    *                 other value the comparison arm.
    * @return one row: (n_total, n_group1, o1, e1_6, v_6, z_6, chi2_6).
    */
  def logRank(df: DataFrame, groupCol: String, durationCol: String,
              eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byT = df.groupBy(col(durationCol).as("t")).agg(
      count(lit(1)).as("c"),
      sum(when(col(groupCol) === 1, 1L).otherwise(0L)).as("c1"),
      sum(when(col(eventCol), 1L).otherwise(0L)).as("d"),
      sum(when(col(eventCol) && col(groupCol) === 1, 1L).otherwise(0L))
        .as("d1"))
    val tot = byT.agg(sum(col("c")).as("nTot"), sum(col("c1")).as("n1Tot"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val rk = byT.crossJoin(broadcast(tot))
      .withColumn("n",
        col("nTot") - sum(col("c")).over(w) + col("c"))
      .withColumn("n1",
        col("n1Tot") - sum(col("c1")).over(w) + col("c1"))
      .filter(col("d") >= 1)
    val eTerm = col("d").cast("double") * col("n1").cast("double") /
      col("n").cast("double")
    val vTerm = when(col("n") > 1,
      (col("d").cast("double") * col("n1").cast("double") /
        col("n").cast("double")) *
        ((col("n") - col("n1")).cast("double") / col("n").cast("double")) *
        ((col("n") - col("d")).cast("double") /
          (col("n") - 1).cast("double")))
      .otherwise(lit(0.0))
    val one = rk.agg(
      max(col("nTot")).as("n_total"), max(col("n1Tot")).as("n_group1"),
      coalesce(sum(col("d1")), lit(0L)).as("o1"),
      array_sort(collect_list(struct(col("t"), eTerm.as("e"),
        vTerm.as("v")))).as("arr"))
    val e1 = aggregate(transform(col("arr"), x => x("e")),
      lit(0.0), _ + _)
    val vv = aggregate(transform(col("arr"), x => x("v")),
      lit(0.0), _ + _)
    val z = (col("o1").cast("double") - e1) / sqrt(vv)
    one.select(col("n_total"), col("n_group1"), col("o1"),
      round(e1, 6).as("e1_6"), round(vv, 6).as("v_6"),
      when(vv > 0, round(z, 6)).as("z_6"),
      when(vv > 0, round(z * z, 6)).as("chi2_6"))
  }

  /** F33: Nelson–Aalen cumulative-hazard estimator (Nelson 1972;
    * Aalen 1978) — the additive sibling of [[kaplanMeier]]: instead
    * of the survival product Π(1 − d/n), the cumulative hazard
    * Ĥ(t) = Σ_{tᵢ≤t} dᵢ/nᵢ. Epidemiology and reliability work read
    * the hazard slope directly (constant slope = constant risk; a
    * bend = a regime change), and ln S(t) ≈ −Ĥ(t) ties the two.
    *
    * Exactness: same at-risk frame as KM (exact integer counts,
    * events-precede-censorings ties), but because the estimator is a
    * SUM — not a product — it quantizes cleanly: each increment is
    * ⌊10⁶·d/n⌋ micro-units and Ĥ is their cumulative integer sum
    * over the event-time-cardinality window, so unlike KM's 6dp
    * product chain this gate is HASH-EXACT. (Per-step floor loses
    * < 1 micro per event time vs the true rational — bounded by
    * #event-times·1e-6, documented semantics, identical both
    * engines.)
    *
    * @return one row per distinct event time: (t, n_risk, d,
    *         h_micro = cumulative ⌊10⁶·d/n_risk⌋).
    */
  def nelsonAalen(df: DataFrame, durationCol: String,
                  eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byT = df.groupBy(col(durationCol).as("t")).agg(
      count(lit(1)).as("__c"),
      sum(when(col(eventCol), 1L).otherwise(0L)).as("d"))
    val tot = byT.agg(sum(col("__c")).as("__nTot"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    byT.crossJoin(broadcast(tot))
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("n_risk", col("__nTot") - col("__cum") + col("__c"))
      .filter(col("d") >= 1)
      .withColumn("h_micro",
        sum(expr("d * 1000000L div n_risk")).over(w))
      .select(col("t"), col("n_risk"), col("d"), col("h_micro"))
  }

  /** F32: EWMA control chart (Roberts 1959) — completes the SPC
    * family: Shewhart (F31) catches big one-day shifts, CUSUM (F13)
    * small sustained drift, EWMA sits between — a geometrically-
    * weighted recent mean crossing its control band flags medium
    * drifts sooner than Shewhart without CUSUM's tuning.
    *
    * Exact-integer discipline: λ = 1/5, so the smoothed statistic is
    * DEFINED as the quantized micro-cent recurrence
    *
    *   z₀ = center·10⁶,   z_t = (x_t·10⁶ + 4·z_{t−1}) div 5
    *
    * (≤ 1 micro floor loss per step, geometrically damped to a ≤
    * 1.25-micro total deviation from the real-valued EWMA — deliberate
    * semantics, identical on both engines, and the reason this gate
    * is HASH-EXACT where a double recurrence would need the 6dp
    * hedge). The steady-state control half-width is ±3·σ̂·√(λ/(2−λ));
    * at λ = 1/5 the factor √(1/9) = 1/3 is EXACT, so the limit
    * collapses to σ̂ = MR̄/1.128 and the breach test cross-multiplies:
    * |z − center·10⁶|·1128 > MR̄_milli·10⁶ — no floats anywhere.
    *
    * Plan shape: the F31 day-aggregate + stats, then ONE per-key
    * in-row fold over the day-sorted array (day cardinality is
    * bounded; the interpreted-HOF cost rides on ≤ hundreds of
    * elements per key). Truncating `div` ≡ the oracle's floor `//`
    * only on nonnegative operands — guarded loudly.
    *
    * @return per key: (key, n_days, center_cents, mrbar_milli,
    *         ewma_micro — final z, n_breaches; mrbar_milli null and
    *         n_breaches 0 for single-day keys).
    */
  def ewmaChart(df: DataFrame, keyCol: String, dayCol: String,
                centsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireNonNegative(df, centsCol, "ewmaChart",
      "the z-recurrence's truncating div matches the oracle's floor " +
        "// only for nonnegative daily sums")
    val daily = df.groupBy(col(keyCol).as("k"), col(dayCol).as("day"))
      .agg(sum(col(centsCol)).as("x"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    val stats = daily
      .withColumn("__mr", abs(col("x") - lag(col("x"), 1).over(w)))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_days"),
        expr("sum(x) div count(1)").as("center_cents"),
        expr("case when count(1) > 1 then " +
          "sum(__mr) * 1000 div (count(1) - 1) end").as("mrbar_milli"))
    daily.join(broadcast(stats), "k")
      .groupBy(col("k"))
      .agg(max(col("n_days")).as("n_days"),
        max(col("center_cents")).as("center_cents"),
        max(col("mrbar_milli")).as("mrbar_milli"),
        array_sort(collect_list(struct(col("day"), col("x")))).as("arr"))
      .withColumn("__st", expr(
        """aggregate(arr,
          |  named_struct('z', center_cents * 1000000L, 'nb', 0L),
          |  (acc, e) -> named_struct(
          |    'z', (e.x * 1000000L + 4L * acc.z) div 5L,
          |    'nb', acc.nb + (case when mrbar_milli is not null
          |      and abs((e.x * 1000000L + 4L * acc.z) div 5L
          |        - center_cents * 1000000L) * 1128L
          |        > mrbar_milli * 1000000L
          |      then 1L else 0L end)))""".stripMargin))
      .select(col("k").as(keyCol), col("n_days"), col("center_cents"),
        col("mrbar_milli"), col("__st.z").as("ewma_micro"),
        col("__st.nb").as("n_breaches"))
  }

  /** F37: MASE-style forecast-baseline skill (Hyndman & Koehler, IJF
    * 2006) — before trusting F14 Holt-Winters or F10 Holt on a series,
    * measure whether even the trivial forecasters have signal: per key
    * the MAE of the naive-1 forecast (ŷₜ = yₜ₋₁) against the MAE of
    * the seasonal-naive (ŷₜ = yₜ₋ₘ); mase < 10⁶ (micro-units) means
    * the last observation already beats the seasonal repeat — a series
    * where NEITHER beats noise isn't worth a model.
    *
    * Exactness: values are integer cents, absolute lag errors are
    * exact BIGINTs, both MAEs and their ratio in floor-div micro-units
    * — integers end to end. Per-key windows ordered by the sequence
    * column — keyed partitions, never a global sort. Keys with fewer
    * than season+1 points emit null mase (no seasonal error exists);
    * a flat seasonal pattern (mae_season = 0) also emits null rather
    * than a division blow-up.
    *
    * @return per key: (key, n_points, mae1_micro, mase_season_micro,
    *         mase_micro).
    */
  def maseBaseline(df: DataFrame, keyCol: String, seqCol: String,
                   centsCol: String, season: Int): DataFrame = {
    require(season >= 2, s"maseBaseline: season $season (use ≥ 2; " +
      "season 1 is the naive-1 numerator itself)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("k")).orderBy(col("s"))
    val d = df.select(col(keyCol).as("k"), col(seqCol).as("s"),
        col(centsCol).cast("long").as("v"))
      .withColumn("e1", abs(col("v") - lag(col("v"), 1).over(w)))
      .withColumn("es", abs(col("v") - lag(col("v"), season).over(w)))
    d.groupBy(col("k"))
      .agg(count(lit(1)).as("n_points"),
        count(col("e1")).as("n1"), sum(col("e1")).as("s1"),
        count(col("es")).as("ns"), sum(col("es")).as("ss"))
      .select(col("k").as(keyCol), col("n_points"),
        when(col("n1") === 0, lit(null))
          .otherwise(expr("s1 * 1000000 div n1")).cast("long")
          .as("mae1_micro"),
        when(col("ns") === 0, lit(null))
          .otherwise(expr("ss * 1000000 div ns")).cast("long")
          .as("mae_season_micro"),
        when(col("ns") === 0 || col("ss") === 0 || col("n1") === 0,
          lit(null))
          .otherwise(expr(
            "(s1 * 1000000 div n1) * 1000000 div (ss * 1000000 div ns)"))
          .cast("long").as("mase_micro"))
  }

  /** F34: at-most-one-change (AMOC) change-point LOCALIZATION
    * (Hinkley, Biometrika 1970; the CUSUM argmax estimator) — F13's
    * CUSUM says a key's level SHIFTED, this says WHERE: the split k
    * maximizing the scaled mean-shift statistic
    * s_k = |n·P_k − k·P_n| (P = prefix sums of integer values), which
    * is n·k·(n−k)/n × |mean(left) − mean(right)| — the classic offline
    * single-change estimator the streaming alarm can't give.
    *
    * Exact end to end (hash gate): values are caller-quantized longs
    * (cents — the F-family convention), prefix sums exact, s_k in
    * decimal(38,0); the argmax packs (s_k, n−k) into ONE orderable
    * decimal s_k·2²¹ + (2²¹−k) so ties break to the SMALLEST k
    * identically on any engine (loud n < 2²¹ series-length guard —
    * per-key series at that length belong in windows/downsampling
    * first). Left/right means in exact floor-div micro-units.
    *
    * Plan: ONE keyed window pass (prefix sum + per-key totals over the
    * same partitioning — single shuffle) + one per-key max aggregate;
    * no self-join over splits, no driver state.
    *
    * @param orderCol must be UNIQUE per key (ambiguous order makes the
    *                 prefix ill-defined) — callers pack (ts, id).
    * @return per key: (key, n, cp_k — 1-based prefix length of the
    *         left segment, s_max as decimal, mean_left_micro,
    *         mean_right_micro). Keys with n < 2 rows are emitted with
    *         null cp fields (no split exists).
    */
  def changePoint(df: DataFrame, keyCol: String, orderCol: String,
                  valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pack = 2097152L // 2^21
    val w = Window.partitionBy(col("key")).orderBy(col("ord"))
    val wAll = Window.partitionBy(col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pref = df.select(col(keyCol).as("key"), col(orderCol).as("ord"),
        col(valueCol).cast("long").as("v"))
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("pk", sum(col("v")).over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("pn", sum(col("v")).over(wAll))
    val guarded = pref.withColumn("n",
      when(col("n") >= pack, raise_error(concat(
        lit("changePoint: series length "), col("n").cast("string"),
        lit(s" exceeds the packed-argmax bound $pack — window or " +
          "downsample the series first"))).cast("long"))
        .otherwise(col("n")))
    // splits are 1..n−1 (a split needs both sides non-empty)
    val splits = guarded.filter(col("k") < col("n"))
      .withColumn("s",
        abs(col("n").cast("decimal(38,0)") * col("pk") -
          col("k").cast("decimal(38,0)") * col("pn")))
      .withColumn("packed",
        col("s") * lit(pack) + (lit(pack) - col("k")))
    val best = splits.groupBy(col("key"))
      .agg(max(col("n")).as("n"), max(col("packed")).as("bp"),
        max(col("pn")).as("pn"))
      .select(col("key"), col("n"),
        (lit(pack) - (col("bp") % lit(pack))).cast("long").as("cp_k"),
        // exact unpack: subtract the remainder BEFORE dividing — a bare
        // decimal division + cast would HALF_UP round the quotient
        ((col("bp") - col("bp") % lit(pack)) / lit(pack))
          .cast("decimal(38,0)").as("s_max"),
        col("pn"))
    // recover P_cp for the means with one self-equi-join on (key, k)
    // — both sides share the key partitioning, no extra shuffle class
    val pkAt = pref.select(col("key"), col("k").as("cp_k"),
      col("pk").as("p_cp"))
    val withMeans = best.join(pkAt, Seq("key", "cp_k"), "left")
      .select(col("key"), col("n"), col("cp_k"), col("s_max"),
        expr("p_cp * 1000000 div cp_k").as("mean_left_micro"),
        expr("(pn - p_cp) * 1000000 div (n - cp_k)")
          .as("mean_right_micro"))
    // n < 2 keys have no split: emit them with null cp fields
    val singletons = pref.filter(col("n") < 2)
      .select(col("key"), col("n"),
        lit(null).cast("long").as("cp_k"),
        lit(null).cast("decimal(38,0)").as("s_max"),
        lit(null).cast("long").as("mean_left_micro"),
        lit(null).cast("long").as("mean_right_micro"))
    withMeans.unionByName(singletons)
  }

  /** F40: Pettitt change-point test (Pettitt, Applied Statistics
    * 1979) — the RANK-based single change-point detector beside F34's
    * AMOC mean-shift (CUSUM of deviations) and F13's CUSUM: where
    * AMOC localizes a MEAN shift under roughly-constant variance,
    * Pettitt is a Mann–Whitney scan — distribution-free, robust to
    * outliers and variance changes, the hydrology-standard
    * "has this gauge/metric regime-shifted, and when" test.
    *
    * U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i−x_j) computed WITHOUT the pair
    * space via the rank identity U_t = 2·Σ_{i≤t}R_i − t(N+1)
    * (midranks for ties): per key, value-cardinality midrank carriers
    * r2 = 2R (exact longs, the mannWhitney discipline) joined back to
    * the series, one ordered cumsum → every U_t exact. K = max|U_t|
    * over t ∈ [1, N−1]; t* = the EARLIEST order key attaining K
    * (packed max: |U|·10⁹ − t, deterministic); the approximate
    * significance p ≈ 2·exp(−6K²/(N³+N²)) is one transcendental of an
    * exact-integer ratio (the tfidf rule), clamped at 1, 6dp.
    *
    * Requires (key, order) unique (aggregate to your grain first —
    * the gate feeds daily sums); keys with < 2 points emit no row.
    * Plan: keyed value-cardinality window + keyed ordered cumsum +
    * one keyed agg — day-cardinality state per key, no pair blowup.
    */
  def pettitt(df: DataFrame, keyCol: String, orderCol: String,
              valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = df.select(col(keyCol).cast("string").as("k"),
        col(orderCol).as("o"), col(valueCol).cast("long").as("v"))
      .filter(col("k").isNotNull && col("o").isNotNull &&
        col("v").isNotNull)
    val vals = d.groupBy(col("k"), col("v")).agg(count(lit(1)).as("t"))
    val wv = Window.partitionBy(col("k")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = vals.withColumn("hi", sum(col("t")).over(wv))
      .select(col("k"), col("v"), (col("hi") * 2 - col("t") + 1).as("r2"))
    val wo = Window.partitionBy(col("k")).orderBy(col("o"))
    val u = d.join(ranked, Seq("k", "v"))
      .withColumn("v2", sum(col("r2"))
        .over(wo.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tt", row_number().over(wo))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("k"))))
      .filter(col("tt") <= col("n") - 1)
      .withColumn("u", col("v2") - col("tt") * (col("n") + 1))
    val agg = u.groupBy(col("k")).agg(
      max(col("n")).as("n_points"),
      max(abs(col("u"))).as("k_stat"),
      max_by(col("o"),
        abs(col("u")) * lit(1000000000L) - col("tt")).as("t_star"))
    val nD = col("n_points").cast("double")
    agg.select(col("k").as(keyCol), col("n_points"), col("k_stat"),
      col("t_star"),
      round(least(lit(1.0), lit(2.0) *
        exp(lit(-6.0) * (col("k_stat") * col("k_stat")).cast("double") /
          (nD * nD * nD + nD * nD))), 6).as("p_6"))
  }

  /** C122: Durbin–Watson first-order autocorrelation statistic
    * (Durbin & Watson, Biometrika 1950) — the regression-residual
    * diagnostic the trend family was missing: fit the per-key OLS
    * time trend, then DW = Σ(e_t − e_{t−1})²/Σe_t² on its residuals
    * (≈ 2(1−ρ̂₁); < 2 ⇒ positive serial correlation, the "my trend
    * model is lying about its standard errors" alarm).
    *
    * Exactness: with x_t = t (row index), every residual sum
    * collapses ALGEBRAICALLY onto exact integer carriers — no
    * residual is ever materialized:
    * {{{
    *   Σe²        = (Syy − b·Sxy) / n,  scaled carriers
    *   Σ(Δe)²     = ΣΔy² − 2b·ΣΔy + (n−1)b²       (Δx ≡ 1)
    * }}}
    * where Sxx/Sxy/Syy are the n-scaled centered moments (exact
    * decimal(38,0)), ΣΔy/ΣΔy² exact lag-difference sums, and
    * b = Sxy/Sxx the ONE IEEE slope. DW is a single fixed IEEE tree
    * of those carriers, 6dp; slope emitted RAW (exact-integer ratio —
    * bit-identical across engines). Null when n < 3, zero x-variance
    * or zero residual variance.
    *
    * Plan: one keyed window pass (row index + lag) + one keyed agg.
    *
    * @return per key: (key, n_points, slope, dw_6).
    */
  def durbinWatson(series: DataFrame, keyCol: String, ordCol: String,
                   valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val d = series.select(col(keyCol).cast("string").as("k"),
        col(ordCol).as("o"), col(valCol).cast("long").as("v"))
      .filter(col("k").isNotNull && col("o").isNotNull &&
        col("v").isNotNull)
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
    val rows = d
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("dlt", col("v") - lag(col("v"), 1).over(w))
    val g = rows.groupBy(col("k")).agg(
      count(lit(1)).as("n"),
      sum(col("v").cast(dec)).as("s"),
      sum(col("v").cast(dec) * col("v")).as("q"),
      sum(col("t").cast(dec)).as("st"),
      sum(col("t").cast(dec) * col("t")).as("stt"),
      sum(col("t").cast(dec) * col("v")).as("stv"),
      sum(col("dlt").cast(dec)).as("d1"),
      sum(col("dlt").cast(dec) * col("dlt")).as("d2"))
    val nDec = col("n").cast(dec)
    val sxx = (nDec * col("stt") - col("st") * col("st")).cast("double")
    val sxy = (nDec * col("stv") - col("st") * col("s")).cast("double")
    val syy = (nDec * col("q") - col("s") * col("s")).cast("double")
    val b = sxy / sxx
    val nD = col("n").cast("double")
    val nSse = syy - b * sxy
    // Σe² = (syy − b·sxy)/n ⇒ DW = (ΣΔe²)·n / (syy − b·sxy)
    val dw = (col("d2").cast("double") - lit(2.0) * b *
      col("d1").cast("double") + (nD - 1.0) * b * b) * nD / nSse
    g.select(col("k").as(keyCol), col("n").as("n_points"),
      when(sxx > 0, b).as("slope"),
      when(col("n") >= 3 && sxx > 0 && nSse > 0, round(dw, 6))
        .as("dw_6"))
  }

  /** F43: Ljung–Box portmanteau test (Ljung & Box, Biometrika 1978)
    * — "is this series white noise at lags 1..m", the aggregate
    * companion of [[acf]]'s per-lag view and the standard residual
    * check after any of the F-family forecasters:
    * Q = n(n+2)·Σ_k r_k²/(n−k).
    *
    * Exactness: the identical n-scaled exact-decimal machinery as
    * [[acf]] (deviations n·x − Σx, numerators/denominator exact
    * integer sums); each r_k is ONE IEEE division, and Q folds the m
    * lag terms in lag order as a fixed left-associated chain, 6dp.
    * Null when the series is constant (zero denominator) or n ≤ m.
    *
    * @return one row: (n, max_lag, q_6).
    */
  def ljungBox(series: DataFrame, ordCol: String, valCol: String,
               maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be ≥ 1: $maxLag")
    val lags = 1 to maxLag
    val dec = "decimal(38,0)"
    val tot = series.agg(count(lit(1)).cast(dec).as("__n"),
      sum(col(valCol).cast(dec)).cast(dec).as("__s"))
    val v = series.crossJoin(broadcast(tot))
      .select(col(ordCol).as("__o"),
        (col("__n") * col(valCol).cast(dec) - col("__s")).cast(dec)
          .as("dev"))
    val w = Window.orderBy(col("__o"))
    val withLeads = v.select(col("dev") +:
      lags.map(k => lead(col("dev"), k).over(w).as(s"__d$k")): _*)
    val aggs = Seq(count(lit(1)).as("__nd"),
      sum((col("dev") * col("dev")).cast(dec)).as("__den")) ++
      lags.map(k =>
        sum((col("dev") * col(s"__d$k")).cast(dec)).as(s"__num$k"))
    val one = withLeads.agg(aggs.head, aggs.tail: _*)
    val nD = col("__nd").cast("double")
    val qSum = lags.map { k =>
      val r = col(s"__num$k").cast("double") / col("__den").cast("double")
      r * r / (nD - k)
    }.reduce(_ + _)
    one.select(col("__nd").as("n"),
      lit(maxLag.toLong).as("max_lag"),
      when(col("__den") =!= 0 && col("__nd") > maxLag,
        round(nD * (nD + 2.0) * qSum, 6)).as("q_6"))
  }

  /** F42: Theta-method one-step forecast (Assimakopoulos &
    * Nikolopoulos, IJF 2000), in the Hyndman & Billah (IJF 2003)
    * closed form: classical theta with θ = 2 is EXACTLY simple
    * exponential smoothing plus half the linear-trend slope as
    * drift — the M3-winning forecaster, and the rung between
    * [[holtPerKey]] (adaptive trend) and plain SES on this file's
    * recurrence ladder.
    *
    * {{{
    *   l_t = α·v_t + (1−α)·l_{t−1}          (seed l₁ = v₁)
    *   ŷ_{n+1} = l_n + (b̂/2)·(1 − (1−α)ⁿ)/α
    * }}}
    *
    * b̂ is the exact-moment OLS slope over the time index (the
    * [[durbinWatson]] carriers). The recurrence rides the holt
    * mapPartitions rung (O(1) state, total fold order); (1−α)ⁿ is
    * carried IN the recurrence as a running product — pow() is NOT
    * used, because libm pow differs across engines while repeated
    * IEEE multiplication replays identically (the oracle's
    * recursive CTE multiplies the same way). A 1-point series has
    * no slope: slope is null and the forecast falls back to the
    * bare level (same for any zero-x-variance degenerate).
    *
    * @return per key: (key, n_points, level_6, slope, forecast_6) —
    *         slope RAW (exact-integer ratio), null for n < 2 or
    *         zero x-variance, in which case forecast = level.
    */
  def thetaPerKey(spark: SparkSession, df: DataFrame, keyCol: String,
                  tsCol: String, tieCol: String, valueCol: String,
                  alpha: Double): DataFrame = {
    import spark.implicits._
    val a1 = 1.0 - alpha
    val dec = "decimal(38,0)"
    val base = df
      .select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("t"),
        col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("long").as("v"))
      .filter(col("k").isNotNull && col("t").isNotNull &&
        col("tie").isNotNull && col("v").isNotNull)
    val sorted = base
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("t"), col("tie"))
      .as[(Long, Long, Long, Long)]
    val ses = sorted.mapPartitions { rows =>
      new Iterator[(Long, Long, Double, Double)] {
        private var pending: Option[(Long, Long, Double, Double)] = None
        private var lookahead: Option[(Long, Long, Long, Long)] = None
        def hasNext: Boolean = pending.isDefined || rows.hasNext ||
          lookahead.isDefined
        def next(): (Long, Long, Double, Double) = {
          if (pending.isEmpty) advance()
          val out = pending.get
          pending = None
          out
        }
        private def advance(): Unit = {
          val first = lookahead.getOrElse(rows.next())
          lookahead = None
          val key = first._1
          var level = first._4.toDouble
          var wPow = a1 // (1−α)^n after the seed observation
          var n = 1L
          var done = false
          while (!done && rows.hasNext) {
            val r = rows.next()
            if (r._1 == key) {
              level = r._4.toDouble * alpha + level * a1
              wPow = wPow * a1
              n += 1
            } else { lookahead = Some(r); done = true }
          }
          pending = Some((key, n, level, wPow))
        }
      }
    }.toDF("k", "n", "level", "w_pow")
    // exact-moment slope per key (the durbinWatson carriers)
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("tie"))
    val mom = base.withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("k")).agg(
        sum(col("v").cast(dec)).as("s"),
        sum(col("i").cast(dec)).as("st"),
        sum(col("i").cast(dec) * col("i")).as("stt"),
        sum(col("i").cast(dec) * col("v")).as("stv"),
        count(lit(1)).as("nm"))
    val joined = ses.join(mom, Seq("k"))
    val nDec = col("nm").cast(dec)
    val sxx = (nDec * col("stt") - col("st") * col("st")).cast("double")
    val sxy = (nDec * col("stv") - col("st") * col("s")).cast("double")
    val slope = when(sxx > 0, sxy / sxx)
    val drift = (sxy / sxx / 2.0) * (lit(1.0) - col("w_pow")) / alpha
    joined.select(col("k").as(keyCol), col("n").as("n_points"),
      round(col("level"), 6).as("level_6"),
      slope.as("slope"),
      round(when(sxx > 0, col("level") + drift)
        .otherwise(col("level")), 6).as("forecast_6"))
  }
}
