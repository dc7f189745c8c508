package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization + windowed aggregation (SURVEY.md §2.F1-F2) —
  * the batch form; streaming equivalents live in graft.streaming.
  */
object Sessions {

  /** F1: gap-based sessionization. Two windows over one shuffle on the
    * user key: a lag to flag gaps > `gapSeconds`, then a running count
    * of flags as the per-user session index. Timestamps are exposed as
    * epoch micros (engine-portable integers).
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val us = unix_micros(col(tsCol))
    val prevUs = lag(us, 1).over(byUser)
    val newSession = when(prevUs.isNull ||
      us - prevUs > gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("__new", newSession)
      .withColumn("session_idx",
        sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__new")
  }

  /** F1 rollup: one row per session with span + volume. */
  def sessionSummary(events: DataFrame, userCol: String, tsCol: String,
                     valueCol: String, gapSeconds: Long): DataFrame =
    sessionize(events, userCol, tsCol, gapSeconds)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"),
        round(sum(col(valueCol)), 2).as("total_value"))

  /** E117: conversation QC stats — the per-dialogue screening table
    * an SFT / chat-transcript curation pass runs before training:
    * turn count, per-role balance, role-ALTERNATION rate (a dialogue
    * that never alternates is a monologue or a log), mean inter-turn
    * gap, and total payload length — the "is this transcript a usable
    * training conversation" features, over a generic
    * (conversation, ts, role, payload) shape.
    *
    * Exactness: counts and byte lengths exact longs; alternation =
    * #(consecutive pairs with different role) vs n−1 and the mean gap
    * are exact floor-div micro-units / integer µs. One keyed window
    * (lag over ts, event-id tie-broken) + one keyed agg — a single
    * conversation-key shuffle, no collect_list payload assembly.
    */
  def conversationStats(events: DataFrame, convCol: String,
                        tsCol: String, tieCol: String, roleCol: String,
                        payloadCol: String): DataFrame = {
    val w = Window.partitionBy(col(convCol))
      .orderBy(col(tsCol), col(tieCol))
    val turns = events.select(col(convCol), col(tsCol), col(tieCol),
        col(roleCol).as("role"),
        coalesce(length(col(payloadCol)), lit(0)).cast("long")
          .as("plen"))
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("prev_us", lag(unix_micros(col(tsCol)), 1).over(w))
    turns.groupBy(col(convCol)).agg(
      count(lit(1)).as("n_turns"),
      countDistinct(col("role")).as("n_roles"),
      sum(col("plen")).as("payload_chars"),
      sum(when(col("prev_role").isNotNull &&
        col("role") =!= col("prev_role"), 1L).otherwise(0L))
        .as("n_alternations"),
      sum(when(col("prev_us").isNotNull,
        unix_micros(col(tsCol)) - col("prev_us")).otherwise(0L))
        .as("gap_us_total"))
      .select(col(convCol), col("n_turns"), col("n_roles"),
        col("payload_chars"), col("n_alternations"),
        when(col("n_turns") > 1,
          expr("n_alternations * 1000000 div (n_turns - 1)"))
          .as("alternation_micro"),
        when(col("n_turns") > 1,
          expr("gap_us_total div (n_turns - 1)")).as("mean_gap_us"))
  }

  /** F16: top-k session paths — the product-analytics "user flows"
    * view: the ordered event-type sequence of every session, counted
    * across sessions, top k by frequency.
    *
    * Scale shape: rides sessionize's single user-key shuffle; each
    * session's path assembles in ONE groupBy — `collect_list` order is
    * partition-dependent, so the collected (us, type) structs are
    * sorted IN-ROW (`sort_array`) before joining, making the path a
    * pure function of the data. Path counting is a keyed agg over
    * path-cardinality rows, and the final top-k is `orderBy.limit` =
    * TakeOrderedAndProject (per-partition heaps, never a global sort).
    * Ties at the boundary break deterministically (count desc, path
    * asc — a strict total order since paths are grouped).
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               typeCol: String, gapSeconds: Long, k: Int): DataFrame =
    sessionize(events, userCol, tsCol, gapSeconds)
      .groupBy(col(userCol), col("session_idx"))
      .agg(sort_array(collect_list(struct(
        unix_micros(col(tsCol)).as("us"),
        col(typeCol).cast("string").as("t")))).as("__evs"))
      .select(array_join(transform(col("__evs"), e => e("t")), ">")
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)

  /** F18: state-change islands (run-length encoding of a per-key state
    * timeline): contiguous runs of the SAME state collapse to one row
    * with span + volume — device up/down phases, order-status
    * stretches, user-mode episodes. The state-conditioned sibling of
    * gap-based sessionization (a new session starts on TIME distance,
    * a new run starts on STATE change), same plan: one keyed
    * shuffle+sort carrying a lag pass and a running flag-sum, then the
    * per-run aggregate — O(1) window state, no self-join (the naive
    * "find run boundaries by joining neighbors" is quadratic per key).
    * Ties on the timestamp break by `tieCol`; timestamps surface as
    * epoch micros (engine-portable integers).
    *
    * @return (key, run_id, state, n_events, start_us, end_us), run_id
    *         1-based per key in timeline order.
    */
  def stateRuns(events: DataFrame, keyCol: String, tsCol: String,
                tieCol: String, stateCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val us = unix_micros(col(tsCol))
    val prev = lag(col(stateCol), 1).over(byKey)
    val change = when(prev.isNull || prev =!= col(stateCol), 1L)
      .otherwise(0L)
    events
      .withColumn("__chg", change)
      .withColumn("run_id", sum(col("__chg")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("run_id"), col(stateCol).as("state"))
      .agg(count(lit(1)).as("n_events"),
        min(us).as("start_us"), max(us).as("end_us"))
  }

  /** E77: gapped sequential-pattern counts (PrefixSpan-lite, length-2)
    * — for every ordered event pair within a user's timeline at
    * positional gap 1..maxGap, the pattern support in pair
    * occurrences AND distinct users. q_transitions counts ADJACENT
    * steps (a Markov chain); this counts skip-gram subsequences, the
    * signal behind "users who view X eventually buy Y" even with
    * noise events between.
    *
    * One window per user for positions, then a self-equi-join ON THE
    * USER KEY with the bounded positional predicate — candidate rows
    * per user are ≤ n·maxGap, never n², and the join shuffles on
    * user_id (the natural 100 TB partitioning). Exact counts.
    *
    * @return (e_a, e_b, gap-bounded support): n_pairs, n_users.
    */
  def gappedPairs(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, tieCol: String, maxGap: Int): DataFrame = {
    require(maxGap >= 1, s"maxGap must be ≥ 1: $maxGap")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val pos = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      row_number().over(w).as("rn"))
    val a = pos.toDF("u", "ta", "ra")
    val b = pos.toDF("u", "tb", "rb")
    a.join(b, Seq("u"))
      .filter(col("rb") - col("ra") >= 1 &&
        col("rb") - col("ra") <= maxGap)
      .groupBy(col("ta").as("e_a"), col("tb").as("e_b"))
      .agg(count(lit(1)).as("n_pairs"),
        count_distinct(col("u")).as("n_users"))
  }

  /** F2: tumbling-window aggregate (batch form of the streaming windowed
    * agg); hour bucket exposed as epoch micros.
    */
  def hourlyAgg(events: DataFrame, tsCol: String, typeCol: String,
                valueCol: String): DataFrame =
    events.groupBy(
        unix_micros(date_trunc("hour", col(tsCol))).as("hour_us"),
        col(typeCol))
      .agg(count(lit(1)).as("n"), round(sum(col(valueCol)), 2).as("total"))
}
