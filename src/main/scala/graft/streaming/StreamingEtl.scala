package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming incremental processing (SURVEY.md §2.F3-F4, G2).
  *
  * The reference runs its pipeline on a cron-style scheduler
  * (main.py:321 BankingBatchScheduler: twice-daily/daily batch windows,
  * concurrency lock, catch-up run at startup). Spark-natively that whole
  * apparatus IS Structured Streaming: `Trigger.AvailableNow` = one
  * catch-up batch then exit (the scheduled run); checkpointing = the
  * concurrency lock + exactly-once bookkeeping; a file-source stream =
  * the "which files are new" tracker (extract.py's etl_file_tracker),
  * maintained by the engine.
  */
object StreamingEtl {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)

  final case class SessionOut(user_id: Long, session_start_us: Long,
                              session_end_us: Long, n_events: Long,
                              total_value: Double)

  final case class SessionState(startUs: Long, lastUs: Long,
                                n: Long, total: Double)

  /** F3: streaming cleaned windowed aggregation — watermarked tumbling
    * window per event type. Works on any streaming DataFrame with
    * (ts, event_type, value); append mode emits finalized windows only.
    */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total"))

  /** F12: gap-based session aggregation via the NATIVE
    * `session_window` — the declarative counterpart of the
    * flatMapGroupsWithState sessionizer below: Catalyst merges
    * overlapping/adjacent per-event windows (gap timeout) inside its
    * streaming session-aggregation operator, state is managed by the
    * engine (watermark-evicted), and the same expression works in
    * BATCH queries unchanged. Prefer this rung when per-session logic
    * is pure aggregation; drop to flatMapGroupsWithState only for
    * custom state machines (emit-mid-session, enrichment, timeouts
    * beyond gap semantics).
    */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
                       watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** F4: stateful gap-based sessionization with
    * flatMapGroupsWithState — per-user state, processing-time timeout;
    * emits a session when the gap exceeds `gapSeconds`.
    * State is O(active users), partitioned by user — the streaming
    * equivalent of operators.Sessions.sessionize.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapSeconds: Long): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var cur = state.getOption
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      sorted.foreach { e =>
        val us = e.ts.getTime * 1000L
        cur match {
          case Some(s) if us - s.lastUs <= gapUs =>
            cur = Some(s.copy(lastUs = us, n = s.n + 1,
              total = s.total + e.value))
          case Some(s) =>
            out += SessionOut(userId, s.startUs, s.lastUs, s.n, s.total)
            cur = Some(SessionState(us, us, 1L, e.value))
          case None =>
            cur = Some(SessionState(us, us, 1L, e.value))
        }
      }
      cur.foreach(state.update)
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** F24: gap sessionization on Spark 4's `transformWithState` — the
    * NEW arbitrary-state API (SPARK-49825 line) that replaces
    * flatMapGroupsWithState: typed named state handles instead of one
    * opaque blob, first-class EVENT-TIME timers instead of
    * processing-time timeouts, and composable state variables.
    * Compared with [[sessionize]] (kept as the classic-API form):
    *
    *  - a session also closes when the WATERMARK passes last event +
    *    gap, via a registered event-time timer — no waiting for the
    *    user's next event to flush (flatMapGroupsWithState's
    *    processing-time timeout can fire early/late under replay;
    *    event-time timers replay deterministically);
    *  - state lives in a named ValueState handle the runtime can
    *    TTL/evolve independently — the production state-management
    *    story at 100 TB key cardinality (RocksDB-backed).
    */
  private class SessionProcessor(gapSeconds: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, SessionOut] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig,
      TimeMode, TimerValues, ValueState}
    @transient private var st: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[SessionOut] = {
      val gapUs = gapSeconds * 1000000L
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var cur = Option(st.get())
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      sorted.foreach { e =>
        val us = e.ts.getTime * 1000L
        cur match {
          case Some(s) if us - s.lastUs <= gapUs =>
            cur = Some(s.copy(lastUs = us, n = s.n + 1,
              total = s.total + e.value))
          case Some(s) =>
            out += SessionOut(key, s.startUs, s.lastUs, s.n, s.total)
            cur = Some(SessionState(us, us, 1L, e.value))
          case None =>
            cur = Some(SessionState(us, us, 1L, e.value))
        }
      }
      cur.foreach { s =>
        st.update(s)
        // one live timer per key at (last event + gap); stale timers
        // are ignored in handleExpiredTimer by re-checking the state
        getHandle.registerTimer(s.lastUs / 1000L + gapSeconds * 1000L)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionOut] = {
      val s = st.get()
      if (s == null) Iterator.empty
      else if (info.getExpiryTimeInMs >=
          s.lastUs / 1000L + gapSeconds * 1000L) {
        st.clear()
        Iterator.single(SessionOut(key, s.startUs, s.lastUs, s.n, s.total))
      } else Iterator.empty // stale timer from a superseded session
    }
  }

  def sessionizeTws(spark: SparkSession, events: Dataset[Event],
                    gapSeconds: Long,
                    watermarkDelay: String = "10 seconds")
      : Dataset[SessionOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** F6 (streaming form): per-key EWMA over an unbounded stream —
    * mapGroupsWithState carrying (ewma, n) per key, the streaming
    * twin of operators.TimeSeries.ewmaPerKey. Emits the updated
    * running value per key per micro-batch (Update mode). State is
    * O(keys), 16 bytes each; the same recurrence that needs a
    * mapPartitions scan in batch needs only a scalar carry here
    * because the stream arrives in order per micro-batch.
    */
  final case class EwmaState(ewma: Double, n: Long)
  final case class EwmaOut(user_id: Long, n_events: Long, ewma: Double)

  def ewmaStream(spark: SparkSession, events: Dataset[Event],
                 alpha: Double): Dataset[EwmaOut] = {
    import spark.implicits._
    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[EwmaState]): EwmaOut = {
      // batch order: (ts, event_id) — same total order as the batch op
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var cur = state.getOption
      sorted.foreach { e =>
        cur = Some(cur match {
          case Some(s) => EwmaState(e.value * alpha + s.ewma * (1 - alpha),
            s.n + 1)
          case None => EwmaState(e.value, 1L)
        })
      }
      cur.foreach(state.update)
      EwmaOut(userId, cur.get.n, cur.get.ewma)
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }

  /** F13-streaming: CUSUM change detection as it should run on a live
    * stream — the batch operator de-recurses the clamp into window
    * algebra (TimeSeries.cusumPerKey), but windows over an unbounded
    * stream are a non-starter, so the streaming twin carries the raw
    * clamped recurrence (4 longs per key) across micro-batches via
    * mapGroupsWithState. Integer cents in, integer state, so the twin
    * is asserted BIT-identical to the batch operator in StreamingSpec
    * — same pairing as ewma/ewmaStream.
    */
  final case class CusumState(sUp: Long, sDn: Long, maxUp: Long,
                              maxDn: Long, nAlarmsUp: Long,
                              nAlarmsDn: Long, n: Long)
  final case class CusumOut(user_id: Long, n: Long, final_up: Long,
                            max_up: Long, n_alarms_up: Long,
                            final_dn: Long, max_dn: Long,
                            n_alarms_dn: Long)

  def cusumStream(spark: SparkSession, events: Dataset[Event],
                  targetCents: Long, allowanceCents: Long,
                  hCents: Long): Dataset[CusumOut] = {
    import spark.implicits._
    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[CusumState]): CusumOut = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var s = state.getOption.getOrElse(
        CusumState(0L, 0L, 0L, 0L, 0L, 0L, 0L))
      sorted.foreach { e =>
        val c = math.floor(e.value * 100 + 0.5).toLong
        val up = math.max(0L, s.sUp + (c - (targetCents + allowanceCents)))
        val dn = math.max(0L, s.sDn + ((targetCents - allowanceCents) - c))
        s = CusumState(up, dn,
          math.max(s.maxUp, up), math.max(s.maxDn, dn),
          s.nAlarmsUp + (if (up > hCents) 1L else 0L),
          s.nAlarmsDn + (if (dn > hCents) 1L else 0L),
          s.n + 1)
      }
      state.update(s)
      CusumOut(userId, s.n, s.sUp, s.maxUp, s.nAlarmsUp,
        s.sDn, s.maxDn, s.nAlarmsDn)
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }

  /** F5: streaming exact dedup — drop events whose key was already seen
    * within the watermark horizon. State is bounded by the watermark
    * (keys older than it are evicted), which is the only way dedup
    * state stays finite on an unbounded 100 TB/day stream.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String], tsCol: String,
                  watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** F6: stream-stream interval join — e.g. attribute each purchase to
    * a click by the same user within the preceding `windowSeconds`.
    * Both sides carry watermarks; the time-bound join condition lets
    * the engine evict state once the interval can no longer match —
    * unbounded-state joins are a non-starter at stream scale.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, watermark: String,
                   windowSeconds: Long): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) <= l(leftTs) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $windowSeconds SECONDS"))
  }

  /** F7: streaming upsert sink — per micro-batch SCD1 merge into a
    * parquet target via foreachBatch (the streaming form of the
    * reference's ON DUPLICATE KEY UPDATE load). Each batch: read
    * current state, upsert (operators.Loads.upsert, batch rows win),
    * atomically swap. At warehouse scale the same foreachBatch body
    * targets a transactional table format; the merge semantics are
    * identical.
    */
  def upsertSink(df: DataFrame, keys: Seq[String], targetPath: String,
                 checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // absence decided by existence check, swap done by rename —
        // a read failure aborts the batch (checkpoint retries it)
        // instead of silently re-initializing the target
        val merged = graft.sources.ParquetIo.readIfExists(spark, targetPath) match {
          case Some(cur) =>
            graft.operators.Loads.upsert(
              cur.withColumn("__v", org.apache.spark.sql.functions.lit(0)),
              batch.withColumn("__v", org.apache.spark.sql.functions.lit(1)),
              keys, "__v").drop("__v")
          case None => batch
        }
        graft.sources.ParquetIo.replace(merged, targetPath)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Exactly-once append sink: foreachBatch + [[graft.sources
    * .BatchLedger]] keyed by the epoch id. Structured Streaming
    * guarantees AT-LEAST-once foreachBatch invocation (an epoch can
    * re-fire after a crash between the batch body and the checkpoint
    * commit); the ledger's batch-id dedup turns that into
    * exactly-once APPENDS — a re-fired epoch is a no-op, a
    * half-published one (crash inside the body) is invisible to
    * [[graft.sources.BatchLedger.read]] until its re-run commits it.
    * The standard epochId-keyed idempotent-sink recipe, with the
    * crash-window analysis actually spec-tested.
    */
  def ledgerSink(df: DataFrame, targetPath: String,
                 checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.sources.BatchLedger.publish(batch.sparkSession, batch,
          targetPath, f"epoch$epochId%012d")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** F3 source side: treat a directory as an unbounded stream of parquet
    * drops — the engine tracks processed files (replacing
    * extract.py:115 etl_file_tracker).
    */
  def parquetStream(spark: SparkSession, path: String,
                    schemaFrom: DataFrame): DataFrame =
    spark.readStream.schema(schemaFrom.schema).parquet(path)

  /** F27: running per-key top-k over an unbounded stream —
    * `transformWithState`'s LIST state exercised for real (F24's
    * ValueState holds one struct; a bounded collection belongs in
    * ListState, not a re-serialized blob): state = the current top-k
    * values per key, merged with each micro-batch's arrivals under
    * (value desc) order and re-capped; the updated top-k is emitted
    * per key per batch (Update mode). State is O(keys·k); no timers,
    * no watermark — pure accumulation, the streaming twin of the
    * TopKBy map-side heap aggregate.
    */
  final case class TopKOut(event_type: String, topk: Seq[Double])

  def topKStream(spark: SparkSession, events: Dataset[Event],
                 k: Int): Dataset[TopKOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.event_type)
      .transformWithState(new TopKProcessor(k), TimeMode.None(),
        OutputMode.Update())
  }

  /** F28: streaming per-key categorical histogram —
    * `transformWithState`'s MAP state, completing the three state
    * faces (F24 ValueState + timers, F27 ListState): per user a
    * MapState[event_type → count] is point-updated for the types
    * arriving in the micro-batch — only TOUCHED entries are read or
    * written (the point of MapState over a re-serialized whole-map
    * ValueState at large per-key cardinality); emits the updated
    * (user, type, n) triples per batch.
    */
  final case class TypeCountOut(user_id: Long, event_type: String, n: Long)

  def typeHistogramStream(spark: SparkSession,
                          events: Dataset[Event]): Dataset[TypeCountOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new TypeHistProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** F33: per-key running event count with state TTL — the state-
    * BUDGET face of `transformWithState` (F24 timers, F27 list, F28
    * map): on an unbounded key space (user ids, session tokens, IPs)
    * un-evicted per-key state grows without bound; `TTLConfig` evicts
    * a key's state `ttl` of processing time after its last update, so
    * steady-state store size is (keys active within one TTL window),
    * not (keys ever seen) — the number a 100 TB/day deployment
    * capacity-plans its state store on. A key that returns after
    * eviction restarts from zero BY CONTRACT (gauge, not ledger —
    * exactly-once counts need the F21 ledger sink instead). TTL
    * requires TimeMode.ProcessingTime.
    */
  final case class GaugeOut(user_id: Long, n: Long)

  def countGaugeTtl(spark: SparkSession, events: Dataset[Event],
                    ttl: java.time.Duration): Dataset[GaugeOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new CountGaugeTtlProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  private class CountGaugeTtlProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, GaugeOut] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues,
      ValueState}
    @transient private var st: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Long]("n", Encoders.scalaLong,
        TTLConfig(ttl))

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[GaugeOut] = {
      // an expired value reads as null through the TTL wrapper — the
      // key restarts from zero without any timer bookkeeping here
      val prev = Option(st.get()).getOrElse(0L)
      val n = prev + rows.size
      st.update(n)
      Iterator.single(GaugeOut(key, n))
    }
  }

  /** F38: streaming PSI drift monitor — the streaming twin of the
    * batch C62 PSI: per key the FIRST `refSize` values freeze into a
    * reference histogram (ValueState), then every micro-batch emits
    * the population-stability index of its own value histogram against
    * that reference — the live "has this segment's distribution moved"
    * alarm a 100 TB/day feed wants per source/segment, with O(keys ·
    * nBins) state regardless of throughput. Add-one smoothing on both
    * sides keeps the ln finite on empty bins; values bin over [0,
    * 100) (the events value range) into `nBins` equal bins.
    */
  final case class PsiRef(bins: Seq[Long], total: Long, frozen: Boolean)
  final case class PsiOut(key: String, n_ref: Long, n_batch: Long,
                          psi_micro: Long)

  def psiDriftStream(spark: SparkSession, events: Dataset[Event],
                     nBins: Int, refSize: Long): Dataset[PsiOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.event_type)
      .transformWithState(new PsiDriftProcessor(nBins, refSize),
        TimeMode.None(), OutputMode.Update())
  }

  private class PsiDriftProcessor(nBins: Int, refSize: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, Event, PsiOut] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode,
      TimerValues, ValueState}
    @transient private var st: ValueState[PsiRef] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[PsiRef]("psi_ref",
        org.apache.spark.sql.Encoders.product[PsiRef], TTLConfig.NONE)

    private def bin(v: Double): Int =
      math.min(nBins - 1, math.max(0, (v * nBins / 100.0).toInt))

    override def handleInputRows(key: String, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[PsiOut] = {
      val vs = rows.map(_.value).toSeq
      val cur = Option(st.get())
        .getOrElse(PsiRef(Seq.fill(nBins)(0L), 0L, frozen = false))
      if (!cur.frozen) {
        // still building the reference: fold this batch in; freeze
        // once enough mass arrived (the tail of the freezing batch is
        // included — a deterministic, documented convention)
        val b = cur.bins.toArray
        vs.foreach(v => b(bin(v)) += 1)
        val total = cur.total + vs.size
        st.update(PsiRef(b.toSeq, total, total >= refSize))
        Iterator.empty
      } else {
        val b = new Array[Long](nBins)
        vs.foreach(v => b(bin(v)) += 1)
        // PSI with add-one smoothing on both histograms
        val refN = cur.total + nBins
        val curN = vs.size.toLong + nBins
        var psi = 0.0
        var i = 0
        while (i < nBins) {
          val pr = (cur.bins(i) + 1).toDouble / refN
          val pc = (b(i) + 1).toDouble / curN
          psi += (pc - pr) * math.log(pc / pr)
          i += 1
        }
        Iterator.single(PsiOut(key, cur.total, vs.size.toLong,
          math.round(psi * 1e6)))
      }
    }
  }

  /** F34: per-key visit gauge in two state-schema VERSIONS — the
    * upgrade story `transformWithState` is sold on: V1 persists
    * (n: Long); V2 adds a field (total: Option[Double]) and must
    * RESTART FROM V1's CHECKPOINT reading old rows with the evolved
    * schema (new field = None). Requires the Avro state encoding
    * (`spark.sql.streaming.stateStore.encodingFormat = avro` — the
    * UnsafeRow encoding is bit-positional and cannot evolve);
    * StreamingSpec performs the live restart.
    */
  final case class VisitV1(n: Long)
  final case class VisitV2(n: Long, total: Option[Double])
  final case class VisitOut(user_id: Long, n: Long, total: Double)

  def visitStreamV1(spark: SparkSession,
                    events: Dataset[Event]): Dataset[VisitOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new VisitV1Processor, TimeMode.None(),
        OutputMode.Update())
  }

  def visitStreamV2(spark: SparkSession,
                    events: Dataset[Event]): Dataset[VisitOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new VisitV2Processor, TimeMode.None(),
        OutputMode.Update())
  }

  private class VisitV1Processor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, VisitOut] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues,
      ValueState}
    @transient private var st: ValueState[VisitV1] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[VisitV1]("visit",
        org.apache.spark.sql.Encoders.product[VisitV1], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[VisitOut] = {
      val prev = Option(st.get()).map(_.n).getOrElse(0L)
      val n = prev + rows.size
      st.update(VisitV1(n))
      Iterator.single(VisitOut(key, n, -1.0))
    }
  }

  private class VisitV2Processor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, VisitOut] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues,
      ValueState}
    @transient private var st: ValueState[VisitV2] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[VisitV2]("visit",
        org.apache.spark.sql.Encoders.product[VisitV2], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[VisitOut] = {
      val es = rows.toSeq
      val prev = Option(st.get()).getOrElse(VisitV2(0L, None))
      // a row written by V1 reads with total = None: the evolved field
      // defaults, the carried count SURVIVES the upgrade
      val n = prev.n + es.size
      val total = prev.total.getOrElse(0.0) + es.map(_.value).sum
      st.update(VisitV2(n, Some(total)))
      Iterator.single(VisitOut(key, n, total))
    }
  }

  private class TypeHistProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, TypeCountOut] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimeMode,
      TimerValues}
    @transient private var st: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[String, Long]("hist", Encoders.STRING,
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[TypeCountOut] = {
      val touched = rows.toSeq.groupBy(_.event_type)
        .map { case (t, es) => t -> es.size.toLong }
      touched.map { case (t, add) =>
        val n = (if (st.containsKey(t)) st.getValue(t) else 0L) + add
        st.updateValue(t, n)
        TypeCountOut(key, t, n)
      }.iterator
    }
  }

  private class TopKProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, Event, TopKOut] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ListState, TTLConfig, TimeMode,
      TimerValues}
    @transient private var st: ListState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[Double]("topk", Encoders.scalaDouble,
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[TopKOut] = {
      val cur = scala.collection.mutable.ArrayBuffer.empty[Double]
      val it = st.get()
      while (it.hasNext) cur += it.next()
      val merged = (cur.toSeq ++ rows.map(_.value))
        .sorted(Ordering[Double].reverse).take(k)
      st.put(merged.toArray)
      Iterator.single(TopKOut(key, merged))
    }
  }
}
