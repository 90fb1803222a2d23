package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the event log — the streaming side
  * of the engine. Batch mirrors (`q_events_hourly` / `q_events_sessionize`)
  * are oracle-checked; these run the same logic incrementally with
  * watermarks and state stores (the 100 TB path: partition state by user,
  * shuffle once, RocksDB state backend in production).
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Exact epoch MICROS of a Timestamp. `getTime` alone truncates to
    * milliseconds, which made streaming session boundaries diverge from
    * the batch operators' `unix_micros` on sub-ms event data (caught by
    * the batch/stream equivalence test on the real events table); the
    * sub-second field carries the full precision in `getNanos`.
    */
  private[graft] def tsUs(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  case class SessionState(startUs: Long, lastUs: Long, nEvents: Int)

  case class Session(user_id: Long, start_us: Long, n_events: Int, duration_us: Long)

  /** Watermarked tumbling-window aggregation (streaming mirror of
    * `Events.hourlyAgg`): 1-hour windows, 2-hour lateness bound.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Native session-window aggregation — the DECLARATIVE counterpart of
    * [[sessionize]] (flatMapGroupsWithState): `session_window` lets the
    * state store merge/extend windows itself, so the operator gets
    * watermark-driven eviction, AQE-planned shuffles, and RocksDB state
    * without custom state code. Same 30-min gap; StreamingSpec proves the
    * two formulations emit identical sessions on the same data. Prefer
    * this form unless per-event custom state is genuinely needed — it is
    * the one Catalyst can reason about.
    */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("start_ts"),
        col("session_window.end").as("end_ts"),
        col("n_events"))

  /** Sliding (hopping) window aggregation: 10-minute windows every 5
    * minutes — each event contributes to exactly windowDuration/slide
    * windows (2 here; conservation spec-asserted). The smoothing view a
    * rate dashboard reads.
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n_events"))

  /** Chained time-window aggregation (Spark 3.4+): a second windowed
    * aggregate over `window_time()` of the first — hourly counts re-rolled
    * to a daily MAX hourly rate, both tiers incremental and
    * watermark-correct in ONE streaming query. Before window_time this
    * needed two queries glued by a sink.
    */
  def chainedWindowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(window(window_time(col("window")), "1 day"), col("event_type"))
      .agg(max(col("n_events")).as("max_hourly"))
      .select(col("window.start").as("day_start"), col("event_type"), col("max_hourly"))

  /** Streaming dedup — drops replayed events (same event_id) with bounded
    * state: the watermark ages keys out of the state store, so memory stays
    * proportional to the lateness bound, not the stream history. The
    * streaming mirror of `Dedup.exactHash`.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join — purchases attributed to a click by the
    * same user within 30 minutes. Watermarks on both sides + the time-range
    * condition bound the join state.
    */
  def clickAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
      expr("""c_user = p_user AND
              purchase_ts >= click_ts AND
              purchase_ts <= click_ts + INTERVAL 30 MINUTES"""))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"), col("value"))
  }

  /** Stream-stream LEFT OUTER attribution: every click emits — matched
    * purchases as soon as they arrive, unmatched clicks with NULL purchase
    * columns once the watermark proves no in-window purchase can still
    * come. The outer side is what makes funnel analysis honest (drop-offs
    * are rows, not absences); state stays bounded by watermark + interval
    * exactly as in the inner join.
    */
  def clickAttributionOuter(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
      expr("""c_user = p_user AND
              purchase_ts >= click_ts AND
              purchase_ts <= click_ts + INTERVAL 30 MINUTES"""),
      "leftOuter")
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("value"))
  }

  /** Stream-static enrichment: the event stream joined to a batch dimension
    * (customer → nation). The static side is planned per micro-batch, so a
    * dimension refresh is picked up without restarting the query; Spark
    * broadcasts it at dim sizes — the streaming ETL join that needs no
    * watermark because the static side never ages.
    */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
        customers.select(col("c_custkey"), col("c_nationkey")),
        events("user_id") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))

  /** Idempotent batch sink for foreachBatch: writes each micro-batch to
    * `basePath/batch=<id>`, skipping batch ids that already exist — the
    * exactly-once file-sink recipe for when the target system has no
    * transactional sink. On failure/replay Spark re-offers the same
    * batchId with the same data; the existence check makes the replay a
    * no-op, so downstream readers never see duplicates.
    */
  def idempotentParquetSink(basePath: String)(batch: DataFrame, batchId: Long): Unit = {
    val dir = new org.apache.hadoop.fs.Path(s"$basePath/batch=$batchId")
    val fs = dir.getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) batch.write.mode("errorifexists").parquet(dir.toString)
  }

  case class FunnelState(viewUs: Long, clickUs: Long)

  case class StageAdvance(user_id: Long, stage: String, at_us: Long)

  /** q (Σx²) is a BigInt kept as its decimal string: x·x overflows Long
    * once an hour holds ≳3·10⁹ events and Q accumulates across hours, so
    * the second moment needs true 128-bit+ state. n and s stay Long —
    * their ceilings (2⁶³ observed hours / total events per type) are
    * beyond any real stream.
    */
  case class HourMoments(curHourEpoch: Long, curCount: Long,
      n: Long, s: Long, q: String)

  case class HourAnomaly(event_type: String, hour_epoch: Long,
      n_events: Long, n_hours: Long)

  /** Streaming 3σ anomaly detection — the incremental mirror of batch
    * `Events.anomaly`: per event type, maintain exact integer moments
    * (n, S=Σx, Q=Σx²) over COMPLETED hours and, the moment a later event
    * closes an hour bucket, test its count with the same sqrt-free
    * integer inequality (x·n−S)² > 9·(Q·n−S²) in BigInt — Q is STORED as
    * a BigInt (decimal string in state), so neither the x·x accumulation
    * nor the test has a magnitude ceiling — an alert fires one event
    * after the hour ends, not next nightly batch.
    *
    * State is ONE tiny record per event type (current bucket + three
    * moments), keyed by type — the state store is bounded by the type
    * cardinality forever, no timeout needed. Within a micro-batch rows
    * sort by event time so buckets close in order; cross-batch lateness
    * is bounded by the watermark (an event older than the closed bucket
    * is dropped, the streaming trade the batch op doesn't have). Hours
    * with zero events contribute nothing to the moments (observed-hours
    * statistics, matching the batch op).
    */
  def anomalyStream(events: Dataset[Event], minHours: Int = 4): Dataset[HourAnomaly] = {
    import events.sparkSession.implicits._

    def step(tpe: String, rows: Iterator[Event],
        state: GroupState[HourMoments]): Iterator[HourAnomaly] = {
      val out = scala.collection.mutable.ListBuffer[HourAnomaly]()
      var st = state.getOption.getOrElse(HourMoments(-1L, 0L, 0L, 0L, "0"))
      def close(): Unit = {
        val x = st.curCount
        val qB = BigInt(st.q)
        if (st.n >= minHours) {
          val lhs = (BigInt(x) * st.n - st.s).pow(2)
          val rhs = BigInt(9) * (qB * st.n - BigInt(st.s) * st.s)
          if (lhs > rhs) out += HourAnomaly(tpe, st.curHourEpoch, x, st.n)
        }
        st = HourMoments(-1L, 0L, st.n + 1, st.s + x,
          (qB + BigInt(x) * BigInt(x)).toString)
      }
      rows.toSeq.sortBy(e => (tsUs(e.ts), e.event_id)).foreach { e =>
        val hourEpoch = (tsUs(e.ts) / 3600000000L) * 3600L
        if (st.curHourEpoch < 0)
          st = st.copy(curHourEpoch = hourEpoch, curCount = 1L)
        else if (hourEpoch == st.curHourEpoch)
          st = st.copy(curCount = st.curCount + 1L)
        else if (hourEpoch > st.curHourEpoch) {
          close()
          st = st.copy(curHourEpoch = hourEpoch, curCount = 1L)
        } // else: older than the closed bucket -> watermark-bounded drop
      }
      state.update(st)
      out.iterator
    }

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(step)
  }

  /** Stateful streaming funnel via flatMapGroupsWithState — the incremental
    * mirror of batch `Events.funnel`: per user, the first view opens the
    * funnel, the first click within 24h of that view advances it, the first
    * purchase within 24h of that click completes it. A StageAdvance row is
    * emitted the moment each stage is reached, so downstream conversion
    * dashboards update per micro-batch instead of per nightly batch job.
    *
    * State is ONE tiny record per in-flight user, keyed by user_id (the
    * same one-shuffle layout as sessionize); a completed funnel removes its
    * state, and an event-time timeout at the current stage's 24h deadline
    * removes dead funnels, so the state store stays bounded by the number
    * of users active inside a 24h horizon — never stream history. Within a
    * micro-batch, rows sort by event time, so intra-batch disorder cannot
    * mis-order stages; cross-batch lateness is bounded by the watermark.
    */
  def funnelStream(events: Dataset[Event], windowUs: Long = 86400000000L): Dataset[StageAdvance] = {
    import events.sparkSession.implicits._

    def advance(userId: Long, rows: Iterator[Event],
        state: GroupState[FunnelState]): Iterator[StageAdvance] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val out = scala.collection.mutable.ListBuffer[StageAdvance]()
      var s = state.getOption.getOrElse(FunnelState(-1L, -1L))
      var done = false
      rows.toSeq.sortBy(e => (tsUs(e.ts), e.event_id)).foreach { e =>
        val tUs = tsUs(e.ts)
        if (!done) e.event_type match {
          case "view" if s.viewUs < 0 =>
            s = s.copy(viewUs = tUs)
            out += StageAdvance(userId, "view", tUs)
          case "click" if s.viewUs >= 0 && s.clickUs < 0 &&
              tUs > s.viewUs && tUs <= s.viewUs + windowUs =>
            s = s.copy(clickUs = tUs)
            out += StageAdvance(userId, "click", tUs)
          case "purchase" if s.clickUs >= 0 &&
              tUs > s.clickUs && tUs <= s.clickUs + windowUs =>
            out += StageAdvance(userId, "purchase", tUs)
            done = true
          case _ => ()
        }
      }
      if (done || (s.viewUs < 0)) state.remove()
      else {
        state.update(s)
        val deadlineUs = (if (s.clickUs >= 0) s.clickUs else s.viewUs) + windowUs
        state.setTimeoutTimestamp(deadlineUs / 1000L)
      }
      out.iterator
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(advance)
  }

  /** Stateful sessionization via flatMapGroupsWithState (streaming mirror of
    * `Events.sessionize`): 30-min inactivity gap, event-time timeout closes
    * sessions once the watermark passes start+gap.
    */
  case class Burst(user_id: Long, minute_epoch: Long, n_events: Long)

  /** Per-user rate-breach detector on `transformWithState` — Spark 4's
    * arbitrary-state API (StatefulProcessor + typed ValueState), which
    * runs only on the RocksDB state store provider, i.e. the production
    * state backend. Flags a user the moment their event count within a
    * tumbling minute crosses `maxPerMinute`, emitting exactly ONE row per
    * (user, minute) breach — the crossing event, not every subsequent one
    * — so downstream throttling isn't itself flooded. State is a single
    * (minute, count) pair per user, keyed by user_id (the same
    * one-shuffle layout as sessionize); a minute rollover overwrites in
    * place, so the store is bounded by distinct active users regardless
    * of stream length. Within a micro-batch rows sort by exact event
    * micros; cross-batch disorder is watermark-bounded like the other
    * mirrors.
    */
  private class BurstDetector(maxPerMinute: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, Burst] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoders, streaming}
    @transient private var st: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("minuteCount",
        Encoders.product[(Long, Long)], TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[Burst] = {
      val out = scala.collection.mutable.ListBuffer[Burst]()
      var cur = if (st.exists()) st.get() else (-1L, 0L)
      rows.toSeq.sortBy(e => (tsUs(e.ts), e.event_id)).foreach { e =>
        val m = tsUs(e.ts) / 60000000L
        if (m != cur._1) cur = (m, 0L)
        cur = (cur._1, cur._2 + 1L)
        if (cur._2 == maxPerMinute + 1) out += Burst(user, m * 60L, cur._2)
      }
      st.update(cur)
      out.iterator
    }
  }

  def burstStream(events: Dataset[Event], maxPerMinute: Long = 10L): Dataset[Burst] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .transformWithState(new BurstDetector(maxPerMinute),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class Milestone(user_id: Long, completed_us: Long, n_tracked_events: Long)

  /** Unordered-completion (cohort-qualification) detector on
    * `transformWithState` with typed MapState — the API's keyed-map
    * state primitive, RocksDB-backed. Emits exactly ONE row per user,
    * the moment the user has performed ALL tracked event types in any
    * order (the unordered complement of the ordered stateful funnel):
    * completed_us is the event that supplied the last missing type,
    * n_tracked_events counts tracked-type events seen up to and
    * including it. Per-user state is one map entry per tracked type
    * (bounded by |steps|, not stream length); the already-emitted case
    * costs one containsKey probe per event. Same one-shuffle user_id
    * keying and watermark discipline as the other mirrors.
    *
    * Batch equivalence (asserted in StreamingSpec): completed_us =
    * max over steps of the per-step FIRST event time, for users whose
    * step set is complete.
    */
  private class MilestoneDetector(steps: Seq[String])
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, Milestone] {
    import org.apache.spark.sql.streaming.{MapState, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders
    @transient private var counts: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("typeCounts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[Milestone] = {
      val out = scala.collection.mutable.ListBuffer[Milestone]()
      rows.toSeq.sortBy(e => (tsUs(e.ts), e.event_id)).foreach { e =>
        if (steps.contains(e.event_type) && !counts.containsKey(DoneKey)) {
          val prev =
            if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
          counts.updateValue(e.event_type, prev + 1L)
          if (prev == 0L && steps.forall(counts.containsKey)) {
            out += Milestone(user, tsUs(e.ts),
              steps.map(counts.getValue).sum)
            counts.updateValue(DoneKey, 1L)
          }
        }
      }
      out.iterator
    }
  }
  private val DoneKey = " done"

  case class ErrorContext(user_id: Long, error_event_id: Long, error_us: Long,
      context_ids: Seq[Long])

  /** Error-context capture on `transformWithState` typed ListState — the
    * fourth state primitive (after ValueState, MapState, timers): when a
    * user emits an `error` event, attach the event_ids of the ≤ 3
    * events that PRECEDED it (the replay breadcrumb an on-call debugger
    * wants), maintained as a bounded ListState ring buffer. `put`
    * rewrites the trimmed window so state per user is ≤ 3 rows forever —
    * the pattern for any "last N per key" stream join without keeping
    * the whole history.
    */
  private class ErrorContextCapture
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, ErrorContext] {
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders
    @transient private var recent: ListState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[(Long, Long)]("recent",
        Encoders.product[(Long, Long)], TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[ErrorContext] = {
      val out = scala.collection.mutable.ListBuffer[ErrorContext]()
      var buf = if (recent.exists()) recent.get().toList else Nil
      rows.toSeq.sortBy(e => (tsUs(e.ts), e.event_id)).foreach { e =>
        if (e.event_type == "error")
          out += ErrorContext(user, e.event_id, tsUs(e.ts), buf.map(_._1))
        buf = (buf :+ (e.event_id, tsUs(e.ts))).takeRight(3)
      }
      recent.put(buf.toArray)
      out.iterator
    }
  }

  def errorContextStream(events: Dataset[Event]): Dataset[ErrorContext] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .transformWithState(new ErrorContextCapture,
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class Dormant(user_id: Long, last_seen_us: Long, alert_at_ms: Long)

  case class Bar(hour_epoch: Long, n_events: Long, open_micro: Long,
      high_micro: Long, low_micro: Long, close_micro: Long, volume_micro: Long)

  // public like SessionState: the product encoder's generated code must
  // construct it from a stock session's codegen classloader
  case class BarState(openTs: Long, openId: Long, openVq: Long,
      closeTs: Long, closeId: Long, closeVq: Long,
      high: Long, low: Long, n: Long, volume: Long)

  /** Streaming OHLC bar builder on `transformWithState` — the streaming
    * twin of [[graft.operators.Events.ohlc]], and the everything-at-once
    * exercise of the arbitrary-state API: ValueState accumulates the bar
    * (open/close picked by the exact (ts, event_id) order, late
    * in-watermark rows INCLUDED — arrival order never decides a bar), an
    * EVENT-TIME timer at hour-end + watermark closes and emits it exactly
    * once, state clears on emit so store size is O(open hours), not
    * O(history). StreamingSpec proves batch ≡ stream on the same rows —
    * the property that makes a lambda architecture collapse into one
    * code path.
    */
  private class OhlcBarBuilder
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, Bar] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var bar: ValueState[BarState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bar = getHandle.getValueState[BarState]("bar",
        Encoders.product[BarState], TTLConfig.NONE)
    override def handleInputRows(hourEpoch: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[Bar] = {
      val existed = bar.exists()
      var s = if (existed) bar.get() else null
      rows.foreach { e =>
        val t = tsUs(e.ts)
        val vq = math.round(e.value * 1000000.0)
        s = if (s == null)
          BarState(t, e.event_id, vq, t, e.event_id, vq, vq, vq, 1L, vq)
        else {
          val isOpen = t < s.openTs || (t == s.openTs && e.event_id < s.openId)
          val isClose = t > s.closeTs || (t == s.closeTs && e.event_id > s.closeId)
          BarState(
            if (isOpen) t else s.openTs,
            if (isOpen) e.event_id else s.openId,
            if (isOpen) vq else s.openVq,
            if (isClose) t else s.closeTs,
            if (isClose) e.event_id else s.closeId,
            if (isClose) vq else s.closeVq,
            math.max(s.high, vq), math.min(s.low, vq),
            s.n + 1L, s.volume + vq)
        }
      }
      bar.update(s)
      // bar closes when the watermark passes the end of ITS hour; the
      // timer is registered once, with the bar's first event
      if (!existed) getHandle.registerTimer((hourEpoch + 3600L) * 1000L)
      Iterator.empty
    }
    override def handleExpiredTimer(hourEpoch: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Bar] = {
      val s = bar.get()
      bar.clear()
      Iterator.single(Bar(hourEpoch, s.n, s.openVq, s.high, s.low,
        s.closeVq, s.volume))
    }
  }

  def ohlcStream(events: Dataset[Event],
      delay: String = "10 minutes"): Dataset[Bar] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", delay)
      .groupByKey(e => tsUs(e.ts) / 3600000000L * 3600L)
      .transformWithState(new OhlcBarBuilder,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Dormancy (churn) alerting on `transformWithState` EVENT-TIME TIMERS
    * — the third leg of the Spark 4 arbitrary-state API after ValueState
    * ([[burstStream]]) and MapState ([[milestoneStream]]): a user who
    * goes quiet for `quietUs` of event time gets exactly one alert, fired
    * by the state store's timer machinery when the WATERMARK passes
    * last_seen + quiet — not by polling and not by piggybacking on the
    * user's own (absent, that's the point) traffic. Each new event
    * deletes the pending timer and registers the pushed-back one, so a
    * returning user cancels their alert; state is one (lastSeen) value +
    * one timer per user.
    */
  private class DormancyDetector(quietUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, Dormant] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var lastSeen: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastSeen = getHandle.getValueState[Long]("lastSeen",
        Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[Dormant] = {
      val maxUs = rows.map(e => tsUs(e.ts)).max
      if (lastSeen.exists()) {
        val prev = lastSeen.get()
        if (maxUs > prev) {
          getHandle.deleteTimer((prev + quietUs + 999L) / 1000L)
          lastSeen.update(maxUs)
          getHandle.registerTimer((maxUs + quietUs + 999L) / 1000L)
        }
      } else {
        lastSeen.update(maxUs)
        getHandle.registerTimer((maxUs + quietUs + 999L) / 1000L)
      }
      Iterator.empty
    }
    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Dormant] = {
      val out = Iterator.single(
        Dormant(user, lastSeen.get(), info.getExpiryTimeInMs))
      lastSeen.clear()
      out
    }
  }

  def dormancyStream(events: Dataset[Event],
      quietUs: Long = 3600L * 1000000L): Dataset[Dormant] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new DormancyDetector(quietUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  def milestoneStream(events: Dataset[Event],
      steps: Seq[String] = Seq("signup", "view", "purchase")): Dataset[Milestone] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .transformWithState(new MilestoneDetector(steps),
        TimeMode.EventTime(), OutputMode.Append())
  }

  def sessionize(events: Dataset[Event], gapUs: Long = 1800L * 1000000L): Dataset[Session] = {
    import events.sparkSession.implicits._

    def updateState(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      val closed = scala.collection.mutable.ListBuffer[Session]()
      if (state.hasTimedOut) {
        state.getOption.foreach { s =>
          closed += Session(userId, s.startUs, s.nEvents, s.lastUs - s.startUs)
        }
        state.remove()
      } else {
        val sorted = rows.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
        var cur = state.getOption
        sorted.foreach { e =>
          val tUs = tsUs(e.ts)
          cur match {
            case Some(s) if tUs - s.lastUs <= gapUs =>
              cur = Some(s.copy(lastUs = tUs, nEvents = s.nEvents + 1))
            case Some(s) =>
              closed += Session(userId, s.startUs, s.nEvents, s.lastUs - s.startUs)
              cur = Some(SessionState(tUs, tUs, 1))
            case None =>
              cur = Some(SessionState(tUs, tUs, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // ceil to ms: a floor'd timeout can fire up to 1 ms before the
          // gap truly elapses on sub-ms data, closing a session the batch
          // operator would have extended
          state.setTimeoutTimestamp((s.lastUs + gapUs + 999L) / 1000L)
        }
      }
      closed.iterator
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateState)
  }
}
