package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom keyed state via flatMapGroupsWithState — the extension point for
  * stream logic that windows/dedup can't express (per-key running
  * aggregates, custom session semantics, CEP-ish detectors).
  *
  * State is explicitly bounded: event-time timeout tied to the watermark
  * purges idle users' state, so the state store scales with ACTIVE keys,
  * not with all keys ever seen — mandatory at 100 TB stream volumes.
  */
object StatefulOps {

  case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class UserState(n: Long, sum: Double, max: Double, maxTsMs: Long)
  case class UserUpdate(user_id: Long, n: Long, sum: Double, max: Double, flagged: Boolean)

  case class KeyedEvent(ts: Timestamp, event_id: Long, user_id: Long, event_type: String)
  case class LastEvent(typ: String, tsMs: Long, eventId: Long)
  case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Streaming twin of the batch q_ev_transitions Markov-bigram query:
    * per-user last-event state (O(1) per ACTIVE user — a single
    * (type, ts, id) triple, purged by the event-time TTL) emits one
    * (from, to) transition per consecutive event pair, bridging
    * micro-batch boundaries through the state; callers aggregate the
    * emitted pairs downstream. Within a micro-batch events sort by
    * (ts, event_id) — the batch query's exact window order — so an
    * in-order (watermark-respecting) feed reproduces the batch
    * transition multiset exactly (pinned in StatefulOpsSpec); an event
    * arriving late AFTER a successor was already consumed transitions
    * from the stored last event instead, the standard append-mode
    * approximation.
    */
  def transitions(spark: SparkSession, events: Dataset[KeyedEvent],
      watermarkDelay: String = "1 hour", ttlMs: Long = 3600000L): Dataset[Transition] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[KeyedEvent], state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var last = state.getOption
            val out = Seq.newBuilder[Transition]
            for (e <- evs) {
              last.foreach(l => out += Transition(user, l.typ, e.event_type))
              last = Some(LastEvent(e.event_type, e.ts.getTime, e.event_id))
            }
            last.foreach { l =>
              state.update(l)
              // same TTL discipline as runningUserStats: anchored to the
              // key's own latest event, clamped above the watermark
              state.setTimeoutTimestamp(
                math.max(l.tsMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  case class EwmaState(lastDay: Long, score: Long, n: Long, maxTsMs: Long)
  case class EwmaUpdate(user_id: Long, last_day: Long, n_events: Long, ewma_q50: Long)

  /** Streaming twin of the batch q_ev_ewma recency-weighted activity
    * counter: per-user exponentially-decayed event count (half-life =
    * 1 day) in the SAME dyadic fixed point — an event Δ whole UTC days
    * before the user's latest event weighs 2^(50−Δ), truncating below
    * the 2^-50 tail. State is TWO longs per active user (anchor day +
    * score; the classic decayed counter S ← (S >> Δ) + 2^50), versus the
    * batch query's corpus-wide horizon scan — O(1) state, O(1) per
    * event, emitted per event in append mode.
    *
    * Semantics vs batch: the ANCHOR here is the user's own latest event
    * day (a stream has no global horizon); rebasing the batch score is
    * `score >> (globalHorizon − last_day)`. In-order feeds reproduce the
    * batch per-event sum exactly while weights stay representable; the
    * one divergence is carry truncation — ≥2^j same-day events whose
    * decayed weights fall below one ulp can leave a carried bit the
    * per-event rule drops (the standard decayed-counter approximation).
    * Late events within the 50-day window fold in at their true decayed
    * weight 2^(50−Δ) without moving the anchor.
    *
    * The TTL is lossless by construction: `ttlMs` defaults to 51 days,
    * and after 50 idle days the score decays to exactly 0 — purged state
    * is state that no longer contributes anything.
    */
  /** One event folded into the dyadic decayed-counter state — shared by the
    * flatMapGroupsWithState and transformWithState twins so the math cannot
    * drift between APIs. UTC day bucket matches the batch query's to_date
    * under the driver's UTC session timezone.
    */
  private def ewmaFold(s: EwmaState, e: KeyedEvent): EwmaState = {
    val d = Math.floorDiv(e.ts.getTime, 86400000L)
    if (s.n == 0L)
      EwmaState(d, 1L << 50, 1L, e.ts.getTime)
    else if (d >= s.lastDay) {
      val shift = d - s.lastDay
      val decayed = if (shift > 50) 0L else s.score >> shift
      EwmaState(d, decayed + (1L << 50), s.n + 1,
        math.max(s.maxTsMs, e.ts.getTime))
    } else { // late event: fold in decayed, anchor unmoved
      val delta = s.lastDay - d
      val w = if (delta > 50) 0L else 1L << (50 - delta)
      EwmaState(s.lastDay, s.score + w, s.n + 1,
        math.max(s.maxTsMs, e.ts.getTime))
    }
  }

  private val EwmaZero = EwmaState(Long.MinValue, 0L, 0L, Long.MinValue)

  def ewmaActivity(spark: SparkSession, events: Dataset[KeyedEvent],
      watermarkDelay: String = "1 hour",
      ttlMs: Long = 51L * 86400000L): Dataset[EwmaUpdate] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[KeyedEvent], state: GroupState[EwmaState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var s = state.getOption.getOrElse(EwmaZero)
            val out = evs.map { e =>
              s = ewmaFold(s, e)
              EwmaUpdate(user, s.lastDay, s.n, s.score)
            }
            state.update(s)
            state.setTimeoutTimestamp(
              math.max(s.maxTsMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** [[ewmaActivity]] on the Spark 4 `transformWithState` API — the
    * successor to flatMapGroupsWithState (SPARK-46815): named state
    * variables with per-variable encoders, explicit event-time TIMERS
    * instead of the single implicit timeout slot, and the RocksDB
    * state-v2 format (callers must run the query with
    * `spark.sql.streaming.stateStore.providerClass =
    * ...state.RocksDBStateStoreProvider` — transformWithState refuses
    * the default HDFS-backed store).
    *
    * Identical semantics to [[ewmaActivity]] — both twins fold through
    * the same [[ewmaFold]], and the spec pins their outputs equal on the
    * same feed. The TTL discipline maps onto timers: each batch
    * re-anchors one event-time timer to the key's own latest event
    * (delete-old + register-new; the registered instant rides in a
    * second state variable so a re-anchored timer's stale firing can be
    * recognized and ignored), and the firing handler clears state —
    * lossless by construction for ttl ≥ 51 days, exactly as before.
    */
  def ewmaActivityTws(spark: SparkSession, events: Dataset[KeyedEvent],
      watermarkDelay: String = "1 hour",
      ttlMs: Long = 51L * 86400000L): Dataset[EwmaUpdate] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new EwmaProcessor(ttlMs), TimeMode.EventTime, OutputMode.Append)
  }

  private class EwmaProcessor(ttlMs: Long)
      extends StatefulProcessor[Long, KeyedEvent, EwmaUpdate] {
    @transient private var state: ValueState[EwmaState] = _
    @transient private var expiry: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      // TTL here is expressed with event-time timers (TTLConfig is
      // processing-time-relative — the wrong clock for replayable feeds)
      state = getHandle.getValueState[EwmaState](
        "ewma", Encoders.product[EwmaState], TTLConfig.NONE)
      expiry = getHandle.getValueState[Long](
        "expiry", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[KeyedEvent],
        tv: TimerValues): Iterator[EwmaUpdate] = {
      val evs = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var s = if (state.exists()) state.get() else EwmaZero
      val out = evs.map { e =>
        s = ewmaFold(s, e)
        EwmaUpdate(user, s.lastDay, s.n, s.score)
      }
      state.update(s)
      val newExpiry = math.max(s.maxTsMs + ttlMs, tv.getCurrentWatermarkInMs + 1)
      if (expiry.exists()) {
        val old = expiry.get()
        if (old != newExpiry) getHandle.deleteTimer(old)
      }
      getHandle.registerTimer(newExpiry)
      expiry.update(newExpiry)
      out.iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[EwmaUpdate] = {
      // only the CURRENT timer purges; a stale timer that survived a
      // re-anchor (e.g. deleted-after-fire races) is ignored
      if (expiry.exists() && expiry.get() == info.getExpiryTimeInMs) {
        state.clear()
        expiry.clear()
      }
      Iterator.empty
    }
  }

  case class SessionState(startMs: Long, lastMs: Long, n: Long, sumCents: Long)
  case class SessionOut(user_id: Long, s_start: Timestamp, s_end: Timestamp,
    n: Long, sum_value: Double)

  /** Streaming sessionization on `transformWithState` — the twin of the
    * batch q_ev_session `session_window` query, and the op whose
    * semantics genuinely NEED the API's event-time timers (the EWMA
    * port's TTL merely purges; a session must EMIT when the watermark
    * passes lastEvent+gap, which only a timer can do — the capability
    * gap the README migration verdict names).
    *
    * Semantics: an event merges into the open session iff its [t, t+gap)
    * window touches or overlaps it — `session_window`'s rule, inclusive
    * at BOTH boundaries (batch merges touching half-open windows: two
    * events exactly gap apart form ONE session, verified empirically, so
    * the backward guard is `t + gap >= start`). A late event STRICTLY
    * more than gap before the session start does NOT extend it backwards
    * (batch would make it a separate session; it emits here as its own
    * already-closed single-event session). A gap-exceeding future event
    * CLOSES the open session (emitting it) and opens a new one; the
    * timer at last+gap closes an idle session once the watermark passes.
    * Emitted windows are [start, last+gap) — exactly `session_window`'s
    * frame, so closed sessions match the batch query row-for-row on an
    * in-order feed (spec-pinned). Residual approximations: an event
    * arriving after its session closed starts fresh, and several
    * too-old late events batch would merge into ONE earlier session
    * emit separately.
    * Values fold as exact integer cents (the batch side's DECIMAL(12,2)
    * discipline), so sums are order-free.
    *
    * State is O(1) per ACTIVE user — one (start, last, n, cents) tuple
    * + one registered-timer slot — and self-purging: every session
    * either closes by gap or by timer, and closing clears it.
    */
  def sessionizeTws(spark: SparkSession, events: Dataset[Event],
      gapMs: Long = 4L * 3600000L,
      watermarkDelay: String = "1 hour"): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs), TimeMode.EventTime, OutputMode.Append)
  }

  private class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, SessionOut] {
    @transient private var state: ValueState[SessionState] = _
    @transient private var expiry: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)
      expiry = getHandle.getValueState[Long](
        "expiry", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def cents(v: Double): Long = Math.round(v * 100.0)

    private def emit(user: Long, s: SessionState): SessionOut =
      SessionOut(user, new Timestamp(s.startMs), new Timestamp(s.lastMs + gapMs),
        s.n, s.sumCents / 100.0)

    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[SessionOut] = {
      val evs = rows.toSeq.sortBy(_.ts.getTime)
      val closed = Seq.newBuilder[SessionOut]
      var cur = if (state.exists()) Some(state.get()) else None
      for (e <- evs) {
        val t = e.ts.getTime
        cur = cur match {
          case None => Some(SessionState(t, t, 1L, cents(e.value)))
          // merge iff the event's [t, t+gap) window TOUCHES-OR-OVERLAPS
          // the open session — session_window's rule merges touching
          // half-open windows on BOTH sides (two events exactly gap
          // apart form ONE batch session), so both bounds are inclusive:
          // forward t <= last+gap, backward t+gap >= start. A late event
          // STRICTLY more than gap before the session start belongs to a
          // separate earlier session
          case Some(s) if t <= s.lastMs + gapMs && t + gapMs >= s.startMs =>
            Some(SessionState(math.min(s.startMs, t), math.max(s.lastMs, t),
              s.n + 1, s.sumCents + cents(e.value)))
          case Some(s) if t + gapMs < s.startMs =>
            // too-old late event: emit it as its own already-closed
            // session [t, t+gap) — the batch answer when it stands alone
            // (further late events near it would merge in batch; that
            // residual is this op's documented append-mode approximation)
            closed += SessionOut(user, new Timestamp(t),
              new Timestamp(t + gapMs), 1L, cents(e.value) / 100.0)
            cur
          case Some(s) => // gap exceeded forward: close, open fresh
            closed += emit(user, s)
            Some(SessionState(t, t, 1L, cents(e.value)))
        }
      }
      cur.foreach { s =>
        state.update(s)
        val newExpiry = math.max(s.lastMs + gapMs, tv.getCurrentWatermarkInMs + 1)
        if (expiry.exists() && expiry.get() != newExpiry)
          getHandle.deleteTimer(expiry.get())
        getHandle.registerTimer(newExpiry)
        expiry.update(newExpiry)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (expiry.exists() && expiry.get() == info.getExpiryTimeInMs && state.exists()) {
        val s = state.get()
        state.clear(); expiry.clear()
        Iterator.single(emit(user, s))
      } else Iterator.empty
    }
  }

  case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-user event-type counters on `transformWithState` MAP STATE —
    * the state-variable shape the other ports don't exercise, and the
    * reason the README migration verdict says `lshCollisions` would
    * eventually move: a point update touches ONE map entry
    * (`updateValue(type, n+1)`) instead of rewriting a whole packed
    * value, which is what makes high-fan-in per-key state cheap in the
    * RocksDB store (each map entry is its own store key). Emits the
    * updated (user, type, count) rows each batch — the streaming twin of
    * q_ev_features' conditional counts, one row per touched type rather
    * than one wide row per user.
    *
    * State is O(|types| seen) per active user, purged whole by the same
    * re-anchored event-time timer as the other ports.
    */
  def typeCountsTws(spark: SparkSession, events: Dataset[KeyedEvent],
      watermarkDelay: String = "1 hour",
      ttlMs: Long = 7L * 86400000L): Dataset[TypeCount] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new TypeCountProcessor(ttlMs), TimeMode.EventTime, OutputMode.Append)
  }

  private class TypeCountProcessor(ttlMs: Long)
      extends StatefulProcessor[Long, KeyedEvent, TypeCount] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var meta: ValueState[Long] = _   // key's max event ts
    @transient private var expiry: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      meta = getHandle.getValueState[Long]("maxts", Encoders.scalaLong, TTLConfig.NONE)
      expiry = getHandle.getValueState[Long]("expiry", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[KeyedEvent],
        tv: TimerValues): Iterator[TypeCount] = {
      var maxTs = if (meta.exists()) meta.get() else Long.MinValue
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      for (e <- rows) {
        val cur = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, cur + 1L)   // ONE entry touched
        touched += e.event_type
        maxTs = math.max(maxTs, e.ts.getTime)
      }
      meta.update(maxTs)
      val newExpiry = math.max(maxTs + ttlMs, tv.getCurrentWatermarkInMs + 1)
      if (expiry.exists() && expiry.get() != newExpiry)
        getHandle.deleteTimer(expiry.get())
      getHandle.registerTimer(newExpiry)
      expiry.update(newExpiry)
      touched.iterator.map(t => TypeCount(user, t, counts.getValue(t)))
        .toSeq.iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[TypeCount] = {
      if (expiry.exists() && expiry.get() == info.getExpiryTimeInMs) {
        counts.clear(); meta.clear(); expiry.clear()
      }
      Iterator.empty
    }
  }

  case class FunnelState(viewMs: Long, clickMs: Long, done: Boolean, maxTsMs: Long)
  case class Conversion(user_id: Long, first_view: Timestamp,
    first_click: Timestamp, first_purchase: Timestamp)

  /** Streaming conversion funnel — the CEP twin of the batch q_ev_funnel
    * stage machine: a user CONVERTS at the first purchase strictly after
    * their first qualifying click, which is the first click strictly
    * after their first view. One Conversion row emits at the purchase
    * instant — exactly the row the batch query shows with
    * `converted = true`, timestamps identical on an in-order feed
    * (spec-pinned). Pre-view clicks and pre-click purchases never count,
    * and a user converts at most once.
    *
    * State is three longs + a flag per ACTIVE user, purged by the same
    * re-anchored event-time timer as the EWMA port. Cross-batch late
    * events fold at their true position WITHIN the current stage
    * prefix (batch-sorted by (ts, event_id)); a late event that would
    * retroactively re-qualify an earlier stage is the standard
    * append-mode approximation (same contract as [[transitions]]).
    */
  def funnelConversions(spark: SparkSession, events: Dataset[KeyedEvent],
      watermarkDelay: String = "1 hour",
      ttlMs: Long = 7L * 86400000L): Dataset[Conversion] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(ttlMs), TimeMode.EventTime, OutputMode.Append)
  }

  private class FunnelProcessor(ttlMs: Long)
      extends StatefulProcessor[Long, KeyedEvent, Conversion] {
    @transient private var state: ValueState[FunnelState] = _
    @transient private var expiry: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[FunnelState](
        "funnel", Encoders.product[FunnelState], TTLConfig.NONE)
      expiry = getHandle.getValueState[Long](
        "expiry", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[KeyedEvent],
        tv: TimerValues): Iterator[Conversion] = {
      val evs = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var s = if (state.exists()) state.get()
        else FunnelState(-1L, -1L, done = false, Long.MinValue)
      val out = Seq.newBuilder[Conversion]
      for (e <- evs) {
        val t = e.ts.getTime
        s = e.event_type match {
          case "view" if s.viewMs < 0 =>
            s.copy(viewMs = t, maxTsMs = math.max(s.maxTsMs, t))
          case "click" if s.viewMs >= 0 && t > s.viewMs && s.clickMs < 0 =>
            s.copy(clickMs = t, maxTsMs = math.max(s.maxTsMs, t))
          case "purchase" if s.clickMs >= 0 && t > s.clickMs && !s.done =>
            out += Conversion(user, new Timestamp(s.viewMs),
              new Timestamp(s.clickMs), new Timestamp(t))
            s.copy(done = true, maxTsMs = math.max(s.maxTsMs, t))
          case _ => s.copy(maxTsMs = math.max(s.maxTsMs, t))
        }
      }
      state.update(s)
      val newExpiry = math.max(s.maxTsMs + ttlMs, tv.getCurrentWatermarkInMs + 1)
      if (expiry.exists() && expiry.get() != newExpiry)
        getHandle.deleteTimer(expiry.get())
      getHandle.registerTimer(newExpiry)
      expiry.update(newExpiry)
      out.result().iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Conversion] = {
      if (expiry.exists() && expiry.get() == info.getExpiryTimeInMs) {
        state.clear(); expiry.clear()
      }
      Iterator.empty
    }
  }

  /** Per-user running (count, sum, max) with an anomaly flag when a single
    * event exceeds `flagFactor` × the user's running mean. Emits one update
    * per input event; a key's state expires once the watermark passes
    * `ttlMs` beyond the key's own latest event (NOT watermark-relative —
    * the watermark starts at epoch 0 and would expire everything on its
    * first jump).
    */
  def runningUserStats(spark: SparkSession, events: Dataset[Event],
      flagFactor: Double = 10.0, watermarkDelay: String = "1 hour",
      ttlMs: Long = 3600000L): Dataset[UserUpdate] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(UserState(0L, 0.0, Double.MinValue, Long.MinValue))
            val evs = batch.toSeq.sortBy(_.ts.getTime)
            val out = evs.map { e =>
              val mean = if (s.n > 0) s.sum / s.n else e.value
              val flagged = s.n > 0 && e.value > flagFactor * mean
              s = UserState(s.n + 1, s.sum + e.value, math.max(s.max, e.value),
                math.max(s.maxTsMs, e.ts.getTime))
              UserUpdate(user, s.n, s.sum, s.max, flagged)
            }
            state.update(s)
            // TTL from the key's max event time EVER SEEN (tracked in the
            // state): using only this batch's max would let a late event
            // move the expiry backward and purge live state early. Clamped
            // to the watermark: Spark THROWS if the timeout is set below
            // the eviction watermark (late events within the previous
            // batch's watermark can otherwise produce exactly that).
            state.setTimeoutTimestamp(
              math.max(s.maxTsMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** [[runningUserStats]] on the Spark 4 `transformWithState` API — the
    * LAST fMGWS-only op ported, completing the migration
    * (ewma/sessionize/typeCounts/funnel/lsh/winnow twins came first):
    * the running (n, sum, max) triple is a single ValueState row, the
    * TTL is the house explicit-timer discipline (re-anchored to the
    * key's own latest event, delete-old + register-new, stale firings
    * recognized via the stored expiry instant). Requires the RocksDB
    * state store (state-v2), like every tws twin; the fMGWS form is
    * retained as the no-provider-opt-in cross-check, and the parity
    * suite runs both on the same feed.
    */
  def runningUserStatsTws(spark: SparkSession, events: Dataset[Event],
      flagFactor: Double = 10.0, watermarkDelay: String = "1 hour",
      ttlMs: Long = 3600000L): Dataset[UserUpdate] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor(flagFactor, ttlMs),
        TimeMode.EventTime, OutputMode.Append)
  }

  private class RunningStatsProcessor(flagFactor: Double, ttlMs: Long)
      extends StatefulProcessor[Long, Event, UserUpdate] {
    @transient private var state: ValueState[UserState] = _
    @transient private var expiry: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[UserState](
        "stats", Encoders.product[UserState], TTLConfig.NONE)
      expiry = getHandle.getValueState[Long](
        "expiry", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[UserUpdate] = {
      var s = if (state.exists()) state.get()
        else UserState(0L, 0.0, Double.MinValue, Long.MinValue)
      val evs = rows.toSeq.sortBy(_.ts.getTime)
      val out = evs.map { e =>
        val mean = if (s.n > 0) s.sum / s.n else e.value
        val flagged = s.n > 0 && e.value > flagFactor * mean
        s = UserState(s.n + 1, s.sum + e.value, math.max(s.max, e.value),
          math.max(s.maxTsMs, e.ts.getTime))
        UserUpdate(user, s.n, s.sum, s.max, flagged)
      }
      state.update(s)
      val newExpiry = math.max(s.maxTsMs + ttlMs, tv.getCurrentWatermarkInMs + 1)
      if (expiry.exists() && expiry.get() != newExpiry)
        getHandle.deleteTimer(expiry.get())
      getHandle.registerTimer(newExpiry)
      expiry.update(newExpiry)
      out.iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[UserUpdate] = {
      if (expiry.exists() && expiry.get() == info.getExpiryTimeInMs) {
        state.clear(); expiry.clear()
      }
      Iterator.empty
    }
  }
}
