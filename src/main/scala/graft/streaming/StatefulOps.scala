package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
}
