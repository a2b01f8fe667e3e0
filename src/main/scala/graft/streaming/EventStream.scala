package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analytics over an event stream — the stateful-operator layer
  * the reference lacks entirely (SURVEY §2 "operators the reference does
  * NOT have"), built the Structured Streaming way: event-time watermarks
  * bound all state.
  *
  * Each transform takes a streaming DataFrame with (ts: timestamp,
  * user_id, event_type, value) — the batch equivalents are the q_ev_*
  * queries in SparkEntry, which the DuckDB oracle checks; these streaming
  * shapes are exercised in StreamingSpec via MemoryStream.
  */
object EventStream {

  /** Tumbling 1-hour aggregation with a 2-hour watermark: state for a
    * window is dropped once the watermark passes its end — bounded memory
    * at any scale. Late events beyond the watermark are dropped (counted
    * by the driver's StreamingQueryListener if observability is wired).
    */
  def tumblingCounts(events: DataFrame,
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Session windows (gap-merged) per user, watermark-bounded. */
  def sessions(events: DataFrame,
      gap: String = "4 hours", watermark: String = "8 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n"))

  /** Stream-stream interval join: each click joined to the same user's
    * purchases from the preceding `lookback`. Both sides are watermarked so
    * the join state is bounded: a buffered purchase can be dropped once the
    * click-side watermark passes purchase.ts + lookback — Spark derives
    * that from the time-range predicate. Without the range condition the
    * state would grow forever.
    */
  def clicksWithRecentPurchases(clicks: DataFrame, purchases: DataFrame,
      lookback: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") <= col("click_ts") &&
        col("purchase_ts") >= col("click_ts") - expr(s"INTERVAL $lookback"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))
  }

  /** Streaming leaderboard: top-k users by spend per tumbling window,
    * the bounded-heap `TopKByValue` aggregate running INSIDE a
    * watermarked streaming aggregation (TypedImperativeAggregate state
    * serializes into the state store like any agg buffer). Per-window
    * state is one O(k) heap + the per-(window,user) sums, all dropped
    * once the watermark passes the window end. Batch equivalent:
    * SparkEntry `q_ev_topusers` (DuckDB-checked).
    */
  def windowTopSpenders(events: DataFrame, k: Int = 3,
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("user_id"))
      .agg(sum(col("value").cast("decimal(12,2)")).cast("double").as("uval"))
      .groupBy(col("window"))
      .agg(graft.expressions.TopKAgg.top_k_ids(col("uval"), col("user_id"), k).as("top"))
      .select(col("window.start").as("w_start"), col("top"))

  /** Streaming latest-per-user materialization — the live twin of the
    * batch q_ev_latest CDC view: max_by with the composite (ts, event_id)
    * ordering key as an UPDATE-mode aggregation, so each micro-batch
    * emits only the users whose latest row changed (what a foreachBatch
    * JDBC upsert sink consumes). State = one (ts, event_id, payload)
    * tuple per user — O(|users|), no per-event retention; unbounded on
    * purpose (an upsert view never expires keys), which is why this runs
    * in update mode rather than behind a watermark.
    */
  def latestPerUser(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("ts"), col("event_id"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("last"))
      .select(col("user_id"), col("last.ts").as("ts"),
        col("last.event_id").as("event_id"),
        col("last.event_type").as("event_type"), col("last.value").as("value"))

  /** Streaming exact dedup with bounded state: duplicates of (user_id,
    * event_type, event_id) arriving within the watermark are dropped;
    * state older than the watermark is purged. The unbounded
    * `dropDuplicates` would grow state forever (SURVEY §7.3).
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "event_id")
}
