package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.sources.Tables

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join ≡ theta join, across bucket widths") {
    val tiers = spark.range(12).select(
      $"id".as("tier"), ($"id" * $"id" * lit(2.0)).as("lo"),
      (($"id" + 1) * ($"id" + 1) * lit(2.0)).as("hi"))
    val ev = Tables.events(spark, Sf).select($"event_id", $"value")
    val theta = ev.join(tiers, $"value" >= $"lo" && $"value" < $"hi")
      .select($"event_id", $"tier")
    for (w <- Seq(1.0, 10.0, 100.0)) {
      val bucketed = RangeJoin.bucketedRangeJoin(ev, "value", tiers, "lo", "hi", w)
        .select($"event_id", $"tier")
      assert(bucketed.exceptAll(theta).count() === 0, s"width=$w extra rows")
      assert(theta.exceptAll(bucketed).count() === 0, s"width=$w missing rows")
    }
  }

  test("boundary values: hi is exclusive, lo inclusive") {
    val pts = Seq((1L, 2.0), (2L, 7.9999), (3L, 8.0)).toDF("id", "value")
    val iv = Seq((0L, 2.0, 8.0)).toDF("tier", "lo", "hi")
    val out = RangeJoin.bucketedRangeJoin(pts, "value", iv, "lo", "hi", 4.0)
      .select($"id").as[Long].collect().sorted
    assert(out === Array(1L, 2L)) // 8.0 excluded, 2.0 included
  }

  test("hi just above a bucket edge still matches points in the edge bucket") {
    // regression: an epsilon-subtraction on hi dropped this match
    val pts = Seq((1L, 2.0000000002)).toDF("id", "value")
    val iv = Seq((0L, 0.5, 2.0000000005)).toDF("tier", "lo", "hi")
    val out = RangeJoin.bucketedRangeJoin(pts, "value", iv, "lo", "hi", 1.0)
    assert(out.count() === 1)
  }

  test("degenerate intervals (hi <= lo) are dropped, not exploded descending") {
    val pts = Seq((1L, 5.0)).toDF("id", "value")
    val iv = Seq((0L, 100.0, 0.0), (1L, 4.0, 6.0)).toDF("tier", "lo", "hi")
    val out = RangeJoin.bucketedRangeJoin(pts, "value", iv, "lo", "hi", 1.0)
      .select($"tier").as[Long].collect()
    assert(out === Array(1L))
  }

  test("trailing-window join ≡ theta join on the events table, across lookbacks") {
    val ev = Tables.events(spark, Sf)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("purchase_ts"), $"value".as("purchase_value"))
    for (lookback <- Seq(600L, 3600L, 86400L)) {
      val theta = clicks.join(purchases, Seq("user_id"))
        .filter($"purchase_ts" <= $"click_ts" &&
          $"purchase_ts" >= $"click_ts" - expr(s"INTERVAL $lookback SECOND"))
        .select($"click_id", $"purchase_ts")
      val bucketed = RangeJoin
        .trailingWindowJoin(clicks, "click_ts", purchases, "purchase_ts",
          Seq("user_id"), lookback)
        .select($"click_id", $"purchase_ts")
      assert(bucketed.exceptAll(theta).count() === 0, s"lookback=$lookback extra rows")
      assert(theta.exceptAll(bucketed).count() === 0, s"lookback=$lookback missing rows")
    }
  }

  test("trailing-window join boundaries: window is inclusive on both ends") {
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    def ts(offSec: Long) = new java.sql.Timestamp(t0.getTime + offSec * 1000L)
    val left = Seq((1L, 7L, ts(0))).toDF("click_id", "user_id", "click_ts")
    val right = Seq(
      (7L, ts(-3600), 1.0),  // exactly lookback ago → included
      (7L, ts(-3601), 2.0),  // just outside → excluded
      (7L, ts(0), 3.0),      // same instant → included
      (7L, ts(1), 4.0),      // future → excluded
      (8L, ts(-10), 5.0))    // other key → excluded
      .toDF("user_id", "purchase_ts", "purchase_value")
    val out = RangeJoin.trailingWindowJoin(left, "click_ts", right, "purchase_ts",
        Seq("user_id"), 3600L)
      .select($"purchase_value").as[Double].collect().sorted
    assert(out === Array(1.0, 3.0))
  }

  test("leading-window join ≡ theta join on the events table, across horizons") {
    val ev = Tables.events(spark, Sf)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pts"))
    for (horizon <- Seq(600L, 3600L, 86400L)) {
      val theta = clicks.join(purchases, Seq("user_id"))
        .filter($"pts" > $"click_ts" &&
          $"pts" <= $"click_ts" + expr(s"INTERVAL $horizon SECOND"))
        .select($"click_id", $"pts")
      val bucketed = RangeJoin
        .leadingWindowJoin(clicks, "click_ts", purchases, "pts",
          Seq("user_id"), horizon)
        .select($"click_id", $"pts")
      assert(bucketed.exceptAll(theta).count() === 0, s"horizon=$horizon extra rows")
      assert(theta.exceptAll(bucketed).count() === 0, s"horizon=$horizon missing rows")
    }
  }

  test("leading-window join boundaries: start exclusive (no label leakage), end inclusive") {
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    def ts(offSec: Long) = new java.sql.Timestamp(t0.getTime + offSec * 1000L)
    val left = Seq((1L, 7L, ts(0))).toDF("click_id", "user_id", "click_ts")
    val right = Seq(
      (7L, ts(0), 1.0),     // same instant → EXCLUDED (would leak the trigger)
      (7L, ts(1), 2.0),     // just after → included
      (7L, ts(3600), 3.0),  // exactly horizon ahead → included
      (7L, ts(3601), 4.0),  // just beyond → excluded
      (7L, ts(-1), 5.0),    // past → excluded
      (8L, ts(10), 6.0))    // other key → excluded
      .toDF("user_id", "pts", "v")
    val out = RangeJoin.leadingWindowJoin(left, "click_ts", right, "pts",
        Seq("user_id"), 3600L)
      .select($"v").as[Double].collect().sorted
    assert(out === Array(2.0, 3.0))
  }

  test("GraftExtensions wires poly_hash into a SparkSessionExtensions instance") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must register without error
  }
}
