package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof: latest prior-or-equal right row per key; null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:05:00")), // after r@00:00 → 100
      (2L, 10L, ts("2024-01-01 01:00:00")), // exactly at r@01:00 → inclusive → 200
      (3L, 10L, ts("2024-01-01 02:30:00")), // after both → 200
      (4L, 20L, ts("2024-01-01 00:30:00")), // other key → 900
      (5L, 30L, ts("2024-01-01 05:00:00"))  // key with no right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 100.0),
      (10L, ts("2024-01-01 01:00:00"), 200.0),
      (20L, ts("2024-01-01 00:00:00"), 900.0)
    ).toDF("user_id", "ts", "v")
    val out = AsOfJoin.asof(left, right, "user_id", "ts", "ts", Seq("v"))
      .select($"event_id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(
      1L -> Some(100.0), 2L -> Some(200.0), 3L -> Some(200.0),
      4L -> Some(900.0), 5L -> None))
  }

  test("asof: a matched right row with a NULL payload value yields NULL (not an older value)") {
    val left = Seq((1L, 10L, ts("2024-01-01 02:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), Some(5.0)),
      (10L, ts("2024-01-01 01:00:00"), None: Option[Double]) // the as-of match, value null
    ).toDF("user_id", "ts", "v")
    val out = AsOfJoin.asof(left, right, "user_id", "ts", "ts", Seq("v"))
      .select($"v").as[Option[Double]].head()
    assert(out === None) // DuckDB ASOF semantics: matched row's value, even if null
  }

  test("asof: multi-column payload always comes from the same right row") {
    val left = Seq((1L, 10L, ts("2024-01-01 02:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), Some(5.0), Some("a")),
      (10L, ts("2024-01-01 01:00:00"), None: Option[Double], Some("b"))
    ).toDF("user_id", "ts", "v", "tag")
    val out = AsOfJoin.asof(left, right, "user_id", "ts", "ts", Seq("v", "tag"))
      .select($"v", $"tag").as[(Option[Double], Option[String])].head()
    assert(out === ((None, Some("b")))) // not the mixed (5.0, "b")
  }

  test("asof: left row count preserved (no duplication, no loss)") {
    val e = graft.sources.Tables.events(spark, Sf)
    val clicks = e.filter($"event_type" === "click").select($"event_id", $"user_id", $"ts", $"value")
    val purchases = e.filter($"event_type" === "purchase").select($"user_id", $"ts", $"value".as("pv"))
    val out = AsOfJoin.asof(clicks, purchases, "user_id", "ts", "ts", Seq("pv"))
    assert(out.count() === clicks.count())
  }
}
