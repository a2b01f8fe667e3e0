package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Semantics pins for q_ev_attrib: window exclusivity at the purchase
  * instant, inclusive trailing boundary, direct fallback, and the
  * deterministic tid tie-break on simultaneous touches.
  */
class EventAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val T0 = "2024-03-10 12:00:00"

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-attrib").toString
    Seq(
      // user 1: view then click before the purchase → first=view, last=click
      (10L, ts("2024-03-10 10:00:00"), 1L, "view", 1.0, "{}"),
      (11L, ts("2024-03-10 11:00:00"), 1L, "click", 1.0, "{}"),
      (12L, ts(T0), 1L, "purchase", 9.5, "{}"),
      // user 2: touch exactly AT the purchase instant → excluded (direct)
      (20L, ts(T0), 2L, "click", 1.0, "{}"),
      (21L, ts(T0), 2L, "purchase", 5.0, "{}"),
      // user 3: only touch is 25h old — outside the 1-day window (direct)
      (30L, ts("2024-03-09 11:00:00"), 3L, "view", 1.0, "{}"),
      (31L, ts(T0), 3L, "purchase", 2.0, "{}"),
      // user 4: click and view at the SAME ts → tid breaks the tie
      (40L, ts("2024-03-10 11:00:00"), 4L, "click", 1.0, "{}"),
      (41L, ts("2024-03-10 11:00:00"), 4L, "view", 1.0, "{}"),
      (42L, ts(T0), 4L, "purchase", 3.0, "{}"),
      // user 5: touch exactly one day back — trailing boundary INCLUSIVE
      (50L, ts("2024-03-09 12:00:00"), 5L, "view", 1.0, "{}"),
      (51L, ts(T0), 5L, "purchase", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("attribution: first/last touch, exclusivity, boundary, tie-break, direct") {
    val got = SparkEntry.queries("q_ev_attrib")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(5), r.getString(4)))) // (first, last)
      .toMap
    assert(got(12L) === (("view", "click")), "in-window touches: first=view, last=click")
    assert(got(21L) === (("direct", "direct")), "touch AT the purchase instant must not count")
    assert(got(31L) === (("direct", "direct")), "touch past the 1-day lookback must not count")
    assert(got(42L) === (("click", "view")), "simultaneous touches break by tid: first=40/click, last=41/view")
    assert(got(51L) === (("view", "view")), "touch exactly 1 day back is inside the window")
  }
}
