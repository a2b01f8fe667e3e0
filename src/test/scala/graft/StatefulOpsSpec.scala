package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{Event, UserUpdate}

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState: running per-user stats with anomaly flag") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StatefulOps.runningUserStats(spark, ms.toDS(), flagFactor = 10.0)
      .writeStream.format("memory").queryName("ustats").outputMode("append").start()
    ms.addData(Seq(
      Event(ts("2024-01-01 00:00:00"), 1L, "click", 10.0),
      Event(ts("2024-01-01 00:01:00"), 1L, "click", 12.0),
      Event(ts("2024-01-01 00:02:00"), 1L, "click", 500.0), // > 10× running mean → flagged
      Event(ts("2024-01-01 00:00:30"), 2L, "click", 5.0)))
    q.processAllAvailable()
    // state persists across micro-batches: next event continues user 1's counts
    ms.addData(Seq(Event(ts("2024-01-01 00:03:00"), 1L, "click", 11.0)))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ustats").as[UserUpdate].collect()
    val u1 = rows.filter(_.user_id == 1L).sortBy(_.n)
    assert(u1.map(_.n).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(u1.map(_.flagged).toSeq === Seq(false, false, true, false))
    assert(u1.last.sum === 533.0 && u1.last.max === 500.0)
    assert(rows.count(_.user_id == 2L) === 1)
  }

  test("latest-per-key: max_by composite-key agg ≡ row_number window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, Sf)
    // the q_ev_latest shape: one partial-combinable agg, O(1) state per key
    val viaAgg = ev.groupBy($"user_id")
      .agg(max_by(struct($"ts", $"event_id"), struct($"ts", $"event_id")).as("l"))
      .select($"user_id", $"l.ts".as("ts"), $"l.event_id".as("event_id"))
    // the sort-shard formulation it must agree with (event_id unique →
    // the composite key is a total order, so the survivor is identical)
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val viaWindow = ev.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"ts", $"event_id")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }
}
