package graft

import java.nio.file.Files

/** q_rfm on a hand-computed fixture: recency against the corpus horizon,
  * exact decimal spend, inclusive median boundaries (R: r_days ≤ median;
  * F/M: ≥ median), and one row per customer.
  */
class RfmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    // q_rfm reads only the orders table — write nothing else
    val d = Files.createTempDirectory("graft-rfm").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // horizon = 2024-01-10. c1: recent+frequent+big (RFM); c2: one old
    // small order (rfm); c3: recent single mid order
    Seq(
      (1L, 1L, "O", 100.00, ts("2024-01-09"), "1-URGENT"),
      (2L, 1L, "O", 150.00, ts("2024-01-10"), "1-URGENT"),
      (3L, 2L, "F", 10.00, ts("2024-01-01"), "3-MEDIUM"),
      (4L, 3L, "O", 120.00, ts("2024-01-08"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  test("hand-computed RFM: recency/frequency/monetary and segment letters") {
    val out = SparkEntry.queries("q_rfm")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    assert(out.size === 3, "one row per customer")
    // r_days: c1 = 0, c2 = 9, c3 = 2 → r_med = 2 (inclusive → c1, c3 'R')
    // n_orders: 2, 1, 1 → f_med = 1 (inclusive → all 'F')
    // spend: 250, 10, 120 → m_med = 120 (inclusive → c1, c3 'M')
    assert(out(1L) === ((0L, 2L, 250.0, "RFM")))
    assert(out(2L) === ((9L, 1L, 10.0, "rFm")))
    assert(out(3L) === ((2L, 1L, 120.0, "RFM")),
      "median boundaries are inclusive on the favorable side")
  }
}
