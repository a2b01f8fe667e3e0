package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Experiment
import graft.sources.Tables

/** CUPED invariants ([[Experiment.cuped]]): the perfect-predictor
  * fixture (θ and ρ² land exactly where the algebra says), degenerate
  * pre-period guarding, and corpus-side accounting.
  */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, us: Long, v: Double) =
    (id, new Timestamp(us / 1000), "click", v)

  test("cuped: a perfect pre-predictor removes ALL post variance and equalizes variants") {
    // pre value x_u per user, post value y_u = 2·x_u exactly; midpoint
    // splits the two events. cov/var algebra: θ = 2, ρ² = 1, and every
    // user's adjusted value is the same constant, so the two variants'
    // adjusted means must be EQUAL even though their raw means differ.
    val hour = 3600L * 1000000L
    val rows = (0L until 8L).flatMap { u =>
      val x = (u + 1).toDouble // 1..8 — variant means differ raw
      Seq(ev(u, hour * 1, x), ev(u, hour * 9, 2 * x))
    }
    val df = rows.toDF("user_id", "ts", "event_type", "value")
    val out = Experiment.cuped(df).collect()
      .map(r => r.getAs[Long]("variant") -> r).toMap
    assert(out.size === 2)
    out.values.foreach { r =>
      assert(math.abs(r.getAs[Double]("theta") - 2.0) < 1e-9, "slope is exactly 2")
      assert(math.abs(r.getAs[Double]("var_reduction") - 1.0) < 1e-9, "rho^2 = 1")
    }
    val adj0 = out(0L).getAs[Double]("mean_adj")
    val adj1 = out(1L).getAs[Double]("mean_adj")
    assert(math.abs(adj0 - adj1) < 1e-9,
      s"perfect covariate must equalize adjusted means: $adj0 vs $adj1")
    // raw post means genuinely differ (odd users have bigger x)
    assert(math.abs(out(0L).getAs[Double]("mean_post")
      - out(1L).getAs[Double]("mean_post")) > 0.5)
  }

  test("cuped: degenerate pre period (zero variance) falls back to raw means") {
    val hour = 3600L * 1000000L
    val rows = (0L until 4L).flatMap { u =>
      Seq(ev(u, hour * 1, 5.0), ev(u, hour * 9, (u + 1).toDouble))
    }
    val out = Experiment.cuped(rows.toDF("user_id", "ts", "event_type", "value"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Double]("theta") === 0.0)
      assert(math.abs(r.getAs[Double]("mean_adj") - r.getAs[Double]("mean_post")) < 1e-12)
    }
  }

  test("cuped on the corpus: accounting, bounded rho^2, adjusted means shift by theta") {
    val out = Experiment.cuped(Tables.events(spark, Sf)).collect()
    assert(out.length === 2)
    val nUsers = Tables.events(spark, Sf)
      .filter($"user_id".isNotNull && $"value".isNotNull)
      .select($"user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n_users")).sum === nUsers)
    out.foreach { r =>
      val vr = r.getAs[Double]("var_reduction")
      assert(vr >= 0.0 && vr <= 1.0 + 1e-12, s"rho^2 $vr out of range")
      val expect = r.getAs[Double]("mean_post") -
        r.getAs[Double]("theta") * (r.getAs[Double]("mean_pre") - globalPre(out))
      assert(math.abs(r.getAs[Double]("mean_adj") - expect) < 1e-9)
    }
  }

  private def globalPre(rows: Array[org.apache.spark.sql.Row]): Double = {
    val n = rows.map(_.getAs[Long]("n_users")).sum
    rows.map(r => r.getAs[Double]("mean_pre") * r.getAs[Long]("n_users")).sum / n
  }
}
