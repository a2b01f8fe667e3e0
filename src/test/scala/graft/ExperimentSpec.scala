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

  test("mde: the sizing formula is replayed exactly and the unit is the USER") {
    // 4 users (2 per variant), per-user totals 1, 2, 3, 4. User 0's
    // total arrives as TWO events (0.6 + 0.4): event-level rows must
    // collapse into the user unit — n stays 4, not 5.
    val hour = 3600L * 1000000L
    val rows = Seq(
      ev(0L, hour, 0.6), ev(0L, 2 * hour, 0.4),
      ev(1L, hour, 2.0), ev(2L, hour, 3.0), ev(3L, hour, 4.0))
    val df = rows.toDF("user_id", "ts", "event_type", "value")
    val out = Experiment.mde(df).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L, "2 users per variant")
    val totals = Seq(1.0, 2.0, 3.0, 4.0)
    val mean = totals.sum / 4
    val s = math.sqrt(totals.map(t => (t - mean) * (t - mean)).sum / 3)
    val mde = Experiment.ZSumDefault * s * math.sqrt(1.0 / 2 + 1.0 / 2)
    assert(math.abs(r.getDouble(3) - mean) < 1e-9)
    assert(math.abs(r.getDouble(4) - s) < 1e-9)
    assert(math.abs(r.getDouble(5) - mde) < 1e-9)
    assert(math.abs(r.getDouble(6) - mde / mean) < 1e-9)
  }

  test("mde: a single-user event type emits null sd and MDE, not Infinity") {
    val hour = 3600L * 1000000L
    val df = Seq(ev(7L, hour, 5.0)).toDF("user_id", "ts", "event_type", "value")
    val r = Experiment.mde(df).collect()(0)
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
    // the lone (odd) user lands in variant 1
    assert(r.getLong(1) == 0L && r.getLong(2) == 1L)
  }

  test("srm: a balanced split passes, a broken randomizer alarms, chi2 exact") {
    val hour = 3600L * 1000000L
    // balanced: users 0..9 (5 even / 5 odd) → chi2 = 0
    val ok = (0L until 10L).map(u => ev(u, hour, 1.0))
    val r1 = Experiment.srmCheck(ok.toDF("user_id", "ts", "event_type", "value"))
      .collect()(0)
    assert(r1.getLong(1) == 5L && r1.getLong(2) == 5L)
    assert(r1.getDouble(3) == 0.0 && !r1.getBoolean(4))
    // broken: 18 even users vs 2 odd → E = 10, chi2 = 2*64/10 = 12.8
    val bad = ((0L until 36L by 2L) ++ Seq(1L, 3L)).map(u => ev(u, hour, 1.0))
    val r2 = Experiment.srmCheck(bad.toDF("user_id", "ts", "event_type", "value"))
      .collect()(0)
    assert(r2.getLong(1) == 18L && r2.getLong(2) == 2L)
    assert(r2.getDouble(3) == 12.8 && r2.getBoolean(4))
    // duplicate events from one user must not inflate the counts
    val dup = ok ++ Seq(ev(0L, 2 * hour, 7.0))
    val r3 = Experiment.srmCheck(dup.toDF("user_id", "ts", "event_type", "value"))
      .collect()(0)
    assert(r3.getLong(1) == 5L && r3.getLong(2) == 5L)
  }

  test("convlift: hand-computed 2x2 chi-square; non-converting users count in the population") {
    val hour = 3600L * 1000000L
    // population: 8 users (4 per variant) all emit 'view'; 'buy' is
    // emitted by 3 even users and 1 odd user → a = 3, b = 1, c = 1,
    // d = 3, N = 8, chi2 = 8·(9−1)²/(4·4·4·4) = 2.0 (not significant)
    val view = (0L until 8L).map(u =>
      (u, new java.sql.Timestamp(hour / 1000), "view", 1.0))
    val buy = Seq(0L, 2L, 4L, 1L).map(u =>
      (u, new java.sql.Timestamp(2 * hour / 1000), "buy", 5.0))
    val df = (view ++ buy).toDF("user_id", "ts", "event_type", "value")
    val got = Experiment.conversionLift(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val b = got("buy")
    assert(b.getLong(1) == 4L && b.getLong(2) == 4L)
    assert(b.getLong(3) == 3L && b.getLong(4) == 1L)
    assert(b.getDouble(5) == 0.75 && b.getDouble(6) == 0.25)
    assert(b.getDouble(7) == 2.0 && !b.getBoolean(8))
    // 'view' converts everyone → det = 0 → chi2 null (zero marginal)
    val v = got("view")
    assert(v.isNullAt(7) && v.isNullAt(8))
  }

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

  test("winsorize: hand-computed cap, whale row capped, permille exact") {
    // type "buy": values 1..9 plus a 1000.0 whale; p=0.5 over the 10
    // sorted values interpolates cap = (5 + 6)/2 = 5.5; rows above 5.5
    // → 6, 7, 8, 9, 1000 = 5 of 10 → 500 permille; winsorized sum =
    // 1+2+3+4+5 + 5·5.5 = 42.5
    val hour = 3600L * 1000000L
    val rows = ((1 to 9).map(_.toDouble) :+ 1000.0).zipWithIndex.map {
      case (v, i) => (i.toLong, new java.sql.Timestamp(hour * i / 1000), "buy", v)
    }
    val out = Experiment.winsorize(
        rows.toDF("user_id", "ts", "event_type", "value"), p = 0.5)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Double]("cap") === 5.5)
    assert(r.getAs[Long]("capped_permille") === 500L)
    assert(math.abs(r.getAs[Double]("wins_mean") - 4.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("raw_mean") - 104.5) < 1e-12)
  }

  test("winsorize on the corpus: capped mean never exceeds raw, cap rate bounded by 1-p") {
    val out = Experiment.winsorize(Tables.events(spark, Sf)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("wins_mean") <= r.getAs[Double]("raw_mean") + 1e-12)
      // exact p99 cap: at most floor(n/100)+1 rows sit strictly above
      // the interpolated quantile (the +1 matters at sf0.001's ~150
      // rows per type, where 1% of n rounds to one row)
      val n = r.getAs[Long]("n")
      val maxCapped = n / 100 + 1
      val capped = r.getAs[Long]("capped_permille") * n / 1000
      assert(capped <= maxCapped,
        s"${r.getAs[String]("event_type")}: $capped of $n capped")
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
