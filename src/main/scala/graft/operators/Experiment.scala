package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experimentation read-outs over the events stream — the A/B analysis
  * a behavioral pipeline serves next to its feature tables. Reference
  * analogue: the reference's serving table is scanned by ad-hoc SQL
  * (§2 Q1); an experimentation deployment of the same events data runs
  * exactly these aggregations.
  */
object Experiment {

  /** CUPED variance-reduced experiment read-out (Deng et al., WSDM'13):
    * per-user pre/post value sums split at the deterministic time
    * midpoint, variant = user_id % 2 (the deterministic hash-split
    * convention), θ = cov(pre, post)/var(pre), adjusted mean =
    * mean_post − θ·(mean_pre − global mean_pre). `var_reduction` (= ρ²)
    * is the fraction of post-period variance the covariate removes —
    * the reason every large A/B platform runs CUPED: the same lift
    * detects at ~(1−ρ²)× the sample size.
    *
    * Exactness: values quantized ×100 (two-decimal inputs are exact
    * integers), all moments DECIMAL(38,0) sums (the PMI/Neyman overflow
    * discipline), and the n·Σxy − Σx·Σy numerator spellings keep cov
    * and var integer-exact until the final few IEEE divisions — both
    * engines spell them identically. θ is 0-guarded for a degenerate
    * pre period.
    *
    * Scale shape: one narrow scan → per-user grouped agg (map-side
    * partials) → a 1-row global-moment broadcast and a ≤ 2-row variant
    * table. Nothing corpus-sized moves twice.
    */
  /** Winsorized robust metrics per event type — the outlier-capping
    * step a metrics pipeline runs BEFORE [[cuped]] (one whale user
    * otherwise owns the variance the experiment is trying to detect
    * through): per type, the exact interpolated p-quantile cap of
    * `value`, raw vs winsorized totals/means (values and the capped
    * values quantized ×100 — order-free integer sums; the cap itself is
    * the one interpolated double, computed by the same `percentile` ≡
    * `quantile_cont` arithmetic the quality gate's q_doc_qthresh pins
    * cross-engine), and the capped-row permille. Output ≤ |types| rows;
    * the quantile is the only non-streaming aggregate (exact
    * percentile's value→count partial state — the documented
    * percentile_approx swap applies at extreme cardinality).
    */
  def winsorize(events: DataFrame, p: Double = 0.99): DataFrame = {
    val ev = events
      .filter(col("event_type").isNotNull && col("value").isNotNull &&
        abs(col("value")) < 9e15)
      .select(col("event_type"), col("value"))
    val caps = ev.groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(p)).as("cap"))
    ev.join(broadcast(caps), "event_type")
      .select(col("event_type"), col("cap"),
        expr("cast(round(value * 100) as long)").as("vq"),
        expr("cast(round(least(value, cap) * 100) as long)").as("wq"),
        when(col("value") > col("cap"), 1L).otherwise(0L).as("capped"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("cap")).as("cap"),
        sum(col("vq")).as("raw_q"), sum(col("wq")).as("wins_q"),
        sum(col("capped")).as("n_capped"))
      .select(col("event_type"), col("n"), col("cap"),
        (col("raw_q").cast("double") / (col("n").cast("double") * 100.0)).as("raw_mean"),
        (col("wins_q").cast("double") / (col("n").cast("double") * 100.0)).as("wins_mean"),
        expr("n_capped * 1000 div n").as("capped_permille"))
  }

  /** DuckDB mirror of [[winsorize]]. */
  def winsorizeSql(p: Double = 0.99): String =
    s"""WITH wev AS (
       |  SELECT event_type, value FROM events
       |  WHERE event_type IS NOT NULL AND value IS NOT NULL AND abs(value) < 9e15),
       |wcap AS (
       |  SELECT event_type, quantile_cont(value, $p) AS cap
       |  FROM wev GROUP BY event_type),
       |wrow AS (
       |  SELECT e.event_type, c.cap,
       |    CAST(ROUND(e.value * 100) AS BIGINT) AS vq,
       |    CAST(ROUND(LEAST(e.value, c.cap) * 100) AS BIGINT) AS wq,
       |    CASE WHEN e.value > c.cap THEN 1 ELSE 0 END AS capped
       |  FROM wev e JOIN wcap c USING (event_type))
       |SELECT event_type, COUNT(*) AS n, MAX(cap) AS cap,
       |  CAST(SUM(vq) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 100.0) AS raw_mean,
       |  CAST(SUM(wq) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 100.0) AS wins_mean,
       |  CAST(SUM(capped) * 1000 // COUNT(*) AS BIGINT) AS capped_permille
       |FROM wrow GROUP BY event_type""".stripMargin

  def cuped(events: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    // abs(v) < 9e15 drops NaN and ±Inf in BOTH engines (each orders NaN
    // above every value, so the comparison is false) and bounds the
    // quantized product inside long — the embeddingHealth junk-row
    // discipline: ANSI would otherwise CAST_OVERFLOW the whole query on
    // one poisoned row
    val ev = events
      .filter(col("user_id").isNotNull && col("value").isNotNull &&
        abs(col("value")) < 9e15)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        expr("cast(round(value * 100) as long)").as("vq"))
    val mid = ev.agg(expr("(min(tus) + max(tus)) div 2").as("mid"))
    val per = ev.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(sum(when(col("tus") < col("mid"), col("vq")).otherwise(0L)).as("x"),
        sum(when(col("tus") >= col("mid"), col("vq")).otherwise(0L)).as("y"))
      .withColumn("variant", pmod(col("user_id"), lit(2L)))
      .localCheckpoint(false)
    val glob = per.agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"))
      .withColumn("covn", (col("n") * col("sxy") - col("sx") * col("sy")).cast("double"))
      .withColumn("varn", (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("varyn", (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))
      .withColumn("theta", when(col("varn") > 0, col("covn") / col("varn")).otherwise(0.0))
    val perV = per.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x").cast(dec)).as("sxv"), sum(col("y").cast(dec)).as("syv"))
    perV.crossJoin(broadcast(glob))
      .select(col("variant"), col("n_users"),
        (col("sxv").cast("double") / (col("n_users").cast("double") * 100.0)).as("mean_pre"),
        (col("syv").cast("double") / (col("n_users").cast("double") * 100.0)).as("mean_post"),
        col("theta"),
        (col("syv").cast("double") / (col("n_users").cast("double") * 100.0)
          - col("theta") * (col("sxv").cast("double") / (col("n_users").cast("double") * 100.0)
            - col("sx").cast("double") / (col("n").cast("double") * 100.0))).as("mean_adj"),
        when(col("varn") > 0 && col("varyn") > 0,
          col("covn") * col("covn") / (col("varn") * col("varyn")))
          .otherwise(0.0).as("var_reduction"))
  }

  /** χ²₁ critical value at 95% — the SRM alarm threshold (shared
    * literal with the SQL mirror).
    */
  val Chi2Crit95: Double = 3.841458820694124

  /** Sample-ratio-mismatch guardrail (the FIRST check an experiment
    * platform runs — a randomizer bug, a crash path that drops one
    * variant's telemetry, or a bot filter that fires asymmetrically
    * all show up here before any metric is worth reading): per event
    * type, the observed variant-0/variant-1 USER split against the
    * designed 50/50, with the one-degree-of-freedom chi-square
    * statistic (2·(n₀−E)²/E at E=(n₀+n₁)/2 — pure +,−,×,÷ of exact
    * counts, no p-value transcendentals) and the alarm flag at the
    * 95% critical value. An alarmed row means the CUPED/MDE read-outs
    * downstream are built on a broken randomization and must not ship.
    *
    * Unit = distinct users (the randomization unit, same as [[mde]]);
    * one grouped pass to (event_type, user), one rollup to
    * ≤ ‖types‖ rows.
    */
  def srmCheck(events: DataFrame): DataFrame = {
    val users = events
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"),
        pmod(col("user_id"), lit(2L)).as("variant"))
      .distinct()
    val agg = users.groupBy(col("event_type"))
      .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"))
    val e = (col("n0") + col("n1")).cast("double") / 2.0
    val chi2 = when(col("n0") + col("n1") > 0,
      (col("n0").cast("double") - e) * (col("n0").cast("double") - e) / e
        + (col("n1").cast("double") - e) * (col("n1").cast("double") - e) / e)
    agg.select(col("event_type"), col("n0"), col("n1"),
      chi2.as("chi2"), (chi2 > Chi2Crit95).as("srm_alarm"))
  }

  /** DuckDB mirror of [[srmCheck]]. */
  def srmCheckSql(): String =
    s"""WITH su AS (
       |  SELECT DISTINCT event_type, user_id, user_id % 2 AS variant
       |  FROM events WHERE user_id IS NOT NULL),
       |sa AS (
       |  SELECT event_type,
       |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
       |  FROM su GROUP BY event_type)
       |SELECT event_type, n0, n1,
       |  CASE WHEN n0 + n1 > 0 THEN
       |    (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
       |      * (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
       |      / (CAST(n0 + n1 AS DOUBLE) / 2.0)
       |    + (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
       |      * (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
       |      / (CAST(n0 + n1 AS DOUBLE) / 2.0) END AS chi2,
       |  (CASE WHEN n0 + n1 > 0 THEN
       |    (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
       |      * (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
       |      / (CAST(n0 + n1 AS DOUBLE) / 2.0)
       |    + (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
       |      * (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
       |      / (CAST(n0 + n1 AS DOUBLE) / 2.0) END > $Chi2Crit95) AS srm_alarm
       |FROM sa""".stripMargin

  /** Conversion-lift read-out (two-proportion chi-square) — the
    * PROPORTION-metric companion to [[cuped]]/[[mde]]'s continuous
    * ones: per event type, did a larger share of variant-1 users emit
    * it at all? Population = every user in the table (the assignment
    * frame), converted = users with ≥ 1 event of the type; the 2×2
    * chi-square spelled in its product form
    * N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)) — every factor an exact
    * integer riding DECIMAL(38,0) ((ad−bc)² passes long at ~10⁹ users,
    * the PMI/Neyman promotion discipline), ONE double division at the
    * end, alarm at the same χ²₁ 95% critical value as [[srmCheck]].
    *
    * Scale: one distinct pass to (user), one to (event_type, user),
    * rollups to ≤ ‖types‖ rows; the population row is a broadcast
    * 1-row cross.
    */
  def conversionLift(events: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val users = events.filter(col("user_id").isNotNull)
      .select(col("user_id"), pmod(col("user_id"), lit(2L)).as("variant"))
      .distinct()
    val pop = users.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("pop0"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("pop1"))
    val conv = events.filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"),
        pmod(col("user_id"), lit(2L)).as("variant"))
      .distinct()
      .groupBy(col("event_type"))
      .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("c1"))
    val a = col("c0").cast(dec)                      // converted, v0
    val b = col("c1").cast(dec)                      // converted, v1
    val c = (col("pop0") - col("c0")).cast(dec)      // not converted, v0
    val d = (col("pop1") - col("c1")).cast(dec)      // not converted, v1
    val n = (col("pop0") + col("pop1")).cast(dec)
    val det = (a * d - b * c).cast("double")
    val denom = ((a + b) * (c + d) * (a + c) * (b + d)).cast("double")
    val chi2 = when(denom > 0, n.cast("double") * det * det / denom)
    conv.crossJoin(broadcast(pop))
      .select(col("event_type"), col("pop0"), col("pop1"),
        col("c0"), col("c1"),
        (col("c0").cast("double") / col("pop0").cast("double")).as("rate0"),
        (col("c1").cast("double") / col("pop1").cast("double")).as("rate1"),
        chi2.as("chi2"), (chi2 > Chi2Crit95).as("significant"))
  }

  /** DuckDB mirror of [[conversionLift]] — HUGEINT where the engine
    * rides DECIMAL(38,0), identical product form.
    */
  def conversionLiftSql(): String =
    s"""WITH cu AS (
       |  SELECT DISTINCT user_id, user_id % 2 AS variant
       |  FROM events WHERE user_id IS NOT NULL),
       |cpop AS (
       |  SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS pop0,
       |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pop1
       |  FROM cu),
       |cc AS (
       |  SELECT event_type,
       |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
       |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
       |  FROM (SELECT DISTINCT event_type, user_id, user_id % 2 AS variant
       |        FROM events WHERE user_id IS NOT NULL) t
       |  GROUP BY event_type),
       |cx AS (
       |  SELECT event_type, pop0, pop1, c0, c1,
       |    CAST(c0 AS HUGEINT) AS a, CAST(c1 AS HUGEINT) AS b,
       |    CAST(pop0 - c0 AS HUGEINT) AS c, CAST(pop1 - c1 AS HUGEINT) AS d,
       |    CAST(pop0 + pop1 AS HUGEINT) AS n
       |  FROM cc CROSS JOIN cpop)
       |SELECT event_type, pop0, pop1, c0, c1,
       |  CAST(c0 AS DOUBLE) / CAST(pop0 AS DOUBLE) AS rate0,
       |  CAST(c1 AS DOUBLE) / CAST(pop1 AS DOUBLE) AS rate1,
       |  CASE WHEN CAST((a + b) * (c + d) * (a + c) * (b + d) AS DOUBLE) > 0 THEN
       |    CAST(n AS DOUBLE) * CAST(a * d - b * c AS DOUBLE)
       |      * CAST(a * d - b * c AS DOUBLE)
       |      / CAST((a + b) * (c + d) * (a + c) * (b + d) AS DOUBLE) END AS chi2,
       |  (CASE WHEN CAST((a + b) * (c + d) * (a + c) * (b + d) AS DOUBLE) > 0 THEN
       |    CAST(n AS DOUBLE) * CAST(a * d - b * c AS DOUBLE)
       |      * CAST(a * d - b * c AS DOUBLE)
       |      / CAST((a + b) * (c + d) * (a + c) * (b + d) AS DOUBLE) END
       |    > $Chi2Crit95) AS significant
       |FROM cx""".stripMargin

  /** z_{0.975} + z_{0.80}: two-sided α = 0.05 at 80% power — the default
    * experiment-sizing constants (shared literal with the SQL mirror so
    * the engines multiply the same double).
    */
  val ZSumDefault: Double = 1.959963984540054 + 0.8416212335729143

  /** Minimum detectable effect (power analysis) per event type — the
    * question a team asks BEFORE the experiment that [[cuped]] reads out
    * after: with the traffic we have, what lift could we even see? Unit
    * of analysis = per-user total value (randomization is by user — the
    * same unit [[cuped]] uses; event-level rows are correlated within a
    * user and would understate the variance), variants by the user_id
    * parity convention. MDE_abs = (z_{1−α/2} + z_pow) · s ·
    * √(1/n₀ + 1/n₁) with s the pooled per-user sample sd — the standard
    * two-sample normal-approximation sizing formula; mde_rel divides by
    * the overall mean (null when the metric means zero). A team reads
    * the table as "event types where mde_rel ≫ the effect we hope for
    * are not worth testing at current traffic".
    *
    * Exactness: per-user totals quantize at ×100 and the (Σu, Σu²)
    * moments ride DECIMAL(38,0) (the CUPED discipline — squared
    * quantized totals pass long at ~10⁸ events of value 10⁶); the sd
    * and MDE are a fixed chain of double ops spelled identically in
    * both engines. n = 1 strata emit null sd/MDE rather than a
    * divide-by-zero Infinity.
    *
    * Scale shape: one grouped agg to (event_type, user) — the corpus's
    * only shuffle — then a second to ≤ ‖event types‖ rows with map-side
    * partials. No window, no sort, no driver state.
    */
  def mde(events: DataFrame, zSum: Double = ZSumDefault): DataFrame = {
    val dec = "decimal(38,0)"
    val ev = events
      .filter(col("user_id").isNotNull && col("value").isNotNull &&
        abs(col("value")) < 9e15)
      .select(col("event_type"), col("user_id"),
        expr("cast(round(value * 100) as long)").as("vq"))
    val per = ev.groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("vq")).as("u"))
      .withColumn("variant", pmod(col("user_id"), lit(2L)))
    val agg = per.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
        sum(col("u").cast(dec)).as("su"),
        sum(col("u").cast(dec) * col("u").cast(dec)).as("suu"))
      .withColumn("varn",
        (col("n") * col("suu") - col("su") * col("su")).cast("double"))
    val meanU = col("su").cast("double") / (col("n").cast("double") * 100.0)
    val sdU = when(col("n") > 1,
      sqrt(col("varn") / (col("n").cast("double")
        * (col("n").cast("double") - 1.0))) / 100.0)
    val mdeAbs = when(col("n0") > 0 && col("n1") > 0,
      lit(zSum) * sdU * sqrt(lit(1.0) / col("n0").cast("double")
        + lit(1.0) / col("n1").cast("double")))
    agg.select(col("event_type"),
      col("n0"), col("n1"),
      meanU.as("mean_u"), sdU.as("sd_u"), mdeAbs.as("mde_abs"),
      when(meanU =!= 0.0, mdeAbs / meanU).as("mde_rel"))
  }

  /** DuckDB mirror of [[mde]] — identical quantization, DECIMAL moments
    * and double-op chain.
    */
  def mdeSql(zSum: Double = ZSumDefault): String =
    s"""WITH mev AS (
       |  SELECT event_type, user_id,
       |    CAST(ROUND(value * 100) AS BIGINT) AS vq
       |  FROM events
       |  WHERE user_id IS NOT NULL AND value IS NOT NULL
       |    AND abs(value) < 9e15),
       |mper AS (
       |  SELECT event_type, user_id, CAST(SUM(vq) AS HUGEINT) AS u,
       |    user_id % 2 AS variant
       |  FROM mev GROUP BY event_type, user_id),
       |magg AS (
       |  SELECT event_type,
       |    CAST(COUNT(*) AS HUGEINT) AS n,
       |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    SUM(u) AS su, SUM(u * u) AS suu
       |  FROM mper GROUP BY event_type),
       |mv AS (
       |  SELECT *, CAST(n * suu - su * su AS DOUBLE) AS varn FROM magg),
       |mx AS (
       |  SELECT event_type, n0, n1,
       |    CAST(su AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) AS mean_u,
       |    CASE WHEN n > 1 THEN
       |      sqrt(varn / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 100.0
       |    END AS sd_u
       |  FROM mv)
       |SELECT event_type, n0, n1, mean_u, sd_u,
       |  CASE WHEN n0 > 0 AND n1 > 0 THEN
       |    $zSum * sd_u * sqrt(1.0 / CAST(n0 AS DOUBLE)
       |      + 1.0 / CAST(n1 AS DOUBLE)) END AS mde_abs,
       |  CASE WHEN mean_u <> 0.0 THEN
       |    (CASE WHEN n0 > 0 AND n1 > 0 THEN
       |      $zSum * sd_u * sqrt(1.0 / CAST(n0 AS DOUBLE)
       |        + 1.0 / CAST(n1 AS DOUBLE)) END) / mean_u END AS mde_rel
       |FROM mx""".stripMargin
}
