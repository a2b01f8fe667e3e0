package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sketch-based aggregates (HLL++, T-digest style) can't be DuckDB-oracle
  * hash-checked — different sketch implementations — so their accuracy
  * contract is pinned here against exact counterparts instead.
  */
class ApproxAggSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on every grouping") {
    val li = Tables.lineitem(spark, Sf)
    val r = li.groupBy($"l_returnflag").agg(
      countDistinct($"l_partkey").as("exact"),
      approx_count_distinct($"l_partkey").as("approx"))
      .select($"exact".cast("double"), $"approx".cast("double"))
      .as[(Double, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (e, a) => assert(math.abs(a - e) / e <= 0.05, s"exact=$e approx=$a") }
  }

  test("approx_percentile brackets the exact percentile") {
    val o = Tables.orders(spark, Sf)
    val (exact, approx) = o.select(
      percentile($"o_totalprice", lit(0.5)),
      percentile_approx($"o_totalprice", lit(0.5), lit(1000)))
      .as[(Double, Double)].head()
    assert(math.abs(approx - exact) / exact <= 0.02, s"exact=$exact approx=$approx")
  }

  test("HLL sketches merge across increments: union of snapshots ≈ whole-corpus distinct") {
    // the incremental distinct-count pattern (daily user counts at 100 TB):
    // keep one serialized HLL sketch per increment — a few KB each — and
    // answer "distinct overall" by unioning SKETCHES, never re-scanning
    val ev = Tables.events(spark, Sf)
    val a = ev.filter($"event_id" % 2 === 0)
    val b = ev.filter($"event_id" % 2 =!= 0)
    val snapshots = a.agg(hll_sketch_agg($"user_id").as("sk"))
      .unionByName(b.agg(hll_sketch_agg($"user_id").as("sk")))
    val merged = snapshots.agg(
      hll_sketch_estimate(hll_union_agg($"sk")).as("est")).as[Long].head()
    val exact = ev.select($"user_id").distinct().count()
    // HLL++ at default lgConfigK=12: relative error ~1.6%; generous 5%
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"merged=$merged exact=$exact")
  }
}
