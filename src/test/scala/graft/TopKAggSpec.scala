package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.TopKAgg
import graft.sources.Tables

/** The bounded-heap top-k aggregate must agree with the window-function
  * formulation (row_number over value desc, id) on every group — across
  * the partial/merge path (forced by repartitioning).
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("heap aggregate == window top-k on every customer, incl. merge path") {
    val orders = Tables.orders(spark, Sf).repartition(8) // force multi-partition merge
    val agg = orders.groupBy($"o_custkey")
      .agg(TopKAgg.top_k_ids($"o_totalprice", $"o_orderkey", 3).as("top_ids"))
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val win = orders
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .groupBy($"o_custkey")
      .agg(array_sort(collect_list(struct($"rn", $"o_orderkey"))).as("pairs"))
      .select($"o_custkey", transform($"pairs", p => p.getField("o_orderkey")).as("expect"))
    val joined = agg.join(win, "o_custkey")
    assert(joined.count() > 0)
    assert(joined.filter($"top_ids" =!= $"expect").count() === 0)
  }

  test("groups smaller than k return all their ids; ties break to smaller id") {
    val df = Seq(
      (1L, 5.0, 10L), (1L, 5.0, 11L), (1L, 7.0, 12L), (1L, 1.0, 13L), (1L, 5.0, 9L),
      (2L, 2.0, 20L)
    ).toDF("g", "v", "id").repartition(4)
    val out = df.groupBy($"g").agg(TopKAgg.top_k_ids($"v", $"id", 3).as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) === Seq(12L, 9L, 10L)) // 7.0, then the 5.0 tie → ids 9,10 (11 dropped)
    assert(out(2L) === Seq(20L))
  }

  test("top_k_pairs: (id, value) structs match the row_number window exactly, partial-aggregated") {
    val rnd = new scala.util.Random(42)
    val df = (0 until 3000).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(40).toDouble / 4.0, rnd.nextInt(5000).toLong))
      .toDF("g", "v", "id").distinct().repartition(7)
    val agg = df.groupBy($"g")
      .agg(TopKAgg.top_k_pairs($"v", $"id", 4).as("ps"))
      .select($"g", posexplode($"ps").as(Seq("pos", "p")))
      .select($"g", $"p.id".as("id"), $"p.value".as("v"),
        ($"pos" + 1).cast("long").as("rn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v".desc, $"id")
    val win = df.withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 4).select($"g", $"id", $"v", $"rn")
    def snap(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, Double, Long)].collect().sorted.toSeq
    assert(snap(agg) === snap(win),
      "pairs aggregate diverged from the window formulation")
    // plan: map-side combined (the reason the aggregate exists)
    val plan = agg.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("partial_topkpairsbyvalue"), plan)
  }

  test("null values and null ids are skipped") {
    val df = Seq(
      (1L, Some(3.0), Some(1L)), (1L, None, Some(2L)), (1L, Some(9.0), None)
    ).toDF("g", "v", "id")
    val out = df.groupBy($"g").agg(TopKAgg.top_k_ids($"v", $"id", 2).as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) === Seq(1L))
  }
}
