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

  test("null values and null ids are skipped") {
    val df = Seq(
      (1L, Some(3.0), Some(1L)), (1L, None, Some(2L)), (1L, Some(9.0), None)
    ).toDF("g", "v", "id")
    val out = df.groupBy($"g").agg(TopKAgg.top_k_ids($"v", $"id", 2).as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) === Seq(1L))
  }
}
