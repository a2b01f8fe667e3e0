package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** embeddingHealth on planted junk: NaN / Inf elements, the zero vector,
  * extreme magnitudes, ragged dimensions — each counted in its own
  * bucket, none crashing the stage (quantization happens only on the
  * healthy subset), mean norm exact over that subset.
  */
class EmbeddingHealthSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Float], Int)]) =
    rows.toDF("vec_id", "embedding", "label")

  test("junk vectors route to their buckets; healthy mean-norm stays exact") {
    val out = Similarity.embeddingHealth(df(Seq(
      (1L, Seq(3f, 4f), 0),                      // healthy, norm 5
      (2L, Seq(0f, 0f), 0),                      // zero vector
      (3L, Seq(Float.NaN, 1f), 0),               // NaN
      (4L, Seq(Float.PositiveInfinity, 1f), 0),  // +Inf
      (5L, Seq(Float.NegativeInfinity, 1f), 0),  // −Inf
      (6L, Seq(1e30f, 1e30f), 0),                // extreme magnitude
      (7L, Seq(6f, 8f), 0))))                    // healthy, norm 10
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_vecs") === 7L)
    assert(r.getAs[Long]("n_nonfinite") === 3L)
    assert(r.getAs[Long]("n_extreme") === 1L)
    assert(r.getAs[Long]("n_zero") === 1L)
    assert(r.getAs[Long]("n_healthy") === 3L) // norms 5, 0, 10
    // exact: (round(5·2^24) + 0 + round(10·2^24)) / (3·2^24) = 5.0
    assert(r.getAs[Double]("mean_norm") === 5.0)
  }

  test("ragged dimensions surface in the dims range; all-junk label has null mean") {
    val out = Similarity.embeddingHealth(df(Seq(
      (1L, Seq(1f, 2f, 3f), 1),
      (2L, Seq(1f, 2f), 1),                  // ragged: 2 vs 3 dims
      (3L, Seq(Float.NaN), 2))))             // label 2: nothing healthy
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    assert((out(1).getAs[Long]("dims_min"), out(1).getAs[Long]("dims_max")) === ((2L, 3L)))
    assert(out(2).getAs[Long]("n_healthy") === 0L)
    assert(out(2).isNullAt(out(2).fieldIndex("mean_norm")),
      "an all-junk label must yield null mean, not divide by zero")
  }

  test("plan: one grouped aggregation, no join, no window") {
    val plan = Similarity.embeddingHealth(
      graft.sources.Tables.embeddings(spark, Sf)).queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"health audit must be a single-pass aggregation:\n$plan")
  }
}
