package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Predicate-filtered ANN: the widened-probe filtered search must match
  * the unfiltered audit's recall bar, the naive same-budget filtered
  * search must show the under-return pathology that motivates widening,
  * and a pushable predicate must reach the parquet scan.
  */
class FilteredAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = Tables.embeddings(spark, Sf)
  private val pred = col("vec_id") % 4 === 1

  private def aggRecall(df: org.apache.spark.sql.DataFrame): Double = {
    val r = df.agg(sum($"n_hit").cast("double"), sum($"n_truth").cast("double")).head()
    r.getDouble(0) / r.getDouble(1)
  }

  test("filtered search at the widened budget matches the unfiltered production bar") {
    // each side is measured against its own honest truth: filtered vs
    // brute-over-filtered-store, unfiltered vs brute-over-full-store
    val filtered4 = aggRecall(Similarity.filteredRecall(e, pred, nprobe = 4))
    val unfiltered2 = Similarity.ivfRecallCurve(e, nprobes = Seq(2), queryCap = 64)
      .select($"recall").as[Double].head()
    assert(filtered4 >= unfiltered2,
      s"widened filtered recall $filtered4 fell below the unfiltered bar $unfiltered2")
  }

  test("same-budget filtered search under-returns — the pathology that motivates widening") {
    val filtered2 = aggRecall(Similarity.filteredRecall(e, pred, nprobe = 2))
    val filtered4 = aggRecall(Similarity.filteredRecall(e, pred, nprobe = 4))
    assert(filtered2 < filtered4,
      s"fixture lost its power: nprobe 2 ($filtered2) should trail nprobe 4 ($filtered4)")
  }

  test("a pushable predicate reaches the parquet scan (PushedFilters)") {
    val plan = Similarity.knnIvfFiltered(e, col("label") === 2)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val scanLines = plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(scanLines.contains("EqualTo(label,2)"),
      s"store predicate must reach the scan, got:\n$scanLines")
  }

  test("filtered results honor the predicate and exclude the query itself") {
    val out = Similarity.knnIvfFiltered(e, pred, queryCap = 64).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) % 4 === 1, s"non-matching candidate ${r.getLong(1)} returned")
      assert(r.getLong(0) !== r.getLong(1), "query returned itself")
    }
  }
}
