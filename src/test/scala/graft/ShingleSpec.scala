package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** The fused ShingleHashes expression must produce exactly the same
  * per-doc shingle-hash MULTISET as the posexplode + window-lead
  * formulation (which the DuckDB oracles mirror), on edge strings and on
  * the whole corpus.
  */
class ShingleSpec extends SparkSpec {
  import spark.implicits._

  private def multisets(df: org.apache.spark.sql.DataFrame) =
    df.groupBy($"doc_id", $"h").count()

  test("fused == windowed formulation on edge docs") {
    val docs = Seq(
      (1L, ""), (2L, "one"), (3L, "one two"),           // < 3 tokens → none
      (4L, "one two three"), (5L, "a b c d e"),
      (6L, "rep rep rep rep"),                          // duplicate shingles kept
      (7L, "  spaced\tout\nwords \f here \r"),
      (8L, "MiXeD Case TOKENS here"),
      (9L, "unicode é ü 中文 žluť İstanbul"),
      (10L, "😀 emoji in a shingle stream")
    ).toDF("doc_id", "text")
    val a = multisets(Dedup.shingles(docs))
    val b = multisets(Dedup.shinglesWindowed(docs)).withColumnRenamed("count", "expect")
    val joined = a.join(b, Seq("doc_id", "h"), "full_outer")
    assert(joined.filter(!($"count" <=> $"expect")).count() === 0)
    // docs with < 3 tokens contribute nothing
    assert(Dedup.shingles(docs).filter($"doc_id" <= 2).count() === 0)
  }

  test("fused == windowed across the whole documents corpus") {
    val docs = Tables.documents(spark, Sf)
    val a = multisets(Dedup.shingles(docs))
    val b = multisets(Dedup.shinglesWindowed(docs)).withColumnRenamed("count", "expect")
    val joined = a.join(b, Seq("doc_id", "h"), "full_outer")
    assert(joined.filter(!($"count" <=> $"expect")).count() === 0)
  }

  test("shingle stream is a narrow map — no exchange before aggregation") {
    val p = withoutScanRebalance(Dedup.shingles(Tables.documents(spark, Sf))
      .queryExecution.executedPlan.toString)
    assert(!p.contains("Exchange"), s"shingle stream must not shuffle:\n$p")
    assert(!p.contains("Window"))
  }
}
