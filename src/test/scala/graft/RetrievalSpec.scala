package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Reciprocal-Rank Fusion on hand-computed fixtures: exact integer
  * nano-unit scores, consensus docs outrank single-list docs, the
  * deterministic (score desc, doc_id) tie-break, and topNRanked's
  * bounded TakeOrderedAndProject list building.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("ndcgAudit: hand-computed DCG on a designed inversion; perfect order scores 1") {
    // term "cat", uniform doc length (4 tokens) → BM25 reduces to tf
    // saturation, which is MONOTONE in tf at equal dl: ranking order ==
    // grade order → nDCG must be exactly 1 and integer sums must match
    // the hand-computed gains (tf 3→gain 7, 2→3, 1→1)
    val uniform = Seq(
      (1L, "cat cat cat x"), // tf 3, gain 7
      (2L, "cat cat x y"),   // tf 2, gain 3
      (3L, "cat x y z"))     // tf 1, gain 1
      .toDF("doc_id", "text")
    val d = Retrieval.ndcgDiscNanos(10).toMap
    val r1 = Retrieval.ndcgAudit(uniform, Seq("cat")).collect()
    assert(r1.length === 1)
    val expect = 7L * d(1) + 3L * d(2) + 1L * d(3)
    assert(r1.head.getAs[Long]("dcg_nanos") === expect)
    assert(r1.head.getAs[Long]("idcg_nanos") === expect)
    assert(r1.head.getAs[Double]("ndcg") === 1.0)
    assert(r1.head.getAs[Long]("n_matched") === 3L)

    // now give the tf-3 doc a huge length: BM25's length normalization
    // demotes it below the short tf-1 doc → a real inversion, nDCG < 1
    val skewed = Seq(
      (1L, "cat cat cat " + Seq.fill(197)("pad").mkString(" ")), // dl 200
      (2L, "cat x")) // dl 2
      .toDF("doc_id", "text")
    val r2 = Retrieval.ndcgAudit(skewed, Seq("cat")).collect().head
    assert(r2.getAs[Double]("ndcg") < 1.0, "length-norm inversion must cost nDCG")
    // ideal = gains (7, 1); observed = (1, 7)
    assert(r2.getAs[Long]("idcg_nanos") === 7L * d(1) + 1L * d(2))
    assert(r2.getAs[Long]("dcg_nanos") === 1L * d(1) + 7L * d(2))
  }

  test("ndcgAudit on the corpus: bounded by 1, positive, one row per matched term") {
    val rows = Retrieval.ndcgAudit(
      graft.sources.Tables.documents(spark, Sf), Seq("scan", "merge", "sort")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Double]("ndcg")
      assert(n > 0 && n <= 1.0 + 1e-12, s"${r.getAs[String]("term")}: ndcg $n")
      assert(r.getAs[Long]("n_ranked") <= 10L)
      assert(r.getAs[Long]("dcg_nanos") <= r.getAs[Long]("idcg_nanos"))
    }
  }

  test("hybridFuse: hand-computed normalization; score shape decides where ranks tie") {
    // list A: doc 10 runs away (10.0 vs 1.0/0.0); list B: flat spread.
    // Under RRF both docs 10 and 11 would tie on rank sums; the convex
    // combination must prefer the runaway.
    val a = Seq((1L, 10L, 10.0), (1L, 11L, 1.0), (1L, 12L, 0.0))
      .toDF("qid", "doc_id", "score")
    val b = Seq((1L, 11L, 2.0), (1L, 10L, 1.0), (1L, 12L, 0.0))
      .toDF("qid", "doc_id", "score")
    val out = Retrieval.hybridFuse(Seq((a, 0.5), (b, 0.5)))
      .collect().map(r => r.getLong(1) -> ((r.getDouble(2), r.getLong(3), r.getLong(4))))
      .toMap
    // norms: A → 10: 1.0, 11: 0.1, 12: 0.0; B → 11: 1.0, 10: 0.5, 12: 0.0
    assert(math.abs(out(10L)._1 - (0.5 * 1.0 + 0.5 * 0.5)) < 1e-12)
    assert(math.abs(out(11L)._1 - (0.5 * 0.1 + 0.5 * 1.0)) < 1e-12)
    assert(out(12L)._1 === 0.0)
    assert(out(10L)._3 === 1L, "the runaway-score doc must win")
    assert(out(11L)._3 === 2L)
    assert(out.forall(_._2._2 <= 2L))
  }

  test("hybridFuse: a constant list normalizes to its ceiling; absent docs score the other half") {
    val const = Seq((1L, 10L, 7.0), (1L, 11L, 7.0)).toDF("qid", "doc_id", "score")
    val only = Seq((1L, 10L, 3.0), (1L, 12L, 1.0)).toDF("qid", "doc_id", "score")
    val out = Retrieval.hybridFuse(Seq((const, 0.5), (only, 0.5)))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(math.abs(out(10L) - (0.5 + 0.5)) < 1e-12, "present in both, both at ceiling")
    assert(math.abs(out(11L) - 0.5) < 1e-12, "constant-list member at the list ceiling")
    assert(math.abs(out(12L) - 0.0) < 1e-12, "bottom of the spread list, absent elsewhere")
  }

  test("rrf: hand-computed scores, consensus beats single-list, ties break by doc_id") {
    // query 1: listA ranks (10,11,12), listB ranks (12,10,13)
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L)).toDF("qid", "doc_id", "rank")
    val b = Seq((1L, 12L, 1L), (1L, 10L, 2L), (1L, 13L, 3L)).toDF("qid", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), kRrf = 60, topK = 10)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def u(r: Long) = 1000000000L / (60L + r) // exact integer division
    // doc 10: ranks 1+2 → u(1)+u(2); doc 12: ranks 3+1 → u(3)+u(1)
    assert(out(10L) === ((u(1) + u(2), 2L, 1L)))
    assert(out(12L) === ((u(3) + u(1), 2L, 2L)))
    // single-list docs score below any two-list doc here
    assert(out(11L)._1 === u(2) && out(11L)._2 === 1L)
    assert(out(13L)._1 === u(3) && out(13L)._2 === 1L)
    // 11 (u(2)=16129032) above 13 (u(3)=15873015); ranks 3,4
    assert(out(11L)._3 === 3L && out(13L)._3 === 4L)
  }

  test("rrf: identical scores tie-break by doc_id; topK truncates per query") {
    // both docs appear at the same rank in one list each → equal scores
    val a = Seq((7L, 5L, 1L), (7L, 3L, 2L)).toDF("qid", "doc_id", "rank")
    val b = Seq((7L, 4L, 1L), (7L, 9L, 2L)).toDF("qid", "doc_id", "rank")
    val rows = Retrieval.rrfFuse(Seq(a, b), kRrf = 60, topK = 3)
      .orderBy($"rank").collect()
    assert(rows.length === 3, "topK must truncate")
    // rank-1 docs 4 and 5 tie → doc_id ascending; then rank-2 doc 3
    assert(rows.map(_.getLong(1)).toSeq === Seq(4L, 5L, 3L))
  }

  test("topNRanked: deterministic bounded list with 1-based dense ranks") {
    val df = Seq((1L, 50L), (2L, 70L), (3L, 70L), (4L, 10L), (5L, 60L))
      .toDF("doc_id", "score")
    val got = Retrieval.topNRanked(df, "score", "doc_id", 3)
      .orderBy($"rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 70 ties: doc 2 before doc 3; then 60
    assert(got === Seq((2L, 1L), (3L, 2L), (5L, 3L)))
  }

  test("retrieval e2e: docs removed by dedup never appear in fused lists or as queries") {
    import graft.operators.Dedup
    import graft.sources.Tables
    val c = Dedup.corpus(Tables.documents(spark, Sf))
    val removed = Dedup.clustersFor(c, Sf)
      .filter(!$"is_keeper").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(removed.nonEmpty, "fixture must actually remove documents")
    val fused = SparkEntry.queries("q_retrieval_e2e")(spark, Sf).collect()
    assert(fused.nonEmpty)
    for (r <- fused) {
      assert(!removed.contains(r.getLong(0)), s"deduped doc served as query: $r")
      assert(!removed.contains(r.getLong(1)), s"deduped doc leaked into a list: $r")
    }
  }

  test("rrf plan: fusion shuffles on (qid, doc_id) only — no corpus-sized side") {
    // the q_doc_rrf instance's plan: the lexical list reaches the fusion
    // as a broadcast (20-row side), never a shuffle of the corpus
    val plan = SparkEntry.queries("q_doc_rrf")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"lexical 20-row list must broadcast:\n$plan")
  }
}
