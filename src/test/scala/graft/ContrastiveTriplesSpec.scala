package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** contrastiveTriples on a constructed cluster + embedding geometry: the
  * anchor's whole cluster is excluded from negatives (the false-negative
  * trap), singletons count as their own cluster, ranks are deterministic,
  * and every (positive × negative) combination appears.
  */
class ContrastiveTriplesSpec extends SparkSpec {
  import spark.implicits._

  test("negatives exclude the anchor's whole cluster; triples are pos × neg") {
    // cluster 1 = {1, 101, 102}; vectors: 2 is very close to anchor 1
    // (the would-be false negative if only the anchor were excluded is
    // 101/102 — but those have no vectors; doc 2's closeness makes it
    // the top TRUE negative), 3 orthogonal-ish, 4 far
    val clusters = Seq((1L, 1L, true), (101L, 1L, false), (102L, 1L, false))
      .toDF("doc_id", "cluster", "is_keeper")
    val emb = Seq(
      (1L, Seq(1f, 0f), 0),
      (2L, Seq(0.95f, 0.3f), 0),
      (3L, Seq(0.1f, 1f), 0),
      (4L, Seq(-1f, 0.1f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.contrastiveTriples(clusters, emb, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    // anchors: cluster 1 only; positives 101, 102; negatives top-2 of
    // {2, 3, 4} (anchor 1 itself excluded via its own cluster row)
    assert(out.length === 4, s"2 positives x 2 negatives: ${out.toSeq}")
    assert(out.forall(_._1 == 1L))
    assert(out.map(_._2).toSet === Set(101L, 102L))
    val negByRank = out.map(t => t._4 -> t._3).toMap
    assert(negByRank === Map(1L -> 2L, 2L -> 3L),
      s"rank 1 must be the nearest other-cluster vector: ${out.toSeq}")
    assert(!out.exists(_._3 == 1L), "the anchor itself must never be a negative")
  }

  test("a cluster member WITH a vector is excluded from negatives") {
    // doc 2 is in the anchor's cluster AND has the closest vector — it
    // must not appear as a negative
    val clusters = Seq((1L, 1L, true), (2L, 1L, false))
      .toDF("doc_id", "cluster", "is_keeper")
    val emb = Seq(
      (1L, Seq(1f, 0f), 0),
      (2L, Seq(0.99f, 0.1f), 0), // near-dup with a vector: the trap
      (3L, Seq(0.2f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.contrastiveTriples(clusters, emb, k = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty && out.forall(_._2 == 3L),
      s"the in-cluster near-dup must never be a negative: ${out.toSeq}")
  }

  test("ANN variant: scaled-copy negative lands in the anchor's own bucket and ranks first") {
    // sign-bit buckets are scale-invariant, so 1.5× the anchor vector
    // shares its bucket exactly — the near-miss negative the probe set
    // must retain; the in-cluster member is still excluded
    val clusters = Seq((1L, 1L, true), (2L, 1L, false))
      .toDF("doc_id", "cluster", "is_keeper")
    val emb = Seq(
      (1L, Seq(0.8f, 0.6f), 0),
      (2L, Seq(0.79f, 0.61f), 0),          // in-cluster: excluded
      (3L, Seq(1.2f, 0.9f), 1))            // 1.5× anchor: same bucket, cos 1.0
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.contrastiveTriplesAnn(clusters, emb, k = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(out.nonEmpty, "the scaled copy must be probed and retained")
    assert(out.forall(_._2 == 3L), s"only the other-cluster copy may serve: ${out.toSeq}")
    assert(out.forall(t => math.abs(t._3 - 1.0) < 1e-12 && t._4 == 1L),
      s"scale-invariant cosine 1.0 at rank 1: ${out.toSeq}")
  }

  test("ANN variant on the corpus: exclusion discipline and bounded negatives hold") {
    import graft.operators.Dedup
    import graft.sources.Tables
    val c = Dedup.corpus(Tables.documents(spark, Sf))
    val clusters = Dedup.clustersFor(c, Sf)
    // one collect, O(1) membership checks in the loop
    val clusterOf = clusters.select($"doc_id", $"cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Similarity.contrastiveTriplesAnn(clusters, Tables.embeddings(spark, Sf))
      .filter($"neg_id".isNotNull).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getLong(2) != r.getLong(0), "anchor never its own negative")
      assert(clusterOf.getOrElse(r.getLong(2), r.getLong(2)) != r.getLong(0),
        s"in-cluster negative leaked: $r")
      assert(r.getLong(4) >= 1L && r.getLong(4) <= 3L)
    }
  }

  test("ANN variant: an anchor with no eligible negative keeps its pairs with null negatives") {
    // single bucket world: anchor and its only bucket-mates are all in
    // the anchor's cluster → zero eligible negatives, but the
    // (anchor, positive) pair must SURVIVE with null negative columns
    val clusters = Seq((1L, 1L, true), (2L, 1L, false), (101L, 1L, false))
      .toDF("doc_id", "cluster", "is_keeper")
    val emb = Seq(
      (1L, Seq(0.8f, 0.6f), 0),
      (2L, Seq(0.81f, 0.59f), 0)) // same bucket, same cluster → excluded
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.contrastiveTriplesAnn(clusters, emb, k = 2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L), (1L, 101L)),
      s"pairs must survive a negative-less anchor: ${out.toSeq}")
    assert(out.forall(_.isNullAt(2)),
      s"negative columns must be null, not fabricated: ${out.toSeq}")
  }

  test("plan: ANN candidate joins are shuffle-hash on bucket/id, never a cartesian") {
    val plan = SparkEntry.queries("q_pipeline_pairs")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"bucket/cluster joins must shuffle-hash:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no all-pairs anywhere in the ANN factory:\n$plan")
  }
}
