package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** OPQ (Ge'13, 1-PC Householder instantiation): the rotation is a real
  * isometry (pairwise distances preserved), degenerates to the identity
  * when PC1 is already axis-aligned, and the equal-bytes recall bake-off
  * row holds on the spec corpus.
  */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  test("the Householder rotation preserves pairwise L2 distances") {
    val e = graft.sources.Tables.embeddings(spark, Sf)
    val rot = Similarity.rotatedCorpus(e, Sf)
    val raw = e.select($"vec_id", $"embedding".cast("array<double>").as("a"))
    val rr = rot.select($"vec_id", $"embedding".cast("array<double>").as("b"))
    // distances between consecutive ids, raw vs rotated
    val d = raw.join(rr, "vec_id")
      .join(raw.select(($"vec_id" - 1).as("vec_id"), $"a".as("a2"))
        .join(rr.select(($"vec_id" - 1).as("vec_id"), $"b".as("b2")), "vec_id"),
        "vec_id")
      .select(graft.functions.VectorFunctions.l2sq($"a", $"a2").as("dr"),
        graft.functions.VectorFunctions.l2sq($"b", $"b2").as("db"))
      .collect()
    assert(d.length > 100)
    d.foreach { r =>
      val (dr, db) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(dr - db) <= 1e-9 * math.max(dr, 1.0),
        s"rotation broke a distance: $dr vs $db")
    }
  }

  test("axis-aligned PC1 degenerates to the identity rotation") {
    // variance only on dim 0 → the centered matvec is exactly
    // proportional to e1 at every iteration → w = e1 exactly → sq = 0
    val dims = 64
    val e = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(dims)(d => if (d == 0) i.toFloat else 0.5f), i % 4)
    }.toDF("vec_id", "embedding", "label")
    val rot = Similarity.rotatedCorpus(e, dir = "")
    assert(rot eq e, "identity case must return the input frame untouched")
  }

  test("recall row: OPQ >= raw PQ at equal bytes on the spec corpus") {
    val got = Similarity.opqRecall(graft.sources.Tables.embeddings(spark, Sf), Sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === Set("pq", "opq"))
    val (pqHit, pqTruth, pqRec) = got("pq")
    val (opqHit, opqTruth, opqRec) = got("opq")
    assert(pqTruth == opqTruth && pqTruth > 0)
    assert(pqHit > 0 && opqHit > 0, "both variants must find something")
    assert(opqRec >= pqRec,
      s"1-PC rotation lost recall on the spec corpus: opq $opqRec < pq $pqRec")
    assert(pqRec == pqHit.toDouble / pqTruth)
  }

  test("knnOpq is partitioning- and AQE-independent (the rm3-incident pin class)") {
    val e = graft.sources.Tables.embeddings(spark, Sf)
    def run(parts: Int): Seq[(Long, Long, Long)] =
      Similarity.knnOpq(e.repartition(parts), Sf)
        .orderBy($"qid", $"rank")
        .as[(Long, Long, Long)].collect().toSeq
    val base = run(1)
    assert(base.nonEmpty)
    assert(run(13) === base, "13-partition run diverged")
    val aqeKey = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(aqeKey)
    try {
      spark.conf.set(aqeKey, "false")
      assert(run(13) === base, "AQE-off run diverged")
    } finally spark.conf.set(aqeKey, old)
  }

  test("alternation round 2: a degenerate deflated fit proposes no challengers") {
    // variance only on dim 0: H1 is the identity (PC1 = e1 exactly) and
    // the coordinate-0-masked corpus is CONSTANT — its centered matvec
    // vanishes, the power iteration keeps its uniform seed with lam = 0,
    // and no real second direction exists. The alternation must propose
    // NOTHING (candidates = [H1 alone]) rather than build challengers
    // from the stale seed — which is also what keeps the oracle aligned
    // (its challenger chains normalize by sqrt(0) into NULL SSEs and
    // keep candidate 0).
    val dims = 64
    val e = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(dims)(d => if (d == 0) i.toFloat else 0.5f), i % 4)
    }.toDF("vec_id", "embedding", "label")
    val cands = Similarity.opq2Candidates(e, dir = "")
    assert(cands.sizeIs == 1)
    assert(Similarity.rotatedCorpus2(e, dir = "") eq cands.head)
  }

  test("alternation round 2: every candidate rotation is an exact isometry") {
    val e = graft.sources.Tables.embeddings(spark, Sf)
    val raw = e.select($"vec_id", $"embedding".cast("array<double>").as("a"))
    for ((cand, ci) <- Similarity.opq2Candidates(e, Sf).zipWithIndex) {
      val rr = cand.select($"vec_id", $"embedding".cast("array<double>").as("b"))
      val d = raw.join(rr, "vec_id")
        .join(raw.select(($"vec_id" - 1).as("vec_id"), $"a".as("a2"))
          .join(rr.select(($"vec_id" - 1).as("vec_id"), $"b".as("b2")), "vec_id"),
          "vec_id")
        .select(graft.functions.VectorFunctions.l2sq($"a", $"a2").as("dr"),
          graft.functions.VectorFunctions.l2sq($"b", $"b2").as("db"))
        .collect()
      assert(d.length > 100)
      d.foreach { r =>
        val (dr, db) = (r.getDouble(0), r.getDouble(1))
        assert(math.abs(dr - db) <= 1e-9 * math.max(dr, 1.0),
          s"candidate $ci broke a distance: $dr vs $db")
      }
    }
  }

  test("alternation round 2: accept-by-measurement never regresses the quantization objective") {
    val e = graft.sources.Tables.embeddings(spark, Sf)
    val sses = Similarity.opq2CandidateSses(e, Sf)
    assert(sses.length == 3 && sses.forall(_ > 0))
    val chosen = Similarity.pqSse(Similarity.rotatedCorpus2(e, Sf), 8)
    // descent: the accepted rotation's refit-codebook SSE is never worse
    // than keeping H1 alone…
    assert(chosen <= sses.head,
      s"alternation regressed the objective: $chosen > ${sses.head} (all: $sses)")
    // …and a challenger only ever displaces the incumbent past the
    // hysteresis bar (sub-noise-floor wins are rejected)
    if (chosen < sses.head)
      assert(chosen * 10000L <=
        sses.head * (10000L - Similarity.OpqAcceptPermyriad),
        s"accepted challenger under the hysteresis bar: $chosen vs ${sses.head}")
  }

  test("alternation round 2: three-variant bake-off — opq2 recall >= opq at equal bytes") {
    val got = Similarity.opq2Recall(graft.sources.Tables.embeddings(spark, Sf), Sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === Set("pq", "opq", "opq2"))
    val (_, t1, opqRec) = got("opq")
    val (h2, t2, opq2Rec) = got("opq2")
    assert(t1 == t2 && t1 > 0 && h2 > 0)
    assert(opq2Rec >= opqRec,
      s"the alternation lost recall vs its own round 1: $opq2Rec < $opqRec")
  }

  test("ivfopq2 serving contract: accepted-rotation IVF search, self excluded, ranks dense") {
    val e = graft.sources.Tables.embeddings(spark, Sf)
    val got = Similarity.knnIvfOpq2(e, Sf)
    assert(got.columns.toSeq === Seq("qid", "rank", "vec_id"))
    val rows = got.as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, r, v) => q != v && r >= 0 && r < 3 })
    // per query: ranks are 0..cnt-1 dense
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (0L until rs.length).toSeq,
        s"query $q ranks not dense: ${rs.toSeq}")
    }
  }

  test("knnOpq output contract matches knnPq (same shape, same k per query)") {
    val e = graft.sources.Tables.embeddings(spark, Sf)
    val opq = Similarity.knnOpq(e, Sf)
    assert(opq.columns.toSeq === Seq("qid", "rank", "vec_id"))
    val perQ = opq.groupBy($"qid").count().select($"count").distinct()
      .as[Long].collect().toSet
    assert(perQ === Set(5L), s"every query must return k=5 rows: $perQ")
    // self never returned
    assert(opq.filter($"qid" === $"vec_id").count() == 0)
  }
}
