package graft

import graft.operators.Similarity

/** IVF maintenance (reassign-drifted-cells): planted-drift fixtures pin
  * the flag rule, the flagged-only retrain, the convergence of drifted
  * members, and byte-identical healthy-cell assignments.
  */
class ReassignSpec extends SparkSpec {
  import spark.implicits._

  // frozen snapshot: cell 0 at (0,0), cell 100 at (10,10)
  private def cents = Seq(
    (0L, Seq(0.0, 0.0)),
    (100L, Seq(10.0, 10.0))).toDF("cell", "cemb")

  test("drifted cell is retrained and its members converge; healthy cell untouched") {
    // cell 0 healthy: train (even ids) and new (odd ids) fit alike.
    // cell 100 drifted: its post-build vectors (ids 5, 7) sit at (13,13),
    // d2 = 18 vs the training member's 0 — flagged by any driftFactor.
    val e = Seq(
      (0L, Array(0.0f, 0.0f), 0L),
      (2L, Array(0.2f, 0.0f), 0L),
      (1L, Array(0.1f, 0.0f), 0L),
      (4L, Array(10.0f, 10.0f), 1L),
      (5L, Array(13.0f, 13.0f), 1L),
      (7L, Array(13.0f, 13.0f), 1L)).toDF("vec_id", "embedding", "label")
    val out = Similarity.reassignDrifted(e, cents)
      .as[(Long, Long, Double, Boolean)].collect().toSeq.sortBy(_._1)

    val (moved, kept) = out.partition(_._4)
    assert(moved.map(_._1) === Seq(4L, 5L, 7L),
      "exactly the drifted cell's members are reassigned")
    // retrained centroid = quantized-exact mean of (10,10),(13,13),(13,13)
    // = (12,12): member d2 falls 0/18/18 → 4+4=8 and (13-12)²·2 = 2
    assert(moved.map(_._3) === Seq(8.0, 2.0, 2.0))
    assert(moved.map(_._2).forall(_ == 100L), "members stay in the retrained cell")
    assert(moved.map(_._3).sum < 36.0, "drifted members converge (Σd2 improves)")

    // healthy cell: byte-identical to the pre-maintenance assignment
    val baseline = Similarity.kmeansAssign(e, cents)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
      .filter(r => Seq(0L, 1L, 2L).contains(r._1))
    assert(kept.map(r => (r._1, r._2, r._3)) === baseline)
  }

  test("no post-build vectors → nothing flagged, output equals the plain assignment") {
    val e = Seq( // even ids only: n_new = 0 in every cell
      (0L, Array(0.0f, 0.1f), 0L),
      (2L, Array(0.3f, 0.0f), 0L),
      (4L, Array(9.0f, 10.0f), 1L)).toDF("vec_id", "embedding", "label")
    val out = Similarity.reassignDrifted(e, cents)
      .as[(Long, Long, Double, Boolean)].collect().toSeq.sortBy(_._1)
    assert(out.forall(!_._4), "no cell may be flagged without post-build members")
    val baseline = Similarity.kmeansAssign(e, cents)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)) === baseline)
  }

  test("driftFactor gates flagging when the cell has training members") {
    // cell 0: train d2 mean 0.25, new d2 0.25 — ratio 1.0
    val e = Seq(
      (0L, Array(0.5f, 0.0f), 0L),
      (1L, Array(0.0f, 0.5f), 0L)).toDF("vec_id", "embedding", "label")
    val strict = Similarity.reassignDrifted(e, cents.filter($"cell" === 0L),
      driftFactor = 0.5) // 0.25 > 0.5·0.25 → flagged
    assert(strict.filter("reassigned").count() === 2)
    val lax = Similarity.reassignDrifted(e, cents.filter($"cell" === 0L),
      driftFactor = 1.5) // 0.25 ≤ 1.5·0.25 → healthy
    assert(lax.filter("reassigned").count() === 0)
  }

  test("splitOverfull: flags couple with the audit; a bimodal overfull cell splits into its modes") {
    import org.apache.spark.sql.functions._
    // three frozen cells; the appended tier (x1.5 copies of %25 ids)
    // lands in cell 100 and doubles it past the 2x bar
    val cents3 = Seq(
      (0L, Seq(0.0, 0.0)),
      (100L, Seq(10.0, 10.0)),
      (200L, Seq(-10.0, -10.0))).toDF("cell", "cemb")
    val e = (Seq(
      (1L, Array(0.1f, 0.0f), 0L), (2L, Array(0.0f, 0.1f), 0L),
      (3L, Array(-10.1f, -10.0f), 2L), (4L, Array(-10.0f, -10.1f), 2L)) ++
      Seq(25L, 50L, 75L, 100L, 125L, 150L).map(id =>
        (id, Array(9.9f, 10.0f), 1L)))
      .toDF("vec_id", "embedding", "label")
    // the audit at the production 2x bar flags exactly cell 100
    val flagged = Similarity.ivfAppend(e, cents3, 2, 1)
      .filter(col("overfull")).select("cell").as[Long].collect().toSet
    assert(flagged === Set(100L))
    // the split at the SAME bar touches exactly the flagged cell
    val out = Similarity.splitOverfull(e, cents3, 2, 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.keySet.map(_._1) === Set(100L), "split touched a non-flagged cell")
    assert(out.keySet === Set((100L, 0L), (100L, 1L)))
    // the deterministic seeds separate the two modes: base members
    // (near the old centroid) vs appended copies (the 1.5x tier)
    val (n0, _, after0) = out((100L, 0L))
    val (n1, before1, after1) = out((100L, 1L))
    assert(n0 === 6L && n1 === 6L)
    assert(before1 > 40.0, s"appended mode must fit the old centroid badly: $before1")
    assert(after1 < 0.1, s"appended mode must fit its sub-centroid tightly: $after1")
    assert(after0 < 0.1)
  }

  test("ivfAppend: a cell with zero base members still appears in the audit") {
    import org.apache.spark.sql.functions._
    // cell 300 at (15,15) attracts no base vector, but the appended tier
    // (1.5x copies of the %25 ids at (10,10)) lands exactly on it — the
    // empty-base cell is the growth-interesting row a left join from the
    // base side would silently drop
    val cents3 = Seq(
      (0L, Seq(0.0, 0.0)),
      (100L, Seq(10.0, 10.0)),
      (300L, Seq(15.0, 15.0))).toDF("cell", "cemb")
    val e = Seq(
      (1L, Array(0.1f, 0.0f), 0L), (2L, Array(0.0f, 0.1f), 0L),
      (25L, Array(10.0f, 10.0f), 1L), (50L, Array(10.0f, 10.0f), 1L))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.ivfAppend(e, cents3).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.contains(300L), "empty-base cell dropped from the audit")
    assert(out(300L).getLong(1) === 0L && out(300L).getLong(2) === 2L)
    assert(out(300L).isNullAt(3), "growth_permille undefined on an empty base")
    // accounting still total: every appended vector appears exactly once
    assert(out.values.map(_.getLong(2)).sum === 2L)
  }

  test("ivfAppend: full accounting, base counts reconcile with the fit, overfull rule exact") {
    val e = graft.sources.Tables.embeddings(spark, Sf)
    val cents = Similarity.kmeansFitMemo(e, Sf, "all")
    val out = Similarity.ivfAppend(e, cents).collect()
    assert(out.nonEmpty)
    // every appended vector lands in exactly one cell: Σ n_new == the
    // planted +1e6 tier's size (vec_id % 25 == 0 originals)
    import org.apache.spark.sql.functions._
    val planted = e.filter(col("vec_id") % 25 === 0).count()
    assert(out.map(_.getLong(2)).sum === planted, "appended vectors lost or duplicated")
    // base occupancy reconciles with the frozen-fit assignment the
    // q_emb_kmeans query serves
    val baseTotal = Similarity.kmeansAssign(e, cents).count()
    assert(out.map(_.getLong(1)).sum === baseTotal)
    // the division-free overfull rule re-derives from the emitted counts
    val k = out.length.toLong
    val total = out.map(r => r.getLong(1) + r.getLong(2)).sum
    out.foreach { r =>
      val expect = (r.getLong(1) + r.getLong(2)) * k > 2L * total
      assert(r.getBoolean(4) === expect, s"overfull flag diverged on cell ${r.getLong(0)}")
      if (r.getLong(1) > 0)
        assert(r.getLong(3) === r.getLong(2) * 1000 / r.getLong(1))
    }
  }
}
