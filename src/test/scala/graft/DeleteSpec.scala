package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Takedown/right-to-be-forgotten propagation through the persisted
  * artifacts: the delete-side primitives next to ADD (incremental merge)
  * and COMPACT (generation roll). Pins delete ≡ full rebuild on
  * corpus ∖ deleted for the index store, the cluster table, and the IVF
  * occupancy audit — plus the cut-vertex case the add-side star-edge
  * shortcut would get wrong.
  */
class DeleteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, Sf)
  private lazy val corpus = Dedup.corpus(docs).cache()
  private def takedown = corpus.filter($"doc_id" % 30 === 0)

  test("deleteFromIndex == full index rebuild over base \\ deleted; store persisted + memo-served") {
    Dedup.clearMemos()
    val base = corpus.filter($"doc_id" < 2000000L)
    val del = base.filter($"doc_id" % 30 === 0)
    val (tokD, bandsD) = Dedup.deleteFromIndex(base, del, Sf)
    val kept = base.filter($"doc_id" % 30 =!= 0)
    assert(tokD.as[(Long, Long)].collect().toSet ===
      Dedup.tokenHashes(kept).as[(Long, Long)].collect().toSet,
      "deleted token store diverged from a from-scratch rebuild")
    assert(bandsD.as[(Long, Long, Long)].collect().toSet ===
      Dedup.lshBands(Dedup.minhashSignatures(kept)).as[(Long, Long, Long)].collect().toSet,
      "deleted band store diverged from a from-scratch rebuild")
    assert(tokD.inputFiles.nonEmpty && bandsD.inputFiles.nonEmpty,
      "deleted store must be parquet-backed (a persisted generation)")
    val (tok2, bands2) = Dedup.deleteFromIndex(base, del, Sf)
    assert((tokD eq tok2) && (bandsD eq bands2), "second call must hit the memo")
  }

  test("deleteClusters == full re-cluster of corpus \\ deleted; untouched rows pass through; work bounded by touched components") {
    Dedup.clearMemos()
    val got = Dedup.deleteClusters(corpus, takedown, Sf)
      .as[(Long, Long, Boolean)].collect().toSet
    val survivorPairs = Dedup.ngramJaccardPairs(
      corpus.filter($"doc_id" % 30 =!= 0))
      .select($"doc_a", $"doc_b")
    val full = Dedup.duplicateClusters(survivorPairs)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === full, "post-takedown cluster table diverged from the full rebuild")

    // fixture power: the takedown batch must actually hit clusters, and
    // some cluster must survive SHRUNK (so the pass-through/minus split
    // is exercised, not just wholesale deletion)
    val before = Dedup.clustersFor(corpus, Sf).as[(Long, Long, Boolean)].collect()
    val delIds = takedown.select($"doc_id").as[Long].collect().toSet
    val touchedClusters = before.filter(r => delIds(r._1)).map(_._2).toSet
    assert(touchedClusters.nonEmpty, "fixture lost its power: no cluster touched")
    assert(got.size < before.length, "deletion must remove cluster rows")

    // untouched components pass through byte-identical
    val untouched = before.filterNot(r => touchedClusters(r._2)).toSet
    assert(untouched.nonEmpty, "fixture lost its power: every cluster touched")
    assert(untouched.subsetOf(got),
      "untouched cluster rows must appear unchanged in the post-delete table")

    // work bound: every row that was re-resolved (not passed through)
    // belongs to a component that contained a deleted member
    val resolved = got -- untouched
    resolved.foreach { case (id, _, _) =>
      val origCluster = before.find(_._1 == id).map(_._2)
      assert(origCluster.exists(touchedClusters),
        s"doc $id was re-resolved without takedown contact")
    }
  }

  test("cut-vertex delete SPLITS the component (star edges would glue it back)") {
    // a ~ b ~ c chain where b bridges: J(a,b) = J(b,c) = 30/46 ≈ 0.65,
    // J(a,c) = 22/54 ≈ 0.41 < 0.5 — deleting b must leave a and c in
    // SEPARATE components (here: both unpaired, so out of the table)
    val w = (1 to 40).map(i => s"w$i")
    val x = (1 to 8).map(i => s"x$i")
    val y = (1 to 8).map(i => s"y$i")
    val a = w.mkString(" ")
    val b = (w.take(32) ++ x).mkString(" ")
    val c = (y ++ w.slice(8, 32) ++ x).mkString(" ")
    val fx = Seq((1L, "en", a), (2L, "en", b), (3L, "en", c))
      .toDF("doc_id", "lang", "text")
    val pairs = Dedup.ngramJaccardPairs(fx)
    val pairSet = pairs.select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairSet === Set((1L, 2L), (2L, 3L)),
      s"fixture must form exactly the a~b~c chain, got $pairSet")
    val cl = Dedup.duplicateClusters(pairs.select($"doc_a", $"doc_b"))
    assert(cl.as[(Long, Long, Boolean)].collect().toSet ===
      Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false)))
    val afterDel = Dedup.deleteClustersFrom(cl, pairs,
      Seq(2L).toDF("doc_id"))
    assert(afterDel.count() === 0L,
      "deleting the bridge must split {a, c} apart (both become unpaired)")
    // and the same machinery on a NON-cut member only shrinks the cluster
    val afterLeaf = Dedup.deleteClustersFrom(cl, pairs, Seq(3L).toDF("doc_id"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(afterLeaf === Set((1L, 1L, true), (2L, 1L, false)))
  }

  test("ivfDelete: n_after == rebuild counts, emptied cell stays visible, underfull rule exact") {
    val e = Tables.embeddings(spark, Sf)
    val cents = Similarity.kmeansFitMemo(e, Sf, "all")
    val del = e.filter($"vec_id" % 10 === 3)
    val out = Similarity.ivfDelete(e, cents, del).collect()
    assert(out.nonEmpty)
    // n_after reconciles with a full occupancy rebuild over corpus \ D
    val rebuilt = Similarity.kmeansAssign(e.filter($"vec_id" % 10 =!= 3), cents)
      .groupBy($"cell").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    out.foreach { r =>
      assert(r.getLong(3) === rebuilt.getOrElse(r.getLong(0), 0L),
        s"n_after diverged from the rebuild on cell ${r.getLong(0)}")
    }
    // delta accounting total: sum n_del == |delete set|
    assert(out.map(_.getLong(2)).sum === del.count())
    // underfull rule re-derives from the emitted counts
    val k = out.length.toLong
    val total = out.map(_.getLong(3)).sum
    out.foreach { r =>
      assert(r.getBoolean(4) === (r.getLong(3) * k * 2 < total),
        s"underfull flag diverged on cell ${r.getLong(0)}")
    }
  }

  test("mergeUnderfull: flag couples with the audit; members fold into the nearest healthy cell") {
    // three cells; deleting 5 of cell 100's 6 members leaves n_after=1
    // against totals (4, 1, 4) — 1·3·2 < 9 flags it at the production
    // 1/2 bar; the survivor at (10,10.5) must adopt the nearest healthy
    // centroid (200 at (10,30) is farther than 0 at (0,0)? no: d2 to 0
    // is 210.25, to 200 is 380.25 → cell 0 adopts)
    val cents = Seq(
      (0L, Seq(0.0, 0.0)), (100L, Seq(10.0, 10.0)), (200L, Seq(10.0, 30.0)))
      .toDF("cell", "cemb")
    val e = (
      (1 to 4).map(i => (i.toLong, Array(0.1f * i, 0.0f), 0L)) ++
      (10 to 15).map(i => (i.toLong, Array(10.0f, 10.5f), 1L)) ++
      (20 to 23).map(i => (i.toLong, Array(10.0f, 30.0f), 2L))
    ).toDF("vec_id", "embedding", "label")
    val del = e.filter($"vec_id".between(11L, 15L))
    val out = Similarity.mergeUnderfull(e, cents, del, underNum = 1, underDen = 2)
      .collect()
    assert(out.length === 1, s"exactly one (from, to) move group expected: ${out.toSeq}")
    val r = out.head
    assert(r.getLong(0) === 100L && r.getLong(1) === 0L && r.getLong(2) === 1L)
    // d2_before = (10-10)^2 + (10.5-10)^2 = 0.25; after = 10^2 + 10.5^2
    assert(math.abs(r.getDouble(3) - 0.25) < 1e-6)
    assert(math.abs(r.getDouble(4) - 210.25) < 1e-6)
    // healthy cells never appear as a source
    assert(!out.exists(x => x.getLong(0) == 0L || x.getLong(0) == 200L))
    // every-cell-underfull degenerate: no adoption target, empty output
    val allDel = e.filter($"vec_id" =!= 1L)
    assert(Similarity.mergeUnderfull(e, cents, allDel, underNum = 10,
      underDen = 1).count() === 0L)
  }

  test("ivfDelete: deleting a cell's only member leaves an n_after=0 underfull row") {
    val cents = Seq((0L, Seq(0.0, 0.0)), (100L, Seq(10.0, 10.0)))
      .toDF("cell", "cemb")
    val e = Seq(
      (1L, Array(0.1f, 0.0f), 0L), (2L, Array(0.0f, 0.1f), 0L),
      (3L, Array(0.2f, 0.1f), 0L), (7L, Array(10.0f, 10.0f), 1L))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.ivfDelete(e, cents, e.filter($"vec_id" === 7L))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(100L).getLong(1) === 1L && out(100L).getLong(2) === 1L &&
      out(100L).getLong(3) === 0L)
    assert(out(100L).getBoolean(4), "an emptied cell must flag underfull")
    assert(out(0L).getLong(3) === 3L && !out(0L).getBoolean(4))
  }

  test("ivfCrawl: net flags use POST-generation occupancy; counts reconcile with the parent ops") {
    // cell A (10,10): base {7, 11, 13} plus increment sources {0, 25}
    // at (7,7); cell B (0,0): 7 members. Delete {7, 11, 13, 0} guts A
    // (n_after 1 → ivfDelete ALONE flags it underfull at the production
    // 1/2 bar), but the day's appends (1.5×(7,7) = (10.5, 10.5) → A)
    // refill it to n_net 3 — the generation must NOT flag it.
    val cents = Seq((0L, Seq(0.0, 0.0)), (100L, Seq(10.0, 10.0)))
      .toDF("cell", "cemb")
    val aSide = Seq(7L, 11L, 13L).map(i => (i, Array(10.0f, 10.0f), 1L)) ++
      Seq(0L, 25L).map(i => (i, Array(7.0f, 7.0f), 1L))
    val bSide = Seq(1L, 2L, 3L, 4L, 6L, 8L, 9L).map(i => (i, Array(0.0f, 0.1f), 0L))
    val e = (aSide ++ bSide).toDF("vec_id", "embedding", "label")
    val deleted = e.filter($"vec_id".isin(7L, 11L, 13L, 0L))
    val crawl = Similarity.ivfCrawl(e, cents, deleted)
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = crawl(100L); val b = crawl(0L)
    assert(a.getLong(1) === 5L && a.getLong(2) === 4L && a.getLong(3) === 2L &&
      a.getLong(4) === 3L, s"cell A accounting off: $a")
    assert(b.getLong(1) === 7L && b.getLong(2) === 0L && b.getLong(3) === 0L &&
      b.getLong(4) === 7L, s"cell B accounting off: $b")
    assert(!a.getAs[Boolean]("underfull"),
      "appends refilled cell A — the generation must not flag it underfull")
    assert(!b.getAs[Boolean]("underfull") && !b.getAs[Boolean]("overfull"))
    // the delete op ALONE would have flagged A at the same 1/2 bar —
    // the discriminating case for post-generation flag accounting
    val delOnly = Similarity.ivfDelete(e, cents, deleted)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(delOnly(100L).getAs[Boolean]("underfull"),
      "fixture lost its power: delete alone must flag cell A")
    // counts reconcile with the parent ops
    assert(a.getLong(2) === delOnly(100L).getLong(2), "n_del diverged from ivfDelete")
    val appOnly = Similarity.ivfAppend(e, cents)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(a.getLong(3) === appOnly(100L).getLong(2), "n_new diverged from ivfAppend")
  }

  test("crawlPairs == full pair recompute over (base \\ removed) UNION increment") {
    Dedup.clearMemos()
    val base = corpus.filter($"doc_id" < 2000000L)
    val removed = base.filter($"doc_id" % 30 === 0)
    val incr = corpus.filter($"doc_id" >= 2000000L)
    val got = Dedup.crawlPairs(base, removed, incr, Sf)
      .select($"doc_a", $"doc_b", $"part")
      .as[(Long, Long, String)].collect().toSet
    val finalCorpus = base.filter($"doc_id" % 30 =!= 0).unionByName(incr)
    val full = Dedup.ngramJaccardPairs(finalCorpus)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(got.map(p => (p._1, p._2)) === full,
      "one crawl generation diverged from the from-scratch pair rebuild")
    // provenance: 'new' pairs all touch the increment; 'kept' pairs never do
    got.foreach {
      case (_, b, "new") => assert(b >= 2000000L, s"'new' pair without increment contact (doc_b=$b)")
      case (a, b, "kept") => assert(a < 2000000L && b < 2000000L, "'kept' pair touching the increment")
      case other => fail(s"unexpected part tag: $other")
    }
    // no pair may touch a removed doc
    val delIds = removed.select($"doc_id").as[Long].collect().toSet
    got.foreach { case (a, b, _) =>
      assert(!delIds(a) && !delIds(b), s"pair ($a, $b) touches a removed doc")
    }
    // fixture power: the takedown actually dropped base pairs, and the
    // increment actually introduced pairs
    Dedup.clearMemos()
    val basePairs = Dedup.basePairsFor(base, Sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val keptGot = got.filter(_._3 == "kept").map(p => (p._1, p._2))
    assert(keptGot.size < basePairs.size, "fixture lost its power: no base pair removed")
    assert(got.exists(_._3 == "new"), "fixture lost its power: no increment pair")
    assert(keptGot.subsetOf(basePairs), "'kept' must be a subset of the persisted base pairs")
  }

  test("crawlClusters == full re-cluster of (base \\ removed) UNION increment") {
    Dedup.clearMemos()
    val base = corpus.filter($"doc_id" < 2000000L)
    val removed = base.filter($"doc_id" % 30 === 0)
    val incr = corpus.filter($"doc_id" >= 2000000L)
    val got = Dedup.crawlClusters(base, removed, incr, Sf)
      .as[(Long, Long, Boolean)].collect().toSet
    val finalCorpus = base.filter($"doc_id" % 30 =!= 0).unionByName(incr)
    val full = Dedup.duplicateClusters(
      Dedup.ngramJaccardPairs(finalCorpus).select($"doc_a", $"doc_b"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === full,
      "cluster-side crawl generation diverged from the full re-cluster")
    // no cluster row may name a removed doc
    val delIds = removed.select($"doc_id").as[Long].collect().toSet
    got.foreach { case (id, cl, _) =>
      assert(!delIds(id) && !delIds(cl), s"cluster row ($id, $cl) names a removed doc")
    }
  }

  test("crawl fold-in re-bridges a component the delete split when the increment provides the path") {
    // a ~ b ~ c chain (b the cut vertex). Deleting b splits {a, c}.
    // A new doc d similar to BOTH a and c must re-merge them into one
    // component {a, c, d} — the delete-then-add order the crawl
    // generation composes, on the sharpest possible fixture.
    val w = (1 to 40).map(i => s"w$i")
    val x = (1 to 8).map(i => s"x$i")
    val y = (1 to 8).map(i => s"y$i")
    val a = w.mkString(" ")
    val b = (w.take(32) ++ x).mkString(" ")
    val c = (y ++ w.slice(8, 32) ++ x).mkString(" ")
    // d straddles both: a's tail half plus c's y-prefix and shared block
    val d = (y ++ w.slice(8, 40)).mkString(" ")
    val fx = Seq((1L, "en", a), (2L, "en", b), (3L, "en", c))
      .toDF("doc_id", "lang", "text")
    val pairs = Dedup.ngramJaccardPairs(fx)
    val cl = Dedup.duplicateClusters(pairs.select($"doc_a", $"doc_b"))
    val postDel = Dedup.deleteClustersFrom(cl, pairs, Seq(2L).toDF("doc_id"))
    assert(postDel.count() === 0L, "precondition: delete splits a and c apart")
    // the increment's verified pairs against the survivors {a, c}
    val withD = Seq((1L, "en", a), (3L, "en", c), (9L, "en", d))
      .toDF("doc_id", "lang", "text")
    val newEdges = Dedup.ngramJaccardPairs(withD)
      .filter($"doc_a" === 9L || $"doc_b" === 9L)
      .select($"doc_a", $"doc_b")
    assert(newEdges.count() === 2L,
      "fixture: d must pair with BOTH a and c (tune the straddle doc if not)")
    val folded = Dedup.foldInClusters(postDel, newEdges)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(folded === Set((1L, 1L, true), (3L, 1L, false), (9L, 1L, false)),
      s"fold-in must re-bridge a and c through d, got $folded")
  }

  test("crawlPairs serves the persisted artifacts: second generation call is memo-served") {
    Dedup.clearMemos()
    val base = corpus.filter($"doc_id" < 2000000L)
    val removed = base.filter($"doc_id" % 30 === 0)
    val incr = corpus.filter($"doc_id" >= 2000000L)
    val a = Dedup.crawlPairsFor(base, removed, incr, Sf)
    val b = Dedup.crawlPairsFor(base, removed, incr, Sf)
    assert(a eq b, "second call must hit the crawl-pair memo")
    // the post-delete store it merged against is itself parquet-backed
    val (tokD, bandsD) = Dedup.deleteFromIndex(base, removed, Sf)
    assert(tokD.inputFiles.nonEmpty && bandsD.inputFiles.nonEmpty,
      "crawl merge must run against the persisted post-delete store")
  }
}
