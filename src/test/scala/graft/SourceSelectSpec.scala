package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup}

/** Greedy max-coverage source selection: the greedy pick rule replayed
  * brute-force on a constructed corpus, the non-increasing-gain property
  * (greedy on a submodular function), exact cumulative coverage, and the
  * early-stop on exhausted sources.
  */
class SourceSelectSpec extends SparkSpec {
  import spark.implicits._

  // docs engineered so coverage sets overlap: srcA is the biggest set,
  // srcB adds a disjoint tail, srcC is a subset of A (zero gain once A
  // is picked), srcD adds one novel shingle.
  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta", "srcA"),
    (2L, "eta theta iota kappa lambda mu", "srcA"),
    (3L, "alpha beta gamma delta", "srcC"),
    (4L, "nu xi omicron pi rho sigma", "srcB"),
    (5L, "eta theta iota kappa", "srcC"),
    (6L, "alpha beta gamma newone", "srcD")
  ).toDF("doc_id", "text", "source")
    .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))

  private def coverSets: Map[String, Set[Long]] =
    Dedup.shingles(docs.select(col("doc_id"), col("text")))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select("source", "h").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (s, a) => s -> a.map(_._2).toSet }

  test("selection trace replays the brute-force greedy exactly") {
    val sets = coverSets
    val got = Curation.sourceSelect(docs, budget = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    var covered = Set.empty[Long]
    var picked = Set.empty[String]
    val want = (1 to 3).map { r =>
      val (src, gain) = sets.filterNot(kv => picked(kv._1))
        .map { case (s, hs) => (s, (hs -- covered).size.toLong) }
        .toSeq.sortBy { case (s, g) => (-g, s) }.head
      covered ++= sets(src); picked += src
      (r, src, gain, covered.size.toLong)
    }
    assert(got.toSeq == want, s"engine ${got.toSeq} vs brute $want")
  }

  test("gains are non-increasing and cum_cov is the exact union size") {
    val sets = coverSets
    val got = Curation.sourceSelect(docs, budget = 4)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val gains = got.map(_._2)
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b },
      s"greedy gains must be non-increasing: ${gains.toSeq}")
    val union = got.map(_._1).flatMap(sets).toSet
    assert(got.last._3 == union.size.toLong)
  }

  test("budgeted: the cost-ratio greedy is replayed and the budget binds") {
    val sets = coverSets
    val costs = docs.groupBy(col("source"))
      .agg(sum(size(graft.functions.TextFunctions.tokens(col("text")))).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = costs.values.sum / 5
    val got = Curation.sourceSelectBudgeted(docs)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // brute replay
    var covered = Set.empty[Long]; var picked = Set.empty[String]
    var rem = budget; var rank = 1; var cum = 0L
    var want = Seq.empty[(Int, String, Long, Long, Long, Long)]
    var done = false
    while (!done) {
      val cand = sets.keys.toSeq
        .filterNot(picked).filter(s => costs(s) <= rem)
        .map(s => (s, (sets(s) -- covered).size.toLong))
        .filter(_._2 > 0)
      if (cand.isEmpty) done = true
      else {
        // tie rule: ratio DESC then source ASC
        val best = cand.sortBy { case (s, g) =>
          (-(g.toDouble / costs(s).toDouble), s) }.head
        covered ++= sets(best._1); picked += best._1
        rem -= costs(best._1); cum += best._2
        want :+= ((rank, best._1, best._2, costs(best._1), cum, rem))
        rank += 1
      }
    }
    assert(got.toSeq == want, s"engine ${got.toSeq} vs brute $want")
    // the budget must actually bind on this fixture: not every source
    // with positive gain fits into total/5 tokens
    assert(got.map(_._2).toSet.size < 4,
      s"fixture must make the budget bind: ${got.toSeq}")
    assert(got.forall(_._6 >= 0), "budget_left never negative")
  }

  test("kmv greedy degrades to the exact trace when every sketch is sub-k") {
    // every source here has far fewer than k = 128 distinct shingles, so
    // the estimator is exact by the sub-k rule and the sketch greedy
    // must replay the exact greedy with est_gain == exact_gain.
    val exact = Curation.sourceSelect(docs, budget = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val kmv = Curation.sourceSelectKmv(docs, budget = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(kmv.map(t => (t._1, t._2)).toSeq == exact.map(t => (t._1, t._2)).toSeq,
      s"sub-k picks must match exact: ${kmv.toSeq} vs ${exact.toSeq}")
    kmv.zip(exact).foreach { case ((_, _, est, eg), (_, _, g)) =>
      assert(eg == g && est == g.toDouble,
        s"sub-k est must equal the exact marginal: $est vs $g")
    }
  }

  test("kmv est_gain tracks the exact marginal within the sketch error band") {
    val corpus = graft.sources.Tables.documents(spark, Sf)
    val got = Curation.sourceSelectKmv(corpus, budget = 4)
      .collect().map(r => (r.getDouble(2), r.getLong(3)))
    assert(got.length == 4)
    got.foreach { case (est, exact) =>
      assert(exact > 0, "picked sources must add real coverage")
      // k = 128 → se ≈ 9%; 50% is a generous deterministic band
      assert(math.abs(est - exact) <= 0.5 * exact + 1.0,
        s"estimate $est too far from exact $exact")
    }
  }

  test("production (audit-free) kmv trace equals the audited truth twin's") {
    // q_doc_srcselkmv_prod drops ONLY the per-round exact-audit column —
    // the greedy itself (sketch union, estimator, pick rule) must be
    // byte-identical to the audited spelling, on both the constructed
    // corpus and the real one.
    val corpus = graft.sources.Tables.documents(spark, Sf)
    val audited = Curation.sourceSelectKmv(corpus, budget = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    val prod = Curation.sourceSelectKmvProd(corpus, budget = 4)
    assert(prod.columns.toSeq === Seq("rank", "source", "est_gain"),
      "prod spelling must not carry the audit column")
    val prodRows = prod.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(prodRows === audited, s"prod trace diverged: $prodRows vs $audited")
    val small = Curation.sourceSelectKmvProd(docs, budget = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    val smallAudited = Curation.sourceSelectKmv(docs, budget = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(small === smallAudited)
  }

  test("selection stops when no remaining source adds coverage") {
    // srcC's shingles are a strict subset of srcA's: once A is picked, C
    // contributes nothing and must never be "selected" — the trace stops
    // at 3 rows even with budget 10 (the answer to "which sources add
    // novel text" correctly excludes a fully-redundant source).
    val got = Curation.sourceSelect(docs, budget = 10).collect()
    assert(got.length == 3, s"redundant srcC must be dropped: ${got.toSeq}")
    assert(got.map(_.getString(1)).toSet == Set("srcA", "srcB", "srcD"))
  }
}
