package graft

import graft.operators.Similarity

/** MMR rerank: full brute greedy replay on a designed fixture, the
  * diversity-vs-relevance trade (a duplicate of the top hit loses to a
  * diverse lower-relevance candidate at low λ, wins at λ = 1), and the
  * rank-1 = pure-relevance invariant.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: Seq[(Long, Seq[Float])]) =
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    def dot(x: Seq[Float], y: Seq[Float]) =
      x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p.toDouble * q.toDouble }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  // vec 0 is the query (0 % 50 == 0); 1/2 share a direction; 3 diverse.
  private val pts = Seq[(Long, Seq[Float])](
    0L -> Seq(1f, 0f),
    1L -> Seq(0.9f, 0.1f),
    2L -> Seq(1.8f, 0.2f),
    3L -> Seq(0.1f, 0.9f),
    4L -> Seq(0.5f, 0.5f))

  private def bruteMmr(lambda10: Int, kOut: Int): Seq[Long] = {
    val byId = pts.toMap
    val q = byId(0L)
    val cands = pts.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q, v)) }
    var selected = Seq(cands.maxBy { case (id, r) => (r, -id) }._1)
    while (selected.size < kOut) {
      val rem = cands.filterNot(c => selected.contains(c._1))
      val next = rem.map { case (id, r) =>
        val maxSim = selected.map(s => cos(byId(id), byId(s))).max
        (id, lambda10 / 10.0 * r - (10 - lambda10) / 10.0 * maxSim)
      }.maxBy { case (id, s) => (s, -id) }._1
      selected :+= next
    }
    selected
  }

  test("the engine replays the brute greedy exactly at several lambdas") {
    for (lam <- Seq(0, 3, 7, 10)) {
      val got = Similarity.mmrRerank(emb(pts), kCand = 4, kOut = 3, lambda10 = lam)
        .orderBy("qid", "rank").collect().map(_.getLong(2)).toSeq
      assert(got == bruteMmr(lam, 3), s"lambda10=$lam: $got vs ${bruteMmr(lam, 3)}")
    }
  }

  test("a duplicate of the top hit loses to a diverse candidate at low lambda") {
    def rank2(lam: Int) =
      Similarity.mmrRerank(emb(pts), kCand = 4, kOut = 2, lambda10 = lam)
        .filter($"rank" === 2).collect()(0).getLong(2)
    assert(rank2(10) == 2L, "pure relevance keeps the duplicate direction")
    assert(rank2(3) == 3L, "diversity-weighted mix promotes the orthogonal doc")
  }

  test("trained-IVF MMR with every cell probed equals the brute-shortlist MMR") {
    val e = graft.sources.Tables.embeddings(spark, Sf)
    val cents = Similarity.kmeansFit(e, k = 8, iters = 2)
    val brute = Similarity.mmrRerank(e, kCand = 10, kOut = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ivf = Similarity.mmrRerankTrained(e, cents, nprobe = 8,
      kCand = 10, kOut = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ivf == brute,
      "probing all 8 cells must reproduce the brute shortlist exactly")
  }

  test("rank 1 is always the pure-relevance argmax") {
    for (lam <- Seq(0, 5, 10)) {
      val r1 = Similarity.mmrRerank(emb(pts), kCand = 4, kOut = 2, lambda10 = lam)
        .filter($"rank" === 1).collect()(0).getLong(2)
      assert(r1 == 1L, s"lambda10=$lam rank-1 must be the top-cos doc")
    }
  }
}
