package graft

import graft.operators.Similarity

/** Greedy k-center (Gonzalez farthest-point traversal): the selection
  * invariant (each center is THE farthest point from its predecessors,
  * ties to the smaller id), the textbook 2-approximation bound checked
  * against a brute-forced true optimum, and the coverage contrast with
  * k-means (an outlying singleton always wins a center).
  */
class KCenterSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: Seq[(Long, Seq[Float])]) =
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")

  private def l2sq(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
      s + (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble)
    }

  test("each selected center is the farthest point from its predecessors") {
    val pts = Seq[(Long, Seq[Float])](
      0L -> Seq(0f, 0f), 1L -> Seq(9f, 1f), 2L -> Seq(1f, 8f),
      3L -> Seq(5f, 5f), 4L -> Seq(2f, 2f), 5L -> Seq(8f, 8f),
      6L -> Seq(0f, 9f), 7L -> Seq(9f, 0f))
    val byId = pts.toMap
    val got = Similarity.kCenterFit(emb(pts), k = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(got.head == 0L, "first center is the smallest vec_id")
    // replay the greedy brute-force: argmax of min-dist, ties to min id
    var chosen = Seq(0L)
    for (_ <- 1 until 4) {
      val next = pts.filterNot(p => chosen.contains(p._1))
        .map { case (id, v) => (id, chosen.map(c => l2sq(v, byId(c))).min) }
        .maxBy { case (id, d) => (d, -id) }._1
      chosen :+= next
    }
    assert(got == chosen, s"engine $got vs brute $chosen")
  }

  test("greedy radius is within 2x of the brute-forced optimal radius") {
    // 9 points, k=3: small enough to brute-force all C(9,3) center sets.
    val pts = Seq[(Long, Seq[Float])](
      0L -> Seq(0f, 0f), 1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f),
      3L -> Seq(10f, 10f), 4L -> Seq(11f, 10f), 5L -> Seq(10f, 11f),
      6L -> Seq(20f, 0f), 7L -> Seq(21f, 0f), 8L -> Seq(20f, 1f))
    val ids = pts.map(_._1)
    val byId = pts.toMap
    def radius(cs: Seq[Long]): Double =
      ids.map(p => cs.map(c => math.sqrt(l2sq(byId(p), byId(c)))).min).max
    val opt = ids.combinations(3).map(radius).min
    val centers = Similarity.kCenterFit(emb(pts), k = 3)
      .collect().map(_.getLong(0)).toSeq
    val greedy = radius(centers)
    assert(greedy <= 2.0 * opt + 1e-12,
      s"Gonzalez bound violated: greedy $greedy vs opt $opt")
  }

  test("an outlying singleton wins a center that k-means starves") {
    // two dense blobs + one far outlier; k=3 k-center MUST pick the
    // outlier (it is the farthest point after round 1 or 2).
    val blobA = (0L to 9L).map(i => i -> Seq(i.toFloat * 0.01f, 0f))
    val blobB = (10L to 19L).map(i => i -> Seq(5f + i * 0.01f, 0f))
    val outlier = Seq(20L -> Seq[Float](1000f, 1000f))
    val centers = Similarity
      .kCenterFit(emb(blobA ++ blobB ++ outlier), k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(centers.contains(20L), s"outlier must be selected: $centers")
  }

  test("coverage radius audit: per-cell max distance, counts partition the corpus") {
    val e = graft.sources.Tables.embeddings(spark, Sf)
    val cents = Similarity.kCenterFit(e, k = 4)
    val asg = Similarity.kmeansAssign(e, cents).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val rad = Similarity.kCenterRadius(e, cents).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // brute per-cell replay from the assignment
    val byCell = asg.groupBy(_._2)
    assert(rad.keySet == byCell.keySet)
    byCell.foreach { case (c, rows) =>
      assert(rad(c)._1 == rows.length.toLong)
      assert(rad(c)._2 == rows.map(_._3).max)
    }
    assert(rad.values.map(_._1).sum == asg.length.toLong)
  }

  test("assignment covers every vector exactly once with a selected cell") {
    val e = graft.sources.Tables.embeddings(spark, Sf)
    val cents = Similarity.kCenterFit(e, k = 8)
    val cells = cents.collect().map(_.getLong(0)).toSet
    assert(cells.size == 8)
    val asg = Similarity.kmeansAssign(e, cents).cache()
    val n = e.count()
    assert(asg.count() == n)
    assert(asg.select("vec_id").distinct().count() == n)
    assert(asg.select("cell").distinct().collect()
      .map(_.getLong(0)).toSet.subsetOf(cells))
    // every selected center assigns to itself at distance 0
    val self = asg.filter(org.apache.spark.sql.functions.col("vec_id")
      .isin(cells.toSeq: _*)).collect()
    self.foreach(r => assert(r.getLong(0) == r.getLong(1) && r.getDouble(2) == 0.0))
    asg.unpersist()
  }
}
