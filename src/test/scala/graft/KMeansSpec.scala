package graft

import graft.operators.Similarity

/** Lloyd's k-means: blob convergence, exact fixed-point centroid math,
  * and the deterministic tie rule (equidistant → smaller cell id) whose
  * effect is observable through the centroid update it feeds.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: Seq[(Long, Seq[Float])]) =
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")

  test("separated blobs converge to one cell per blob in 2 iterations") {
    // ids 0 and 1 (the k=2 init seeds) land one in each blob; the rest
    // alternate so the initial assignment is NOT already the answer.
    val blobA = Seq[(Long, Seq[Float])](
      0L -> Seq(10f, 0f), 2L -> Seq(11f, 0f), 4L -> Seq(10f, 1f), 6L -> Seq(11f, 1f))
    val blobB = Seq[(Long, Seq[Float])](
      1L -> Seq(0f, 10f), 3L -> Seq(0f, 11f), 5L -> Seq(1f, 10f), 7L -> Seq(1f, 11f))
    val got = Similarity.kmeans(emb(blobA ++ blobB), k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cellsA = blobA.map(p => got(p._1)).toSet
    val cellsB = blobB.map(p => got(p._1)).toSet
    assert(cellsA.size == 1 && cellsB.size == 1 && cellsA != cellsB,
      s"each blob must share one cell: A=$cellsA B=$cellsB")
    assert(got.keySet == (0L to 7L).toSet)
  }

  test("tie goes to the smaller cell id and the centroid update is exact") {
    // init c0 = vec 0 (0,0) and vec 1 (2,0); vec 2 (1,0) is EXACTLY
    // equidistant (d2 = 1 both sides) → must join cell 0. The update then
    // moves cell 0 to (0.5, 0) — exact in 2^24 fixed point — so the final
    // assignment distances are exact rationals we can assert with ==.
    val got = Similarity.kmeans(
      emb(Seq(0L -> Seq(0f, 0f), 1L -> Seq(2f, 0f), 2L -> Seq(1f, 0f))),
      k = 2, iters = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(0L) == (0L, 0.25), "(0,0) vs centroid (0.5,0)")
    assert(got(2L) == (0L, 0.25), "tie joined cell 0, then (1,0) vs (0.5,0)")
    assert(got(1L) == (1L, 0.0), "cell 1 kept its lone member exactly")
  }

  test("topic profile: shares partition each cell, counts partition the corpus") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(spark, Sf)
    val d = graft.sources.Tables.documents(spark, Sf)
    val prof = Similarity.topicProfile(e, d).cache()
    val nDocs = d.count()
    assert(prof.agg(sum($"n_docs")).as[Long].head() === nDocs,
      "every doc must land in exactly one (cell, lang) row")
    // within each cell the lang shares sum to exactly 1 (shares are
    // n/total with a shared denominator — the sum telescopes)
    val sums = prof.groupBy($"cell").agg(sum($"share").as("s"))
      .select($"s").as[Double].collect()
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-12), sums.mkString(","))
    // volume conservation: per-cell chars roll up to the corpus total
    assert(prof.agg(sum($"total_chars")).as[Long].head() ===
      d.agg(sum($"n_chars")).as[Long].head())
    prof.unpersist()
  }

  test("index staleness: drifted post-build vectors surface as runaway mean_d2_new") {
    import org.apache.spark.sql.functions._
    // train (even ids): two tight blobs; new (odd ids): 11/13 sit inside
    // the blobs (healthy), 9/15 drifted far away — the audit must show the
    // drifted cell's mean_d2_new far above its training fit
    val rows = Seq[(Long, Seq[Float])](
      0L -> Seq(10f, 0f), 2L -> Seq(11f, 0f), 4L -> Seq(10f, 1f),
      6L -> Seq(0f, 10f), 8L -> Seq(0f, 11f), 10L -> Seq(1f, 10f),
      11L -> Seq(10.5f, 0.5f), // healthy: inside blob A
      13L -> Seq(0.5f, 10.5f), // healthy: inside blob B
      9L -> Seq(100f, 100f),   // drifted
      15L -> Seq(120f, 100f))  // drifted
    val e = rows.map { case (id, v) => (id, v, 0) }.toDF("vec_id", "embedding", "label")
    val st = Similarity.indexStaleness(e, k = 2, iters = 2).cache()
    val got = st.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    // conservation: every vector lands in exactly one cell
    assert(got.values.map(v => v._1 + v._2).sum === rows.size)
    assert(got.values.map(_._1).sum === 6L, "6 training vectors")
    // some cell's new-data fit must run away from its training fit: the
    // drifted points are >100x further than any training spread
    val runaway = got.values.exists { case (nt, nn, t, n) =>
      nt > 0 && nn > 0 && n.exists(nv => nv > t.getOrElse(0.0) * 100 + 1.0)
    }
    assert(runaway, s"drift must be visible: $got")
    st.unpersist()
  }

  test("fewer vectors than k degrades to one cell per vector") {
    val got = Similarity.kmeans(
      emb(Seq(0L -> Seq(1f, 1f), 1L -> Seq(5f, 5f))), k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map(0L -> (0L, 0.0), 1L -> (1L, 0.0)))
  }

  test("silhouette: hand-computed means against an explicit centroid table") {
    import org.apache.spark.sql.functions._
    // centroids at (0,0) and (10,10); four vectors with known a/b
    val cents = Seq((0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 10.0)))
      .toDF("cell", "cemb")
    val e = emb(Seq(
      0L -> Seq(1f, 0f),   // cell 0: a=1,        b=sqrt(181)
      1L -> Seq(0f, 0f),   // cell 0: a=0,        b=sqrt(200) → s=1
      2L -> Seq(10f, 10f), // cell 1: a=0,        b=sqrt(200) → s=1
      3L -> Seq(6f, 5f)))  // cell 1: a=sqrt(41), b=sqrt(61)
    val got = Similarity.silhouette(e, cents).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def q(s: Double): Long = math.round(s * 16777216.0)
    def mean(ss: Double*): Double = ss.map(q).sum.toDouble / (ss.size * 16777216.0)
    val s0 = 1.0 - 1.0 / math.sqrt(181.0)
    val s3 = 1.0 - math.sqrt(41.0) / math.sqrt(61.0)
    assert(got(0L)._1 === 2L && got(1L)._1 === 2L)
    assert(got(0L)._2 === mean(s0, 1.0), s"cell 0 mean: ${got(0L)._2}")
    assert(got(1L)._2 === mean(1.0, s3), s"cell 1 mean: ${got(1L)._2}")
  }

  test("silhouette: agrees with a brute-force reference on seeded random inputs") {
    import org.apache.spark.sql.functions._
    // brute reference: same sequential-fold l2sq (left fold == Scala sum
    // order), same (d2, cell) tie-break, same 2^24 quantized means
    def brute(vecs: Seq[(Long, Seq[Float])], cents: Seq[(Long, Seq[Double])])
        : Map[Long, (Long, Double)] = {
      def d2(a: Seq[Double], b: Seq[Double]): Double =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
      val per = vecs.map { case (_, vf) =>
        val v = vf.map(_.toDouble)
        val ds = cents.map { case (c, ce) => (d2(v, ce), c) }.sorted
        val (a2, cell) = ds.head
        val b2 = ds(1)._1
        val s = if (b2 == 0.0) 0.0 else 1.0 - math.sqrt(a2) / math.sqrt(b2)
        (cell, math.round(s * 16777216.0))
      }
      per.groupBy(_._1).map { case (c, xs) =>
        c -> ((xs.size.toLong, xs.map(_._2).sum.toDouble / (xs.size * 16777216.0)))
      }
    }
    for (seed <- Seq(7, 8, 9)) {
      val rnd = new scala.util.Random(seed)
      def grid(): Float = (rnd.nextInt(17) - 8) / 2.0f // exact halves in [-4, 4]
      val vecs = (0 until 30).map(i => (i.toLong, Seq.fill(4)(grid())))
      val cents = (0 until 3).map(c => (c.toLong, Seq.fill(4)(grid().toDouble)))
      val got = Similarity.silhouette(
          vecs.toDF("vec_id", "embedding"), cents.toDF("cell", "cemb"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got === brute(vecs, cents), s"seed $seed diverges from the brute reference")
    }
  }

  test("silhouette: duplicate centroids score 0 (degenerate quantizer flagged)") {
    import org.apache.spark.sql.functions._
    val cents = Seq((0L, Seq(1.0, 1.0)), (1L, Seq(1.0, 1.0))).toDF("cell", "cemb")
    val e = emb(Seq(0L -> Seq(3f, 4f), 1L -> Seq(-2f, 0.5f)))
    val rows = Similarity.silhouette(e, cents).collect()
    assert(rows.forall(_.getDouble(2) === 0.0),
      "a==b for every vector when centroids coincide → silhouette 0")
  }
}
