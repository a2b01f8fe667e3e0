package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** The round-11 ANN unification: search served from the SAME trained
  * coarse quantizer the maintenance family manages. Pins (1) the
  * search-side cell table is byte-identical to the maintenance
  * artifact (literally the same served memo, and content-equal to a
  * fresh fit), (2) the trained residual-PQ search keeps the planted
  * fixture's within-cell discrimination, (3) real-corpus recall clears
  * the label-cell variant's bar, (4) the post-crawl serving store
  * honors the generation: deleted docs absent, increment present.
  */
class TrainedIvfSpec extends SparkSpec {
  import spark.implicits._

  // the PqResidualSpec fixture: two far-apart cells, a true neighbour
  // hidden behind an adversarial id tie-break inside cell 0
  private def vec(parts: (Int, Float)*): Array[Float] = {
    val a = Array.fill(64)(0.0f)
    parts.foreach { case (i, v) => a(i) = v }
    a
  }
  private lazy val fixture = (
    Seq((0L, vec(0 -> 10.0f, 8 -> 1.0f), 0L),
      (900L, vec(0 -> 10.0f, 8 -> 0.9f, 9 -> 0.1f), 0L)) ++
    (1 to 6).map(i => (i.toLong, vec(0 -> 10.0f, (9 + i) -> 1.0f), 0L)) ++
    (1 to 4).map(i => (1000L + i, vec(0 -> -10.0f, (15 + i) -> 0.5f), 1L))
  ).toDF("vec_id", "embedding", "label")

  test("search-side cell table IS the maintenance artifact: same memo, content == fresh fit") {
    val e = Tables.embeddings(spark, Sf)
    // the q_emb_ivft / q_emb_servecrawl lambdas and the maintenance
    // lambdas (q_emb_kmeans/append/delete/crawl/merge) all resolve the
    // cells through this exact call — one served artifact, not a copy
    val searchCents = Similarity.kmeansFitMemo(e, Sf, "all")
    val maintCents = Similarity.kmeansFitMemo(e, Sf, "all")
    assert(searchCents eq maintCents,
      "search and maintenance must serve the SAME memoized centroid frame")
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select($"cell", $"cemb").as[(Long, Seq[Double])]
      .collect().sortBy(_._1).toSeq
    assert(snap(searchCents) === snap(Similarity.kmeansFit(e)),
      "served cell table diverged from a fresh kmeansFit")
  }

  test("trained-cell residual search keeps within-cell discrimination on the planted fixture") {
    val cents = Similarity.kmeansFit(fixture, k = 2, iters = 2)
    val res = Similarity.knnIvfPqResidualTrained(fixture, cents, k = 3)
      .filter($"qid" === 0L).orderBy($"rank")
      .select($"vec_id").as[Long].collect()
    assert(res.head === 900L,
      s"trained-cell residual ADC must rank the planted neighbour first, got ${res.toSeq}")
  }

  test("real corpus: trained-cell recall >= the label-cell variant's bar") {
    val e = Tables.embeddings(spark, Sf)
    val truth = Similarity.knnBrute(e, k = 3).select($"qid", $"vec_id")
    def hits(ann: org.apache.spark.sql.DataFrame): Long =
      truth.join(ann.select($"qid", $"vec_id"), Seq("qid", "vec_id"), "left_semi").count()
    val cents = Similarity.kmeansFitMemo(e, Sf, "all")
    val trained = hits(Similarity.knnIvfPqResidualTrained(e, cents))
    val label = hits(Similarity.knnIvfPqResidual(e))
    assert(trained >= label,
      s"trained-cell hits $trained fell below the label-cell bar $label")
  }

  test("serveCrawl: deleted ids absent everywhere, increment served, k bounded") {
    val e = Tables.embeddings(spark, Sf)
    val cents = Similarity.kmeansFitMemo(e, Sf, "all")
    val out = Similarity.serveCrawl(e, cents, e.filter($"vec_id" % 10 === 3))
      .collect()
    assert(out.nonEmpty)
    // the generation's takedowns are GONE: neither query nor candidate
    // may name a deleted vec_id (deleted ⊆ base ids < 1e6)
    def deleted(id: Long) = id < 1000000L && id % 10 == 3
    assert(!out.exists(r => deleted(r.getAs[Long]("qid")) ||
      deleted(r.getAs[Long]("vec_id"))),
      "a takedown id survived into the post-generation serving results")
    // the day's increment is part of the served store
    assert(out.exists(r => r.getAs[Long]("qid") >= 1000000L ||
      r.getAs[Long]("vec_id") >= 1000000L),
      "the increment tier never appeared in the served results")
    assert(out.forall(_.getAs[Long]("rn") <= 3L))
  }
}
