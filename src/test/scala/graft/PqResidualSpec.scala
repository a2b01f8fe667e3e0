package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Residual-encoded IVF-PQ vs the raw-vector variant at EQUAL byte
  * budget (m codes, C codes/subspace): on a corpus with real cell
  * structure, raw codes built from the same coarse centroids collapse a
  * cell's members onto one code array (ADC cannot rank within a probed
  * cell — the FAISS motivation for residual encoding), while residual
  * codes capture the within-cell offsets and rank the true neighbour
  * first even against an adversarial id tie-break.
  */
class PqResidualSpec extends SparkSpec {
  import spark.implicits._

  // Two far-apart cells in 64 dims. Cell 0: query id 0 with offset e8,
  // true neighbour id 900 (0.9·e8 + 0.1·e9 — nearly the query's offset)
  // hidden behind six orthogonal decoys at SMALL ids 1..6 (offsets
  // e10..e15), so a ranking that degenerates to the vec_id tie-break
  // puts the true neighbour LAST. Cell 1 at −10·e0 keeps the probe
  // stage honest (2 centroids).
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

  test("raw PQ codes COLLAPSE a cell's members onto one code array") {
    val codes = Similarity.pqEncode(fixture)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    val cellA = Seq(0L, 900L) ++ (1L to 6L)
    assert(cellA.map(codes).toSet.size === 1,
      "fixture lost its power: raw codes should be identical across cell 0")
  }

  test("residual PQ codes DISCRIMINATE within the cell") {
    val codes = Similarity.pqrEncode(fixture)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    val cellA = Seq(0L, 900L) ++ (1L to 6L)
    assert(cellA.map(codes).toSet.size >= 3,
      "residual codes must separate the within-cell offsets")
    // the codebook stays a complete m×C grid (flat ADC indexing depends
    // on it), every code vector PqSubDim wide
    val cb = Similarity.pqrCodebook(fixture).collect()
    assert(cb.length === 8 * Similarity.PqrCodes)
    assert(cb.forall(_.getSeq[Double](2).length === 8))
  }

  test("equal byte budget: residual ranks the true neighbour 1st, raw ranks it LAST") {
    val res = Similarity.knnIvfPqResidual(fixture, k = 3)
      .filter($"qid" === 0L).orderBy($"rank")
      .select($"vec_id").as[Long].collect()
    assert(res.head === 900L,
      s"residual ADC must rank the planted neighbour first, got ${res.toSeq}")
    val raw = Similarity.knnIvfPq(fixture, k = 3)
      .filter($"qid" === 0L).orderBy($"rank")
      .select($"vec_id").as[Long].collect()
    assert(!raw.contains(900L),
      s"fixture lost its power: raw ADC should fall to the id tie-break, got ${raw.toSeq}")
    // and the planted neighbour really is the brute-truth rank 1
    val truth = Similarity.knnBrute(fixture, k = 1)
      .filter($"qid" === 0L).select($"vec_id").as[Long].collect()
    assert(truth.toSeq === Seq(900L))
  }

  test("filtered store: predicate honored pre-ADC; exclusion never post-filters the list") {
    // query 0's planted neighbour 900 — a predicate KEEPING it must
    // still rank it 1st (codebook/cells unchanged: trained on the full
    // corpus), and a predicate EXCLUDING it must drop it from the list
    // entirely while the unfiltered list still carries it (the
    // post-k-filter pathology this composition exists to avoid)
    val keep = Similarity.knnIvfPqResidual(fixture, k = 3, nprobe = 4,
      storePred = col("vec_id") =!= 3L)
      .filter($"qid" === 0L).orderBy($"rank").select($"vec_id").as[Long].collect()
    assert(keep.head === 900L, s"kept neighbour must stay rank 1, got ${keep.toSeq}")
    assert(!keep.contains(3L), "excluded id leaked into the filtered list")
    val excl = Similarity.knnIvfPqResidual(fixture, k = 3, nprobe = 4,
      storePred = col("vec_id") =!= 900L)
      .filter($"qid" === 0L).select($"vec_id").as[Long].collect()
    assert(!excl.contains(900L), "excluded neighbour leaked into the filtered list")
    assert(excl.length === 3, "widened probe must still fill k from the thinned store")
    val unfiltered = Similarity.knnIvfPqResidual(fixture, k = 3)
      .filter($"qid" === 0L).select($"vec_id").as[Long].collect()
    assert(unfiltered.contains(900L),
      "fixture lost its power: the unfiltered list must carry the excluded id")
  }

  test("real corpus non-regression: residual recall >= raw recall at equal bytes") {
    val e = Tables.embeddings(spark, Sf)
    val truth = Similarity.knnBrute(e, k = 3).select($"qid", $"vec_id")
    def recall(ann: org.apache.spark.sql.DataFrame): Long =
      truth.join(ann.select($"qid", $"vec_id"), Seq("qid", "vec_id"), "left_semi").count()
    val res = recall(Similarity.knnIvfPqResidual(e))
    val raw = recall(Similarity.knnIvfPq(e))
    assert(res >= raw, s"residual hits $res fell below raw hits $raw")
  }
}
