package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Johnson–Lindenstrauss sign projection ([[graft.expressions.SignProject]]
  * + [[Similarity.jlProject]]): native-vs-HOF parity, a hand-derived
  * basis-vector check against an independent LCG reimplementation, the
  * JL distortion bound on the real corpus, and degenerate-input posture.
  */
class JlProjectSpec extends SparkSpec {
  import spark.implicits._

  private val D = Similarity.JlDims

  /** Built-ins-only HOF spelling of the projection — the cross-check the
    * native loop must match bit-for-bit (same left fold, same LCG).
    */
  private def projectHof(emb: Column, outDims: Int): Column =
    transform(sequence(lit(0), lit(outDims - 1)), j =>
      aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1), (v, d) =>
          when((lit(1103515245L) * ((j.cast("long") + 64L) * 4096L + d.cast("long"))
            + 12345L) % 2147483648L >= 1073741824L, v).otherwise(-v)),
        lit(0.0d), (acc, x) => acc + x) /
        sqrt(lit(outDims).cast("double")))

  /** Independent scalar reimplementation for the hand checks. */
  private def signOf(j: Int, d: Int): Double = {
    val r = (1103515245L * ((j + 64L) * 4096L + d) + 12345L) % 2147483648L
    if (r >= 1073741824L) 1.0 else -1.0
  }

  private val genVec: Gen[Seq[Double]] = for {
    n <- Gen.chooseNum(1, 80)
    v <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.choose(-10.0, 10.0),
      2 -> Gen.choose(-1e150, 1e150),
      1 -> Gen.oneOf(0.0, -0.0, 1e-320, Double.PositiveInfinity, Double.NaN)))
  } yield v

  private lazy val vecs = {
    val params = Gen.Parameters.default
    val s = (0 until 300).flatMap(i => genVec.apply(params, Seed(i.toLong)))
    assert(s.size > 250)
    s.toDF("emb").cache()
  }

  test("native == HOF fold bit-for-bit on adversarial IEEE values") {
    val bad = vecs.filter(
      !(graft.expressions.SignProject.sign_project($"emb", D) <=> projectHof($"emb", D)))
    assert(bad.count() === 0)
  }

  test("basis vector e_d projects to ±1/sqrt(outDims) with the LCG's sign") {
    // one-hot input isolates a single (j, d) sign — checkable by hand
    for (d <- Seq(0, 3, 63)) {
      val emb = Array.fill(64)(0.0).updated(d, 1.0).toSeq
      val got = Seq(emb).toDF("emb")
        .select(graft.expressions.SignProject.sign_project($"emb", D).as("p"))
        .as[Seq[Double]].head()
      val want = (0 until D).map(j => signOf(j, d) / 4.0)
      assert(got === want, s"d=$d")
    }
  }

  test("JL distortion on the real corpus: every ratio finite-positive, mean near 1") {
    val r = Similarity.jlProject(graft.sources.Tables.embeddings(spark, Sf))
      .select("ratio").as[Double].collect()
    assert(r.nonEmpty)
    // 16 output dims → Var(ratio) = 2/16; individual ratios can wander
    // but must stay positive and finite, and the mean concentrates
    assert(r.forall(x => x > 0 && java.lang.Double.isFinite(x)))
    val mean = r.sum / r.size
    assert(mean > 0.7 && mean < 1.3, s"mean distortion $mean drifted from 1")
  }

  test("degenerate inputs: null element nulls the projection; zero vector nulls the ratio") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0), None, Some(2.0)))),
      (2L, Some(Seq(Some(0.0), Some(0.0)))),
      (3L, None: Option[Seq[Option[Double]]])
    ).toDF("vec_id", "embedding").withColumn("label", lit(0))
    val out = Similarity.jlProject(df).orderBy("vec_id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("ratio")), "null element must null the ratio")
    assert(out(1).isNullAt(out(1).fieldIndex("ratio")), "zero vector must null the ratio")
    assert(out(1).getDouble(out(1).fieldIndex("n2_proj")) === 0.0)
    assert(out(2).isNullAt(out(2).fieldIndex("n2_orig")), "null array propagates")
  }

  test("jlRecall: a planted near-exact copy survives projection; count invariants hold") {
    // the projection is linear, so a scaled copy keeps cosine ≈ 1 in the
    // projected space and must be found at strict rank 1; random
    // neighbors may scramble, but the count invariants cannot
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map(i =>
      (i.toLong * 7 + 1, Seq.fill(64)(rnd.nextGaussian()), 0))
    val query = (0L, Seq.fill(64)(rnd.nextGaussian()), 0)      // 0 % 50 == 0 → query
    val copy = (1000000L, query._2.map(_ * 1.5), 0)
    val df = (base :+ query :+ copy)
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.jlRecall(df).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nt, nh, ns) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nh <= ns && ns <= nt, s"invariant n_hit <= n_short <= n_truth broken: $r")
    }
    val qRow = out.find(_.getLong(0) == 0L).get
    assert(qRow.getLong(2) >= 1, s"scaled copy must survive projection at top-k: $qRow")
  }

  test("projection shares no LCG state with the LSH hyperplanes (plane offset)") {
    // the sign matrix starts at plane 64; RandomHyperplaneBits caps at 62
    assert(graft.expressions.SignProject.PlaneOffset > 62)
  }

  test("inputs wider than 4096 dims are rejected (LCG plane-stride bound)") {
    // past 4096 input dims, plane j at dim d would reuse plane j+1's LCG
    // state at d-4096, correlating sign-matrix rows — fail loudly rather
    // than silently void the JL guarantee
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val e = intercept[IllegalArgumentException] {
      graft.expressions.SignProject.project(
        new GenericArrayData(Array.fill(4097)(0.0)), 16)
    }
    assert(e.getMessage.contains("4096"))
    // the widest supported input still projects
    val ok = graft.expressions.SignProject.project(
      new GenericArrayData(Array.fill(4096)(1.0)), 4)
    assert(ok.numElements() == 4)
  }
}
