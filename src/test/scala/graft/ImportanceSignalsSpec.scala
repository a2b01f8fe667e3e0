package graft

import graft.operators.TextAnalysis

/** DSIR importance weights and the Gopher top-bigram repetition signal:
  * hand-computed references plus the ordering properties each score is
  * used for (target-like docs outrank out-of-domain; templated docs
  * outrank varied prose).
  */
class ImportanceSignalsSpec extends SparkSpec {
  import spark.implicits._

  test("dsirWeights matches hand-computed bit-length log-ratios") {
    // all: x:3 y:1 z:1; target(en): x:2 y:1
    // s(x) = bitlen(2+1) − bitlen(3+1) = 2−3 = −1
    // s(y) = bitlen(1+1) − bitlen(1+1) = 0
    // s(z) = bitlen(0+1) − bitlen(1+1) = 1−2 = −1
    val docs = Seq((1L, "en", "x x y"), (2L, "fr", "x z"))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.dsirWeights(docs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) == (3L, -2L, -2.0 / 3.0)) // x,x,y
    assert(got(2L) == (2L, -2L, -1.0))       // x,z
  }

  test("target-heavy docs outrank out-of-domain docs") {
    val target = (1 to 8).map(i => (i.toLong, "en", "alpha beta gamma"))
    val ood = (9 to 16).map(i => (i.toLong, "fr", "rouge vert bleu"))
    val probeIn = (17L, "fr", "alpha beta gamma") // target-like text, other lang
    val probeOut = (18L, "en", "rouge vert bleu") // OOD text labeled target
    val docs = (target ++ ood :+ probeIn :+ probeOut)
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.dsirWeights(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(17L) > got(18L),
      s"target-distribution text ${got(17L)} must outrank OOD ${got(18L)}")
  }

  test("topNgramFraction matches the hand-computed top bigram") {
    // doc 1: "a b a b a b" → "a b"×3, "b a"×2; n=5, top=("a b",3)
    // doc 2: "a b c a" → three distinct bigrams ×1; lex-largest "c a" wins
    // doc 3: single token → no bigrams, no row
    val docs = Seq(
      (1L, "a b a b a b", 11L), (2L, "a b c a", 7L), (3L, "solo", 4L))
      .toDF("doc_id", "text", "n_chars")
    val got = TextAnalysis.topNgramFraction(docs)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got(1L) == (5L, "a b", 3L, 0.6, 3.0 * 3.0 / 11.0))
    assert(got(2L) == (3L, "c a", 1L, 1.0 / 3.0, 3.0 / 7.0))
    assert(!got.contains(3L))
  }

  test("templated text concentrates; varied prose does not") {
    val docs = Seq(
      (1L, Seq.fill(20)("buy now").mkString(" "), 159L),
      (2L, (1 to 40).map(i => s"w$i").mkString(" "), 200L))
      .toDF("doc_id", "text", "n_chars")
    val got = TextAnalysis.topNgramFraction(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got(1L) > 0.5 && got(2L) < 0.1,
      s"templated ${got(1L)} vs varied ${got(2L)}")
  }
}
