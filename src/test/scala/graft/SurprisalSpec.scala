package graft

import graft.operators.TextAnalysis

/** Bigram-surprisal score: hand-computed reference on a tiny corpus,
  * and the LM-proxy ordering property — common words in a RARE order
  * (frequent unigram, rare bigram) must outscore the corpus's dominant
  * pattern, while a doc of unique words scores 0 (each transition is
  * fully determined by its one-occurrence predecessor).
  */
class SurprisalSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Double)] =
    TextAnalysis.surprisal(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

  test("matches the hand-computed counts on a two-doc corpus") {
    // uni: a:3 b:3 c:1; bigrams: "a b":3 "b a":1 "b c":1
    // s("a b") = bitlen(3)-bitlen(3) = 0; s("b a") = s("b c") = 2-1 = 1
    val got = run(Seq(1L -> "a b a b", 2L -> "a b c", 3L -> "solo"))
    assert(got(1L) == (3L, 1L, 1.0 / 3.0)) // (a b),(b a),(a b)
    assert(got(2L) == (2L, 1L, 0.5))       // (a b),(b c)
    assert(!got.contains(3L), "a 1-token doc has no bigrams")
  }

  test("rare-order doc outscores the dominant pattern; unique words score 0") {
    val dominant = (1 to 10).map(i => i.toLong -> "a b c a b c a b c")
    val rareOrder = 11L -> "c b a c b a"
    val uniques = 12L -> "qq ww ee rr tt"
    val got = run(dominant :+ rareOrder :+ uniques)
    assert(got(11L)._3 > got(1L)._3,
      s"rare transitions ${got(11L)._3} must outscore dominant ${got(1L)._3}")
    assert(got(12L)._3 == 0.0,
      "unique-word doc: every transition is determined by its unique predecessor")
  }
}
