package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** RM3 pseudo-relevance feedback: expansion recall (a doc with ONLY
  * co-occurring terms enters the ranking), the alpha = 1 degeneration to
  * the literal BM25 order, and seed-term exclusion from the expansion.
  */
class Rm3Spec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))

  // seed query "apple"; banana co-occurs with apple in the feedback
  // docs; doc 30 contains ONLY banana; fillers keep df honest.
  private val corpus = docsDf(Seq(
    1L -> "apple banana orchard fruit stand",
    2L -> "apple banana market fresh fruit",
    3L -> "apple banana pie recipe baking",
    30L -> "banana smoothie breakfast energy",
    40L -> "unrelated filler text about weather",
    41L -> "more filler text about traffic",
    42L -> "filler text about sports results"))

  test("a doc matching only expansion terms enters the ranking with positive score") {
    val got = TextAnalysis.rm3Search(corpus, Seq("apple"),
      fbDocs = 3, fbTerms = 3)
      .collect().map(r => r.getLong(0) ->
        BigDecimal(r.getDecimal(1))).toMap
    assert(got.contains(30L), s"banana-only doc must enter: ${got.keySet}")
    assert(got(30L) > 0)
    // the literal matches still dominate the pure-expansion doc
    assert(Seq(1L, 2L, 3L).forall(d => got(d) > got(30L)),
      s"feedback docs outrank the expansion-only doc: $got")
    // pure fillers score zero (present only through the full-outer mix)
    Seq(40L, 41L, 42L).foreach(d =>
      assert(!got.contains(d) || got(d) == 0, s"filler $d must not score"))
  }

  test("alpha10 = 10 reproduces the literal BM25 ranking order") {
    val rm3 = TextAnalysis.rm3Search(corpus, Seq("apple"),
      fbDocs = 3, fbTerms = 3, alpha10 = 10)
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDecimal(1))))
    val bm25 = TextAnalysis.bm25Search(corpus, Seq("apple"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(t => (-t._2, t._1))
    val rm3Scored = rm3.filter(_._2 > 0).map(_._1)
    assert(rm3Scored.toSeq == bm25.map(_._1).toSeq,
      s"pure-alpha order must be the BM25 order: $rm3Scored vs ${bm25.map(_._1).toSeq}")
  }

  test("seed terms are excluded from the expansion set") {
    // with alpha10 = 0 (pure expansion), the seed-only doc must score 0:
    // if 'apple' leaked into the expansion set it would score positive.
    val seedOnly = docsDf(Seq(
      1L -> "apple banana fruit", 2L -> "apple banana stand",
      10L -> "apple apple apple apple",
      40L -> "filler text here", 41L -> "other filler text"))
    val got = TextAnalysis.rm3Search(seedOnly, Seq("apple"),
      fbDocs = 2, fbTerms = 2, alpha10 = 0)
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    assert(got.getOrElse(10L, BigDecimal(0)) == 0,
      s"seed-only doc must not gain from expansion: $got")
  }
}
