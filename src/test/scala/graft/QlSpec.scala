package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Dirichlet query likelihood (Zhai–Lafferty'01) against a fully
  * hand-computed fixture, plus the smoothing properties that
  * distinguish it from every tf-only scorer: unmatched documents still
  * score, and among unmatched documents the SHORTER one ranks higher
  * (its probability mass is less diluted).
  */
class QlSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // doc 1: "a a b"  (dl 3, two 'a')
    (1L, "a a b", "en", "s"),
    // doc 2: "a c c c" (dl 4, one 'a')
    (2L, "a c c c", "en", "s"),
    // doc 3: "c c" (dl 2, unmatched, short)
    (3L, "c c", "en", "s"),
    // doc 4: "c c c c c c" (dl 6, unmatched, long)
    (4L, "c c c c c c", "en", "s"))
    .toDF("doc_id", "text", "lang", "source")

  private def refAtto(tf: Long, dl: Long, cf: Long, tt: Long,
      mu: Double): Long =
    math.floor(1.0 * ((tf.toDouble + mu * (cf.toDouble / tt.toDouble))
      / (dl.toDouble + mu)) * 1e18).toLong

  test("scores match the hand-computed Dirichlet ratios exactly") {
    val mu = 10.0
    val got = TextAnalysis.qlSearch(docs, Seq("a"), mu = mu, k = 10)
      .as[(Long, Long)].collect().toMap
    // corpus: tt = 15, cf(a) = 3
    val want = Map(
      1L -> refAtto(2, 3, 3, 15, mu),
      2L -> refAtto(1, 4, 3, 15, mu),
      3L -> refAtto(0, 2, 3, 15, mu),
      4L -> refAtto(0, 6, 3, 15, mu))
    assert(got === want)
  }

  test("smoothing: unmatched docs score, and the shorter unmatched doc ranks higher") {
    val ranked = TextAnalysis.qlSearch(docs, Seq("a"), mu = 10.0, k = 10)
      .as[(Long, Long)].collect()
    val order = ranked.map(_._1).toSeq
    assert(ranked.forall(_._2 > 0L), s"every doc must carry smoothed mass: ${ranked.toSeq}")
    // matched docs lead; among the unmatched pair, dl 2 beats dl 6
    assert(order.indexOf(3L) < order.indexOf(4L),
      s"short unmatched doc must outrank the long one: $order")
    assert(order.head == 1L, s"highest-tf shortest match must lead: $order")
  }

  test("multi-term product folds in query order and matches the reference") {
    val mu = 10.0
    val got = TextAnalysis.qlSearch(docs, Seq("a", "c"), mu = mu, k = 10)
      .as[(Long, Long)].collect().toMap
    // cf(a) = 3, cf(c) = 11, tt = 15
    def both(tfa: Long, tfc: Long, dl: Long): Long = {
      val ra = (tfa.toDouble + mu * (3.0 / 15.0)) / (dl.toDouble + mu)
      val rc = (tfc.toDouble + mu * (11.0 / 15.0)) / (dl.toDouble + mu)
      math.floor(1.0 * ra * rc * 1e18).toLong
    }
    val want = Map(
      1L -> both(2, 0, 3), 2L -> both(1, 3, 4),
      3L -> both(0, 2, 2), 4L -> both(0, 6, 6))
    assert(got === want)
  }

  test("a term absent from the corpus zeroes every score deterministically") {
    val got = TextAnalysis.qlSearch(docs, Seq("zzz"), mu = 10.0, k = 10)
      .as[(Long, Long)].collect()
    assert(got.forall(_._2 == 0L))
    // tie-break by doc_id, total order preserved
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
  }
}
