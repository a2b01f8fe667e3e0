package graft

import graft.operators.TextAnalysis

/** Conjunctive term search and the cross-source shingle containment
  * matrix: hand-computed fixtures (AND semantics, tf scoring, set — not
  * bag — containment) on planted corpora.
  */
class SearchOverlapSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("scan", "merge", "sort")

  test("search keeps exactly the docs containing EVERY term, scored by total tf") {
    val docs = Seq(
      (1L, "scan merge sort scan"),        // all 3 terms, 4 postings
      (2L, "scan merge scan merge"),       // no sort → excluded
      (3L, "sort sort merge scan extra"),  // all 3, 4 postings
      (4L, "nothing relevant here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.search(docs, terms)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 4L, 3L -> 4L))
  }

  test("search matches case-insensitively (tokenize lowers)") {
    val docs = Seq((1L, "Scan MERGE sort")).toDF("doc_id", "text")
    val got = TextAnalysis.search(docs, terms)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L))
  }

  test("sourceOverlap computes set containment; duplicate docs don't inflate") {
    // trigram shingles: "a b c d" → {abc, bcd}; "a b c x" → {abc, bcx}
    // A ∩ B = {abc} → containment 1/2 each direction; C shares nothing.
    // The duplicated doc in A must not change A's shingle SET.
    val docs = Seq(
      (1L, "A", "a b c d"),
      (2L, "A", "a b c d"), // exact dup within source
      (3L, "B", "a b c x"),
      (4L, "C", "p q r s")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.sourceOverlap(docs)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(
      ("A", "B") -> (1L, 0.5),
      ("B", "A") -> (1L, 0.5)))
  }

  test("identical sources have containment 1 both ways") {
    val docs = Seq(
      (1L, "A", "a b c d e"),
      (2L, "B", "a b c d e")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.sourceOverlap(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(got == Map(("A", "B") -> 1.0, ("B", "A") -> 1.0))
  }

  test("bm25: disjunctive, hand-computed nano-unit scores") {
    val docs = Seq(
      (1L, "scan merge sort scan"),    // all 3 terms
      (2L, "scan merge scan merge"),   // 2 terms — still scored (disjunctive)
      (3L, "nothing relevant here"),   // no terms → absent
      (4L, "sort extra words beyond")  // 1 term
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25Search(docs, terms)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // independently computed: N=4 sumdl=15 avgdl=3.75; per-term
    // floor(((N-df+0.5)/(df+0.5)) * (tf*2.2/(tf+1.2*(0.25+0.75*dl/avgdl))) * 1e9)
    assert(got == Map(
      1L -> ((3L, 3296595905L)),
      2L -> ((2L, 2699386502L)),
      4L -> ((1L, 973451327L))))
  }

  test("bm25 saturation: doubling tf raises the score sublinearly") {
    // same dl, same single term; tf 1 vs 2 vs 8 — scores strictly rise but
    // with strictly shrinking increments (Robertson saturation), never tf-linear
    val docs = Seq(
      (1L, "scan pad1 pad2 pad3 pad4 pad5 pad6 pad7"),
      (2L, "scan scan pad2 pad3 pad4 pad5 pad6 pad7"),
      (3L, "scan scan scan scan scan scan scan scan"),
      (4L, "none of these words match anything here")
    ).toDF("doc_id", "text")
    val s = TextAnalysis.bm25Search(docs, Seq("scan"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(1L) < s(2L) && s(2L) < s(3L), s"not monotone: $s")
    assert(s(2L) < 2 * s(1L), "tf=2 must score below 2x tf=1 (saturation)")
    assert(s(3L) < 8 * s(1L), "tf=8 must score far below 8x tf=1")
  }

  test("bm25 idf: a rare term outweighs a common term at equal tf and dl") {
    // 'rare' appears in 1 of 6 docs; 'common' in 5 of 6 — doc 1 and doc 2
    // match exactly one term each with tf=1 and identical dl
    val docs = Seq(
      (1L, "rare pad pad pad"),
      (2L, "common pad pad pad"),
      (3L, "common x y z"),
      (4L, "common x y z"),
      (5L, "common x y z"),
      (6L, "common x y z")
    ).toDF("doc_id", "text")
    val s = TextAnalysis.bm25Search(docs, Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(1L) > s(2L), s"rare-term doc must outrank common-term doc: $s")
  }
}
