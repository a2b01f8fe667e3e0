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
}
