package graft

import org.apache.spark.sql.functions._
import graft.operators.EntityResolution

/** Robustness sweep for EntityResolution.bestMatch: null, empty,
  * whitespace-only, 1-word, multi-space, and unicode part names must
  * flow through both stages (twin aggregation + fuzzy blocking) without
  * a stage failure, and the declared semantics must hold at the edges:
  * names with no valid blocking bigram resolve to nothing; unicode
  * names block and measure distance by CHARACTER, not byte.
  */
class EntityResolutionFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Long)] =
    EntityResolution.bestMatch(rows.toDF("p_partkey", "p_name"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("null / empty / whitespace / 1-word names produce no rows and no crash") {
    val out = run(Seq(
      (1L, null),
      (2L, null),              // two nulls: must not twin-match
      (3L, ""),
      (4L, ""),                // two empties: must not twin-match
      (5L, "   "),
      (6L, "solo"),            // 1 word: no blocking bigram
      (7L, "solo"),            // duplicated 1-word name: still no bigram
      (8L, "alpha beta"),      // valid 2-word pair — the control group
      (9L, "alpha beta")))
    assert(out === Map(8L -> ((0L, 9L)), 9L -> ((0L, 8L))),
      s"only the valid twin pair may resolve: $out")
  }

  test("unicode names: twins resolve at distance 0, blocking keys compare by codepoint") {
    val out = run(Seq(
      (1L, "café rouge grand nord"),
      (2L, "café rouge grand nord"),           // exact unicode twin
      (3L, "café bleu grand nord"),            // blocks via (w3,w4)=(grand,nord)
      (4L, "日本語 データ 処理 系"),             // CJK twin pair
      (5L, "日本語 データ 処理 系")))
    assert(out(1L) === ((0L, 2L)) && out(2L) === ((0L, 1L)))
    assert(out(4L) === ((0L, 5L)) && out(5L) === ((0L, 4L)))
    // doc 3 blocks with 1/2 on the second bigram; lev("rouge","bleu")
    // dominates: distance is by character (5 for rouge→bleu as substring
    // edit), and the tie-break picks the lowest key
    assert(out(3L)._2 === 1L, s"unicode blocking pair lost: $out")
    assert(out(3L)._1 === lev("café rouge grand nord", "café bleu grand nord"),
      s"character-distance mismatch: $out")
  }

  test("multi-space and trailing-space names never crash, empty fields never block") {
    val out = run(Seq(
      (1L, "a  b c d"),    // double space → empty 2nd field: (w1,w2)=(a,"") invalid
      (2L, "a  b c d"),    // but it IS a twin — stage 1 needs split_part(name,2) nonempty,
                           // which is "" here → twins with no valid first bigram skip stage 1
      (3L, "x y  "),       // trailing spaces
      (4L, "p q r s t u v w"))) // many words: only (w1,w2),(w3,w4) block
    // the contract is completion + no spurious pairs; names 1/2 share
    // their exact string but have no valid first bigram so stage 1 skips
    // them, and stage 2 only handles unique names → no rows for 1/2
    assert(!out.contains(3L) && !out.contains(4L), s"spurious match: $out")
  }

  test("degenerate rows interleaved with the real corpus change nothing for valid names") {
    val base = Seq(
      (10L, "forest green metallic sky"),
      (11L, "forest green metallic sky"),
      (12L, "forest green plastic sky"))
    val noise = Seq((90L, null: String), (91L, ""), (92L, " "), (93L, "one"))
    val clean = run(base)
    val noisy = run(base ++ noise).view.filterKeys(_ < 90L).toMap
    assert(clean === noisy, s"degenerate rows perturbed valid matches:\n$clean\n$noisy")
  }

  test("blocking recall audit: single-word edits always recalled, double-bigram breaks surface as misses") {
    val rows = Seq(
      // sample key 100: single-word edit vs 1 → pigeonhole guarantees the block
      (1L, "amber rose copper mist"),
      (100L, "amber rose copper haze"),
      // sample key 200: true nearest (201) differs in words 2 AND 4 —
      // both bigram keys break, the blocking CANNOT see it
      (200L, "violet storm silver peak"),
      (201L, "violet cloud silver vale"),
      // far-away fillers sharing 200's bigrams so the blocked side still
      // resolves 200 to SOMETHING (just at a worse distance)
      (300L, "violet storm thunder quake rumble"),
      (301L, "unrelated words entirely different"))
      .toDF("p_partkey", "p_name")
    val out = EntityResolution.blockingRecall(rows, sampleMod = 100)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))).toMap
    // key 100: true dist = lev(haze, mist)-ish single-word edit, recalled exactly
    assert(out(100L)._3, s"single-word edit must be recalled: ${out(100L)}")
    assert(out(100L)._1 === out(100L)._2)
    // key 200: true nearest is 201 but both bigrams broke → blocked finds
    // only the worse in-block 300 (or nothing) → a genuine measured miss
    assert(!out(200L)._3, s"double-bigram break must surface as a miss: ${out(200L)}")
    assert(out(200L)._2 > out(200L)._1 || out(200L)._2 == -1L)
  }

  private def lev(a: String, b: String): Long = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length).toLong
  }
}
