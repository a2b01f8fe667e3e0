package graft

import org.apache.spark.sql.functions._
import graft.operators.EntityResolution
import graft.sources.Tables

/** EntityResolution.bestMatch against a brute-force in-memory reference
  * (same conjunctive bigram blocking, exhaustive Levenshtein argmin) on
  * synthetic records and the real sf0.001 part table, plus the
  * pigeonhole recall property: a single-word edit can never break both
  * disjoint bigram keys, so mutated copies are always found.
  */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def word(s: String, i: Int): String = {
    val w = s.split(" ", -1)
    if (i <= w.length) w(i - 1) else ""
  }

  /** Same blocking predicate as the operator: agree on (w1, w2) or on
    * (w3, w4), empty words never block.
    */
  private def blocked(a: String, b: String): Boolean = {
    def key(s: String, i: Int) = (word(s, i), word(s, i + 1))
    def ok(k: (String, String)) = k._1.nonEmpty && k._2.nonEmpty
    (ok(key(a, 1)) && key(a, 1) == key(b, 1)) ||
      (ok(key(a, 3)) && key(a, 3) == key(b, 3))
  }

  /** Exhaustive reference: candidates from the blocking predicate,
    * argmin by (distance, key).
    */
  private def ref(recs: Seq[(Long, String)]): Map[Long, (Long, Long)] =
    recs.flatMap { case (k, n) =>
      recs.collect {
        case (k2, n2) if k2 != k && blocked(n, n2) => (k, (lev(n, n2).toLong, k2))
      }
    }.groupBy(_._1).map { case (k, cs) => k -> cs.map(_._2).min }

  private def run(recs: Seq[(Long, String)]): Map[Long, (Long, Long)] =
    EntityResolution.bestMatch(recs.toDF("p_partkey", "p_name"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("exact duplicates resolve at distance 0; ties break to the lowest key") {
    val recs = Seq(
      1L -> "alpha beta gamma delta one",
      2L -> "alpha beta gamma delta one",   // exact pair with 1
      3L -> "alpha beta zzz yyy xxx",       // shares (w1,w2) with 1,2,6
      4L -> "qqq rrr gamma delta sss",      // shares (w3,w4) with 1,2,6
      5L -> "unique words entirely different here", // no shared bigram
      6L -> "alpha beta gamma delta two",   // dist 3 to both 1 and 2
      7L -> "short")                        // one word: blocks nowhere
    val got = run(recs)
    assert(got(1L) == (0L, 2L) && got(2L) == (0L, 1L))
    assert(!got.contains(5L) && !got.contains(7L), "blockless records emit no row")
    assert(got(6L)._1 == 3L && got(6L)._2 == 1L, "tie must break to key 1")
    assert(got == ref(recs))
  }

  test("pigeonhole recall: a one-word edit always shares a blocking key") {
    // mutate word i of each base name; the other disjoint bigram is
    // untouched, so the pair MUST surface with best_dist = the edit cost
    val base = "lime cornsilk honeydew orchid plum"
    val recs = (1L -> base) +: (1 to 5).map { i =>
      val w = base.split(" "); w(i - 1) = w(i - 1) + "x"
      (i + 1).toLong -> w.mkString(" ")
    }
    val got = run(recs)
    for (i <- 1 to 5)
      assert(got((i + 1).toLong) == (1L, 1L), s"mutated word $i not recalled")
    assert(got(1L)._1 == 1L, "base must resolve to one of its 1-edit copies")
  }

  test("matches the exhaustive reference on the sf0.001 part table") {
    val parts = Tables.part(spark, Sf)
      .select($"p_partkey".cast("long"), $"p_name").as[(Long, String)]
      .collect().toSeq
    val want = ref(parts)
    assert(want.nonEmpty, "fixture must produce at least one blocked pair")
    assert(run(parts) == want)
  }
}
