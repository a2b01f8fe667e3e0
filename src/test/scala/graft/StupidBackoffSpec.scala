package graft

import graft.operators.TextAnalysis

/** Stupid-Backoff bigram LM score: hand-computed reference on a tiny
  * corpus with a genuinely held-out doc, pinning both score paths (seen
  * ratio and 0.4-backoff), the unseen-unigram floor, and the
  * backoff_frac novelty signal.
  */
class StupidBackoffSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Double)] =
    TextAnalysis.stupidBackoff(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))))
      .toMap

  test("hand-computed: seen ratios, backoff path, unseen-unigram floor") {
    // train = even ids: doc 2 "a b a b", doc 4 "a b c"
    // train uni: a:3 b:3 c:1, N=7; train bigrams: "a b":3 "b a":1 "b c":1
    val docs = Seq(
      2L -> "a b a b",
      4L -> "a b c",
      1L -> "a b c",   // all bigrams seen in train → 0 backoff
      3L -> "c a",     // "c a" UNSEEN bigram, both unigrams seen
      5L -> "a zz")    // "a zz" unseen bigram, zz unseen unigram
    val got = run(docs)
    // doc 1: s(a b)=bitlen(3)-bitlen(3)=0; s(b c)=1-2=-1 → total -1
    assert(got(1L) === ((2L, 0L, -1L, 0.0)))
    // doc 3: backoff with c1(a)=3: bitlen(6)-bitlen(35) = 3-6 = -3
    assert(got(3L) === ((1L, 1L, -3L, 1.0)))
    // doc 5: backoff with floor c1(zz):=1: bitlen(2)-bitlen(35) = 2-6 = -4
    assert(got(5L) === ((1L, 1L, -4L, 1.0)))
    // train docs score against themselves: never back off
    assert(got(2L)._2 === 0L && got(4L)._2 === 0L)
  }

  test("perplexity buckets: held-out only, tercile invariants hold, no lang window in the plan") {
    import graft.operators.TextAnalysis
    import graft.sources.Tables
    val df = TextAnalysis.perplexityBuckets(Tables.documents(spark, Sf))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"terciles must be two-pass, not a lang window:\n$plan")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      "the |langs|-row threshold table must broadcast")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(0) % 2 == 1), "held-out docs only")
    for (r <- rows) {
      val (sb, bucket, t1, t2) = (r.getDouble(2), r.getString(3), r.getDouble(4), r.getDouble(5))
      assert(t1 <= t2, s"tercile order: $r")
      bucket match {
        case "head"   => assert(sb >= t2)
        case "middle" => assert(sb >= t1 && sb < t2)
        case "tail"   => assert(sb < t1)
      }
    }
    // every language with >= 3 held-out docs populates all three buckets
    val byLang = rows.groupBy(_.getString(1))
    for ((lang, rs) <- byLang if rs.length >= 3) {
      val buckets = rs.map(_.getString(3)).toSet
      assert(buckets === Set("head", "middle", "tail"),
        s"$lang (${rs.length} docs) buckets: $buckets")
    }
  }

  test("backoff_frac separates held-out novelty from in-distribution text") {
    val train = (0 to 10).map(i => (i * 2).toLong -> "the cat sat on the mat")
    val inDist = 1L -> "the cat sat on the mat"
    val novel = 3L -> "quantum flux capacitors hum loudly"
    val got = run(train :+ inDist :+ novel)
    assert(got(1L)._4 === 0.0, "in-distribution doc must not back off")
    assert(got(3L)._4 === 1.0, "fully-novel doc must back off on every bigram")
    // backoff scores ≈ log(0.4·c/N) sit far below seen-ratio scores
    assert(got(3L)._3 < got(1L)._3)
  }
}
