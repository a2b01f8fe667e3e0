package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** BPE merge training (Sennrich'16) — hand-computed merge sequences pin
  * the pair counting (overlapping adjacencies), the greedy non-overlap
  * merge, and the deterministic (count desc, lhs, rhs) tie-break.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpeMerges reproduces the hand-computed Sennrich'16 merge sequence") {
    // word freqs {low:5, lower:2, newest:6, widest:3} — the paper's
    // worked example. Hand-derived with the </w> marker:
    //  round 1: (e,s)/(s,t)/(t,</w>) all count 9 → lhs tie-break → (e,s)
    //  round 2: (es,t) and (t,</w>) at 9 → "es" < "t" → (es,t)
    //  round 3: (est,</w>) alone at 9
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, merges = 3)
      .orderBy("merge_round")
      .as[(Long, String, String, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, "e", "s", 9L, "es"),
      (2L, "es", "t", 9L, "est"),
      (3L, "est", "</w>", 9L, "est</w>")))
  }

  test("bpeMerges counts overlapping adjacencies, merges non-overlapping greedily") {
    // "aaaa" has THREE adjacent (a,a) positions — the paper's get_stats
    // counts every adjacency — but the greedy left-to-right merge yields
    // [aa, aa], not [aa, a, a]; round 2 must see the merged symbols.
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, merges = 2)
      .orderBy("merge_round")
      .as[(Long, String, String, Long, String)].collect().toSeq
    assert(got.head === ((1L, "a", "a", 6L, "aa")))
    // after the merge "aaaa" → [aa, aa, </w>]: (aa,aa)=2 ties (aa,</w>)=2
    // and "</w>" sorts below "aa" in binary order → rhs tie-break
    assert(got(1) === ((2L, "aa", "</w>", 2L, "aa</w>")))
  }

  test("bpeMerges: a capped dictionary trains on the most frequent words only") {
    // maxWords=1 keeps just "zz" (freq 3 beats "ab" 2): the merge table
    // can only contain zz-derived symbols. (z,z) and (z,</w>) tie at 3;
    // "</w>" < "z" in binary order so the rhs tie-break picks (z,</w>).
    val docs = Seq((1L, "zz zz zz ab ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, merges = 1, maxWords = 1)
      .as[(Long, String, String, Long, String)].collect().toSeq
    assert(got === Seq((1L, "z", "</w>", 3L, "z</w>")))
  }

  test("bpeSegment: hand-computed fertility under the trained merges") {
    // after the 3 Sennrich merges (es, est, est</w>):
    //   low → l o w </w> (4)        lower → l o w e r </w> (6)
    //   newest → n e w est</w>?  no: est</w> only fires round 3 →
    //   newest → n e w est</w> = [n, e, w, est</w>] (4)
    //   widest → [w, i, d, est</w>] (4)
    // n_words = 16, n_subwords = 5·4 + 2·6 + 6·4 + 3·4 = 68
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextAnalysis.bpeSegment(docs, merges = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 16L, 68L, 68.0 / 16.0)))
  }

  test("bpeSegment: OOV words (capped dictionary) fall back to chars + marker") {
    // maxWords=1 trains on "zz" only ([z, z</w>] after the (z,</w>)
    // merge = 2 subwords); OOV "ab" costs length+1 = 3
    val docs = Seq((1L, "zz zz zz ab ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeSegment(docs, merges = 1, maxWords = 1)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 5L, 3L * 2L + 2L * 3L, 12.0 / 5.0)))
  }

  test("fertilityByLang: per-lang totals conserve against the per-doc segmentation") {
    val docs = graft.sources.Tables.documents(spark, Sf)
    val perDoc = TextAnalysis.bpeSegment(docs)
      .agg(sum($"n_words"), sum($"n_subwords")).collect().head
    val perLang = TextAnalysis.fertilityByLang(docs)
      .agg(sum($"n_words"), sum($"n_subwords")).collect().head
    assert(perLang.getLong(0) === perDoc.getLong(0), "word mass must conserve")
    assert(perLang.getLong(1) === perDoc.getLong(1), "subword mass must conserve")
  }

  test("fertilityByLang: OOV fallback counted, fertility weighted by occurrence") {
    // maxWords=1 trains on "zz" only (freq 3 beats ab's 2 and qq's 1 —
    // no tie) → "zz" in-vocab at 2 subwords; OOV costs length+1 = 3.
    // en: 3×zz + 2×ab → 5 words, 12 subwords, 2 OOV; de: 1×qq → 1 word,
    // 3 subwords, 1 OOV
    val docs = Seq(
      (1L, "zz zz zz ab ab", "en"),
      (2L, "qq", "de")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.fertilityByLang(docs, merges = 1, maxWords = 1)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    val en = out("en")
    assert(en.getAs[Long]("n_words") === 5L)
    assert(en.getAs[Long]("n_subwords") === 12L)
    assert(en.getAs[Long]("n_oov") === 2L)
    assert(en.getAs[Double]("fertility") === 12.0 / 5.0)
    assert(en.getAs[Long]("oov_permille") === 400L)
    val de = out("de")
    assert(de.getAs[Long]("n_words") === 1L)
    assert(de.getAs[Long]("n_oov") === 1L)
    assert(de.getAs[Long]("oov_permille") === 1000L)
  }

  test("bpeMerges: empty corpus yields zero merges with the contract schema") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(empty, merges = 2)
    assert(out.columns.toSeq ===
      Seq("merge_round", "lhs", "rhs", "pair_count", "new_sym"))
    assert(out.count() === 0)
  }
}
