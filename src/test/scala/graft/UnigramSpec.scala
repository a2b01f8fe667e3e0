package graft

import org.apache.spark.sql.functions._
import graft.operators.Unigram

/** Unigram-LM tokenizer (Kudo'18, hard-EM variant): a fully hand-computed
  * EM fixture (seed counts → Viterbi segmentations → re-count → prune),
  * the single-character coverage guarantee, fertility sanity against BPE,
  * and partitioning-independence of the trained vocabulary.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))

  test("one EM round replays the hand-computed trainer exactly") {
    // dictionary: abab×4, ab×2, cd×1 (from one doc's token stream).
    // Seed substring counts (len 1..2, every occurrence, freq-weighted):
    //   a=10, b=10, ab=10, ba=4, c=1, d=1, cd=1   (total 37)
    // Viterbi under p=cnt/37: abab→"ab ab" ((10/37)² beats any 3+-piece
    // product), ab→"ab" (fewer pieces at 10/37 vs (10/37)²), cd→"cd".
    // E-step counts: ab = 4·2 + 2·1 = 10, cd = 1.
    // Prune to vocabV=2 → {ab:10, cd:1}; chars floored to 1 →
    //   {ab:10, cd:1, a:1, b:1, c:1, d:1}.
    val docs = docsDf(Seq(1L -> "abab abab abab abab ab ab cd"))
    val got = Unigram.unigramVocab(docs, seedV = 100, vocabV = 2,
        maxLen = 2, emRounds = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = Set(("ab", 10L), ("cd", 1L),
      ("a", 1L), ("b", 1L), ("c", 1L), ("d", 1L))
    assert(got === want, s"EM fixture diverged: $got")
  }

  test("encode replays the hand-computed fertility") {
    // under the fixture vocabulary: abab→2 pieces, ab→1, cd→1;
    // doc = 7 words → 4·2 + 2·1 + 1 = 11 pieces, fertility 11/7
    val docs = docsDf(Seq(1L -> "abab abab abab abab ab ab cd"))
    val got = Unigram.unigramEncode(docs, seedV = 100, vocabV = 2,
        maxLen = 2, emRounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 1)
    assert(got(0) === ((1L, 7L, 11L, 11.0 / 7.0)), s"fixture encode: ${got(0)}")
  }

  test("single-character coverage: every dictionary word segments (no empty segs)") {
    // a word whose every substring of length ≥ 2 is pruned away must
    // still segment via the character floor
    val docs = docsDf(Seq(
      1L -> "zzzz zzzz zzzz xqvj",  // xqvj's pairs never reach vocabV=1
      2L -> "zzzz zz"))
    val enc = Unigram.unigramEncode(docs, seedV = 4, vocabV = 1,
        maxLen = 3, emRounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.nonEmpty)
    enc.foreach { case (id, nw, ns) =>
      assert(ns >= nw, s"doc $id: pieces $ns < words $nw — a word failed to segment") }
    // and the vocabulary always carries the full character inventory
    val vocab = Unigram.unigramVocab(docs, seedV = 4, vocabV = 1,
        maxLen = 3, emRounds = 1)
      .collect().map(_.getString(0)).toSet
    Seq("z", "x", "q", "v", "j").foreach(c =>
      assert(vocab.contains(c), s"char $c missing from vocab: $vocab"))
  }

  test("real corpus: vocabulary beats the character baseline and is partitioning-independent") {
    val docs = graft.sources.Tables.documents(spark, Sf)
    def run(parts: Int): Set[(String, Long)] =
      Unigram.unigramVocab(docs.repartition(parts))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val a = run(1)
    assert(a === run(13), "trained vocab is partitioning-dependent")
    assert(a.exists(_._1.length > 1),
      s"no multi-char piece learned: ${a.take(10)}")
    // multi-char pieces must do real work: corpus fertility strictly
    // below the all-characters segmentation cost
    val enc = Unigram.unigramEncode(docs)
      .agg(sum($"n_subwords").as("ns"), sum($"n_words").as("nw"))
      .collect()(0)
    val chars = docs.select(explode(graft.functions.TextFunctions.tokens($"text")).as("w"))
      .agg(sum(length($"w"))).collect()(0).getLong(0)
    assert(enc.getLong(0) < chars,
      s"unigram fertility no better than characters: ${enc.getLong(0)} vs $chars")
    assert(enc.getLong(0) >= enc.getLong(1), "pieces below word count")
  }

  test("per-lang equity table reconciles with the per-doc encode exactly") {
    val docs = graft.sources.Tables.documents(spark, Sf)
    val byLang = Unigram.unigramFertilityByLang(docs, Sf)
      .agg(sum($"n_words"), sum($"n_subwords"), sum($"n_oov")).collect()(0)
    val byDoc = Unigram.unigramEncode(docs, Sf)
      .agg(sum($"n_words"), sum($"n_subwords")).collect()(0)
    assert(byLang.getLong(0) === byDoc.getLong(0), "word totals must reconcile")
    assert(byLang.getLong(1) === byDoc.getLong(1), "piece totals must reconcile")
    // and the equity columns are internally consistent
    Unigram.unigramFertilityByLang(docs, Sf).collect().foreach { r =>
      val (nw, ns, noov) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(r.getDouble(5) == ns.toDouble / nw)
      assert(r.getLong(7) == noov * 1000 / nw)
    }
  }

  test("memoized dictionary artifact serves the encode (bpeDictFor contract)") {
    val docs = graft.sources.Tables.documents(spark, Sf)
    val d1 = Unigram.unigramDictFor(docs, Sf)
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    val d2 = Unigram.unigramDictFor(docs, Sf)
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(d1 === d2)
    assert(d1.nonEmpty && d1.values.forall(_ >= 1))
    Unigram.clearMemos()
  }
}
