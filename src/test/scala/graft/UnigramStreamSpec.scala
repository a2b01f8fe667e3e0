package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Unigram
import graft.streaming.DocStream

/** Streaming twin of the unigram tokenizer's serving side
  * ([[DocStream.unigramEncodeDocs]]): the frozen vocabulary map applied
  * per word must reproduce the batch encode row-for-row on
  * in-dictionary corpora, never cost MORE pieces than the batch
  * character fallback on unseen words, and run stateless in append mode
  * across micro-batch boundaries.
  */
case class StreamTokDoc(doc_id: Long, text: String)

class UnigramStreamSpec extends SparkSpec {
  import spark.implicits._

  test("batch ≡ stream: frozen vocab tokenizes the real corpus identically to the batch encode") {
    implicit val ctx = spark.sqlContext
    val table = graft.sources.Tables.documents(spark, Sf)
    // the real corpus's vocabulary fits far under maxWords, so every
    // word is in the training dictionary — parity must be exact
    val vocab = Unigram.vocabMapOf(table)
    val docs = table.select($"doc_id", $"text").as[StreamTokDoc].collect().toSeq

    val ms = MemoryStream[StreamTokDoc]
    val q = DocStream.unigramEncodeDocs(ms.toDF(), vocab)
      .writeStream.format("memory").queryName("unitok_stream")
      .outputMode("append").start()
    // two micro-batches: tokenization must not depend on batch boundaries
    ms.addData(docs.take(200))
    q.processAllAvailable()
    ms.addData(docs.drop(200))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("unitok_stream")
      .select($"doc_id", $"n_words", $"n_subwords")
      .as[(Long, Long, Long)].collect().toSet
    val batch = Unigram.unigramEncode(table, Sf)
      .select($"doc_id", $"n_words", $"n_subwords")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    Unigram.clearMemos()
  }

  test("unseen words: the stream twin never costs more than the batch character fallback") {
    implicit val ctx = spark.sqlContext
    val train = Seq(
      (1L, "ababa babab ababa babab aabba", "en", "s"),
      (2L, "bbaab ababa babab aabba bbaab", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val vocab = Unigram.vocabMapOf(train, seedV = 50, vocabV = 6, maxLen = 3,
      emRounds = 1, maxWords = 100)
    // OOV docs: words absent from training (so the batch apply would
    // cost length(word) chars) but built from trained character patterns
    val oov = Seq(StreamTokDoc(10L, "ababab bababa"), StreamTokDoc(11L, "aab bba"))
    val ms = MemoryStream[StreamTokDoc]
    val q = DocStream.unigramEncodeDocs(ms.toDF(), vocab, maxLen = 3)
      .writeStream.format("memory").queryName("unitok_oov")
      .outputMode("append").start()
    ms.addData(oov)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("unitok_oov")
      .select($"doc_id", $"n_words", $"n_subwords")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == oov.length)
    rows.foreach { case (id, nw, ns) =>
      assert(ns >= nw, s"doc $id under-segmented")
      // character-fallback cost of each doc = total chars (what the
      // batch dictionary join would charge these unseen words)
      val chars = oov.find(_.doc_id == id).get.text.split(" ").map(_.length).sum
      assert(ns <= chars,
        s"doc $id: stream Viterbi ($ns) must beat/match the char fallback ($chars)")
    }
    // the learned multi-char pieces must actually engage: "ababab
    // bababa" (12 chars) segments with aba/bab-style pieces, well
    // under the 12-piece character fallback
    val d10 = rows.find(_._1 == 10L).get
    assert(d10._3 < 12, s"no learned piece engaged on OOV words: $d10")
  }

  test("untrained characters: a word with no Viterbi path costs length(word), never 1") {
    implicit val ctx = spark.sqlContext
    val train = Seq(
      (1L, "ababa babab ababa babab aabba", "en", "s"),
      (2L, "bbaab ababa babab aabba bbaab", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val vocab = Unigram.vocabMapOf(train, seedV = 50, vocabV = 6, maxLen = 3,
      emRounds = 1, maxWords = 100)
    assert(!vocab.keySet.exists(_.exists(c => c != 'a' && c != 'b')))
    // "xyz" and "qqqq": every character outside the trained alphabet —
    // the DP has NO path, seg = '', and the twin must charge the
    // length(word) character fallback (the batch path's cost), not the
    // silent 1-piece under-count size(split('', ' ')) would produce.
    // "ab" stays fully in-vocabulary inside the same doc.
    val docs = Seq(StreamTokDoc(20L, "xyz ab qqqq"))
    val ms = MemoryStream[StreamTokDoc]
    val q = DocStream.unigramEncodeDocs(ms.toDF(), vocab, maxLen = 3)
      .writeStream.format("memory").queryName("unitok_nochar")
      .outputMode("append").start()
    ms.addData(docs)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("unitok_nochar")
      .select($"doc_id", $"n_words", $"n_subwords")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 1)
    val (_, nw, ns) = rows.head
    assert(nw == 3L)
    // xyz → 3 (char fallback) + ab → 1 learned piece + qqqq → 4 = 8;
    // the pre-fix under-count would have read 3 + 1 + 3... no: 1+1+1 or
    // mixed — anything < charging the fallback. Pin the exact total.
    val abPieces = ns - 3L - 4L
    assert(abPieces >= 1L && abPieces <= 2L,
      s"in-vocab word must still segment by Viterbi: $ns total")
    // and the stream ≤ batch invariant now holds by construction on
    // untrained alphabets too: batch charges length(w) for every word
    // outside its dictionary
    assert(ns <= 3L + 2L + 4L)
  }
}
