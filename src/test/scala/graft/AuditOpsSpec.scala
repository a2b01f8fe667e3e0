package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextAnalysis}
import graft.sources.Tables

/** Invariants for the index/corpus audit read-outs: vocabulary coverage
  * and IVF cell balance.
  */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  test("vocab coverage: hand-computed fixture, monotone in k, exact integers") {
    // counts: a=4, b=3, c=2, d=1 → total 10
    val docs = Seq(
      (1L, "a a b c", "en", "s", 7L),
      (2L, "a b c d", "en", "s", 7L),
      (3L, "a b", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.vocabCoverage(docs, ks = Seq(1, 2, 3))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) === ((4L, 10L, 4L, 0.4)))
    assert(out(2L) === ((7L, 10L, 4L, 0.7)))
    assert(out(3L) === ((9L, 10L, 4L, 0.9)))
  }

  test("vocab coverage on the corpus: monotone, bounded by 1, vocab consistent") {
    val rows = TextAnalysis.vocabCoverage(Tables.documents(spark, Sf))
      .orderBy($"k").collect()
    val covs = rows.map(_.getDouble(4))
    assert(covs.zip(covs.tail).forall { case (a, b) => a <= b }, "monotone in k")
    assert(covs.forall(c => c > 0 && c <= 1.0))
    assert(rows.map(_.getLong(3)).distinct.length === 1, "one vocab size")
  }

  test("lang confusion: planted mislabels land off-diagonal with exact permille") {
    val docs = Seq(
      (1L, "the king of a castle", "en", "s", 20L),
      (2L, "the queen of a palace", "en", "s", 21L),
      (3L, "der hund und die katze", "en", "s", 22L), // mislabeled: German text
      (4L, "der baum und die blume", "de", "s", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.langConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(("en", "en")) === ((2L, 3L, 666L)))
    assert(out(("en", "de")) === ((1L, 3L, 333L)), "the mislabel must land off-diagonal")
    assert(out(("de", "de")) === ((1L, 1L, 1000L)))
    assert(out.size === 3)
  }

  test("lang confusion reconciles with langId's matches_label on the corpus") {
    val docs = Tables.documents(spark, Sf)
    val diag = TextAnalysis.langConfusion(docs)
      .filter($"lang" === $"pred_lang")
      .agg(sum($"n_docs")).collect().head.getLong(0)
    val matches = TextAnalysis.langId(docs)
      .filter($"matches_label").count()
    assert(diag === matches, "diagonal mass must equal the per-doc match count")
  }

  test("quality-length correlation: planted perfect/anti/zero correlations recovered") {
    import graft.operators.Curation
    // lang p: quality rises with length (few stopwords in long docs);
    // these docs are crafted so quality is monotone with n_chars
    def doc(id: Long, lang: String, text: String, n: Long) = (id, text, lang, "s", n)
    val docs = Seq(
      // same text => same quality; vary n_chars only => r undefined in x? no:
      // qx constant => zero variance => null
      doc(1L, "z", "alpha beta gamma", 10L),
      doc(2L, "z", "alpha beta gamma", 20L),
      doc(3L, "z", "alpha beta gamma", 30L),
      // lang c: constant length, varying quality => zero length variance => null
      doc(4L, "c", "the the the the", 10L),
      doc(5L, "c", "alpha beta gamma delta", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Curation.qualityLengthCorr(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("z").isNullAt(2), "constant quality must yield null r, not a crash")
    assert(out("c").isNullAt(2), "constant length must yield null r, not a crash")
    // a genuinely correlated pair: quality differs, length differs in step
    val docs2 = Seq(
      doc(1L, "p", "alpha beta gamma delta", 40L),  // high quality, long
      doc(2L, "p", "the the of of", 10L),           // low quality (stopwords), short
      doc(3L, "p", "alpha the gamma of", 25L))      // middle on both
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Curation.qualityLengthCorr(docs2).collect().head.getDouble(2)
    assert(r > 0.9, s"planted positive correlation must be recovered: $r")
  }

  test("nprobe recall curve: monotone in the budget, reconciles with knnIvf at nprobe=2") {
    val e = Tables.embeddings(spark, Sf)
    val curve = Similarity.ivfRecallCurve(e).orderBy($"nprobe").collect()
    assert(curve.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L))
    val recalls = curve.map(_.getDouble(3))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"candidate sets nest, so recall must be monotone: ${recalls.toSeq}")
    assert(recalls.forall(r => r >= 0 && r <= 1))
    // the np=2 point must equal the recall computed from knnIvf(nprobe=2)
    val truth = Similarity.knnBrute(e).filter($"rn" <= 3).select($"qid", $"vec_id")
    val ann2 = Similarity.knnIvf(e, nprobe = 2).select($"qid", $"vec_id")
    val hit2 = truth.join(ann2, Seq("qid", "vec_id"), "left_semi").count()
    val at2 = curve.find(_.getLong(0) == 2L).get
    assert(at2.getLong(2) === hit2 && at2.getLong(1) === truth.count(),
      "curve point must reconcile with the single-budget operator")
  }

  test("cell balance: a cell no vector lands in still appears with n_vecs = 0") {
    val e = Seq(
      (1L, Seq(1f, 0f), 0),
      (2L, Seq(0.9f, 0.1f), 0))
      .toDF("vec_id", "embedding", "label")
    // centroid 7 is far from every vector → captures nothing, and the
    // audit must SHOW that (the wasted probe slot), not drop the row
    val cents = Seq(
      (0L, Seq(1.0, 0.0)),
      (7L, Seq(100.0, 100.0)))
      .toDF("cell", "cemb")
    val out = Similarity.cellBalance(e, cents).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet === Set(0L, 7L), s"empty cell must surface: $out")
    assert(out(0L) === ((2L, 1000L, 2.0)))
    assert(out(7L) === ((0L, 0L, 0.0)))
  }

  test("cell balance: shares reconcile, mean imbalance is exactly 1") {
    val e = Tables.embeddings(spark, Sf)
    val rows = Similarity.cellBalance(e, Similarity.kmeansFitMemo(e, Sf, "all"))
      .collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total === e.count(), "every vector lands in exactly one cell")
    for (r <- rows) {
      assert(r.getLong(2) === r.getLong(1) * 1000L / total, "exact permille")
      assert(r.getDouble(3) === r.getLong(1).toDouble * rows.length / total)
    }
    val meanImb = rows.map(_.getDouble(3)).sum / rows.length
    assert(math.abs(meanImb - 1.0) < 1e-9, s"mean imbalance must be 1: $meanImb")
  }
}
