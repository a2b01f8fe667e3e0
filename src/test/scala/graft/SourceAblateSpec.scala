package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Leave-one-source-out ablation: exact complement arithmetic (brute
  * replay per source), the influence sign convention, and the
  * fixed-point conservation law Σ qsum_s = gq.
  */
class SourceAblateSpec extends SparkSpec {
  import spark.implicits._

  test("influence is positive for a lifting source, negative for a dragging one") {
    // srcGood: long distinctive tokens (no stopwords, nothing short) →
    // quality 1.0; srcBad: all stopword-ish short tokens → low quality.
    val docs = Seq(
      (1L, "wonderful excellent magnificent extraordinary", "en", "srcGood"),
      (2L, "delightful remarkable outstanding impressive", "en", "srcGood"),
      (3L, "the an of to in it is at", "en", "srcBad"),
      (4L, "a the to of an in at is", "en", "srcBad")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val got = Curation.sourceAblate(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val good = got("srcGood")
    val bad = got("srcBad")
    assert(good._5 > 0, s"srcGood must lift the mean: $good")
    assert(bad._5 < 0, s"srcBad must drag the mean: $bad")
    // exact leave-one-out: ablated(good) = mean of bad's docs alone
    assert(good._4 == bad._2, "ablating srcGood leaves exactly srcBad's mean")
    assert(bad._4 == good._2, "ablating srcBad leaves exactly srcGood's mean")
    // shared corpus mean across rows
    assert(good._3 == bad._3)
  }

  test("per-source means and counts reconcile exactly to the corpus mean") {
    val docs = graft.sources.Tables.documents(spark, Sf)
    val rows = Curation.sourceAblate(docs).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val gn = rows.map(_._1).sum
    // reconstruct integer sums from the exact means (mean = qsum/(n*2^24))
    val qsums = rows.map { case (n, m, _) => math.round(m * n * 16777216.0) }
    val corpus = rows.head._3
    assert(math.round(corpus * gn * 16777216.0) == qsums.sum,
      "sum of per-source fixed-point sums must equal the global sum")
  }
}
