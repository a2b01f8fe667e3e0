package graft

import org.apache.spark.sql.functions._
import graft.operators.{Classifier, Curation}
import graft.sources.Tables

/** Split-conformal gate: the k = ⌊α(n+1)⌋ order-statistic threshold
  * replayed brute-force from the scored frame, the order-statistic
  * coverage inequalities on the calibration slice, the α → threshold
  * monotonicity, and the k = 0 keep-everything degeneration.
  */
class ConformalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, Sf)

  /** (bucket, label_true, score_q, source) rows replayed outside the op. */
  private lazy val scoredRows = Classifier.score(docs, Sf)
    .join(docs.select(col("doc_id"), col("source"),
      Curation.sampleBucket(col("text")).as("bucket")), "doc_id")
    .select("bucket", "label_true", "score_q", "source")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("threshold is the brute-forced k-th smallest calibration positive") {
    val calScores = scoredRows
      .filter(r => r._1 >= 900 && r._1 < 950 && r._2 == 1L)
      .map(_._3).sorted
    val n = calScores.length
    val k = (100 * (n + 1)) / 1000
    assert(k >= 1, s"fixture must give a non-degenerate k (n=$n)")
    val want = calScores(k - 1)
    val got = Classifier.conformalGate(docs, Sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) == n.toLong && r.getLong(2) == k.toLong &&
        r.getLong(3) == want, s"threshold row $r vs (n=$n, k=$k, t=$want)")
    }
    // order-statistic coverage inequalities on the calibration slice
    assert(calScores.count(_ < want) <= k - 1)
    assert(calScores.count(_ <= want) >= k)
    // eval read-out replay per source
    val eval = scoredRows.filter(_._1 >= 950)
    val bySrc = eval.groupBy(_._4)
    got.foreach { r =>
      val rows = bySrc(r.getString(0))
      assert(r.getLong(4) == rows.count(_._2 == 1L))
      assert(r.getLong(5) == rows.count(x => x._2 == 1L && x._3 >= want))
      assert(r.getLong(6) == rows.count(_._2 == 0L))
      assert(r.getLong(7) == rows.count(x => x._2 == 0L && x._3 >= want))
    }
  }

  test("a stricter alpha keeps no more positives") {
    def keptPos(alpha: Int): Long =
      Classifier.conformalGate(docs, Sf, alphaPermille = alpha)
        .agg(sum(col("kept_pos"))).collect()(0).getLong(0)
    assert(keptPos(500) <= keptPos(100),
      "alpha = 0.5 discards at least as much as alpha = 0.1")
  }

  test("k = 0 degenerates to keep-everything") {
    // alpha = 0.001 at sf0.001: n_cal + 1 < 1000, so k = 0 and the gate
    // must not reject a single eval doc.
    val got = Classifier.conformalGate(docs, Sf, alphaPermille = 1)
      .agg(sum(col("n_pos")).as("p"), sum(col("kept_pos")).as("kp"),
        sum(col("n_neg")).as("n"), sum(col("kept_neg")).as("kn"))
      .collect()(0)
    assert(got.getLong(0) == got.getLong(1) && got.getLong(2) == got.getLong(3),
      s"keep-all expected: $got")
  }
}
