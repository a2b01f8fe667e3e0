package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Invariants for the two-stage binary-quantization kNN
  * ([[Similarity.knnBqRerank]]): planted-duplicate retrieval, code-word
  * range, and the recall bar against brute truth.
  */
class BqSearchSpec extends SparkSpec {
  import spark.implicits._

  private def vec(f: Int => Float): Seq[Float] = (0 until 64).map(f)

  test("knnBqRerank: an exact duplicate is retrieved at rank 1 with cosine 1") {
    // query is vec 0 (0 % 50 == 0; ids 1-41 keep the rest off the query
    // set); vec 101 is its exact copy — Hamming distance 0 under ANY
    // centering, so it must survive the shortlist and rerank to the top
    val rows = (1 to 40).map { i =>
      (i.toLong, vec(d => math.sin(d * 0.7 + i * 2.3).toFloat), i % 4)
    }
    val e = (Seq(
      (0L, vec(d => math.cos(d * 0.3).toFloat), 0),
      (101L, vec(d => math.cos(d * 0.3).toFloat), 1)) ++ rows)
      .toDF("vec_id", "embedding", "label")
    val top = Similarity.knnBqRerank(e, k = 1).collect()
    assert(top.length === 1)
    assert(top.head.getAs[Long]("vec_id") === 101L)
    assert(math.abs(top.head.getAs[Double]("cos") - 1.0) < 1e-9)
  }

  test("knnBqRerank: exact cosines out, contiguous ranks per query") {
    val e = Tables.embeddings(spark, Sf)
    val out = Similarity.knnBqRerank(e, k = 5, queryCap = 4).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"cos $c out of range")
    }
    out.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rn")).sorted.toSeq === (1L to rs.length).toSeq,
        s"qid $q ranks not contiguous")
      val sorted = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("cos"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b },
        s"qid $q rerank not cosine-descending")
    }
  }

  test("bqRecall: the 8-byte store holds the recall bar on the corpus") {
    val rows = Similarity.bqRecall(Tables.embeddings(spark, Sf)).collect()
    assert(rows.nonEmpty)
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    // 64 mean-centered bits over 64 dims with a 40-wide exact rerank:
    // the shortlist is 2× k deep per truth item — the bar is strict
    assert(mean >= 0.8, s"mean BQ recall $mean below bar")
  }

  test("ivfBq: the bit stage costs (almost) no recall beyond the cell bound") {
    // the compound budget decomposes: cells bound WHICH candidates
    // exist, bits only reorder the in-cell shortlist — with a 40-wide
    // rerank over these cell sizes the compound must track the
    // exact-scan-within-cells recall
    val e = Tables.embeddings(spark, Sf)
    val cents = Similarity.kmeansFitMemo(e, Sf, "all")
    // cells-only recall at the same budget, from the trained curve
    val cellsOnly = Similarity.ivfRecallCurveTrained(e, cents, nprobes = Seq(4))
      .collect().head.getAs[Double]("recall")
    // with the shortlist wide enough to hold every in-cell candidate,
    // the bit stage is a pure reorder — the compound must EQUAL the
    // exact-scan-within-cells recall (micro-recall here is the mean
    // over a uniform per-query truth count, so the two means agree)
    val wide = Similarity.ivfBqRecall(e, cents, nprobe = 4,
      queryCap = 64).collect() // default shortR
    val full = Similarity.knnIvfBqTrained(e, cents, k = 3, nprobe = 4,
      shortR = 1000000, queryCap = 64)
    val truth = Similarity.knnBrute(e, k = 3, queryCap = 64)
      .select(col("qid"), col("vec_id"))
    val nHit = full.select(col("qid"), col("vec_id"))
      .join(truth, Seq("qid", "vec_id"), "left_semi").count()
    val nTruth = truth.count()
    assert(nHit.toDouble / nTruth === cellsOnly,
      s"uncapped bit stage must equal the cell bound: ${nHit.toDouble / nTruth} vs $cellsOnly")
    // at the default 40-wide shortlist, the bit stage may trade some
    // recall on a tiny corpus (4 of 8 cells hold half of it) — bounded
    val meanDefault = wide.map(_.getAs[Double]("recall")).sum / wide.length
    assert(meanDefault >= cellsOnly - 0.25,
      s"bit stage cost too much recall: compound $meanDefault vs cells $cellsOnly")
  }

  test("residual codes never rank below global-mean codes at equal budget") {
    // the PqResidualSpec claim re-run on 1-bit codes: sign(x − cell
    // centroid) discriminates within a cell where global-mean bits of a
    // tight cell collapse toward one word
    val e = Tables.embeddings(spark, Sf)
    val cents = Similarity.kmeansFitMemo(e, Sf, "all")
    def mean(rows: Array[org.apache.spark.sql.Row]): Double =
      rows.map(_.getAs[Double]("recall")).sum / rows.length
    val raw = mean(Similarity.ivfBqRecall(e, cents, nprobe = 4).collect())
    val res = mean(Similarity.ivfBqResidualRecall(e, cents, nprobe = 4).collect())
    assert(res >= raw - 1e-9,
      s"residual BQ recall $res fell below global-mean $raw at equal budget")
  }

  test("bqRecall: every query reports k truths and hits ≤ truths") {
    val rows = Similarity.bqRecall(Tables.embeddings(spark, Sf)).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_truth") === 3L)
      assert(r.getAs[Long]("n_hit") <= 3L)
    }
  }
}
