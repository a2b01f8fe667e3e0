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

  test("bqRecall: every query reports k truths and hits ≤ truths") {
    val rows = Similarity.bqRecall(Tables.embeddings(spark, Sf)).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_truth") === 3L)
      assert(r.getAs[Long]("n_hit") <= 3L)
    }
  }
}
