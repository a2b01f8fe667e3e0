package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Classifier
import graft.streaming.DocStream

/** Streaming twin of the classifier's scoring side
  * ([[DocStream.scoreDocs]]): frozen batch-trained weights applied to a
  * document stream must reproduce the batch scorer row-for-row (same
  * fused featurization expression, zero state), and the query must run
  * in append mode with no watermark — stateless by construction.
  */
case class StreamScoreDoc(doc_id: Long, text: String)

class ClassifierStreamSpec extends SparkSpec {
  import spark.implicits._
  private type Doc = StreamScoreDoc
  private def Doc(id: Long, text: String) = StreamScoreDoc(id, text)

  test("batch ≡ stream: frozen weights score a doc stream identically to the batch scorer") {
    implicit val ctx = spark.sqlContext
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select($"doc_id", $"text").as[Doc].collect().toSeq.take(200)

    val wq = Classifier.fitMemo(graft.sources.Tables.documents(spark, Sf), Sf)

    val ms = MemoryStream[Doc]
    val q = DocStream.scoreDocs(ms.toDF(), wq)
      .writeStream.format("memory").queryName("qclf_stream").outputMode("append").start()
    // two micro-batches: scoring must not depend on batch boundaries
    ms.addData(docs.take(80))
    q.processAllAvailable()
    ms.addData(docs.drop(80))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("qclf_stream")
      .select($"doc_id", $"score_q", $"pred")
      .as[(Long, Long, Long)].collect().toSet
    val batch = Classifier.score(graft.sources.Tables.documents(spark, Sf), Sf)
      .filter($"doc_id".isin(docs.map(_.doc_id): _*))
      .select($"doc_id", $"score_q", $"pred")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("the scoring stream is stateless: no state operators in the streaming plan") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Doc]
    val q = DocStream.scoreDocs(ms.toDF(), Array.fill(Classifier.Dims)(0L))
      .writeStream.format("memory").queryName("qclf_stateless").outputMode("append").start()
    ms.addData(Seq(Doc(1L, "some tokens here")))
    q.processAllAvailable()
    val progress = q.lastProgress
    q.stop()
    assert(progress.stateOperators.isEmpty,
      s"scoring must carry zero streaming state: ${progress.stateOperators.mkString(",")}")
  }
}
