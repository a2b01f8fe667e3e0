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

  test("batch ≡ stream: the frozen conformal threshold gates a doc stream identically") {
    implicit val ctx = spark.sqlContext
    val table = graft.sources.Tables.documents(spark, Sf)
    val docs = table.select($"doc_id", $"text").as[Doc].collect().toSeq.take(120)
    val wq = Classifier.fitMemo(table, Sf)
    // freeze the threshold the batch calibration picked
    val tQ = Classifier.conformalGate(table, Sf).select($"t_q")
      .distinct().as[Long].collect() match { case Array(t) => t }

    val ms = MemoryStream[Doc]
    val q = DocStream.conformalGateDocs(ms.toDF(), wq, tQ)
      .writeStream.format("memory").queryName("conf_stream")
      .outputMode("append").start()
    ms.addData(docs.take(50))
    q.processAllAvailable()
    ms.addData(docs.drop(50))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("conf_stream")
      .select($"doc_id", $"score_q", $"keep")
      .as[(Long, Long, Boolean)].collect().toSet
    val batch = Classifier.score(table, Sf)
      .filter($"doc_id".isin(docs.map(_.doc_id): _*))
      .select($"doc_id", $"score_q", ($"score_q" >= tQ).as("keep"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(streamed === batch)
    assert(streamed.exists(_._3) , "gate must keep something on the fixture")
  }

  test("batch ≡ stream: frozen multiclass lang weights predict a doc stream identically") {
    implicit val ctx = spark.sqlContext
    val table = graft.sources.Tables.documents(spark, Sf)
    val docs = table.select($"doc_id", $"text").as[Doc].collect().toSeq.take(150)
    val wq = Classifier.langFitMemo(table, Sf)

    val ms = MemoryStream[Doc]
    val q = DocStream.langOfDocs(ms.toDF(), wq)
      .writeStream.format("memory").queryName("langclf_stream").outputMode("append").start()
    ms.addData(docs.take(70)); q.processAllAvailable()
    ms.addData(docs.drop(70)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("langclf_stream")
      .select($"doc_id", $"pred_lang").as[(Long, String)].collect().toSet
    // batch truth re-derived from the same weights + feature expression
    val zCols = (0 until Classifier.LangC).map { c =>
      val wCol = array((0 until Classifier.Dims)
        .map(j => lit(wq(c * Classifier.Dims + j) / Classifier.Q)): _*)
      graft.functions.VectorFunctions.dot(wCol, col("x"))
    }
    val batch = Classifier.langFeatures(table)
      .filter($"doc_id".isin(docs.map(_.doc_id): _*))
      .withColumn("zs", array(zCols: _*))
      .withColumn("pi", expr("array_position(zs, array_max(zs))"))
      .select($"doc_id",
        element_at(array(Classifier.Langs.map(lit): _*), $"pi".cast("int")).as("pred_lang"))
      .as[(Long, String)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // and it is stateless like every scoring twin
    val ms2 = MemoryStream[Doc]
    val q2 = DocStream.langOfDocs(ms2.toDF(), Array.fill(Classifier.LangC * Classifier.Dims)(0L))
      .writeStream.format("memory").queryName("langclf_stateless").outputMode("append").start()
    ms2.addData(Seq(Doc(1L, "some tokens here"))); q2.processAllAvailable()
    val progress = q2.lastProgress
    q2.stop()
    assert(progress.stateOperators.isEmpty)
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
