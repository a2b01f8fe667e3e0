package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, Sf)
  private lazy val media = Multimodal.mediaTable(docs).cache()

  test("payload round-trips: binary column carries the exact source bytes") {
    val back = media.select($"doc_id", decode($"payload", "UTF-8").as("t"))
      .join(docs.select($"doc_id", $"text"), "doc_id")
      .filter($"t" =!= $"text")
    assert(back.count() === 0)
  }

  test("mapPartitions decode path agrees with the expression path exactly") {
    val viaPartitions = Multimodal.decodeMedia(spark, media, Multimodal.MediaDecoder.Fake).toDF()
    val viaExprs = Multimodal.decodedMetaCols(media, docs.select($"doc_id", $"text"))
    assert(viaPartitions.count() === viaExprs.count())
    assert(viaPartitions.exceptAll(
      viaExprs.select($"doc_id", $"media_type",
        $"width".cast("int"), $"height".cast("int"), $"n_frames".cast("int"))).count() === 0)
  }

  test("real decoder is an explicit stub (documents the missing codec dep)") {
    intercept[NotImplementedError] {
      Multimodal.MediaDecoder.Real.decode(Array[Byte](1, 2, 3))
    }
  }

  test("frame sampling: at most 4 evenly-spaced, in-range indices per video") {
    val d = Multimodal.decodedMetaCols(media, docs.select($"doc_id", $"text"))
    val f = Multimodal.frameSample(d).cache()
    val byDoc = f.groupBy($"doc_id").agg(count(lit(1)).as("k"), max($"frame_idx").as("mx"),
      first($"n_frames").as("n"))
    assert(byDoc.filter($"k" > 4).count() === 0)
    assert(byDoc.filter($"mx" >= $"n").count() === 0)
    assert(f.filter($"frame_idx" < 0).count() === 0)
  }
}
