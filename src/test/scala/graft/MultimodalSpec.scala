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

  // ---- MediaDecoder.Real: JDK javax.imageio image path -------------------

  private def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // deterministic non-trivial pixels so encoders can't trivially elide
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  test("real decoder reads PNG/JPEG/BMP geometry via the JDK (no external codec)") {
    for {
      format <- Seq("png", "jpg", "bmp")
      (w, h) <- Seq((1, 1), (64, 48), (320, 200))
    } {
      val (dw, dh, df) = Multimodal.MediaDecoder.Real.decode(imageBytes(w, h, format))
      assert((dw, dh, df) === (w, h, 1), s"$format ${w}x$h")
    }
  }

  test("real decoder drives the mapPartitions plumbing end to end") {
    val rows = Seq(
      (1L, "image", imageBytes(10, 20, "png")),
      (2L, "image", imageBytes(300, 5, "jpg")),
      (3L, "image", imageBytes(7, 7, "bmp")))
    val df = rows.toDF("doc_id", "media_type", "payload")
    val out = Multimodal.decodeMedia(spark, df, Multimodal.MediaDecoder.Real)
      .collect().map(d => d.doc_id -> ((d.width, d.height, d.n_frames))).toMap
    assert(out === Map(1L -> ((10, 20, 1)), 2L -> ((300, 5, 1)), 3L -> ((7, 7, 1))))
  }

  test("real decoder rejects payloads no JDK reader claims (audio/video stay stubbed)") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.MediaDecoder.Real.decode(Array[Byte](1, 2, 3))
    }
    assert(e.getMessage.contains("no JDK ImageReader"))
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
