package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Adversarial payload fuzz for the multimodal decode paths: truncated
  * headers, wrong magic bytes, and 0-byte blobs must become ERROR ROWS
  * (null fields + bounded message) in the `*Safe` operators, never stage
  * failures — at 100 TB a corrupt blob is a certainty, and a decode stage
  * that dies on the first one never finishes. Valid payloads interleaved
  * with corrupt ones must still decode in the same DataFrame.
  */
class MultimodalFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  private def wavBytes(rate: Float, channels: Int, nSamples: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, channels, true, false)
    val pcm = new Array[Byte](nSamples * channels * 2)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  // PNG signature survives truncation → a reader CLAIMS the stream, then
  // fails parsing the header; the nastier case than wrong-magic rejection.
  private val truncatedPng: Array[Byte] = imageBytes(32, 32, "png").take(12)
  private val truncatedWav: Array[Byte] = wavBytes(8000f, 1, 100).take(16)
  private val wrongMagic: Array[Byte] = "not a media file".getBytes("UTF-8")
  private val zeroBytes: Array[Byte] = Array.empty[Byte]

  test("decodeMediaSafe: corrupt payloads yield error rows, valid rows still decode") {
    val rows = Seq(
      (1L, "image", imageBytes(10, 20, "png")),
      (2L, "image", truncatedPng),
      (3L, "image", wrongMagic),
      (4L, "image", zeroBytes),
      (5L, "image", imageBytes(7, 7, "bmp")))
      .toDF("doc_id", "media_type", "payload")
    val out = Multimodal.decodeMediaSafe(spark, rows, Multimodal.MediaDecoder.Real)
      .collect().map(d => d.doc_id -> d).toMap
    assert(out.size === 5, "every payload must produce exactly one row")
    assert((out(1L).width, out(1L).height, out(1L).err) === ((Some(10), Some(20), None)))
    assert((out(5L).width, out(5L).height, out(5L).err) === ((Some(7), Some(7), None)))
    for (id <- Seq(2L, 3L, 4L)) {
      val d = out(id)
      assert(d.width.isEmpty && d.height.isEmpty && d.n_frames.isEmpty,
        s"corrupt doc $id must have null geometry: $d")
      assert(d.err.exists(_.nonEmpty), s"corrupt doc $id needs an error message")
      assert(d.err.get.length <= 200, s"error message unbounded for doc $id")
    }
  }

  test("dHashSafe: corrupt payloads yield error rows, valid rows still hash") {
    val rows = Seq(
      (1L, "image", imageBytes(64, 64, "png")),
      (2L, "image", truncatedPng),
      (3L, "image", wrongMagic),
      (4L, "image", zeroBytes))
      .toDF("doc_id", "media_type", "payload")
    val out = Multimodal.dHashSafe(spark, rows).collect().map(h => h.doc_id -> h).toMap
    assert(out.size === 4)
    assert(out(1L).dhash.isDefined && out(1L).err.isEmpty)
    for (id <- Seq(2L, 3L, 4L))
      assert(out(id).dhash.isEmpty && out(id).err.exists(_.nonEmpty),
        s"corrupt doc $id: ${out(id)}")
  }

  test("audioMetaSafe: truncated/wrong-magic/0-byte payloads yield error rows") {
    val rows = Seq(
      (1L, "audio", wavBytes(16000f, 1, 8000)),
      (2L, "audio", truncatedWav),
      (3L, "audio", wrongMagic),
      (4L, "audio", zeroBytes),
      // a PNG routed to the audio column — wrong modality, must not crash
      (5L, "audio", imageBytes(4, 4, "png")))
      .toDF("doc_id", "media_type", "payload")
    val out = Multimodal.audioMetaSafe(spark, rows).collect().map(a => a.doc_id -> a).toMap
    assert(out.size === 5)
    assert((out(1L).sample_rate, out(1L).channels, out(1L).n_samples,
      out(1L).duration_ms, out(1L).err) ===
      ((Some(16000), Some(1), Some(8000L), Some(500L), None)))
    for (id <- Seq(2L, 3L, 4L, 5L)) {
      val a = out(id)
      assert(a.sample_rate.isEmpty && a.err.exists(_.nonEmpty),
        s"corrupt doc $id: $a")
      assert(a.err.get.length <= 200, s"error message unbounded for doc $id")
    }
  }

  test("imageNearDups survives a corrupt blob in the corpus and still finds the planted pair") {
    val rows = Seq(
      (1L, "image", imageBytes(64, 64, "png")),
      (2L, "image", imageBytes(64, 64, "png")), // exact dup of 1 → hamming 0
      (3L, "image", truncatedPng),              // corrupt: must drop, not kill
      (4L, "image", zeroBytes))
      .toDF("doc_id", "media_type", "payload")
    val pairs = Multimodal.imageNearDups(spark, rows)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.get((1L, 2L)) === Some(0L), s"planted pair lost: $pairs")
    assert(!pairs.keySet.exists(p => p._1 >= 3L || p._2 >= 3L),
      s"corrupt docs must not appear in pairs: $pairs")
  }

  test("strict decoders still throw (contract unchanged for callers that want failure)") {
    intercept[IllegalArgumentException] {
      Multimodal.MediaDecoder.Real.decode(wrongMagic)
    }
    intercept[org.apache.spark.SparkException] {
      Multimodal.audioMeta(spark,
        Seq((1L, "audio", wrongMagic)).toDF("doc_id", "media_type", "payload")).collect()
    }
  }
}
