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

  test("real resize: output geometry matches resizePlan and re-decodes at target size") {
    val rows = Seq(
      (1L, "image", imageBytes(100, 50, "png")),   // wide → 224×112
      (2L, "image", imageBytes(30, 90, "jpg")),    // tall → 74×224
      (3L, "image", imageBytes(224, 224, "bmp")),  // exact → 224×224
      (4L, "audio", Array[Byte](1, 2, 3)))         // non-image: filtered out
    val df = rows.toDF("doc_id", "media_type", "payload")
    val out = Multimodal.resizeImages(spark, df, box = 224).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert((out(1L).new_w, out(1L).new_h) === ((224, 112)))
    assert((out(2L).new_w, out(2L).new_h) === ((74, 224)))
    assert((out(3L).new_w, out(3L).new_h) === ((224, 224)))
    // the emitted bytes are a real PNG of exactly the target geometry —
    // decode them back through the Real decoder
    for ((_, r) <- out) {
      val (dw, dh, df_) = Multimodal.MediaDecoder.Real.decode(r.out_bytes)
      assert((dw, dh, df_) === ((r.new_w, r.new_h, 1)))
    }
    // geometry agrees with the pure-plan operator on the same metadata
    val plan = Multimodal.resizePlan(
      Seq((1L, 100, 50), (2L, 30, 90), (3L, 224, 224)).toDF("doc_id", "width", "height"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    for ((id, r) <- out)
      assert(plan(id) === ((r.new_w.toLong, r.new_h.toLong)), s"doc $id plan mismatch")
  }

  test("dHash: identical images collide, re-encoded images stay close, distinct images differ") {
    def noisyBytes(w: Int, h: Int, format: String, shift: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        // strong horizontal gradient + mild noise: dHash tracks the
        // left-vs-right structure, which re-encoding preserves
        img.setRGB(x, y, ((x * 255 / w + shift) & 0xff) * 0x010101)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, out)
      out.toByteArray
    }
    val rows = Seq(
      (1L, "image", noisyBytes(64, 64, "png", 0)),
      (2L, "image", noisyBytes(64, 64, "png", 0)),    // exact copy
      (3L, "image", noisyBytes(64, 64, "jpg", 2)),    // re-encoded, slightly shifted
      (4L, "image", {                                  // reversed gradient: different
        val img = new java.awt.image.BufferedImage(64, 64,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        (0 until 64).foreach(x => (0 until 64).foreach(y =>
          img.setRGB(x, y, (255 - x * 255 / 64) * 0x010101)))
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out); out.toByteArray
      }),
      (5L, "audio", Array[Byte](9, 9))                 // filtered out
    ).toDF("doc_id", "media_type", "payload")
    val h = Multimodal.dHash(spark, rows).collect().map(r => r.doc_id -> r.dhash).toMap
    assert(h.keySet === Set(1L, 2L, 3L, 4L))
    assert(h(1L) === h(2L), "identical bytes must hash identically")
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(1L), h(3L)) <= 8,
      s"re-encoded image drifted ${hamming(h(1L), h(3L))} bits")
    assert(hamming(h(1L), h(4L)) >= 24,
      s"reversed gradient too close: ${hamming(h(1L), h(4L))} bits")
  }

  // ---- audioMeta: JDK javax.sound.sampled WAV path ------------------------

  private def wavBytes(rate: Float, channels: Int, nSamples: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, channels, true, false)
    val pcm = new Array[Byte](nSamples * channels * 2)
    pcm.indices.foreach(i => pcm(i) = ((i * 37) & 0xff).toByte)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audioMeta reads real WAV headers via the JDK (no external codec)") {
    val rows = Seq(
      (1L, "audio", wavBytes(44100f, 2, 44100)), // 1 s stereo
      (2L, "audio", wavBytes(16000f, 1, 8000)),  // 0.5 s mono
      (3L, "image", imageBytes(4, 4, "png")))    // filtered out
      .toDF("doc_id", "media_type", "payload")
    val got = Multimodal.audioMeta(spark, rows).collect()
      .map(a => a.doc_id -> a).toMap
    assert(got.keySet === Set(1L, 2L))
    assert((got(1L).sample_rate, got(1L).channels, got(1L).bits,
      got(1L).n_samples, got(1L).duration_ms) === ((44100, 2, 16, 44100L, 1000L)))
    assert((got(2L).sample_rate, got(2L).channels, got(2L).bits,
      got(2L).n_samples, got(2L).duration_ms) === ((16000, 1, 16, 8000L, 500L)))
  }

  test("audioMeta rejects non-PCM payloads with a clear error") {
    val rows = Seq((1L, "audio", Array[Byte](1, 2, 3, 4)))
      .toDF("doc_id", "media_type", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.audioMeta(spark, rows).collect()
    }
    assert(e.getCause match {
      case c: IllegalArgumentException => c.getMessage.contains("not WAV/AIFF/AU")
      case c => c.getMessage != null && c.getMessage.contains("not WAV/AIFF/AU")
    }, s"unexpected cause: ${e.getCause}")
  }

  test("imageNearDups: planted near-dup found, reversed image rejected, exact recall by pigeonhole") {
    def gradient(shift: Int, reversed: Boolean = false): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 64).foreach(x => (0 until 64).foreach { y =>
        val v = if (reversed) 255 - x * 255 / 64 else (x * 255 / 64 + shift) & 0xff
        img.setRGB(x, y, v * 0x010101)
      })
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out); out.toByteArray
    }
    val rows = Seq(
      (1L, "image", gradient(0)),
      (2L, "image", gradient(0)),              // exact copy → hamming 0
      (3L, "image", gradient(2)),              // near-dup re-shading
      (4L, "image", gradient(0, reversed = true)), // structurally different
      (5L, "audio", Array[Byte](1, 2)))        // filtered out
      .toDF("doc_id", "media_type", "payload")
    val pairs = Multimodal.imageNearDups(spark, rows)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 0L,
      s"exact copy must pair at hamming 0: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      s"reversed gradient must not pair: $pairs")
    // every reported pair is within the threshold (verify step works)
    assert(pairs.values.forall(_ <= 7L), s"over-threshold pair leaked: $pairs")
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
