package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.stringHash

/** Multimodal-column operators: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata alongside —
  * exactly how a 100 TB training-data pipeline carries media (the bytes
  * are never interpreted by Catalyst; only decoded at the edge by a
  * per-partition decoder).
  *
  * Decoding: [[MediaDecoder.Real]] decodes IMAGE payloads for real via
  * the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF — header-only geometry
  * reads, spec-tested against synthesized images), and [[audioMeta]]
  * reads WAV/AIFF/AU headers for real via `javax.sound.sampled` (PCM
  * containers need no codec). Compressed audio and video decode stay
  * stubbed (this container genuinely has no codecs), so tests and the
  * oracle drive the full media mix through [[MediaDecoder.Fake]], a
  * deterministic function of the payload bytes. Also real and tested: the
  * binary schema, the mapPartitions batch shape (iterator-lazy, no
  * per-row JNI-style setup), and the expression-only metadata path used
  * by the DuckDB oracle.
  */
object Multimodal {

  /** Deterministic stand-in media table derived from documents: payload =
    * UTF-8 bytes of the text (a real pipeline would read blob files);
    * media_type round-robins image/audio/video.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload")
    )

  /** Pure-column metadata: byte length + content hash. Runs entirely in
    * codegen — no decoder involved.
    */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("media_type"),
      octet_length(col("payload")).cast("long").as("byte_len"),
      md5(col("payload")).as("content_md5")
    )

  case class Decoded(doc_id: Long, media_type: String, width: Int, height: Int, n_frames: Int)

  /** Decoder contract: bytes → frame geometry. Real codecs plug in here. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Int) // (width, height, n_frames)
  }
  object MediaDecoder {
    /** Real decode for IMAGE payloads via the JDK's built-in
      * `javax.imageio` (PNG/JPEG/BMP/GIF readers ship with the JDK — no
      * external codec needed). Header-only: `getWidth/getHeight(0)` read
      * image metadata without decoding pixel data, so the per-row cost is
      * a few header bytes even for large assets; n_frames counts the
      * stream's images (1 for PNG/JPEG/BMP, >1 for animated GIF).
      *
      * Audio/video payloads remain genuinely undecodable here (the JDK
      * ships no audio/video codecs and the container has no external
      * libraries): bytes no `ImageReader` claims get a clear
      * `IllegalArgumentException` rather than a silent guess — callers
      * route non-image media to [[Fake]] or an external decoder.
      */
    object Real extends MediaDecoder {
      def decode(payload: Array[Byte]): (Int, Int, Int) = {
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (!readers.hasNext)
            throw new IllegalArgumentException(
              "MediaDecoder.Real: no JDK ImageReader recognizes this payload " +
                "(audio/video need external codecs; use Fake or plug a real decoder)")
          val r = readers.next()
          try {
            r.setInput(in)
            val frames =
              try r.getNumImages(true)
              catch { case _: java.io.IOException => 1 }
            (r.getWidth(0), r.getHeight(0), math.max(frames, 1))
          } finally r.dispose()
        } finally in.close()
      }
    }

    /** Deterministic fake: geometry derived from a polynomial hash of the
      * payload bytes — mirrors [[decodedMetaCols]] (and the DuckDB oracle)
      * exactly, so the mapPartitions path can be verified against the
      * pure-expression path.
      */
    object Fake extends MediaDecoder {
      def decode(payload: Array[Byte]): (Int, Int, Int) = {
        var h = 7L
        payload.foreach(b => h = (h * 31 + (b & 0xff)) % 1000000007L)
        (64 + (h % 512).toInt, 64 + ((h / 512) % 512).toInt, 1 + (h % 16).toInt)
      }
    }
  }

  /** The per-partition decode path — the real plumbing a codec would use:
    * one decoder instance per partition (amortized setup), lazy iterator
    * (no partition-sized buffering), typed Dataset out.
    */
  def decodeMedia(spark: SparkSession, media: DataFrame,
      decoder: MediaDecoder): Dataset[Decoded] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, mt, payload) =>
          val (w, h, f) = decoder.decode(payload)
          Decoded(id, mt, w, h, f)
        }
      }
  }

  /** Expression-only equivalent of [[MediaDecoder.Fake]] — this is what the
    * DuckDB oracle replicates (payload bytes are the text's UTF-8 bytes, so
    * the polynomial over bytes equals the polynomial over characters for
    * ASCII corpora).
    */
  def decodedMetaCols(media: DataFrame, textCol: DataFrame): DataFrame =
    media.join(textCol, "doc_id")
      .withColumn("h", stringHash(col("text")))
      .select(
        col("doc_id"), col("media_type"),
        (lit(64) + col("h") % 512).cast("long").as("width"),
        // `div` = integer division — Column./ would go through double
        (lit(64) + expr("h div 512") % 512).cast("long").as("height"),
        (lit(1) + col("h") % 16).cast("long").as("n_frames")
      )

  /** Feature extraction stub: a fixed-length deterministic feature vector
    * derived from the payload's content hash (a real extractor — CLIP,
    * mel spectrogram… — plugs in at the same shape: one array<double>
    * column of fixed length per asset). Exploded to (doc_id, k, feature)
    * rows. Features land in [0, 1): perm_k(hash)/P.
    */
  def featureExtract(media: DataFrame, textCol: DataFrame, dims: Int = 8): DataFrame =
    media.join(textCol, "doc_id")
      .withColumn("h", stringHash(col("text")))
      .select(col("doc_id"), col("media_type"),
        posexplode(transform(sequence(lit(0), lit(dims - 1)), k =>
          (((k * 2 + 1).cast("long") * col("h") + (k.cast("long") * 7919L + 13L)) % 1000000007L)
            .cast("double") / lit(1.0e9 + 7))).as(Seq("k", "feature")))
      .select(col("doc_id"), col("media_type"), col("k").cast("long").as("k"), col("feature"))

  /** Resize planning: fit (width, height) into a target square box
    * preserving aspect ratio — pure integer arithmetic on the decoded
    * metadata (the pixel work would happen in the per-partition decoder;
    * the engine's job is exactly this geometry + partitioning).
    */
  def resizePlan(decoded: DataFrame, box: Int = 224): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    decoded.select(
      col("doc_id"), col("width"), col("height"),
      (col("width") * box / longest).cast("long").as("new_w"),
      (col("height") * box / longest).cast("long").as("new_h")
    )
  }

  case class Resized(doc_id: Long, new_w: Int, new_h: Int, out_bytes: Array[Byte])

  /** Real pixel resize for IMAGE payloads, JDK-only (`javax.imageio` +
    * `java.awt.image` ship with the JDK; fully headless): decode, scale
    * into the target box preserving aspect ratio — the SAME integer
    * geometry as [[resizePlan]] — re-encode as PNG. Runs in the
    * [[decodeMedia]] mapPartitions shape: per-partition batch, lazy
    * iterator, bytes in → bytes out, which is exactly how a GPU/codec
    * resize stage slots into the same plan. Audio/video rows must be
    * routed elsewhere (ImageIO.read returns null → clear error).
    */
  def resizeImages(spark: SparkSession, media: DataFrame, box: Int = 224): Dataset[Resized] = {
    import spark.implicits._
    media.filter(col("media_type") === "image")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          require(img != null,
            s"resizeImages: payload of doc $id is not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          val longest = math.max(w, h)
          val nw = math.max(1, w * box / longest)
          val nh = math.max(1, h * box / longest)
          val out = new java.awt.image.BufferedImage(
            nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Resized(id, nw, nh, bos.toByteArray)
        }
      }
  }

  case class DecodedSafe(doc_id: Long, media_type: String,
    width: Option[Int], height: Option[Int], n_frames: Option[Int],
    err: Option[String])

  /** Bounded, class-prefixed error text for corrupt-payload rows (payload
    * junk can leak into codec messages, so cap the length).
    */
  private def errMsg(e: Throwable): String = {
    val m = Option(e.getMessage).getOrElse("")
    val s = e.getClass.getSimpleName + (if (m.isEmpty) "" else ": " + m)
    if (s.length > 200) s.substring(0, 200) else s
  }

  /** Corrupt-tolerant decode: same per-partition batch shape as
    * [[decodeMedia]], but a payload the decoder rejects (truncated header,
    * wrong magic bytes, 0-byte blob) becomes an ERROR ROW — null geometry
    * plus a bounded message — instead of a stage failure. At 100 TB one
    * corrupt blob per million rows is a certainty; a pipeline whose decode
    * stage dies on the first one never finishes. This is the same
    * null-on-corrupt discipline as the JSON deserializer (D1,
    * ref `src/app/order_validator.py:71-89`): route errors, don't throw.
    * Only non-fatal decode errors are absorbed — OOM and friends still
    * propagate.
    */
  def decodeMediaSafe(spark: SparkSession, media: DataFrame,
      decoder: MediaDecoder): Dataset[DecodedSafe] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, mt, payload) =>
          try {
            val (w, h, f) = decoder.decode(payload)
            DecodedSafe(id, mt, Some(w), Some(h), Some(f), None)
          } catch {
            case scala.util.control.NonFatal(e) =>
              DecodedSafe(id, mt, None, None, None, Some(errMsg(e)))
          }
        }
      }
  }

  case class ImageHash(doc_id: Long, dhash: Long)

  /** Perceptual difference-hash (dHash) for IMAGE payloads, JDK-only:
    * decode, scale to 9×8 grayscale, emit 64 bits of "is pixel brighter
    * than its right neighbour" — the standard cheap near-dup fingerprint
    * for images (small recompressions/resizes keep most bits). Pairs
    * within a small Hamming distance are near-dups; bucketing the hash's
    * bytes gives the same multi-index candidate scheme as text SimHash
    * (operators/Dedup.simhashPairs), so the text dedup machinery applies
    * unchanged to image corpora. Same mapPartitions batch shape as the
    * decoder; not oracle-able (no image codec in the oracle engine) — the
    * contract is spec-pinned on synthesized images instead.
    */
  def dHash(spark: SparkSession, media: DataFrame): Dataset[ImageHash] = {
    import spark.implicits._
    media.filter(col("media_type") === "image")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          require(img != null, s"dHash: payload of doc $id is not a decodable image")
          ImageHash(id, dHashOf(img))
        }
      }
  }

  private def dHashOf(img: java.awt.image.BufferedImage): Long = {
    val small = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    try g.drawImage(img, 0, 0, 9, 8, null) finally g.dispose()
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        def lum(px: Int): Int = {
          val c = small.getRGB(px, y)
          ((c >> 16 & 0xff) * 299 + (c >> 8 & 0xff) * 587 + (c & 0xff) * 114) / 1000
        }
        if (lum(x) > lum(x + 1)) h |= 1L << bit
        bit += 1; x += 1
      }
      y += 1
    }
    h
  }

  case class ImageHashSafe(doc_id: Long, dhash: Option[Long], err: Option[String])

  /** Corrupt-tolerant [[dHash]]: undecodable image payloads (ImageIO.read
    * returns null on wrong magic, throws on truncated streams) become
    * error rows. [[imageNearDups]] rides this, so one corrupt blob no
    * longer kills corpus-wide near-dup detection.
    */
  def dHashSafe(spark: SparkSession, media: DataFrame): Dataset[ImageHashSafe] = {
    import spark.implicits._
    media.filter(col("media_type") === "image")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            if (img == null)
              ImageHashSafe(id, None, Some("not a decodable image (no JDK reader)"))
            else ImageHashSafe(id, Some(dHashOf(img)), None)
          } catch {
            case scala.util.control.NonFatal(e) =>
              ImageHashSafe(id, None, Some(errMsg(e)))
          }
        }
      }
  }

  case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
    bits: Int, n_samples: Long, duration_ms: Long)

  /** REAL audio metadata for WAV/AIFF/AU payloads via the JDK's
    * `javax.sound.sampled.AudioSystem` — these are uncompressed PCM
    * container formats whose readers ship with every JDK (no external
    * codec), the audio analogue of the `javax.imageio` image path.
    * Header-only: `getAudioFileFormat` parses the RIFF/AIFF header
    * without reading sample data. Compressed audio (MP3/AAC/Opus)
    * genuinely needs external codecs absent from this container — those
    * payloads get a clear error, same contract as [[MediaDecoder.Real]]
    * for non-image bytes. Same mapPartitions batch shape as the decoder.
    */
  def audioMeta(spark: SparkSession, media: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    media.filter(col("media_type") === "audio")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val aff =
            try javax.sound.sampled.AudioSystem.getAudioFileFormat(
              new java.io.ByteArrayInputStream(payload))
            catch {
              case e: javax.sound.sampled.UnsupportedAudioFileException =>
                throw new IllegalArgumentException(
                  s"audioMeta: payload of doc $id is not WAV/AIFF/AU " +
                    "(compressed audio needs external codecs)", e)
            }
          val f = aff.getFormat
          val n = aff.getFrameLength.toLong
          val rate = f.getSampleRate
          AudioMeta(id, rate.toInt, f.getChannels, f.getSampleSizeInBits, n,
            if (n >= 0 && rate > 0) (n * 1000L / rate.toLong) else -1L)
        }
      }
  }

  case class AudioMetaSafe(doc_id: Long, sample_rate: Option[Int],
    channels: Option[Int], bits: Option[Int], n_samples: Option[Long],
    duration_ms: Option[Long], err: Option[String])

  /** Corrupt-tolerant [[audioMeta]]: a payload `AudioSystem` rejects
    * (truncated RIFF header, wrong magic, 0 bytes, compressed audio)
    * becomes an error row instead of a stage failure — the same
    * null-on-corrupt routing as [[decodeMediaSafe]].
    */
  def audioMetaSafe(spark: SparkSession, media: DataFrame): Dataset[AudioMetaSafe] = {
    import spark.implicits._
    media.filter(col("media_type") === "audio")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          try {
            val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
              new java.io.ByteArrayInputStream(payload))
            val f = aff.getFormat
            val n = aff.getFrameLength.toLong
            val rate = f.getSampleRate
            AudioMetaSafe(id, Some(rate.toInt), Some(f.getChannels),
              Some(f.getSampleSizeInBits), Some(n),
              Some(if (n >= 0 && rate > 0) n * 1000L / rate.toLong else -1L), None)
          } catch {
            case scala.util.control.NonFatal(e) =>
              AudioMetaSafe(id, None, None, None, None, None, Some(errMsg(e)))
          }
        }
      }
  }

  /** Image near-duplicates: [[dHash]] fingerprints bucketed by the SAME
    * multi-index Hamming scheme as text SimHash (8×8-bit bands over the
    * 64-bit hash; by pigeonhole, any pair within Hamming ≤ 7 shares at
    * least one intact band — EXACT recall at the default threshold).
    * Candidates come from an equi-join on (band, key) — the shuffle key,
    * never all-pairs — then one `bit_count(xor)` verify per candidate.
    * This is the text-dedup machinery applied unchanged to an image
    * corpus; like [[dHash]], not oracle-able (no image codec in the
    * oracle engine) — recall/precision are spec-pinned on synthesized
    * near-dup images. Rides [[dHashSafe]]: undecodable payloads drop out
    * of candidate generation (the corpus-correct semantic) instead of
    * failing the stage.
    */
  def imageNearDups(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 7): DataFrame = {
    val hashes = dHashSafe(spark, media).toDF()
      .filter(col("dhash").isNotNull)
      .select(col("doc_id"), col("dhash"))
    val bands = hashes.select(col("doc_id"), col("dhash"),
      posexplode(array((0 until 8).map(b =>
        shiftright(col("dhash"), b * 8).bitwiseAND(lit(255L))): _*))
        .as(Seq("band", "key")))
    val a = bands.select(col("doc_id").as("doc_a"), col("dhash").as("ha"),
      col("band"), col("key"))
    val b = bands.select(col("doc_id").as("doc_b"), col("dhash").as("hb"),
      col("band"), col("key"))
    a.join(b.hint("shuffle_hash"), Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Frame sampling for video payloads: evenly-spaced frame indices,
    * exploded to rows (at most `maxSamples` per asset).
    */
  def frameSample(decoded: DataFrame, maxSamples: Int = 4): DataFrame = {
    val n = col("n_frames")
    val k = least(n, lit(maxSamples.toLong))
    decoded
      .filter(col("media_type") === "video")
      .select(col("doc_id"), n,
        explode(transform(sequence(lit(0L), k - 1), i => (i * n).divide(k).cast("long")))
          .as("frame_idx"))
  }
}
