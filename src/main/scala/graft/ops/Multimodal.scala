package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** A multimodal asset: opaque binary payload + typed metadata. */
final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                          width: Int, height: Int, durationMs: Long)

/** Extracted features for one asset. `decodedWidth`/`decodedHeight` come from
  * the actual image decode (0 for non-images), `sampleRateHz` from the actual
  * audio decode (0 for non-audio). */
final case class MediaFeatures(media_id: Long, kind: String, features: Array[Float],
                               frames: Int, decodedBytes: Long,
                               decodedWidth: Int, decodedHeight: Int, sampleRateHz: Int)

/**
 * Multimodal-column pipeline: image/audio/video as opaque `binary` columns
 * with typed metadata, processed batch-wise in `mapPartitions` (the Scala
 * analogue of `mapInPandas` — one iterator per partition, no driver
 * involvement; this is the 100 TB-able shape).
 *
 * Codecs are REAL where the JDK ships one:
 *  - images: PNG encode/decode via `javax.imageio` — decoded dimensions and a
 *    16-bin luminance histogram come from actual pixel data;
 *  - audio: WAV (PCM 16-bit mono) encode/decode via `javax.sound.sampled` —
 *    sample rate and an RMS-energy feature come from actual samples;
 *  - video: the JDK has no video codec, so video stays an opaque container —
 *    frame sampling works off the typed duration metadata and features fall
 *    back to a byte histogram of the payload. A real decoder drops into
 *    [[decodeVideo]] without touching the pipeline shape.
 */
object Multimodal {

  // ------------------------------------------------------------------ image

  /** Decode an image payload with ImageIO; returns (width, height, 16-bin
    * L1-normalized luminance histogram). */
  def decodeImage(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "not a decodable image payload")
    val bins = new Array[Float](16)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
        bins(lum >> 4) += 1f
        x += 1
      }
      y += 1
    }
    val total = math.max(1f, (img.getWidth * img.getHeight).toFloat)
    (img.getWidth, img.getHeight, bins.map(_ / total))
  }

  /** Encode a deterministic RGB image (pixels are a pure function of
    * (seed, x, y)) as real PNG bytes. */
  def encodePng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (graft.gen.SyntheticRepoFiles.mix(seed, x.toLong, y.toLong) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // ------------------------------------------------------------------ audio

  private val WavFormat = new AudioFormat(8000f, 16, 1, true, false)

  /** Encode deterministic 16-bit mono PCM samples as a real WAV container. */
  def encodeWav(seed: Long, nSamples: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (graft.gen.SyntheticRepoFiles.mix(seed, i.toLong) & 0xFFFF).toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val out = new ByteArrayOutputStream()
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), WavFormat, nSamples.toLong)
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decode a WAV payload; returns (sampleRateHz, nSamples, 16-bin feature
    * vector: RMS energy over 16 equal time slices, normalized). */
  def decodeWav(payload: Array[Byte]): (Int, Long, Array[Float]) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    val bins = new Array[Double](16)
    var i = 0
    while (i < n) {
      val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)).toDouble / 32768.0
      bins(math.min(15, i * 16 / math.max(1, n))) += s * s
      i += 1
    }
    val perSlice = math.max(1.0, n / 16.0)
    (fmt.getSampleRate.toInt, n.toLong, bins.map(b => math.sqrt(b / perSlice).toFloat))
  }

  // ------------------------------------------------------------------ video

  /** Frame sampler over the typed duration metadata: one frame every
    * `everyMs`, capped. (The JDK ships no video codec; real per-frame decode
    * would plug in here.) */
  def sampleFrameCount(durationMs: Long, everyMs: Long = 1000L, cap: Int = 32): Int =
    math.min(cap, math.max(1, (durationMs / math.max(1L, everyMs)).toInt))

  /** Video fallback features: 16-bin byte histogram of the (opaque) payload,
    * L1-normalized — honest container-level stats, not a pixel decode. */
  def decodeVideo(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < payload.length) { bins((payload(i) & 0xFF) >> 4) += 1f; i += 1 }
    val total = math.max(1f, payload.length.toFloat)
    bins.map(_ / total)
  }

  // --------------------------------------------------------------- pipeline

  /** One quarantined media row (decode failure) — same per-element error
    * isolation contract as MineJob's manifest quarantine (T3): a corrupt
    * payload never fails the job. */
  final case class MediaQuarantine(media_id: Long, kind: String, errorClass: String,
                                   message: String, payloadBytes: Long)

  /** Feature extraction over binary media columns — batch-shaped, partition-
    * local, no driver involvement. Images and audio run REAL decodes
    * (ImageIO / AudioSystem). Throws on a corrupt payload; use
    * [[extractFeaturesIsolated]] for the quarantine-shaped production path. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions(it => it.map(decodeOne))
  }

  /** Feature extraction with per-element error isolation: decode failures
    * become quarantine rows on a side output instead of failing the job —
    * the same Either-shape as MineJob.run. */
  def extractFeaturesIsolated(spark: SparkSession, media: Dataset[MediaRow])
      : (Dataset[MediaFeatures], Dataset[MediaQuarantine]) = {
    import spark.implicits._
    val results = media.mapPartitions { it =>
      it.map { m =>
        try (Some(decodeOne(m)), Option.empty[MediaQuarantine])
        catch {
          case e: Exception =>
            (Option.empty[MediaFeatures], Some(MediaQuarantine(m.media_id, m.kind,
              e.getClass.getSimpleName, Option(e.getMessage).getOrElse("").take(200),
              m.payload.length.toLong)))
        }
      }
    }.persist()
    (results.flatMap(_._1), results.flatMap(_._2))
  }

  private def decodeOne(m: MediaRow): MediaFeatures = m.kind match {
    case "image" =>
      val (w, h, feats) = decodeImage(m.payload)
      MediaFeatures(m.media_id, m.kind, feats, 1, m.payload.length.toLong, w, h, 0)
    case "audio" =>
      val (rate, _, feats) = decodeWav(m.payload)
      MediaFeatures(m.media_id, m.kind, feats, 1, m.payload.length.toLong, 0, 0, rate)
    case _ =>
      MediaFeatures(m.media_id, m.kind, decodeVideo(m.payload),
        sampleFrameCount(m.durationMs), m.payload.length.toLong, 0, 0, 0)
  }

  /** Deterministic synthetic media table derived from the documents table:
    * REAL PNG payloads for images, REAL WAV payloads for audio, opaque bytes
    * for video (no JDK codec). Sized tiny (8–23 px sides, ≤400 samples) so
    * the per-row cost is codec-path exercise, not bulk. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      (id % 3) match {
        case 0 =>
          val w = 8 + (id % 16).toInt; val h = 8 + (id % 12).toInt
          MediaRow(id, "image", encodePng(id, w, h), w, h, 0L)
        case 1 =>
          val n = 100 + (id % 300).toInt
          MediaRow(id, "audio", encodeWav(id, n), 0, 0, n * 1000L / 8000L)
        case _ =>
          MediaRow(id, "video", text.getBytes("UTF-8"),
            width = 64 + (id % 512).toInt, height = 64 + (id % 256).toInt,
            durationMs = 1000L * (1 + id % 90))
      }
    }
  }
}
