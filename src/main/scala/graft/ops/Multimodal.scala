package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal asset: opaque binary payload + typed metadata. */
final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                          width: Int, height: Int, durationMs: Long)

/** Extracted features for one asset. */
final case class MediaFeatures(media_id: Long, kind: String, features: Array[Float],
                               frames: Int, decodedBytes: Long)

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed batch-wise in `mapPartitions` (the Scala
 * analogue of `mapInPandas` — one iterator per partition, vectorizable).
 *
 * The actual codec work is STUBBED (no image/audio libraries in this
 * container): `decodeStub` produces a deterministic fake decode (byte
 * histogram) so the Spark-side contract — schema, partitioning, batch shape,
 * feature vector type — is real and tested, and a real decoder can be
 * dropped in by replacing one function.
 */
object Multimodal {

  /** STUB decoder: deterministic 16-bin byte histogram, L1-normalized.
    * Replace with a real image/audio decode when codecs are available. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < payload.length) { bins((payload(i) & 0xFF) >> 4) += 1f; i += 1 }
    val total = math.max(1f, payload.length.toFloat)
    bins.map(_ / total)
  }

  /** STUB frame sampler: one "frame" every `everyMs`, capped. */
  def sampleFrameCount(durationMs: Long, everyMs: Long = 1000L, cap: Int = 32): Int =
    math.min(cap, math.max(1, (durationMs / math.max(1L, everyMs)).toInt))

  /** Feature extraction over binary media columns — batch-shaped, partition-
    * local, no driver involvement; this is the 100 TB-able path. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val feats = decodeStub(m.payload)
        val frames = if (m.kind == "video") sampleFrameCount(m.durationMs) else 1
        MediaFeatures(m.media_id, m.kind, feats, frames, m.payload.length.toLong)
      }
    }
  }

  /** Deterministic synthetic media table derived from the documents table
    * (text bytes stand in for the opaque payload). */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      MediaRow(id, kind, text.getBytes("UTF-8"),
        width = 64 + (id % 512).toInt, height = 64 + (id % 256).toInt,
        durationMs = 1000L * (1 + id % 90))
    }
  }
}
