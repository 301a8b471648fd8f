package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Opaque multimodal payload with typed metadata: the engine's model for
  * image/audio/video columns is a `binary` content column plus plain
  * metadata columns — the payload is never interpreted by Catalyst, only
  * by explicit decode/feature steps. */
final case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])

/** Typed features extracted per media item (one flat row per item —
  * joinable back to the corpus by doc_id). */
final case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Int,
                               width: Int, height: Int, channels: Int,
                               n_frames: Int, content_hash: String)

/** Multimodal-column plumbing: schema, partition-preserving batch shape,
  * and the decode/feature-extract pass as typed `mapPartitions` (the
  * Scala analogue of a vectorized Python `mapInPandas` stage — one
  * iterator per partition so a real decoder could amortize codec or
  * model initialization per partition, not per row).
  *
  * The DECODE ITSELF IS A STUB: this container ships no image/audio
  * codecs, so [[decodeStub]] derives deterministic fake dimensions from
  * the byte stream. Everything around it — the binary column, the typed
  * record boundary, the per-partition batch shape, the feature schema —
  * is the real plumbing a codec would drop into.
  */
object Multimodal {

  /** Wrap a text corpus as media payloads (UTF-8 bytes as the opaque
    * binary column; media_type fanned out deterministically so every
    * branch is exercised). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col("text").cast("binary").as("content"))

  /** STUB decoder — a real implementation would parse the container
    * format (JPEG/WAV/MP4) here; this derives deterministic pseudo
    * metadata from the byte length so the full pipeline is testable
    * without codecs. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val len = r.content.length
    val hash = MessageDigest.getInstance("MD5").digest(r.content)
      .map("%02x".format(_)).mkString
    r.media_type match {
      case "image" => MediaFeatures(r.doc_id, r.media_type, len,
        64 + len % 577, 64 + len % 433, 3, 1, hash)
      case "audio" => MediaFeatures(r.doc_id, r.media_type, len,
        0, 0, 1, len % 1000, hash)
      case _ => MediaFeatures(r.doc_id, r.media_type, len,
        64 + len % 577, 64 + len % 433, 3, len % 30 + 1, hash)
    }
  }

  /** Decode/feature-extract pass: typed, per-partition batches. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Untyped convenience entry: docs → media → features DataFrame. */
  def features(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    extractFeatures(asMedia(docs).as[MediaRecord]).toDF()
  }
}
