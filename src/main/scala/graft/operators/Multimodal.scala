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

/** A really-decoded media item: container metadata plus a 64-dim
  * grayscale-thumbnail embedding for images. `decoded = false` rows carry
  * zeroed metadata — the skip-don't-crash policy a 100 TB corpus needs
  * for its inevitable corrupt payloads. */
final case class DecodedMedia(doc_id: Long, media_type: String, byte_len: Int,
                              decoded: Boolean, width: Int, height: Int,
                              channels: Int, sample_rate: Int, n_frames: Long,
                              embedding: Array[Float], content_hash: String)

/** Multimodal-column plumbing: schema, partition-preserving batch shape,
  * and the decode/feature-extract pass as typed `mapPartitions` (the
  * Scala analogue of a vectorized Python `mapInPandas` stage — one
  * iterator per partition so the decoder amortizes codec/digest
  * initialization per partition, not per row).
  *
  * Two decode paths:
  *  - [[decodeReal]] — REAL decoding with JDK-native codecs: images via
  *    `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF), audio via
  *    `javax.sound.sampled.AudioSystem` (WAV/PCM), and multi-frame
  *    containers (animated GIF — the JDK's native "video" stand-in)
  *    via [[decodeFrames]] with exact frame counts; plus [[resizeImage]]
  *    and the thumbnail-embedding feature extraction. True video codecs
  *    (H.264 etc.) don't ship with the JDK — such payloads take the
  *    skip-don't-crash `decoded = false` row.
  *  - [[decodeStub]] — deterministic pseudo-metadata from the byte
  *    stream, kept for the oracle-checked `mm_features` entry (the
  *    driver corpus's payloads are text bytes, not real containers);
  *    the REAL path is oracle-checked by `mm_real_decode` over
  *    deterministic in-entry PNG/WAV/GIF payloads ([[MediaPayloads]]).
  */
object Multimodal extends Serializable {

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

  /** STUB decoder for the oracle-checked entry (the driver corpus's
    * payloads are text bytes, not containers): derives deterministic
    * pseudo metadata from the byte length so the full pipeline is
    * DuckDB-mirrorable. Real container parsing lives in [[decodeReal]]. */
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

  // ---- real decoders (JDK-native codecs, no external libraries) --------

  /** Decode an image payload with `ImageIO` (PNG/JPEG/BMP/GIF): container
    * dimensions + channel count + a 64-dim grayscale 8×8-thumbnail
    * embedding (the classic perceptual-feature baseline — enough for
    * near-dup blocking via [[Similarity]] over the embedding column).
    * None for bytes no installed reader accepts. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Float])] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))).map { img =>
      (img.getWidth, img.getHeight, img.getColorModel.getNumComponents,
        thumbEmbedding(img))
    } catch {
      // ImageIO.read returns null only when NO reader claims the bytes; a
      // recognized-but-corrupt payload (valid magic, truncated body)
      // THROWS from the reader instead — both are the same skip case
      case _: Exception => None
    }

  /** 64-dim grayscale 8×8-thumbnail embedding (ITU-R BT.601 luma,
    * normalized to [0, 1]) — the classic perceptual-feature baseline. */
  private def thumbEmbedding(img: java.awt.image.BufferedImage): Array[Float] = {
    val thumb = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = thumb.createGraphics()
    try g.drawImage(img, 0, 0, 8, 8, null) finally g.dispose()
    Array.tabulate(64) { i =>
      val rgb = thumb.getRGB(i % 8, i / 8)
      (((rgb >> 16 & 0xFF) * 299 + (rgb >> 8 & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000f) / 255f
    }
  }

  /** Multi-frame image-container decode (animated GIF — the one
    * multi-frame format the JDK decodes natively, standing in for the
    * video branch): first-frame dimensions/channels/embedding plus the
    * EXACT frame count via `ImageReader.getNumImages(true)`. The input
    * is opened non-seek-forward-only so the reader may scan the whole
    * stream to count frames. None when no installed reader claims the
    * bytes or the container holds no frames. */
  def decodeFrames(bytes: Array[Byte]): Option[(Int, Int, Int, Long, Array[Float])] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            if (n <= 0) None
            else {
              val img = reader.read(0)
              Some((img.getWidth, img.getHeight,
                img.getColorModel.getNumComponents, n.toLong, thumbEmbedding(img)))
            }
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Decode an audio payload with `AudioSystem` (WAV/AIFF/AU PCM):
    * (channels, sample rate Hz, frame count). None for unsupported bytes. */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try Some((in.getFormat.getChannels, in.getFormat.getSampleRate.toInt,
        in.getFrameLength))
      finally in.close()
    } catch { case _: Exception => None }

  /** Re-encode an image payload at (w, h) as PNG bytes — the resize stage
    * of a training-data pipeline, runnable inside the same typed
    * per-partition batches as the decode. */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))).map { img =>
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    } catch { case _: Exception => None }

  /** Real decode dispatch. Undecodable bytes take the `decoded = false`
    * row — skip-don't-crash, with the payload hash kept so corrupt items
    * stay traceable. The video branch decodes multi-frame containers
    * (animated GIF) with exact frame counts via [[decodeFrames]]; true
    * video codecs don't ship with the JDK, so such payloads fall into
    * the same skip row as corrupt ones. `digest` is passed in so
    * [[extractReal]] amortizes one instance per partition. */
  def decodeReal(r: MediaRecord, digest: MessageDigest): DecodedMedia = {
    digest.reset()
    val hash = digest.digest(r.content).map("%02x".format(_)).mkString
    val len = r.content.length
    def undecoded = DecodedMedia(r.doc_id, r.media_type, len, decoded = false,
      0, 0, 0, 0, 0L, Array.empty, hash)
    r.media_type match {
      case "image" => decodeImage(r.content).fold(undecoded) {
        case (w, h, ch, emb) => DecodedMedia(r.doc_id, r.media_type, len,
          decoded = true, w, h, ch, 0, 1L, emb, hash)
      }
      case "audio" => decodeAudio(r.content).fold(undecoded) {
        case (ch, rate, frames) => DecodedMedia(r.doc_id, r.media_type, len,
          decoded = true, 0, 0, ch, rate, frames, Array.empty, hash)
      }
      case _ => decodeFrames(r.content).fold(undecoded) {
        case (w, h, ch, n, emb) => DecodedMedia(r.doc_id, r.media_type, len,
          decoded = true, w, h, ch, 0, n, emb, hash)
      }
    }
  }

  /** Real decode pass: typed per-partition batches, one digest per
    * partition. */
  def extractReal(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val digest = MessageDigest.getInstance("MD5")
      it.map(decodeReal(_, digest))
    }
  }

  /** Untyped convenience entry: docs → media → features DataFrame. */
  def features(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    extractFeatures(asMedia(docs).as[MediaRecord]).toDF()
  }
}
