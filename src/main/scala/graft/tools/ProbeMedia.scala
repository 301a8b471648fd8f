package graft.tools

import graft.operators.{MediaPayloads, Multimodal}

/** One-off probe: print what [[Multimodal.decodeReal]] reads back from
  * the deterministic [[MediaPayloads]] containers (used to pin the
  * `mm_real_decode` oracle VALUES). */
object ProbeMedia {
  def main(args: Array[String]): Unit = {
    val png = MediaPayloads.png(16, 9)
    val wav = MediaPayloads.wav(8000, 1600)
    val gif = MediaPayloads.gif(8, 5, 3)
    println(s"png bytes=${png.length} decode=${Multimodal.decodeImage(png).map(t => (t._1, t._2, t._3))}")
    println(s"wav bytes=${wav.length} decode=${Multimodal.decodeAudio(wav)}")
    println(s"gif bytes=${gif.length} frames=${Multimodal.decodeFrames(gif).map(t => (t._1, t._2, t._3, t._4))}")
    println(s"corrupt=${Multimodal.decodeImage("not an image".getBytes("UTF-8"))}")
    // determinism across two builds
    println(s"png stable=${java.util.Arrays.equals(png, MediaPayloads.png(16, 9))}")
    println(s"gif stable=${java.util.Arrays.equals(gif, MediaPayloads.gif(8, 5, 3))}")
    println(s"wav stable=${java.util.Arrays.equals(wav, MediaPayloads.wav(8000, 1600))}")
  }
}
