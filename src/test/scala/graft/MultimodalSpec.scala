package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Real-decoder coverage for the multimodal seam: animated-GIF frame
  * iteration (the one multi-frame container the JDK decodes) and the
  * WAV poison-header bound. The stub/fallback paths are covered by
  * QueriesSpec's envelope tests.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** A `frames`-frame animated GIF (20x10, one solid color per frame)
    * via ImageIO's sequence writer — no dependencies beyond the JDK.
    */
  private def animatedGif(colors: Seq[Int]): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      colors.foreach { rgb =>
        val img = new java.awt.image.BufferedImage(
          20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(rgb))
        g.fillRect(0, 0, 20, 10)
        g.dispose()
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  test("sampleFrames: a 3-frame GIF yields three real frames with true dimensions") {
    val gif = animatedGif(Seq(0xFF0000, 0x00FF00, 0x0000FF))
    assert(Multimodal.isGif(gif))
    val assets = Seq((1L, "video", gif)).toDF("media_id", "modality", "content")
    val rows = Multimodal.sampleFrames(assets, everyN = 1)
      .orderBy("frame_no")
      .select("frame_no", "width", "height", "frame_sig")
      .as[(Int, Int, Int, String)].collect()
    assert(rows.length == 3, s"expected 3 frames, got ${rows.toSeq}")
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2))
    assert(rows.forall(r => r._2 == 20 && r._3 == 10), s"wrong dims: ${rows.toSeq}")
    // three solid colors -> three distinct grid signatures
    assert(rows.map(_._4).distinct.length == 3)
    // everyN = 2 samples frames 0 and 2
    assert(Multimodal.sampleFrames(assets, everyN = 2)
      .select("frame_no").as[Int].collect().sorted.toSeq == Seq(0, 2))
  }

  test("sampleFrames: non-GIF video bytes take the byte stub with 0x0 dims") {
    val assets = Seq((1L, "video", "not a gif at all".getBytes("UTF-8")))
      .toDF("media_id", "modality", "content")
    val rows = Multimodal.sampleFrames(assets)
      .select("frame_no", "width", "height").as[(Int, Int, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._2 == 0 && r._3 == 0))
  }

  test("WavPcmDecoder: a poison header declaring 8192 channels falls back, never allocates by header") {
    // hand-built RIFF/WAVE header: PCM16, 8192 channels, blockAlign
    // 16384 — passes the frameSize == 2*channels gate, so only the
    // content-length buffer bound stands between a 6-byte payload and a
    // header-driven 1 GiB allocation
    val payload = Array[Byte](1, 2, 3, 4, 5, 6)
    val bb = java.nio.ByteBuffer.allocate(44 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + payload.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(8192.toShort).putInt(8000).putInt(8000 * 16384)
      .putShort(16384.toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(payload.length).put(payload)
    val wav = bb.array()
    val dec = new Multimodal.WavPcmDecoder()
    val got = dec.decode("audio", wav)
    // payload < one frame -> zero frames -> the deterministic fallback
    val want = Multimodal.FakeDecoder.decode("audio", wav)
    assert(got._1 == want._1 && got._2 == want._2 && got._3.toSeq == want._3.toSeq)
  }
}
