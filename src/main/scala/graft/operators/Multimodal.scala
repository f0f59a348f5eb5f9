package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * The Spark-side machinery — schema, partitioning, batch iteration,
  * feature-vector output shape — is real and tested. IMAGE decode is
  * real ([[ImageIoDecoder]], `javax.imageio` from the JDK — PNG/JPEG/
  * GIF/BMP). AUDIO decode is real ([[WavPcmDecoder]],
  * `javax.sound.sampled` from the JDK — WAV/AIFF/AU signed PCM). VIDEO
  * decode is STUBBED (`FakeDecoder`): no video codec ships with the
  * JDK, so decode produces a deterministic feature vector from the
  * bytes. [[MediaIoDecoder]] composes all three behind the one
  * [[Decoder]] seam; everything else (distribution, batching, schema)
  * is decoder-agnostic.
  */
object Multimodal {

  /** A decoded media asset's features. */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      features: Array[Float]
  )

  /** Decode seam. Implementations must be deterministic per byte-input
    * for replayable pipelines (retries re-decode the same split).
    */
  trait Decoder extends Serializable {
    def decode(modality: String, content: Array[Byte]): (Int, Int, Array[Float])
  }

  /** STUB decoder — media codecs are unavailable in this environment.
    * Produces a deterministic 8-dim feature vector + fake dimensions
    * from a rolling hash of the bytes, so tests can assert exact values
    * and the full pipeline (schema/partitioning/batching) is exercised.
    */
  object FakeDecoder extends Decoder {
    def decode(modality: String, content: Array[Byte]): (Int, Int, Array[Float]) = {
      var h = 1125899906842597L // deterministic polynomial rolling hash
      var i = 0
      while (i < content.length) { h = 31 * h + content(i); i += 1 }
      val feats = new Array[Float](8)
      var j = 0
      var s = h
      while (j < 8) {
        s = s * 6364136223846793005L + 1442695040888963407L
        feats(j) = ((s >>> 40).toInt % 1000) / 1000.0f
        j += 1
      }
      val w = 64 + (math.abs(h) % 64).toInt
      (w, w, feats)
    }
  }

  /** REAL image decoder backed by `javax.imageio` (ships with the JDK:
    * PNG, JPEG, GIF, BMP — no new dependencies). Decodes intrinsic
    * width/height and an 8-dim feature vector from a bounded 16x16
    * pixel-grid sample, so cost per image is O(1) regardless of
    * resolution — the per-partition batch shape around it is unchanged.
    *
    * Feature layout: [meanR, meanG, meanB, meanLuma, stdLuma,
    * w/(w+h), h/(w+h), brightFraction(luma>0.5)] — all in [0,1],
    * deterministic per byte-input (ImageIO decode is pure).
    *
    * Non-image modalities and UNDECODABLE image bytes delegate to
    * `fallback` (default [[FakeDecoder]]) instead of failing the task:
    * at corpus scale a handful of truncated/corrupt blobs per billion
    * is the norm — a poison row must not kill a 100 TB job. Delegation
    * is per-row and deterministic, so retries replay identically.
    */
  final class ImageIoDecoder(fallback: Decoder = FakeDecoder) extends Decoder {
    def decode(modality: String, content: Array[Byte]): (Int, Int, Array[Float]) = {
      if (modality != "image") return fallback.decode(modality, content)
      val img =
        try {
          // in-memory decode; the default ImageIO path spills a temp
          // file per read, which is pure overhead for partition batches
          javax.imageio.ImageIO.setUseCache(false)
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        } catch { case _: java.io.IOException => null }
      if (img == null) return fallback.decode(modality, content)
      val w = img.getWidth
      val h = img.getHeight
      val gx = math.min(16, w)
      val gy = math.min(16, h)
      var sr = 0.0; var sg = 0.0; var sb = 0.0
      var sl = 0.0; var sl2 = 0.0; var bright = 0
      var y = 0
      while (y < gy) {
        var x = 0
        while (x < gx) {
          val px = img.getRGB(x * w / gx, y * h / gy)
          val r = ((px >> 16) & 0xff) / 255.0
          val g = ((px >> 8) & 0xff) / 255.0
          val b = (px & 0xff) / 255.0
          val l = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sl += l; sl2 += l * l
          if (l > 0.5) bright += 1
          x += 1
        }
        y += 1
      }
      val n = (gx * gy).toDouble
      val meanL = sl / n
      val varL = math.max(0.0, sl2 / n - meanL * meanL)
      val feats = Array(
        (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
        meanL.toFloat, math.sqrt(varL).toFloat,
        (w.toDouble / (w + h)).toFloat, (h.toDouble / (w + h)).toFloat,
        (bright / n).toFloat
      )
      (w, h, feats)
    }
  }

  /** REAL audio decoder backed by `javax.sound.sampled` (ships with the
    * JDK: WAV/AIFF/AU container parsing + signed-PCM frames — no new
    * dependencies). Decodes the container's true sample rate and channel
    * count and an 8-dim feature vector from a bounded prefix of frames
    * (≤ 65536), so cost per asset is O(1) regardless of duration — the
    * image decoder's 16x16-grid bound, one modality over.
    *
    * Output mapping: width = sample rate (Hz), height = channels.
    * Feature layout: [meanAbs, rms, zeroCrossRate(ch 0), peakAbs,
    * rate/96k, channels/8, framesRead/65536, bitDepth/32] — all in
    * [0,1], amplitudes normalized from signed 16-bit PCM.
    *
    * Non-audio modalities, non-PCM16 encodings (8-bit, float, ulaw) and
    * undecodable bytes delegate to `fallback` per-row — same
    * poison-blob contract as [[ImageIoDecoder]].
    */
  final class WavPcmDecoder(fallback: Decoder = FakeDecoder) extends Decoder {
    def decode(modality: String, content: Array[Byte]): (Int, Int, Array[Float]) = {
      if (modality != "audio") return fallback.decode(modality, content)
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in =
        try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content))
        catch { case _: Exception => null }
      if (in == null) return fallback.decode(modality, content)
      try {
        val fmt = in.getFormat
        // frameSize must be exactly 2 bytes * channels: a container
        // declaring padded/nonstandard blockAlign would otherwise be
        // silently misdecoded (sample() reads 2*idx) instead of
        // falling back per the poison-blob contract
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 ||
          fmt.getFrameSize != 2 * fmt.getChannels)
          return fallback.decode(modality, content)
        val ch = fmt.getChannels
        val frameSize = fmt.getFrameSize // 2 * ch
        val maxFrames = 65536
        // bound the buffer by the INPUT size too: channels is an
        // attacker-controlled uint16, and maxFrames * frameSize alone
        // would let a corrupt header force a ~2 GB allocation —
        // OutOfMemoryError is an Error, so it would skip the fallback
        // catch and kill the task. The content can never yield more PCM
        // bytes than it contains. The bound stays FRAME-ALIGNED:
        // AudioInputStream.read returns 0 (not -1) for a request shorter
        // than one frame, so a byte-granular buffer would spin forever.
        val boundFrames = math.min(maxFrames.toLong, content.length.toLong / frameSize)
        if (boundFrames == 0) return fallback.decode(modality, content)
        val buf = new Array[Byte]((boundFrames * frameSize).toInt)
        var off = 0
        var r = 1
        while (off < buf.length && r > 0) {
          r = in.read(buf, off, buf.length - off)
          if (r > 0) off += r
        }
        val frames = off / frameSize
        if (frames == 0) return fallback.decode(modality, content)
        val big = fmt.isBigEndian
        @inline def sample(idx: Int): Double = {
          val b0 = buf(2 * idx); val b1 = buf(2 * idx + 1)
          val s = if (big) (b0 << 8) | (b1 & 0xff) else (b1 << 8) | (b0 & 0xff)
          s / 32768.0
        }
        val total = frames * ch
        var sAbs = 0.0; var s2 = 0.0; var peak = 0.0
        var i = 0
        while (i < total) {
          val v = sample(i)
          val a = math.abs(v)
          sAbs += a; s2 += v * v; if (a > peak) peak = a
          i += 1
        }
        // zero crossings on channel 0 only (interleaved stride = ch)
        var zc = 0
        var f = 1
        while (f < frames) {
          if (sample(f * ch) * sample((f - 1) * ch) < 0) zc += 1
          f += 1
        }
        val feats = Array(
          (sAbs / total).toFloat,
          math.sqrt(s2 / total).toFloat,
          (zc.toDouble / math.max(1, frames - 1)).toFloat,
          peak.toFloat,
          math.min(1.0, fmt.getSampleRate / 96000.0).toFloat,
          math.min(1.0, ch / 8.0).toFloat,
          math.min(1.0, frames / 65536.0).toFloat,
          16.0f / 32
        )
        (math.round(fmt.getSampleRate), ch, feats)
      } catch {
        case _: Exception => fallback.decode(modality, content)
      } finally in.close()
    }
  }

  /** The all-modality decoder a production pipeline wires in: real
    * image and audio decode, video still behind the stub (no video
    * codec ships with the JDK).
    */
  final class MediaIoDecoder(fallback: Decoder = FakeDecoder) extends Decoder {
    private val img = new ImageIoDecoder(fallback)
    private val wav = new WavPcmDecoder(fallback)
    def decode(modality: String, content: Array[Byte]): (Int, Int, Array[Float]) =
      modality match {
        case "image" => img.decode(modality, content)
        case "audio" => wav.decode(modality, content)
        case _       => fallback.decode(modality, content)
      }
  }

  /** The multimodal envelope: treat each document's text bytes as an
    * opaque asset. With real media, this is `spark.read.format("binaryFile")`
    * or a parquet table with a binary column — same schema shape.
    */
  def assets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      // round-robin modality so each partition sees a mix
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")
      ).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        col("source").as("origin"),
        col("n_chars").as("content_length")
      ).as("meta")
    )

  /** Feature extraction over partition-local batches — the Scala analog
    * of a pandas-batched UDF: one decoder instance per partition, rows
    * streamed through it, columnar output schema. No shuffle; scales
    * with input splits.
    */
  def extractFeatures(assets: DataFrame, decoder: Decoder): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col("media_id"), col("modality"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, modality, content) =>
          val (w, h, feats) = decoder.decode(modality, content)
          MediaFeatures(id, modality, content.length.toLong, w, h, feats)
        }
      }
  }

  /** Resize stub: maps decoded feature rows to a target resolution.
    * The real implementation swaps the arithmetic for an image kernel;
    * schema contract (width/height replaced, features rescaled
    * deterministically) and the narrow no-shuffle shape are the tested
    * surface.
    */
  def resize(features: Dataset[MediaFeatures], targetW: Int, targetH: Int): Dataset[MediaFeatures] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map { f =>
      val sx = targetW.toFloat / math.max(1, f.width)
      val sy = targetH.toFloat / math.max(1, f.height)
      f.copy(
        width = targetW,
        height = targetH,
        features = f.features.map(v => v * sx * sy)
      )
    }
  }

  /** Frame sampling for video assets — REAL keyframe iteration for
    * animated GIFs (`ImageIO`'s multi-image reader API, the one
    * multi-frame container the JDK ships a codec for — zero new
    * dependencies), the deterministic byte stub for every other
    * container (no other video codec in the JDK). One row per sampled
    * frame: GIF rows carry the frame's true intrinsic width/height and
    * a 16x16 pixel-grid signature; stub rows carry 0x0 and the byte
    * signature. Per-row decode inside the partition, no shuffle — the
    * partitioning/output contract is identical either way, which is
    * exactly what lets a real codec slot in per-container.
    */
  def sampleFrames(assets: DataFrame, everyN: Int = 2, maxFrames: Int = 32): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    require(everyN >= 1 && maxFrames >= 1, "positive everyN/maxFrames")
    assets
      .filter(col("modality") === "video")
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, content) =>
        val real = if (isGif(content)) gifFrames(content, everyN, maxFrames) else Seq.empty
        if (real.nonEmpty)
          real.map { case (no, w, h, sig) => (id, no, sig, w, h) }
        else {
          // the byte stub: every-nth-byte "frames" from the base64 text,
          // deterministic per input (and GIFs that fail to decode land
          // here too — the poison-blob contract)
          val b64 = java.util.Base64.getEncoder.encodeToString(content)
          val k = math.min(4, content.length / everyN)
          (0 to k).map { i =>
            val from = math.min(i * 8, b64.length)
            (id, i, b64.substring(from, math.min(from + 8, b64.length)), 0, 0)
          }
        }
      }
      .toDF("media_id", "frame_no", "frame_sig", "width", "height")
  }

  private[graft] def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Every `everyN`-th frame of an animated GIF, at most `maxFrames`:
    * (frame index, width, height, grid signature). Frames that fail to
    * decode are skipped per-frame; a container that yields no frames at
    * all sends the caller to the stub path.
    */
  private[graft] def gifFrames(
      content: Array[Byte], everyN: Int, maxFrames: Int
  ): Seq[(Int, Int, Int, String)] = {
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return Seq.empty
    val reader = readers.next()
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (iis == null) { reader.dispose(); return Seq.empty }
    try {
      reader.setInput(iis, false, true)
      val n = try reader.getNumImages(true) catch { case _: Exception => 0 }
      (0 until n by everyN).take(maxFrames).flatMap { i =>
        try {
          val img = reader.read(i)
          Some((i, img.getWidth, img.getHeight, frameSig(img)))
        } catch { case _: Exception => None }
      }
    } finally {
      try reader.dispose()
      finally iis.close()
    }
  }

  /** Deterministic 16x16 pixel-grid signature of a decoded frame — the
    * [[ImageIoDecoder]] sampling bound, hashed instead of averaged.
    */
  private def frameSig(img: java.awt.image.BufferedImage): String = {
    val w = img.getWidth
    val h = img.getHeight
    val gx = math.min(16, w)
    val gy = math.min(16, h)
    var acc = 1125899906842597L
    var y = 0
    while (y < gy) {
      var x = 0
      while (x < gx) {
        acc = acc * 31 + img.getRGB(x * w / gx, y * h / gy)
        x += 1
      }
      y += 1
    }
    java.lang.Long.toHexString(acc)
  }

  /** Driver-contract query: per-modality feature statistics. Oracle-
    * checked: the DuckDB twin replicates the stub's rolling byte hash
    * with HUGEINT mod-2^64 arithmetic (valid while the corpus is ASCII,
    * where ascii(char) == the UTF-8 byte — asserted true for the test
    * corpus; a real decoder would make this a rows-only check again).
    */
  def featuresQuery(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(assets(spark, dir), FakeDecoder)
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(col("width")).as("avg_width")
      )
      .orderBy("modality")
}
