package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * The Spark-side machinery — schema, partitioning, batch iteration,
  * feature-vector output shape — is real and tested. The actual media
  * decode is STUBBED (`FakeDecoder`): the image/audio codecs aren't in
  * this container, so decode produces a deterministic feature vector
  * from the bytes. Swapping in a real decoder is a one-function change
  * behind [[Decoder]]; everything else (distribution, batching, schema)
  * is unchanged.
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

  /** Frame sampling stub for video assets: deterministic every-nth-byte
    * "frames" standing in for keyframe extraction; the partitioning and
    * output shape (one row per sampled frame) are the real contract.
    */
  def sampleFrames(assets: DataFrame, everyN: Int = 2): DataFrame =
    assets
      .filter(col("modality") === "video")
      .select(
        col("media_id"),
        posexplode(
          transform(
            sequence(lit(0), least(lit(4), (length(col("content")) / everyN).cast("int"))),
            i => substring(base64(col("content")), i * 8 + lit(1), lit(8))
          )
        )
      )
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_sig")

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
