package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** DEDUPLICATING CHUNK-STORE ingest — the storage-dedup sink of the
  * CDC family (the LBFS/venti shape: store every distinct chunk ONCE,
  * represent documents as manifests of chunk digests). Completes the
  * batch↔stream pairings: exact dedup ([[IngestDedup]]), near dedup
  * ([[NearDupIngest]]), quality gate ([[QualityGate]]), and now
  * content-defined chunk storage ([[graft.operators.Dedup.cdcDedup]] /
  * `dedup_cdc_incremental` are the batch-side accounting twins).
  *
  * Per micro-batch:
  *   1. chunk every document ([[graft.functions.CdcChunks]] — local
  *      boundaries, so shared spans produce shared chunks);
  *   2. write the batch MANIFEST (doc_id, pos, digest, len) — the
  *      document's recipe; chunk TEXT never enters the manifest;
  *   3. append to the STORE only chunks whose digest is novel versus
  *      the standing store (prior batches) and within-batch first
  *      occurrences — an anti-join on skinny digests.
  *
  * Replay idempotence is the [[IngestDedup]] layout: both tables write
  * deterministic `batch=<id>` partitions with overwrite semantics and
  * the standing-store scan EXCLUDES the batch's own partition, so a
  * crash-replay rewrites the same files and converges. Reassembly
  * (manifest ⋈ store, concat by pos) reproduces every ingested
  * document byte-for-byte — the StreamingSpec lossless pin.
  *
  * Scale shape: the only corpus-sized work is the batch's own chunking
  * pass; the anti-join ships batch-distinct digests against the
  * standing digest column (in production fronted by the Bloom tier —
  * a chunk digest is a digest — and prefix partition pruning, exactly
  * as [[IngestDedup.priorDigests]] does for whole-doc digests).
  */
object ChunkStoreIngest {

  /** (doc_id, pos, digest, len, chunk) rows of one batch — `pos` is the
    * chunk's 0-based position in its document, the reassembly key.
    */
  private def chunkRows(batch: DataFrame, k: Int, divisor: Int): DataFrame =
    batch
      .select(col("doc_id"),
        posexplode(graft.functions.sketch.cdcChunks(col("text"), k, divisor))
          .as(Seq("pos", "chunk")))
      .select(col("doc_id"), col("pos"), md5(col("chunk")).as("digest"),
        length(col("chunk")).cast("long").as("len"), col("chunk"))

  /** Standing store digests (empty before the first batch), excluding
    * `batchId`'s own partition for replay safety.
    */
  private[graft] def storedDigests(
      spark: SparkSession, storeDir: String, batchId: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(storeDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      spark.read.parquet(storeDir)
        .filter(col("batch") =!= lit(batchId))
        .select(col("digest"))
    else
      spark.emptyDataFrame
        .select(lit("").as("digest")).limit(0)
  }

  /** Process one micro-batch (columns `doc_id`, `text`): write the
    * manifest partition and the novel-chunk store partition; returns
    * (manifest rows, novel chunks stored). Exposed for the spec.
    */
  private[graft] def processBatch(
      batch: DataFrame,
      batchId: Long,
      storeDir: String,
      manifestDir: String,
      k: Int = 8,
      divisor: Int = 64
  ): (Long, Long) = {
    val spark = batch.sparkSession
    val rows = chunkRows(batch, k, divisor)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val manifestRows = graft.sources.WriteMetrics.countingWrite(
        rows.select(col("doc_id"), col("pos"), col("digest"), col("len")))(
        _.write.mode(SaveMode.Overwrite).parquet(s"$manifestDir/batch=$batchId"))
      // within-batch first occurrence (smallest (doc_id, pos) wins —
      // deterministic under replay), then anti-join the standing store
      val firstInBatch = rows
        .groupBy(col("digest"))
        .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
      val novel = rows
        .join(firstInBatch, Seq("digest"))
        .filter(col("doc_id") === col("first.doc_id") && col("pos") === col("first.pos"))
        .join(storedDigests(spark, storeDir, batchId), Seq("digest"), "left_anti")
        .select(col("digest"), col("len"), col("chunk"))
      val stored = graft.sources.WriteMetrics.countingWrite(novel)(
        _.write.mode(SaveMode.Overwrite).parquet(s"$storeDir/batch=$batchId"))
      (manifestRows, stored)
    } finally { rows.unpersist(false); () }
  }

  /** Reassemble documents from manifest ⋈ store — the restore path and
    * the lossless invariant's executable definition. One digest-keyed
    * equi-join; per-doc concat is bounded by document length.
    */
  def reassemble(spark: SparkSession, storeDir: String, manifestDir: String): DataFrame =
    spark.read.parquet(manifestDir)
      .join(spark.read.parquet(storeDir).select("digest", "chunk"), Seq("digest"))
      .groupBy(col("doc_id"))
      .agg(concat_ws("", array_sort(collect_list(struct(col("pos"), col("chunk"))))
        .getField("chunk")).as("text"))

  /** Drain a doc stream (columns `doc_id`, `text`) into the store with
    * AvailableNow semantics.
    */
  def runChunkIngest(
      docs: DataFrame,
      storeDir: String,
      manifestDir: String,
      checkpoint: String,
      k: Int = 8,
      divisor: Int = 64
  ): Unit = {
    val q = docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, storeDir, manifestDir, k, divisor); ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
