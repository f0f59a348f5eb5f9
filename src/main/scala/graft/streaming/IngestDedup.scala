package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming dedup ingest: the continuous form of
  * [[graft.operators.Dedup.incremental]] — every micro-batch is checked
  * against the PERSISTENT digest table of everything ever ingested, and
  * only first-seen content lands in the destination.
  *
  * Scale/correctness shape:
  *   - The digest table is 16 bytes per ingested doc and is the ONLY
  *     thing the batch joins against — never the accumulated corpus.
  *   - Digests are PARTITIONED BY PREFIX (`hp` = first two hex chars of
  *     the md5, 256 buckets): each micro-batch reads only the digest
  *     partitions whose prefixes actually occur in the batch — file-level
  *     partition pruning on the scan, so a batch that touches p of 256
  *     prefixes reads p/256 of the digest table instead of all of it.
  *     (A full-coverage batch still reads everything — the bound is the
  *     batch's prefix spread, which is what makes SMALL continuous
  *     batches cheap against a 100 TB history. At that scale the prefix
  *     would widen to 4 hex chars / 65k buckets.)
  *   - Both destination docs and new digests write into a
  *     deterministic `batch=<id>` subdirectory with overwrite
  *     semantics, so a foreachBatch REPLAY after a crash (at-least-once
  *     delivery) rewrites the same files instead of appending
  *     duplicates — idempotence by layout, the parquet analog of the
  *     reference's overwrite-by-slice bulk contract.
  *   - Within a batch, content keeps the min doc_id (same rule as the
  *     batch operator), then survivors anti-join the stored digests.
  */
object IngestDedup {

  /** Digest-table scan that tolerates the empty-first-batch case. The
    * `batch` partition column is part of the schema so a replaying batch
    * can exclude ITS OWN previously-written digests — without that, a
    * crash-replay would anti-join its docs against itself and overwrite
    * the destination partition with nothing (silent data loss).
    */
  private def storedDigests(spark: org.apache.spark.sql.SparkSession, digestDir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(digestDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // EXPLICIT schema, never inference: a micro-batch whose docs were
    // all dropped upstream (gates, dedup) commits a batch=<id> partition
    // with zero data files — legitimate, but schema inference over a
    // footerless tree throws UNABLE_TO_INFER_SCHEMA and would poison
    // every later batch's digest scan (spec-pinned). hp/batch are
    // partition columns; h is the only column inside the files.
    if (fs.exists(path))
      spark.read.schema("h STRING, hp STRING, batch LONG").parquet(digestDir)
    else spark.emptyDataFrame
      .select(lit("").as("h"), lit("").as("hp"), lit(0L).as("batch")).limit(0)
  }

  /** The prior-digest scan one batch anti-joins against: everything
    * ingested by OTHER batches, pruned to the digest-prefix partitions
    * in `prefixes`. Exposed for the spec that asserts the pruning
    * actually reaches the file scan (files read < files on disk).
    */
  private[graft] def priorDigests(
      spark: org.apache.spark.sql.SparkSession,
      digestDir: String,
      batchId: Long,
      prefixes: Seq[String]
  ): DataFrame =
    storedDigests(spark, digestDir)
      .filter(col("batch") =!= lit(batchId)) // replay: self-exclusion
      .filter(col("hp").isin(prefixes: _*))  // partition pruning by prefix
      .select(col("h"))

  /** Process one micro-batch: returns (docs written). Exposed for the
    * spec to drive directly; the streaming query calls it per batch.
    */
  private[graft] def processBatch(
      batch: DataFrame,
      batchId: Long,
      destDir: String,
      digestDir: String
  ): Long = {
    val spark = batch.sparkSession
    val h = batch.select(
      col("doc_id"), col("text"),
      md5(coalesce(col("text"), lit(""))).as("h"))
      .withColumn("hp", substring(col("h"), 1, 2))
    val firstInBatch = h.groupBy("h").agg(min(col("doc_id")).as("__keep"))
    val kept0 = h.join(firstInBatch, "h")
      .filter(col("doc_id") === col("__keep"))
      // at-least-once delivery can repeat the SAME (doc_id, text) row
      // within one micro-batch; both copies pass the min-doc_id keep, so
      // collapse to one row per content here — the operator's whole
      // contract is that only first-seen content lands
      .dropDuplicates("h")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the batch's prefix spread: a tiny driver-side set (<= 256
      // values) that prunes the digest scan to matching partitions —
      // one cheap job over the (persisted) batch survivors, traded for
      // not scanning the full digest history
      val prefixes = graft.engine.DriverBudget.collect(
          "IngestDedup.batchPrefixes", 256L)(
          kept0.select(col("hp")).distinct())
        .map(_.getString(0)).toSeq
      val kept = kept0.join(priorDigests(spark, digestDir, batchId, prefixes), Seq("h"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val written = graft.sources.WriteMetrics.countingWrite(kept.select(col("doc_id"), col("text")))(
          _.write.mode(SaveMode.Overwrite).parquet(s"$destDir/batch=$batchId"))
        // digests AFTER docs: a crash between the two re-runs the batch,
        // and the overwrite layout makes the re-run converge
        kept.select(col("h"), col("hp")).write
          .partitionBy("hp")
          .mode(SaveMode.Overwrite)
          .parquet(s"$digestDir/batch=$batchId")
        written
      } finally { kept.unpersist(false); () }
    } finally { kept0.unpersist(false); () }
  }

  /** Drain a doc stream (columns `doc_id`, `text`) into `destDir` with
    * digest-table dedup, AvailableNow semantics (the scroll-loop drain).
    */
  def runDedupIngest(
      docs: DataFrame,
      destDir: String,
      digestDir: String,
      checkpoint: String
  ): Unit = {
    val q = docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, destDir, digestDir); ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
