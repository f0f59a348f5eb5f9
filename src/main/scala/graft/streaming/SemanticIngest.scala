package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Similarity

/** Streaming SEMANTIC near-dup ingest: the continuous form of
  * [[graft.operators.Similarity.cosineIncremental]], completing the
  * ingest-tier matrix — exact digests ([[IngestDedup]]), lexical
  * n-gram Jaccard ([[NearDupIngest]]), chunk storage
  * ([[ChunkStoreIngest]]), and now embedding cosine: the tier that
  * stops a PARAPHRASE of standing content, which every lexical screen
  * passes. Every micro-batch of (vec_id, embedding) rows is banded
  * once, probed against the standing corpus's materialized band asset
  * PLUS every prior batch's accreted band rows, exact-cosine-verified,
  * self-deduped within the batch, and only novel vectors land.
  *
  * Scale/correctness shape (the [[NearDupIngest]] layout, re-based on
  * the LSH machinery):
  *   - The standing side is the MATERIALIZED band asset
  *     ([[Similarity.corpusBandedEmbeddings]]) — the corpus is never
  *     re-banded; each batch pays its own banding plus a (t, b)-keyed
  *     join whose probe side carries only the batch's bands.
  *   - Verification is EXACT basis-point cosine on candidate pairs
  *     only: embeddings move just for candidates, id-keyed against the
  *     corpus table plus prior batches' kept vectors.
  *   - Within a batch, the drop rule is the pipeline convention: the
  *     larger vec_id of any qualifying within-batch pair drops;
  *     cross-side matches drop the batch vector. Deterministic,
  *     replay-stable.
  *   - Destination vectors and band rows write into deterministic
  *     `batch=<id>` partitions with overwrite semantics, and both
  *     standing scans exclude the batch's OWN partition — a
  *     crash-replay rewrites the same files and converges (without
  *     self-exclusion a replay would near-dup against itself and land
  *     nothing).
  */
object SemanticIngest {

  /** Prior batches' accreted band rows (empty on the first batch),
    * excluding `batchId`'s own partition for replay safety.
    */
  private[graft] def priorBands(
      spark: SparkSession, idxDir: String, batchId: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(idxDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      spark.read.parquet(idxDir)
        .filter(col("batch") =!= lit(batchId))
        .select(col("vec_id"), col("t"), col("b"))
    else
      spark.emptyDataFrame
        .select(lit(0L).as("vec_id"), lit(0).as("t"), lit(0L).as("b")).limit(0)
  }

  /** Prior batches' kept vectors (the verification side for matches
    * against accreted history), excluding `batchId`'s own partition.
    */
  private[graft] def priorVectors(
      spark: SparkSession, destDir: String, batchId: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(destDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      spark.read.parquet(destDir)
        .filter(col("batch") =!= lit(batchId))
        .select(col("vec_id"), col("embedding"))
    else
      spark.emptyDataFrame
        .select(lit(0L).as("vec_id"),
          array().cast("array<float>").as("embedding")).limit(0)
  }

  /** Process one micro-batch (columns `vec_id`, `embedding`): write
    * novel vectors + their band rows, return vectors written. Exposed
    * for the spec; the streaming query calls it per batch.
    */
  private[graft] def processBatch(
      batch: DataFrame,
      batchId: Long,
      destDir: String,
      idxDir: String,
      corpusBands: DataFrame,
      corpusVectors: DataFrame,
      threshold: Double,
      bits: Int,
      tables: Int,
      dim: Int,
      seedBase: Long
  ): Long = {
    val spark = batch.sparkSession
    val thresholdBp = math.round(threshold * 10000)
    val rows = batch.select(col("vec_id"), col("embedding"))
      .filter(col("embedding").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val batchBands = rows
        .select(col("vec_id"),
          explode(Similarity.tableBuckets(col("embedding"), bits, tables, dim, seedBase)).as("bk"))
        .select(col("vec_id"), col("bk.t"), col("bk.b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val standingBands = corpusBands.unionByName(priorBands(spark, idxDir, batchId))
        val standingVecs = corpusVectors.unionByName(priorVectors(spark, destDir, batchId))
        def verified(cand: DataFrame, aVecs: DataFrame): DataFrame = cand
          .join(aVecs.select(col("vec_id").as("id_a"), col("embedding").as("v_a")), Seq("id_a"))
          .join(rows.select(col("vec_id").as("id_b"), col("embedding").as("v_b")), Seq("id_b"))
          .withColumn("cos_bp",
            floor(graft.functions.vec.cosine(col("v_a"), col("v_b")) * 10000 + 0.5).cast("long"))
          .filter(col("cos_bp") >= thresholdBp)
        // cross: standing x batch candidates; any verified match drops
        // the batch vector
        val crossDrop = verified(
          standingBands.select(col("t"), col("b"), col("vec_id").as("id_a"))
            .join(batchBands.select(col("t"), col("b"), col("vec_id").as("id_b")), Seq("t", "b"))
            .select("id_a", "id_b").dropDuplicates("id_a", "id_b"),
          standingVecs)
          .select(col("id_b").as("vec_id"))
        // within-batch: larger vec_id of a qualifying pair drops
        val selfDrop = verified(
          batchBands.select(col("t"), col("b"), col("vec_id").as("id_a"))
            .join(batchBands.select(col("t"), col("b"), col("vec_id").as("id_b")), Seq("t", "b"))
            .filter(col("id_a") < col("id_b"))
            .select("id_a", "id_b").dropDuplicates("id_a", "id_b"),
          rows)
          .select(col("id_b").as("vec_id"))
        val dropIds = crossDrop.union(selfDrop).distinct()
        val kept = rows.join(dropIds, Seq("vec_id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val written = graft.sources.WriteMetrics.countingWrite(kept)(
            _.write.mode(SaveMode.Overwrite).parquet(s"$destDir/batch=$batchId"))
          // bands AFTER vectors: a crash between the two re-runs the
          // batch; overwrite layout + self-exclusion make it converge
          batchBands.join(kept.select(col("vec_id")), Seq("vec_id"))
            .write.mode(SaveMode.Overwrite).parquet(s"$idxDir/batch=$batchId")
          written
        } finally { kept.unpersist(false); () }
      } finally { batchBands.unpersist(false); () }
    } finally { rows.unpersist(false); () }
  }

  /** Drain a vector stream (columns `vec_id`, `embedding`) into
    * `destDir` with corpus-plus-history semantic near-dedup,
    * AvailableNow semantics. The standing band table is the durable
    * asset of `corpusDir`'s embeddings.
    */
  def runSemanticIngest(
      vectors: DataFrame,
      corpusDir: String,
      destDir: String,
      idxDir: String,
      checkpoint: String,
      threshold: Double = 0.2,
      bits: Int = 4,
      tables: Int = 8,
      dim: Int = 64,
      seedBase: Long = 42L
  ): Unit = {
    val spark = vectors.sparkSession
    val corpusBands = Similarity.corpusBandedEmbeddings(spark, corpusDir, bits, tables, dim, seedBase)
    val corpusVectors = graft.Tables.embeddings(spark, corpusDir)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    val q = vectors.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, destDir, idxDir,
          corpusBands, corpusVectors, threshold, bits, tables, dim, seedBase); ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
