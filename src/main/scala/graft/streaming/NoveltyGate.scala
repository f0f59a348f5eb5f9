package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NOVELTY ADMISSION GATE — the streaming tier of
  * `text_novelty_incremental` (round 15): each micro-batch document's
  * k-shingles are screened against a STANDING gram set and the doc is
  * admitted only when its novelty (fraction of shingles the standing
  * corpus has never seen, in basis points) clears a threshold — the
  * admission-control rule a continuously-growing corpus applies before
  * paying storage and dedup cost for material it already has.
  *
  * The verdict expression tree is
  * [[graft.operators.TextAnalysis.noveltyAgainst]] — the SAME core the
  * batch query runs — so stream-vs-batch parity is structural, not
  * coincidental (StreamingSpec pins it). At deployment the standing
  * set is the materialized gram-stats asset
  * ([[graft.operators.Dedup.corpusGramDf]], column `g`): a skinny
  * asset scan on the build side of one membership join per batch;
  * nothing here re-shingles the standing corpus.
  *
  * Gate policy for docs with NO shingles (null text / < k tokens):
  * ADMITTED. The tier gates on redundancy EVIDENCE; a doc too short to
  * produce a shingle offers none, and the quality/profile gates own
  * the too-short verdict. This pass-through is part of the contract
  * (spec-pinned) — flipping it would silently drop every short doc at
  * the novelty tier instead of the tier built to judge them.
  */
object NoveltyGate {

  /** Verdict frame: the batch's columns plus `n_grams`, `n_novel`,
    * `novelty_bp` (null for shingle-less docs) and `admitted`.
    * `standingGrams` needs one column `g`; extra columns (the gram
    * asset also carries `__df`/`first_doc`) are pruned here.
    */
  def gate(batch: DataFrame, standingGrams: DataFrame,
           minNoveltyBp: Long, k: Int = 3): DataFrame = {
    val nov = graft.operators.TextAnalysis.noveltyAgainst(
      batch.select(col("doc_id"), col("text")), standingGrams, k)
    batch.join(nov, Seq("doc_id"), "left")
      .withColumn("admitted",
        coalesce(col("novelty_bp") >= minNoveltyBp, lit(true)))
  }

  /** Prior batches' ACCRETED gram rows (empty before the first batch),
    * excluding `batchId`'s own partition — the
    * [[NearDupIngest.priorIndex]] replay-safety layout.
    */
  private[graft] def priorGrams(
      spark: org.apache.spark.sql.SparkSession, gramDir: String, batchId: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(gramDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      spark.read.parquet(gramDir)
        .filter(col("batch") =!= lit(batchId))
        .select(col("g"))
    else
      spark.emptyDataFrame.select(lit("").as("g")).limit(0)
  }

  /** ACCRETING form (round 16) — the rung the sibling tiers already
    * had ([[NearDupIngest]] / [[SemanticIngest]] accrete batch
    * history): docs admitted in batch N raise the standing gram set
    * against batch N+1, so a stream of mutually-redundant "novel"
    * docs no longer all passes the tier (exact dedup catches literal
    * copies downstream; paraphrase-level shingle overlap BETWEEN
    * batches is exactly what this tier exists to stop).
    *
    * Mechanics: the effective standing set is `corpusGrams` UNION
    * every prior batch's accreted partition; after the verdict, the
    * admitted docs' NOVEL grams (left-anti the effective standing
    * set, distinct within the batch) land in `gramDir/batch=<id>`.
    * Accreting only the novel grams keeps the partitions MUTUALLY
    * DISJOINT and disjoint from the corpus asset by construction, so
    * the union stays duplicate-free without a per-batch distinct over
    * the whole vocabulary — [[graft.operators.TextAnalysis.noveltyAgainst]]'s
    * membership join requires a distinct standing side (a duplicate
    * gram would inflate `n_grams` through the join).
    *
    * Within a batch, docs are screened against the standing set only
    * (batch-atomic admission, the `text_novelty_incremental`
    * semantics) — admitted material raises grams for LATER batches,
    * not for batchmates. Deterministic-partition overwrite plus
    * self-exclusion makes crash-replay converge, same argument as the
    * sibling tiers.
    */
  private[graft] def processBatch(
      batch: DataFrame,
      batchId: Long,
      gramDir: String,
      corpusGrams: DataFrame,
      minNoveltyBp: Long,
      k: Int = 3
  ): DataFrame = {
    val spark = batch.sparkSession
    val standing = corpusGrams.select(col("g"))
      .unionByName(priorGrams(spark, gramDir, batchId))
    // the verdict frame is PERSISTED and returned that way: the
    // accretion write below and the caller's admitted-filter both read
    // it, so one membership join serves both — the CALLER releases it
    // (CuratedIngest's finally / the spec's clearCache)
    val verdicts = gate(batch, standing, minNoveltyBp, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val novelAdmitted = verdicts.filter(col("admitted"))
      .select(explode(graft.functions.sketch.tokenShingles(col("text"), k)).as("g"))
      .distinct()
      .join(standing, Seq("g"), "left_anti")
    novelAdmitted
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$gramDir/batch=$batchId")
    verdicts
  }
}
