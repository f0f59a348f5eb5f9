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
}
