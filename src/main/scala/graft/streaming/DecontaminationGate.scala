package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EVAL-DECONTAMINATION GATE (round 19) — the contamination audit
  * applied at INGEST: each micro-batch document is screened against a
  * fixed eval TABLE's `gramK`-grams and admitted only when it shares
  * at most `maxSharedGrams` of them. The post-hoc audits
  * (`contamination` / `contamination_eval` /
  * `semantic_contamination_eval`) report leakage already in the
  * corpus; this tier is decontaminate-at-the-door — the shape a
  * training-data pipeline actually wants once an eval suite is frozen,
  * and the lexical sibling of [[SemanticIngest]]'s paraphrase tier.
  *
  * The verdict core is [[graft.operators.TextAnalysis.contamination]]
  * — the SAME expression tree as the batch audit (eval grams
  * broadcast, the batch side one narrow stage + a gram-keyed join +
  * doc rollup) — so stream-vs-batch parity is structural, not
  * coincidental (StreamingSpec pins it). Run inside `foreachBatch`
  * like the novelty tier (the per-doc rollup is a batch-side
  * aggregation), composed AFTER the row-local quality gate and BEFORE
  * dedup: contaminated material never reaches the digest table.
  *
  * Gate policy for docs with NO shingles (null text / < gramK
  * tokens): ADMITTED — they can share no eval gram, and the
  * quality/profile tiers own the short-doc verdict
  * ([[NoveltyGate]]'s pass-through contract, same reasoning).
  */
object DecontaminationGate {

  /** Verdict frame: the batch's columns plus `n_eval_docs`,
    * `shared_grams` (0 for clean or shingle-less docs) and `admitted`.
    * `evalDocs` needs columns `doc_id` (its own namespace) and `text`.
    */
  def gate(batch: DataFrame, evalDocs: DataFrame, gramK: Int = 8,
      maxSharedGrams: Long = 0L): DataFrame = {
    val hits = graft.operators.TextAnalysis.contamination(
        batch.select(col("doc_id"), col("text")), evalDocs, gramK)
      .select(col("doc_id"), col("n_eval_docs"), col("shared_grams"))
    batch.join(hits, Seq("doc_id"), "left")
      .withColumn("n_eval_docs", coalesce(col("n_eval_docs"), lit(0L)))
      .withColumn("shared_grams", coalesce(col("shared_grams"), lit(0L)))
      .withColumn("admitted", col("shared_grams") <= maxSharedGrams)
  }
}
