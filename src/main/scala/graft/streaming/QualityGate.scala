package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming QUALITY GATE — the classifier applied at ingest, so
  * below-threshold documents never land in the corpus (the continuous
  * form of [[graft.operators.TextAnalysis.qualityClassify]], the same
  * batch↔stream pairing as [[IngestDedup]]/exact dedup and
  * [[NearDupIngest]]/near dedup).
  *
  * The scoring kernel ([[graft.functions.HashedBowScore]]) is a
  * STATELESS narrow projection — the trained model rides inside the
  * expression as a plan constant — so the gate needs no streaming
  * state, no watermark, and no shuffle: each micro-batch is scored at
  * scan speed and the verdict is identical to the batch operator on
  * the same rows (StreamingSpec pins parity). Compose it BEFORE the
  * stateful ingest stages: it is pure row-local filtering, so running
  * it first shrinks every downstream dedup join and digest write.
  */
object QualityGate {

  /** Score + verdict columns on a (doc_id, text) stream or batch frame
    * — the same expression tree either way; pass the result to
    * `.filter(col("kept"))` to gate, or keep both verdicts for
    * attrition accounting.
    */
  def gate(docs: DataFrame, weights: IndexedSeq[Long], threshold: Long = 0L): DataFrame =
    docs.select(
      col("doc_id"),
      coalesce(graft.functions.sketch.bowScore(col("text"), weights), lit(0L))
        .as("bow_score"))
      .withColumn("kept", col("bow_score") >= lit(threshold))
}
