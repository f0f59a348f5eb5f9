package graft.streaming

import org.apache.spark.sql.DataFrame

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

  /** Score + verdict columns APPENDED to the input frame — every input
    * column (text included) passes through, so the gate composes in
    * front of the text-consuming ingest stages as documented:
    * `QualityGate.gate(stream, w).filter(col("kept"))` feeds
    * [[IngestDedup]]/[[NearDupIngest]] unchanged. Same expression tree
    * for batch and stream; [[graft.operators.TextAnalysis.qualityClassify]]
    * is this plus a projection — ONE definition, so the batch↔stream
    * parity pin can never silently diverge.
    */
  def gate(docs: DataFrame, weights: IndexedSeq[Long], threshold: Long = 0L): DataFrame =
    graft.operators.TextAnalysis.classifierGate(docs, weights, threshold)
}
