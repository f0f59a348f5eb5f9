package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming PROFILE GATE — the robust length screen applied at
  * ingest: a per-source (median, MAD) profile computed ONCE over the
  * standing corpus ([[graft.operators.TextAnalysis.lengthProfile]])
  * is broadcast into the stream, and each arriving doc is flagged when
  * it sits more than `k`·MAD from its source's median. The fourth
  * member of the batch↔stream gate family ([[QualityGate]]/classifier,
  * [[IngestDedup]]/exact, [[NearDupIngest]]/near): where the quality
  * gate carries its model INSIDE the expression, this gate's model is
  * a computed TABLE — the stream-static broadcast-join deployment every
  * profile-shaped model (stats screens, per-domain thresholds, source
  * allowlists) uses at scale.
  *
  * Scale/streaming shape: the profile is |sources| rows (broadcast,
  * rebuilt only when the standing corpus is republished — the asset
  * cadence, not the micro-batch cadence); the join is stream-static and
  * STATELESS — no watermark, no state store, each micro-batch gates at
  * scan speed. Unknown sources (no profile row yet) pass un-flagged:
  * a cold-start source must not be dropped by a screen that has no
  * evidence about it.
  *
  * Parity: the flag expression is the SAME comparison
  * [[graft.operators.TextAnalysis.lengthOutliers]] filters on, and the
  * profile is the same frame — StreamingSpec pins stream output ==
  * batch output row-for-row on the streamed rows.
  */
object ProfileGate {

  /** Per-source (med_chars, mad_chars) from a standing corpus. */
  def profile(corpus: DataFrame): DataFrame =
    graft.operators.TextAnalysis.lengthProfile(corpus)

  /** Profile columns + `len_outlier` verdict APPENDED to the input
    * frame (every input column passes through, the [[QualityGate]]
    * composition contract). Works identically on a streaming or batch
    * `docs` frame — the profile side must be static.
    */
  def gate(docs: DataFrame, profile: DataFrame, k: Double = 3.0): DataFrame =
    docs.join(broadcast(profile), Seq("source"), "left")
      .withColumn("len_outlier",
        coalesce(
          col("mad_chars") > 0 &&
            abs(col("n_chars") - col("med_chars")) > lit(k) * col("mad_chars"),
          lit(false)))
}
