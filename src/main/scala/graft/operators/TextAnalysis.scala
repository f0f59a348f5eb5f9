package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{text, sketch}

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline surface (language id, quality scoring, token counting,
  * fingerprinting). All are single-pass narrow transforms: no shuffle
  * except the final presentation ORDER BY, so they scale linearly with
  * input splits.
  */
object TextAnalysis {

  /** Token counting (whitespace tokenization). */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        text.tokenCount(col("text")).cast("long").as("n_tokens")
      )
      .orderBy("doc_id")

  /** BPE-ish sub-word token counting (regex pre-tokenization). */
  def textTokensBpe(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        text.bpeTokenCount(col("text")).cast("long").as("n_bpe")
      )
      .orderBy("doc_id")

  /** Quality scoring: integer component counts + one ratio. */
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        text.tokenCount(col("text")).cast("long").as("n_tokens"),
        text.punctCount(col("text")).cast("long").as("punct_n"),
        text.upperCount(col("text")).cast("long").as("upper_n"),
        text.stopwordCount(col("text")).cast("long").as("stop_n")
      )
      .withColumn(
        "stop_ratio",
        when(col("n_tokens") > 0, col("stop_n").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0))
      )
      .orderBy("doc_id")

  /** Language identification (marker heuristic; see
    * [[graft.functions.text.langId]]).
    */
  def textLangId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), text.langId(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  /** Heavy hitters: top sources by document count — the frequent-item
    * scan a corpus-curation pipeline runs first. Exact via groupBy;
    * deterministic tie-break on the key.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(desc("n_docs"), asc("source"))
      .limit(5)

  /** Whole-document fingerprint (canonicalized md5) — the oracle-checkable
    * twin of the winnowing fingerprint below.
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), text.fingerprintMd5(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Winnowing fingerprint (rolling-hash k-grams, min-per-window —
    * SIGMOD'03). Output: per-doc fingerprint count + first fingerprint,
    * deterministic via XXH64. No SQL oracle (custom expression); the
    * driver records a rows-only check and the ScalaTest spec asserts the
    * winnowing guarantees.
    */
  def textWinnow(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        sketch.winnow(col("text"), k = 8, w = 4).as("fps")
      )
      .select(
        col("doc_id"),
        size(col("fps")).cast("long").as("n_fps"),
        col("fps").getItem(0).as("first_fp")
      )
      .orderBy("doc_id")
}
