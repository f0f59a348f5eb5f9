package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis column builders for the training-data pipeline operators.
  *
  * Every function here is built from codegen'd `functions._` primitives
  * and has an exact DuckDB-SQL twin (same regex dialect subset, same
  * edge-case handling) so the operators stay oracle-checkable.
  */
object text {

  /** Whitespace tokens of trimmed text; empty/blank -> empty array.
    * (split on a trimmed string never yields leading/trailing empties,
    * which is what keeps Spark and DuckDB token counts identical.)
    */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast(ArrayType(StringType)))
      .otherwise(split(trim(c), "\\s+"))

  /** Token count via the single-pass kernel
    * ([[graft.functions.TokenCountExpr]]) — `size(tokens(c))` without
    * materializing the token array. [[tokenCountComposed]] is the
    * composition it replaces, kept as the executable spec.
    */
  def tokenCount(c: Column): Column = sketch.tokenCount(c)

  def tokenCountComposed(c: Column): Column = size(tokens(c))

  /** Word k-gram shingles (space-joined); fewer than k tokens -> empty.
    * `sequence` would count DOWN for start>stop, hence the guard.
    *
    * The token array is BOUND once as a lambda variable (the
    * `transform(array(x), t -> …)` let-binding idiom): HOF lambdas do
    * not CSE outer expressions, so slicing `tokens(c)` directly inside
    * the per-shingle lambda would re-run trim+split for EVERY shingle —
    * O(tokens²) string work per document (measured 7x on the bigram
    * explode at sf0.1 before the binding).
    */
  def shingles(c: Column, k: Int): Column =
    element_at(
      transform(
        array(tokens(c)),
        t =>
          when(size(t) < k, array().cast(ArrayType(StringType)))
            .otherwise(
              transform(
                sequence(lit(0), size(t) - k),
                i => array_join(slice(t, i + lit(1), lit(k)), " ")
              )
            )
      ),
      1
    )

  /** BPE-ish sub-word token count: letter runs, single digits, and
    * punctuation as separate tokens (a lookahead-free approximation of
    * GPT-2-style pre-tokenization, so the same pattern runs identically
    * on Java regex and RE2/DuckDB).
    */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokenCount(c: Column): Column = regexp_count(c, lit(BpePattern))

  /** Canonical form for fingerprinting: lowercase, collapse whitespace. */
  def normalized(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Deterministic whole-document fingerprint over the canonical form. */
  def fingerprintMd5(c: Column): Column = md5(normalized(c))

  // -- quality scoring ---------------------------------------------------

  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[.!?,;:]", ""))

  def upperCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[A-Z]", ""))

  def stopwordCount(c: Column): Column =
    regexp_count(lower(c), lit("\\b(the|and|of|to|in|is|a)\\b"))

  // -- language id (n-gram/marker heuristic) -----------------------------
  // NOTE: the driver corpus's `documents.lang` label is synthetic metadata
  // (the text itself is uniform English-ish word salad), so accuracy vs
  // that column is not meaningful there; the operator is still exercised
  // end-to-end and oracle-checked for determinism.

  val EnMarkers = "\\b(the|and|of|to|in|is|you|that|it|for)\\b"
  val FrMarkers = "\\b(le|la|les|des|et|une|est|que|dans|pour)\\b"
  val DeMarkers = "\\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\\b"
  val EsMarkers = "\\b(el|los|las|y|un|una|es|que|por|para)\\b"
  val CjkChars  = "[一-鿿]"

  /** Marker-count language guess with a fixed tie-break order
    * (zh by script, then en > fr > de > es, else 'unknown').
    *
    * Computed by the fused single-pass kernel
    * ([[graft.functions.LangIdGuess]]) — one scan of the document
    * instead of the five regex scans of [[langIdRegex]], same result.
    */
  def langId(c: Column): Column = sketch.langId(c)

  /** The five-regex formulation [[langId]] fuses: 4 marker alternations
    * over `lower(c)` + the CJK class. Kept as the kernel's executable
    * specification (the property spec asserts equality on arbitrary
    * strings) and as the source the DuckDB oracle SQL mirrors.
    */
  def langIdRegex(c: Column): Column = {
    val lc   = lower(c)
    val cEn  = regexp_count(lc, lit(EnMarkers))
    val cFr  = regexp_count(lc, lit(FrMarkers))
    val cDe  = regexp_count(lc, lit(DeMarkers))
    val cEs  = regexp_count(lc, lit(EsMarkers))
    val cCjk = regexp_count(c, lit(CjkChars))
    when(cCjk > 0, "zh")
      .when(cEn >= greatest(cFr, cDe, cEs) && cEn > 0, "en")
      .when(cFr >= greatest(cDe, cEs) && cFr > 0, "fr")
      .when(cDe >= cEs && cDe > 0, "de")
      .when(cEs > 0, "es")
      .otherwise("unknown")
  }
}
