package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.engine.GlobalRank
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

  /** TOKENIZER FERTILITY — sub-word tokens per whitespace word, rolled
    * up by language: the standard tokenizer-QA number (a language with
    * fertility ≫ the corpus mean is being shredded by the vocabulary —
    * under-trained merges, wrong script coverage — and will pay that
    * multiple in sequence length forever). Reuses the two green token
    * kernels verbatim; exact int64 sums, one double division per
    * language row (the corpusStats determinism argument).
    *
    * Scale shape: both counts are narrow per-row expressions fused
    * into the scan projection; one map-side-combined aggregate keyed
    * by language — the exchange is |langs| partial rows per task.
    */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        text.tokenCount(col("text")).cast("long").as("nw"),
        text.bpeTokenCount(col("text")).cast("long").as("nb"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nw")).as("total_words"),
        sum(col("nb")).as("total_bpe"))
      .withColumn("fertility",
        when(col("total_words") > 0,
          col("total_bpe").cast("double") / col("total_words").cast("double"))
          .otherwise(lit(0.0)))
      .orderBy("lang")

  /** N-GRAM NOVELTY — per document, the fraction of its distinct
    * 3-shingles whose FIRST corpus occurrence (min doc id) is this
    * document: the novelty curve curation pipelines sample against
    * (a doc that introduces nothing the corpus hasn't already said is
    * a compression candidate; a high-novelty doc anchors coverage).
    * Emitted in integer basis points — engine-independent.
    *
    * Scale shape (in-plan form, for arbitrary DataFrames): one fused
    * shingle kernel in the scan projection, one grams-keyed min
    * aggregate (map-side combined) for first occurrence, one equi-join
    * back, one doc-keyed rollup. The join back re-carries hot grams
    * through a second corpus-wide exchange — which is why the driver
    * query runs [[ngramNoveltyFromAssets]] instead (no gram join at
    * all); this form remains the reference semantics both are pinned
    * against.
    */
  def ngramNovelty(docs: DataFrame): DataFrame = {
    val sh = docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(sketch.shingleSet(col("t"), 3)).as("g"))
    val firstDoc = sh.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    sh.join(firstDoc, Seq("g"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_bp", expr("(10000 * n_novel) DIV n_grams"))
      .orderBy("doc_id")
  }

  /** [[ngramNovelty]] served from the corpus gram assets (round 15) —
    * the deployment plan. Two observations kill the in-plan version's
    * gram-keyed join (the round-14 sf1 watch item: re-carrying hot
    * grams through a second corpus-wide join):
    *   - every gram has exactly ONE first-occurrence doc, so the
    *     per-doc novel count is just `gramstats GROUP BY first_doc` —
    *     a vocabulary-sized aggregate, no join back to the corpus;
    *   - the per-doc denominator (distinct-gram count) is the `n`
    *     column the materialized per-doc index already carries.
    * The only corpus-sized work left is the asset builds, shared with
    * every other exact-ngram consumer; the query itself is one
    * doc-keyed join of two skinny doc-sized tables.
    */
  def ngramNoveltyFromAssets(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val novel = graft.operators.Dedup.corpusGramDf(spark, dir, k)
      .groupBy(col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    graft.operators.Dedup.corpusNgramIndex(spark, dir, k)
      .select(col("doc_id"), col("n").cast("long").as("n_grams"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_bp", expr("(10000 * n_novel) DIV n_grams"))
      .orderBy("doc_id")
  }

  def ngramNoveltyQuery(spark: SparkSession, dir: String): DataFrame =
    ngramNoveltyFromAssets(spark, dir)

  /** The INCREMENTAL tier of [[ngramNovelty]] — each batch document's
    * shingles screened against the STANDING corpus's gram set (the
    * midpoint-cut convention of the incremental family): "how much of
    * this ingest batch is new material" is the admission-control number
    * a continuously-growing corpus reads per batch, where the batch
    * view ([[ngramNovelty]]) answers the within-corpus question.
    *
    * Scale shape: a left-anti-style membership join on the gram key —
    * standing grams arrive as a skinny distinct set; the rollup keys
    * on batch doc. This in-plan form re-derives the standing set from
    * raw text (for arbitrary DataFrames, e.g. the streaming parity
    * pin); the driver query runs
    * [[ngramNoveltyIncrementalFromAssets]], which reads it from the
    * materialized gram-stats asset instead.
    */
  /** The incremental tier's CORE, shared by the batch query, the
    * asset-backed query, and the streaming admission gate
    * ([[graft.streaming.NoveltyGate]]): per-doc novelty of `docs`'
    * k-shingles against an explicit standing gram set (one column
    * `g`). Docs with no shingles (null text / < k tokens) produce no
    * row — a gate layering on this treats them as no-evidence
    * pass-throughs. One gram-keyed membership join (left; the standing
    * side is a skinny distinct set), one doc-keyed rollup.
    */
  def noveltyAgainst(docs: DataFrame, standingGrams: DataFrame, k: Int = 3): DataFrame =
    docs
      .select(col("doc_id"), explode(sketch.tokenShingles(col("text"), k)).as("g"))
      .join(standingGrams.select(col("g")).withColumn("__known", lit(1L)), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__known").isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_bp", expr("(10000 * n_novel) DIV n_grams"))

  def ngramNoveltyIncremental(docs: DataFrame): DataFrame = {
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    val standing = docs.filter(col("doc_id") < cut)
      .select(explode(sketch.tokenShingles(col("text"), 3)).as("g")).distinct()
    noveltyAgainst(docs.filter(col("doc_id") >= cut), standing, 3)
      .orderBy("doc_id")
  }

  /** The incremental tier served from the corpus gram asset
    * (round 15): the STANDING gram set is `first_doc < cut` over the
    * materialized gram-stats table — a skinny asset scan — instead of
    * re-shingling half the corpus per query. The BATCH side stays
    * raw-shingled on purpose: that is the honest ingest shape (a new
    * batch has no index entry yet); only the standing side, which a
    * deployment accumulates, comes from the asset. Membership is
    * unchanged: a gram occurs in some standing doc iff its first
    * occurrence is standing.
    */
  def ngramNoveltyIncrementalFromAssets(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    // a gram occurs in some standing doc iff its first occurrence is
    // standing — the asset's first_doc column IS the membership test
    val standing = graft.operators.Dedup.corpusGramDf(spark, dir, k)
      .filter(col("first_doc") < cut).select(col("g"))
    noveltyAgainst(docs.filter(col("doc_id") >= cut), standing, k)
      .orderBy("doc_id")
  }

  def ngramNoveltyIncrementalQuery(spark: SparkSession, dir: String): DataFrame =
    ngramNoveltyIncrementalFromAssets(spark, dir)

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

  /** PER-SOURCE LANGUAGE COMPOSITION — the mix-design table behind
    * "what is each source actually made of": documents and tokens per
    * (source, predicted language), plus each cell's token share of the
    * whole corpus. Multilingual mixes are weighted off exactly this
    * breakdown (a crawl that is 40% non-target-language gets its quota
    * cut before any per-doc filtering runs).
    *
    * Scale shape: ONE corpus pass — both fused kernels
    * ([[graft.functions.text.langId]], [[graft.functions.text
    * .tokenCount]]) run in the same narrow projection, the aggregation
    * is map-side combined to (sources x languages) rows, and the total
    * is a 1-row broadcast. `token_share` is a single division of two
    * exact longs (engine-independent, the [[mixKl]] convention).
    */
  def mixLanguagesQuery(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .select(col("source"),
        text.langId(col("text")).as("pred_lang"),
        text.tokenCount(col("text")).cast("long").as("__nt"))
      .groupBy("source", "pred_lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))
    val total = cells.agg(sum(col("n_tokens")).cast("double").as("__t"))
    cells.crossJoin(broadcast(total))
      .select(col("source"), col("pred_lang"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("__t")).as("token_share"))
      .orderBy("source", "pred_lang")
  }

  /** CROSS-SOURCE VOCABULARY OVERLAP — pairwise Jaccard of the
    * per-source top-K vocabularies: the complement of [[mixKl]]'s
    * divergence view ("how much does X's frequent vocabulary overlap
    * Y's" is the question behind merging near-duplicate crawls or
    * keeping them as distinct mix components). Within-source diagonal
    * excluded (trivially 1); source pairs sharing no top-K term drop
    * out (inner join — both engines agree).
    *
    * Scale shape: one corpus pass to (source, term) counts (map-side
    * combined); the top-K cut is a window PARTITIONED by source
    * (bounded per-group work, no global sort); everything after runs
    * on sources × K rows — the pairwise join is tiny by construction.
    */
  def vocabOverlapQuery(spark: SparkSession, dir: String, topK: Int = 32): DataFrame =
    vocabOverlap(Tables.documents(spark, dir), topK)

  /** Frame-level core of [[vocabOverlapQuery]]. CARDINALITY CONTRACT:
    * the matrix is sources² — the key space must be dimension-sized,
    * enforced by [[graft.engine.Skew.requirePairwiseKeyBound]] on the
    * (persisted, sources×topK-row) top-term table before the pair
    * stage runs (property-tested in QueriesSpec).
    */
  def vocabOverlap(docs: DataFrame, topK: Int = 32): DataFrame = {
    val counts = docs
      .select(col("source"), explode(text.tokens(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("source", "term")
      .agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(col("source")).orderBy(desc("freq"), asc("term"))
    val top = counts
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topK)
      .select(col("source"), col("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.engine.Skew.requirePairwiseKeyBound(top, "source", "vocab_overlap")
    val sizes = top.groupBy("source").agg(count(lit(1)).as("k"))
    val inter = top.select(col("source").as("source_a"), col("term"))
      .join(top.select(col("source").as("source_b"), col("term")), Seq("term"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
    val out = inter
      .join(sizes.select(col("source").as("source_a"), col("k").as("ka")), Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"), col("k").as("kb")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        (col("n_shared").cast("double") /
          (col("ka") + col("kb") - col("n_shared"))).as("jaccard"))
      .orderBy("source_a", "source_b")
    graft.engine.Caching.handoff(out, top)
  }

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

  /** Count-Min sketched token frequencies, verified in-query against
    * exact counts: the sketch ([[graft.functions.CmsSketchAgg]], d×w
    * counters, map-side mergeable, the token stream never shuffles) is
    * built in one aggregation pass over the token ARRAYS; the exact
    * top-k (the verification harness — at 100 TB you would sketch
    * FIRST and verify a sample) comes from the usual explode+groupBy.
    * Output carries both counts per top token; the CMS contract
    * `n_est >= n_exact` (one-sided error) is spec-asserted and the
    * oracle recomputes the identical buckets from `substr(md5(tok))`.
    *
    * Driver state: one 8·d·w-byte sketch row (32 KiB at 4×1024),
    * embedded as plan literals for the estimate pass — the
    * centroid-model pattern.
    */
  def cmsFreq(docs: DataFrame, d: Int = 4, w: Int = 1024, topK: Int = 20): DataFrame = {
    val toks = docs
      .filter(col("text").isNotNull)
      .select(text.tokens(col("text")).as("toks"))
    val sketchRow: IndexedSeq[Long] =
      toks.agg(graft.functions.cms.sketch(col("toks"), d, w).as("s"))
        .head().getSeq[Long](0).toIndexedSeq
    docs
      .filter(col("text").isNotNull)
      .select(explode(text.tokens(col("text"))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(desc("n_exact"), asc("tok"))
      .limit(topK)
      .withColumn("n_est", graft.functions.cms.estimate(sketchRow, col("tok"), d, w))
      .orderBy(desc("n_exact"), asc("tok"))
  }

  def cmsFreqQuery(spark: SparkSession, dir: String): DataFrame =
    cmsFreq(Tables.documents(spark, dir))

  /** Winnow-fingerprint overlap pairs — plagiarism-style near-dup
    * detection scored by CONTAINMENT (shared fingerprints over the
    * smaller doc's fingerprint count), which catches a small doc pasted
    * into a large one where Jaccard would dilute. Inverted index on the
    * (already deduplicated) fingerprint values, self-join per
    * fingerprint — same skinny-shuffle shape as the n-gram join but
    * over ~1/w as many keys (winnowing samples one gram per window),
    * so the index is w-times smaller for the same guarantee (shared
    * substrings of length >= k+w-1 always collide). Corpus-common
    * fingerprints (df > maxDf) are dropped before the join — the
    * inverted-index analog of stopword removal, and the guard that
    * keeps the join linear in practice.
    */
  def winnowPairs(
      docs: DataFrame,
      k: Int = 8,
      w: Int = 4,
      minContainment: Double = 0.6,
      maxDf: Int = 20
  ): DataFrame = {
    // GROUPED inverted index: one shuffle on the fingerprint key folds
    // the per-fp posting list, its size IS the document frequency, and
    // candidate pairs are emitted array-side from each (df <= maxDf)
    // posting list — at most maxDf·(maxDf-1)/2 per fingerprint, by
    // construction. The previous shape (count-over-window for df, then
    // an fp-keyed self-join) shuffled the full index by fp three times;
    // this shuffles it once.
    //
    // df cap: a fingerprint in >maxDf docs is corpus boilerplate, not
    // evidence of copying — and it is exactly the hot key that makes an
    // inverted-index join quadratic (one ubiquitous fingerprint at sf0.1
    // measured 257M candidate rows; the cap bounds it at ~600k). Scores
    // are containment over each doc's RARE-fingerprint profile.
    val grouped = docs
      .select(col("doc_id"), explode(sketch.winnow(col("text"), k, w)).as("fp"))
      .groupBy("fp").agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) <= maxDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-doc profile size over the SAME capped index (skinny re-explode
    // of the cached posting lists, not a second pass over the corpus)
    val sizes = grouped.select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    // ids are sorted, so ordered combinations give id_a < id_b directly
    val emitted = grouped
      .filter(size(col("ids")) >= 2)
      .select(Dedup.orderedPairs("ids").as("p"))
      .select(col("p.id_a"), col("p.id_b"))
    val pairs = emitted
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_fps"))
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .withColumn(
        "containment",
        col("shared_fps").cast("double") / least(col("na"), col("nb"))
      )
      .filter(col("containment") >= minContainment)
      .select("id_a", "id_b", "shared_fps", "containment")
    graft.engine.Caching.handoff(pairs, grouped)
  }

  def winnowPairsQuery(spark: SparkSession, dir: String): DataFrame =
    winnowPairs(Tables.documents(spark, dir), minContainment = 0.6)
      .orderBy("id_a", "id_b")

  /** PII scrub: detect + redact emails, phone numbers, and IPv4
    * addresses in one narrow codegen'd pass — counts per category plus
    * a fingerprint of the redacted text (so redaction itself, not just
    * detection, is oracle-checked). No shuffle: at 100 TB this runs at
    * scan speed, and the redacted column would be written straight back
    * out per-partition.
    *
    * Patterns are deliberately the intersection of Java-regex and RE2
    * semantics — character classes, bounded repetition, and `\b` on
    * ASCII neighbors behave identically — so the DuckDB oracle runs the
    * byte-same patterns (see the kernel/regex equivalence notes in the
    * verify recipe; no lookaround, no backreferences).
    */
  def piiScrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val t = col(textCol)
    val clean = regexp_replace(
      regexp_replace(regexp_replace(t, email, "<EMAIL>"), phone, "<PHONE>"),
      ip, "<IP>")
    docs.select(
      col("doc_id"),
      regexp_count(t, lit(email)).cast("long").as("n_emails"),
      regexp_count(t, lit(phone)).cast("long").as("n_phones"),
      regexp_count(t, lit(ip)).cast("long").as("n_ips"),
      md5(clean).as("clean_fp")
    )
  }

  /** Driver query: the synthetic corpus is letters-only (zero digits,
    * no '@'), so raw-text PII counts would be degenerately all-zero.
    * Each doc is therefore augmented with doc_id-derived PII tokens —
    * one email (two for odd ids), one phone, one IPv4 — built with the
    * same string arithmetic in the DuckDB oracle, which makes every
    * count column informative and the redaction fingerprint sensitive
    * to match boundaries.
    */
  def piiQuery(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val aug = concat(
      col("text"),
      lit(" contact user"), id.cast("string"), lit("@mail.example"),
      expr("repeat(' alt' || cast(doc_id as string) || '@example.org', int(doc_id % 2))"),
      lit(" call 555-"), lpad((id % 1000).cast("string"), 3, "0"),
      lit("-"), lpad((id % 10000).cast("string"), 4, "0"),
      lit(" from 10."), (id % 256).cast("string"), lit(".0."), ((id * 7) % 256).cast("string")
    )
    piiScrub(
      Tables.documents(spark, dir).select(col("doc_id"), aug.as("text"))
    ).orderBy("doc_id")
  }

  /** Per-doc top-k terms by TF-IDF — the keyword extractor a curation
    * pipeline uses for topic tagging and boilerplate spotting.
    *
    * idf is the LOG-FREE variant N/df: `ln` is not correctly-rounded
    * and can differ across engines in the last ulp, which would make
    * cross-engine rank order nondeterministic near ties; `(tf*N)/df` is
    * one exact int64 product (<= 2^53 here) and one IEEE division —
    * bit-identical everywhere, so the ranking is hash-checkable. For
    * fixed tf it orders terms exactly as ln(N/df) would (monotone).
    *
    * The per-doc ranking window is scale-safe HERE because its group is
    * one doc's vocabulary (bounded by doc length) — never a corpus-wide
    * partition; the corpus-size work is the tf aggregation (one shuffle
    * on (doc, term), map-side combined) and the df join (term-keyed —
    * a genuinely hot term is AQE-skew-splittable, which is why df is
    * NOT a per-term window total: a window partition cannot be split,
    * so a stopword would serialize into one straggler task).
    *
    * One-action shape (the [[perplexity]] pattern): nothing persists
    * and nothing is eagerly counted — the tf subtree is recomputed by
    * its two consumers (df and the scored join) and N comes from one
    * extra narrow scan; three tokenize passes total, the price of
    * keeping corpus-sized state out of executor caches.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 5): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(text.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // (doc, term) is unique after the aggregate, so count per term IS df
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // docs with >= 1 token, exactly countDistinct(doc_id) over tf
    val n = docs
      .filter(size(text.tokens(col("text"))) > 0)
      .agg(countDistinct(col("doc_id")).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("score"), asc("term"))
    tf.join(dft, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n")).cast("double") / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df", "score")
  }

  def tfidfQuery(spark: SparkSession, dir: String): DataFrame =
    tfidfTopTerms(Tables.documents(spark, dir), k = 5)
      .orderBy("doc_id", "rank")

  /** Corpus-vocabulary OOV scoring: build the top-`vocabSize` term list
    * from the corpus itself (ties broken by term so the cut is total and
    * deterministic), then score each document by its fraction of
    * out-of-vocabulary tokens. The classic two-pass "train a vocab,
    * broadcast it, score the corpus" shape of LM-side quality filters:
    * pass 1 is one term-keyed count (map-side combined — the heavy-hitter
    * terms collapse per partition), the cut happens on the tiny count
    * table, and pass 2 is a broadcast join — the corpus itself shuffles
    * only for the final per-doc aggregate on `doc_id`.
    */
  def oovScore(docs: DataFrame, vocabSize: Int = 16): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(text.tokens(col("text"))).as("term"))
    val vocab = toks
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("term"))
      .limit(vocabSize)
      .select(col("term"), lit(true).as("in_vocab"))
    toks
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      // exact long/long division: bit-identical across engines
      .withColumn("oov_frac", col("n_oov").cast("double") / col("n_tokens"))
      .orderBy("doc_id")
  }

  def oovQuery(spark: SparkSession, dir: String): DataFrame =
    oovScore(Tables.documents(spark, dir), vocabSize = 16)

  /** OOV RATE BY SOURCE (round 17) — [[oovScore]]'s verdict at the
    * mix-design grain: per source, token mass and the share falling
    * outside the corpus-global top-`vocabSize` vocabulary, in basis
    * points. A source whose OOV rate sits far above the corpus band is
    * the tokenizer-mismatch alarm (different language, markup, code)
    * read BEFORE per-doc filters — and after a tokenizer retrain, the
    * first table checked for coverage regressions.
    *
    * Scale shape: one tokenize pass; the vocabulary head is a bounded
    * TakeOrderedAndProject broadcast back onto the token stream; the
    * rollup is sources-sized, map-side combined.
    */
  def oovRateBySource(spark: SparkSession, dir: String, vocabSize: Int = 16): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(text.tokens(col("text"))).as("term"))
    val vocab = toks
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("term"))
      .limit(vocabSize)
      .select(col("term"), lit(true).as("in_vocab"))
    toks
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_bp", expr("(10000 * n_oov) DIV n_tokens"))
      .orderBy("source")
  }

  /** Type-token ratio (lexical diversity): n_types / n_tokens per doc —
    * the "fraction of unique words" quality rule; low TTR flags the
    * boilerplate/keyword-stuffing documents a curation pass drops.
    * Entirely narrow and shuffle-free: tokenize + `array_distinct` per
    * row, no explode, no aggregation — at 100 TB this is scan-speed.
    * The ratio is exact-integer / exact-integer in one double division,
    * so it is bit-identical across engines; the token-string parity
    * with the DuckDB tokenizer is already pinned by text_oov (whose
    * vocab join would diverge on any tokenization mismatch).
    */
  def ttrScore(docs: DataFrame): DataFrame = {
    val t = text.tokens(col("text"))
    docs
      .select(col("doc_id"), t.as("t"))
      .filter(size(col("t")) > 0)
      .select(
        col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        size(array_distinct(col("t"))).cast("long").as("n_types"))
      .withColumn("ttr", col("n_types").cast("double") / col("n_tokens"))
      .orderBy("doc_id")
  }

  def ttrQuery(spark: SparkSession, dir: String): DataFrame =
    ttrScore(Tables.documents(spark, dir))

  /** Whole-document fingerprint (canonicalized md5) — the oracle-checkable
    * twin of the winnowing fingerprint below.
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), text.fingerprintMd5(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Deterministic per-bucket weight table standing in for a trained
    * quality classifier (a real deployment loads the fastText-style
    * model's weights here): w(b) = ((b·1103515245 + 12345) mod 4001)
    * − 2000, symmetric around 0 so a 0 threshold exercises both
    * verdicts. Exact int64 end-to-end, so scores hash-match the SQL
    * twin bit-for-bit.
    */
  def classifierWeights(nBuckets: Int = 256): IndexedSeq[Long] =
    (0 until nBuckets).map(b => ((b.toLong * 1103515245L + 12345L) % 4001L) - 2000L)

  /** Model-based quality filter — the classifier-scoring stage an LLM
    * data pipeline runs after the heuristic gates (Gopher/C4 rules):
    * a hashed bag-of-words LINEAR model applied to every document.
    *
    * Dataflow at 100 TB: the model is a plan constant (a reference
    * object inside the fused [[graft.functions.HashedBowScore]]
    * kernel — tokenize, poly-31 hash, bucket, weight-sum in ONE text
    * pass), so scoring is a narrow codegen'd projection: no token
    * explode, no shuffle, no join — the corpus is read once at scan
    * speed and only (doc_id, score, verdict) leaves the stage. That is
    * the same model-as-literal shape the centroid/PQ families use for
    * their argmins ([[Similarity]]), applied to text scoring.
    */
  /** Score + verdict columns APPENDED to the input frame (all input
    * columns pass through) — the ONE definition behind both the batch
    * operator below and the streaming [[graft.streaming.QualityGate]],
    * so batch and stream verdicts can never silently diverge.
    */
  def classifierGate(docs: DataFrame, weights: IndexedSeq[Long],
      threshold: Long = 0L): DataFrame =
    docs
      .withColumn("bow_score",
        coalesce(graft.functions.sketch.bowScore(col("text"), weights), lit(0L)))
      .withColumn("kept", col("bow_score") >= lit(threshold))

  def qualityClassify(docs: DataFrame, weights: IndexedSeq[Long],
      threshold: Long = 0L): DataFrame =
    classifierGate(docs, weights, threshold)
      .select("doc_id", "bow_score", "kept")
      .orderBy("doc_id")

  /** Driver query: 256-bucket hashed linear classifier at threshold 0. */
  def classifierQuery(spark: SparkSession, dir: String): DataFrame =
    qualityClassify(Tables.documents(spark, dir), classifierWeights())

  /** Deterministic train/val/test split by CONTENT hash: the first hex
    * nibble of md5(text) buckets 16 ways — 12 train / 2 val / 2 test
    * (75/12.5/12.5). Hashing content rather than doc_id means exact
    * duplicates always land in the same split, so a later exact dedup
    * can never leak train text into test. Narrow, shuffle-free, and
    * reproducible across runs/engines — the properties a 100 TB split
    * assignment must have (no sampling state, no RNG).
    */
  def splitAssign(docs: DataFrame): DataFrame = {
    val nib = substring(md5(col("text")), 1, 1)
    docs.select(
      col("doc_id"),
      when(nib.isin("c", "d"), "val")
        .when(nib.isin("e", "f"), "test")
        .otherwise("train")
        .as("split")
    )
  }

  def splitAssignQuery(spark: SparkSession, dir: String): DataFrame =
    splitAssign(Tables.documents(spark, dir)).orderBy("doc_id")

  /** Deterministic export-shard planning — the manifest a training-data
    * export (WebDataset tars, JSONL shards) is driven by: every document
    * maps to a shard by CONTENT hash (first 15 md5 hex digits as int64,
    * mod nShards — the [[splitAssign]] convention, so exact duplicates
    * always co-shard and membership is reproducible across runs and
    * engines with no RNG state), and each shard's row carries the stats
    * a writer and its auditor need: doc/token/char totals for size
    * balancing, and an ORDER-INDEPENDENT `bit_xor` content fingerprint
    * that any later re-export can recompute to prove shard integrity
    * without re-reading order (xor is commutative — the fingerprint is
    * partition-order-invariant, hence hash-checkable on any engine).
    *
    * Dataflow at 100 TB: one narrow scan (md5 + fused token-count
    * kernel), one `nShards`-key aggregation with map-side partials —
    * the exchange carries nShards rows. The hash is uniform, so shards
    * stay balanced no matter how skewed sources are; the writer that
    * consumes this manifest repartitions by the same expression and
    * writes each shard independently.
    */
  def shardManifest(docs: DataFrame, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    docs
      .select(
        col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        text.tokenCount(col("text")).cast("long").as("n_tokens"),
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        expr("bit_xor(__h)").as("fingerprint"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy("shard")
  }

  def shardManifestQuery(spark: SparkSession, dir: String): DataFrame =
    shardManifest(Tables.documents(spark, dir), nShards = 8)

  /** Corpus vocabulary statistics: top-k word bigrams by DOCUMENT
    * frequency (distinct per doc, so a doc repeating a bigram counts
    * once). One explode + one count shuffle keyed by gram — the
    * high-cardinality key spreads evenly; map-side partial aggregation
    * collapses per-partition repeats before the exchange.
    */
  def topNgrams(docs: DataFrame, k: Int = 2, topK: Int = 20): DataFrame =
    docs
      .select(col("doc_id"), explode(sketch.tokenShingles(col("text"), k)).as("gram"))
      .groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("df"))
      .orderBy(desc("df"), asc("gram"))
      .limit(topK)

  def topNgramsQuery(spark: SparkSession, dir: String): DataFrame =
    topNgrams(Tables.documents(spark, dir), k = 2, topK = 20)

  /** One BPE training round's merge-candidate statistics (Sennrich et
    * al., ACL 2016): the frequency of every adjacent within-word symbol
    * pair, weighted by word frequency — the table whose argmax is the
    * round's merge. One round per call, the [[graft.operators.Similarity.kmeansStep]]
    * pattern: a training loop applies the winning merge to its symbol
    * sequences and calls again.
    *
    * Dataflow at 100 TB — the reason BPE training scales at all: the
    * corpus collapses to the WORD-FREQUENCY dictionary first (one
    * map-side-combined (word) aggregation, the only corpus-sized
    * exchange), and everything after runs on the VOCABULARY: pair
    * explosion is vocab × word-length skinny (symbol, symbol, freq)
    * rows, the pair aggregate is vocab-sized, and the result is a
    * bounded `TakeOrderedAndProject`. Re-counting from text each round
    * costs one corpus scan per merge; real trainers iterate on the
    * materialized dictionary — this operator accepts EITHER (docs via
    * [[bpePairStatsQuery]], or a (w, freq) table directly).
    */
  def bpePairStats(wordFreq: DataFrame, topK: Int = 20): DataFrame =
    wordFreq
      // single-symbol words carry no pairs; the filter also keeps
      // sequence() ascending (sequence(1, 0) would count DOWN)
      .filter(length(col("w")) >= 2)
      .select(col("w"), col("freq"), explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(
        col("w").substr(col("i"), lit(1)).as("left_sym"),
        col("w").substr(col("i") + 1, lit(1)).as("right_sym"),
        col("freq"))
      .groupBy("left_sym", "right_sym")
      .agg(sum(col("freq")).as("pair_freq"))
      .orderBy(desc("pair_freq"), asc("left_sym"), asc("right_sym"))
      .limit(topK)

  /** MULTI-ROUND BPE TRAINER (Sennrich et al., ACL 2016): the ordered
    * merge list a tokenizer ships — [[bpePairStats]] run to a fixpoint
    * instead of one round. Per round: aggregate adjacent-symbol pair
    * frequencies over the word dictionary, take the argmax
    * (freq DESC, pair ASC — the deterministic tiebreak), apply the
    * merge GREEDY LEFT-TO-RIGHT non-overlapping to every word's symbol
    * sequence (the reference algorithm's scan order: on "aaa" the
    * merge (a,a) yields [aa, a]), repeat. Stops early when no pair
    * remains. Output: (round, left_sym, right_sym, pair_freq).
    *
    * Dataflow at 100 TB — why a driver-side round loop is the RIGHT
    * shape here: the corpus collapses to the word-frequency dictionary
    * once (the only corpus-sized exchange, map-side combined); every
    * round after that is a vocabulary-sized aggregation plus a
    * vocabulary-sized map — the argmax row (ONE row) is the only thing
    * that ever reaches the driver, exactly the
    * [[graft.operators.Similarity.kmeansStep]] / bounded-model-state
    * pattern. The merge application is a per-word fold, codegen'd,
    * no UDF.
    */
  /** The training loop's full result: the ordered merges AND the
    * dictionary with every merge applied (caller unpersists `dict`).
    */
  private[graft] def bpeTrainCore(
      wordFreq: DataFrame, rounds: Int): (Seq[(Long, String, String, Long)], DataFrame) = {
    require(rounds >= 1 && rounds <= 64, s"rounds out of range: $rounds")
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    var dict = wordFreq.filter(length(col("w")) > 0)
      .select(col("w"), col("freq"),
        expr("filter(split(w, ''), x -> x != '')").as("syms"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val topDf = dict.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> struct(syms[i - 1] AS l, syms[i] AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("pf"))
        .orderBy(desc("pf"), asc("l"), asc("r"))
        .limit(1)
      val top = graft.engine.DriverBudget.collect("TextAnalysis.bpeTopPair", 1L)(topDf)
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, pf) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((round.toLong, l, r, pf))
        // greedy left-to-right fold; the merged symbol can't rematch
        // within the same round (the new last element is l||r, not l)
        val applied = dict.withColumn("syms", expr(
          s"""aggregate(syms, cast(array() as array<string>), (acc, x) ->
             |CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '${esc(l)}' AND x = '${esc(r)}'
             |THEN concat(slice(acc, 1, size(acc) - 1), array('${esc(l + r)}'))
             |ELSE concat(acc, array(x)) END)""".stripMargin))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        applied.count() // materialize before releasing the previous round
        dict.unpersist(blocking = false)
        dict = applied
        round += 1
      }
    }
    (merges.toSeq, dict)
  }

  def bpeTrain(wordFreq: DataFrame, rounds: Int): DataFrame = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    val (merges, dict) = bpeTrainCore(wordFreq, rounds)
    try merges.toDF("round", "left_sym", "right_sym", "pair_freq")
    finally dict.unpersist(blocking = false)
  }

  /** TOKENIZER APPLICATION of the trained merges — the train→apply
    * loop closed on the dictionary: after `rounds` merges, each word's
    * symbol segmentation, reported for the most frequent words
    * (freq DESC, word ASC). `n_syms` is the word's post-merge token
    * count — summed over frequencies this is exactly the corpus's
    * token-count reduction from those merges — and `syms_fp` pins the
    * segmentation content, not just its size. Same scale shape as
    * training: everything after the one corpus collapse is
    * dictionary-sized.
    */
  def bpeApply(wordFreq: DataFrame, rounds: Int, topK: Int = 20): DataFrame = {
    val (_, dict) = bpeTrainCore(wordFreq, rounds)
    val out = segmentationReport(dict, topK)
    graft.engine.Caching.handoff(out, dict)
  }

  /** The (w, freq, n_syms, syms_fp) projection both apply paths share. */
  private def segmentationReport(dict: DataFrame, topK: Int): DataFrame =
    dict
      .select(col("w"), col("freq"),
        size(col("syms")).cast("long").as("n_syms"),
        md5(concat_ws("|", col("syms"))).as("syms_fp"))
      .orderBy(desc("freq"), asc("w"))
      .limit(topK)

  /** Apply an ALREADY-TRAINED merge list to a word dictionary — the
    * tokenizer-at-inference shape: no pair statistics, no argmax, just
    * the greedy left-to-right fold per merge in training order. Each
    * merge is one vocabulary-sized codegen'd map; the merges compose
    * into a single plan (fine for tokenizer-scale lists — a thousands-
    * deep production list would stage through materialization every
    * few dozen merges to bound plan depth).
    */
  private[graft] def bpeSegment(wordFreq: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    merges.foldLeft(
      wordFreq.filter(length(col("w")) > 0)
        .select(col("w"), col("freq"),
          expr("filter(split(w, ''), x -> x != '')").as("syms"))
    ) { case (dict, (l, r)) =>
      dict.withColumn("syms", expr(
        s"""aggregate(syms, cast(array() as array<string>), (acc, x) ->
           |CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '${esc(l)}' AND x = '${esc(r)}'
           |THEN concat(slice(acc, 1, size(acc) - 1), array('${esc(l + r)}'))
           |ELSE concat(acc, array(x)) END)""".stripMargin))
    }
  }

  // (asset id) -> parquet path of the trained merge list. The merge
  // list is MODEL STATE (the artifact a tokenizer ships), so it lives
  // in the durable asset store like the PQ codebooks — trained once per
  // (corpus fingerprint, rounds), loaded by every later consumer and
  // JVM. Before this asset, bpe_train and bpe_apply each ran the full
  // multi-round training: two identical trainings per bench run.
  private val bpeMergeTables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Test seam: trainings this JVM ran for the merge-list asset. */
  private[graft] val bpeAssetBuilds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Test seam: forget the in-JVM asset handles (simulates a fresh JVM). */
  private[graft] def dropInMemoryBpeTables(): Unit = bpeMergeTables.clear()

  /** The trained merge list for `dir`'s documents as a durable asset:
    * (round, left_sym, right_sym, pair_freq), trained once per (corpus
    * fingerprint, rounds) per warehouse. `topK`-style consumers don't
    * affect the address — the stored bytes depend only on the corpus
    * and the round budget.
    */
  def corpusBpeMerges(spark: SparkSession, dir: String, rounds: Int): DataFrame = {
    val fp = graft.engine.AssetStore.corpusFingerprint(spark, dir, "documents.parquet")
    val assetId =
      s"bpemerges_r${rounds}_v${graft.engine.AssetStore.FormatVersion}_$fp"
    val path = bpeMergeTables.computeIfAbsent(assetId, _ =>
      graft.engine.AssetStore.resolve(spark, assetId,
        staging => {
          bpeAssetBuilds.incrementAndGet()
          bpeTrain(wordFrequency(Tables.documents(spark, dir)), rounds)
            .write.mode("overwrite").parquet(staging)
        }))
    spark.read.parquet(path)
  }

  /** [[bpeApply]] from a prebuilt merge table — loads the (bounded,
    * rounds-sized) merge list to the driver in training order and
    * applies it via [[bpeSegment]]: the train→apply loop with the
    * training paid ONCE per corpus, not once per consumer.
    */
  def bpeApplyFromMerges(wordFreq: DataFrame, merges: DataFrame, topK: Int = 20): DataFrame = {
    // merge tables are rounds-sized model state (one row per training
    // round); 65536 covers any real tokenizer build, never a corpus
    val ms = graft.engine.DriverBudget.collect("TextAnalysis.bpeApplyFromMerges", 65536L)(
        merges.select(col("round"), col("left_sym"), col("right_sym")))
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    segmentationReport(bpeSegment(wordFreq, ms), topK)
  }

  /** Driver query: segmentation of the 20 most frequent words under the
    * shared 3-round merge asset (loaded, not retrained).
    */
  def bpeApplyQuery(spark: SparkSession, dir: String): DataFrame =
    bpeApplyFromMerges(wordFrequency(Tables.documents(spark, dir)),
      corpusBpeMerges(spark, dir, rounds = 3))

  /** Driver query: the first 3 merges of a character-level BPE over the
    * corpus dictionary, served from the merge-list asset.
    */
  def bpeTrainQuery(spark: SparkSession, dir: String): DataFrame =
    corpusBpeMerges(spark, dir, rounds = 3).orderBy("round")

  /** Per-source TOKEN-DISTRIBUTION DIVERGENCE — the mix-design
    * diagnostic behind "which source is least like the corpus"
    * (domain-weight tuning reads exactly this table): KL(source ‖
    * corpus) over unigram distributions, plus size/diversity columns.
    * KL here is an EXPECTED log-ratio, so the [[entropy]] family's
    * determinism pattern applies verbatim: each term's log-ratio is
    * quantized to the 1e4 grid FIRST (integer per-term contribution),
    * then summed as int64 weighted by the term count — order- and
    * engine-independent where a raw double sum is a ulp lottery.
    * `kl_q` is that integer sum; `kl` divides once at the end
    * (single double division, exact on both engines).
    *
    * Scale shape: one corpus-sized token explode feeding two map-side
    * combined aggregations ((source, term) and (term)); everything
    * after is vocabulary-sized — the totals broadcast, the per-term
    * join keys on term, and the final rollup is sources-sized.
    */
  def mixKl(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("source"), explode(text.tokens(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
    val st = tok.groupBy("source", "term").agg(count(lit(1)).as("n_st"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sTot = st.groupBy("source").agg(sum(col("n_st")).as("n_s"))
    val tTot = st.groupBy("term").agg(sum(col("n_st")).as("n_t"))
    val nTot = st.agg(sum(col("n_st")).as("N"))
    val out = st
      .join(broadcast(sTot), "source")
      .join(tTot, "term")
      .crossJoin(broadcast(nTot))
      .withColumn("q", expr(
        "CAST(floor(ln(CAST(n_st * N AS DOUBLE) / CAST(n_s * n_t AS DOUBLE)) * 10000 + 0.5) AS BIGINT)"))
      .groupBy("source")
      .agg(
        max(col("n_s")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("n_st") * col("q")).as("kl_q"))
      .withColumn("kl", col("kl_q").cast("double") / (col("n_tokens") * 10000).cast("double"))
      .orderBy("source")
    graft.engine.Caching.handoff(out, st)
  }

  /** Driver query: the per-source divergence report. */
  def mixKlQuery(spark: SparkSession, dir: String): DataFrame =
    mixKl(Tables.documents(spark, dir))

  /** The corpus→dictionary half: token explode + (word) count. */
  def wordFrequency(docs: DataFrame): DataFrame =
    docs
      .select(explode(text.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w")
      .agg(count(lit(1)).as("freq"))

  /** Driver query: top-20 first-round merge candidates. */
  def bpePairStatsQuery(spark: SparkSession, dir: String): DataFrame =
    bpePairStats(wordFrequency(Tables.documents(spark, dir)), topK = 20)

  /** Vocabulary COVERAGE curve — the tokenizer-sizing question: "how
    * much of the corpus do the top-N terms cover?" Every term's corpus
    * frequency, ranked by (freq DESC, term ASC), with each rank's
    * cumulative token share against the WHOLE corpus (tail included).
    * The rank where `cum_share` crosses 0.9/0.95/0.99 is the vocab-size
    * elbow a BPE/unigram tokenizer build reads off this table.
    *
    * Dataflow at 100 TB: one (term) aggregation with map-side partials
    * — the exchange carries the vocabulary, not the corpus; the total
    * token count is a second aggregate OVER THE VOCAB TABLE (millions
    * of rows, not trillions), broadcast back as a 1-row scalar. Only
    * the top `topK` rows (bounded, driver-chosen) pay the cumulative
    * window — `TakeOrdered` + a window over topK rows, never a full
    * vocabulary sort.
    */
  def vocabCoverage(docs: DataFrame, topK: Int = 100): DataFrame = {
    // persisted: the total and the top-N both consume the term table —
    // without the persist each branch replays the full corpus scan +
    // (term) aggregation (the plan showed the aggregate subtree twice).
    // Vocab-sized (not corpus-sized), released by the caller's
    // clearCache per the Caching contract; at 100 TB this is the
    // materialized vocabulary table every tokenizer build keeps anyway.
    val freqs = docs
      .select(explode(text.tokens(col("text"))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = freqs.agg(sum(col("freq")).cast("double").as("__total"))
    // rank + cumulative share over the TOP-K ROWS ONLY: K is bounded
    // and driver-chosen, so the K rows are model state — collected and
    // ranked on the driver (the bpeTrain/centroid pattern) instead of
    // through a partition-less WindowExec whose single-task sort is
    // harmless here but warns on every run. The running sum stays an
    // exact long; the one double division per row matches the oracle.
    val spark = docs.sparkSession
    import spark.implicits._
    // empty corpus: sum(freq) aggregates to NULL — return the empty
    // frame (the pre-rewrite window plan's behavior) instead of
    // throwing from getDouble on the null scalar
    val totRow = total.head()
    if (totRow.isNullAt(0)) {
      freqs.unpersist()
      return Seq.empty[(Long, String, Long, Double)]
        .toDF("rank", "term", "freq", "cum_share")
    }
    val tot = totRow.getDouble(0)
    val top = graft.engine.DriverBudget.collect("TextAnalysis.vocabCoverageTop", topK.toLong)(
        freqs.orderBy(desc("freq"), asc("term")).limit(topK))
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (term, freq) => (-freq, term) }
    val ranked = top.zipWithIndex.scanLeft((0L, "", 0L, 0L)) {
      case ((_, _, _, cum), ((term, freq), i)) =>
        ((i + 1).toLong, term, freq, cum + freq)
    }.drop(1).map { case (rank, term, freq, cum) => (rank, term, freq, cum / tot) }
    ranked.toSeq.toDF("rank", "term", "freq", "cum_share")
  }

  def vocabCoverageQuery(spark: SparkSession, dir: String): DataFrame =
    vocabCoverage(Tables.documents(spark, dir), topK = 100).orderBy("rank")

  /** TERM CONCENTRATION — per term: how many sources use it, its total
    * corpus frequency, and the share of that mass held by its heaviest
    * source (basis points, integer-exact). A term at ~10000 bp lives
    * in ONE source — the signature of boilerplate, templates and
    * site-specific artifacts that survive per-document quality gates
    * because each instance looks fine alone; a low-bp term is
    * corpus-universal vocabulary. The report curation reads before
    * writing source-specific scrub rules ([[stripMarkup]]'s targeting
    * question answered from data).
    *
    * Scale shape: one (source, term) aggregation with map-side
    * partials — the exchange carries sources × vocabulary, not the
    * corpus — then a vocabulary-keyed rollup. Output is IDF-table
    * sized, the standing artifact size every tokenizer build already
    * carries.
    */
  def vocabConcentration(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("source"), explode(text.tokens(col("text"))).as("term"))
      .groupBy("source", "term")
      .agg(count(lit(1)).as("freq"))
      .groupBy("term")
      .agg(
        count(lit(1)).as("n_sources"),
        sum(col("freq")).as("total_freq"),
        max(col("freq")).as("max_source_freq"))
      .withColumn("concentration_bp",
        expr("(10000 * max_source_freq) DIV total_freq"))
      .orderBy("term")

  /** ZIPF PROFILE — the vocabulary's rank-frequency power law read off
    * a frequency-DOUBLING histogram: terms are bucketed by
    * `k = floor(log2(freq))` and each bucket reports term count, token
    * mass and its frequency range. A Zipfian corpus shows n_terms
    * decaying geometrically in k (the classic slope, with no float
    * `log` anywhere: k comes from the BIGINT's binary width, so both
    * engines bucket identically — the integer-grid convention applied
    * to the log axis). The profile is what a tokenizer build reads to
    * pick vocabulary size and what corpus QA reads to spot synthetic /
    * template-heavy corpora (a missing tail or a spiked head bucket).
    *
    * Scale shape: one (term) aggregation with map-side partials — the
    * exchange carries the vocabulary, not the corpus — then a ~64-row
    * rollup on the bucket index. Nothing else.
    */
  def vocabZipfProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(explode(text.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .groupBy((length(bin(col("freq"))) - 1).cast("long").as("k"))
      .agg(
        count(lit(1)).as("n_terms"),
        sum(col("freq")).as("total_freq"),
        min(col("freq")).as("min_freq"),
        max(col("freq")).as("max_freq"))
      .orderBy("k")

  /** TOKEN-COUNT HISTOGRAM (round 16) — documents bucketed by
    * length-DOUBLING token counts: the corpus-shape chart behind
    * sequence-packing and truncation-budget decisions (mass above the
    * context length is what pack_sequences will split; a spiked short
    * bucket is the boilerplate tell). Same integer-log2 axis as the
    * zipf/value/norm histograms — binary width, no float log.
    * Token-free and null docs carry no length evidence and are
    * excluded (their count is corpus_stats' business).
    *
    * Scale shape: one narrow scan through the single-pass token-count
    * kernel, ≤64-row map-side-combined rollup.
    */
  def tokenCountHist(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(text.tokenCount(col("text")).cast("long").as("n"))
      .filter(col("n") >= 1)
      .groupBy((length(bin(col("n"))) - 1).cast("long").as("k"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n")).as("total_tokens"),
        min(col("n")).as("min_tokens"),
        max(col("n")).as("max_tokens"))
      .orderBy("k")

  /** VOCABULARY GROWTH CURVE (round 16) — new distinct terms per
    * doc-id bucket plus the running total: the empirical Heaps-law
    * curve. A real corpus keeps minting vocabulary sublinearly
    * forever; a flat tail says the source is exhausted (re-crawls,
    * templates) and more ingest buys tokens but no diversity — the
    * acquisition-planning twin of [[vocabZipfProfile]]'s static view,
    * and the corpus-level version of the per-doc novelty curve.
    *
    * Scale shape: one tokenize pass, a vocabulary-keyed min aggregate
    * (the gram-asset first_doc shape applied to terms), then a
    * bucket-keyed rollup. The bucket axis is REPORT-sized by
    * construction (size `bucketWidth` to the corpus); the running
    * total is computed on the driver over those rows (the
    * vocabCoverage pattern — no partition-less window), budget-bounded.
    */
  def vocabGrowth(spark: SparkSession, dir: String, bucketWidth: Long = 50L): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(text.tokens(col("text"))).as("term"))
    val buckets = toks
      .groupBy("term").agg(min(col("doc_id")).as("first_doc"))
      .groupBy(expr(s"first_doc div ${bucketWidth}L").as("bucket"))
      .agg(count(lit(1)).as("new_terms"))
    val rows = graft.engine.DriverBudget.collect("TextAnalysis.vocabGrowthBuckets", 65536L)(buckets)
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val cum = rows.scanLeft((0L, 0L, 0L)) {
      case ((_, _, c), (b, n)) => (b, n, c + n)
    }.drop(1)
    val spark2 = spark
    import spark2.implicits._
    cum.toSeq.toDF("bucket", "new_terms", "cum_terms")
  }

  /** Benchmark-contamination check: which corpus docs share an 8-token
    * gram with the (small) eval set. The eval side's exploded grams are
    * BROADCAST — the 100 TB corpus side streams through one narrow
    * stage + a broadcast hash join keyed on the gram, no corpus shuffle.
    * Output: per contaminated doc, how many eval docs it overlaps and
    * the total (gram x eval-doc) collision count.
    */
  def contamination(docs: DataFrame, evalDocs: DataFrame, gramK: Int = 8): DataFrame =
    contaminationGrams(docs, contaminationEvalGrams(evalDocs, gramK), gramK)

  /** The frozen eval suite's side of [[contamination]], factored out
    * (round 20): an ingest gate screens EVERY micro-batch against the
    * same eval table, so the one shingling this frame costs should run
    * once per suite — [[graft.streaming.DecontaminationGate]] persists
    * it as a small durable asset keyed by the eval dir's fingerprint —
    * not once per batch. Columns `(eval_id, g)`, one row per gram
    * OCCURRENCE (not distinct — `shared_grams` counts collisions).
    */
  def contaminationEvalGrams(evalDocs: DataFrame, gramK: Int = 8): DataFrame =
    evalDocs.select(col("doc_id").as("eval_id"),
      explode(sketch.tokenShingles(col("text"), gramK)).as("g"))

  /** [[contamination]] against a pre-derived eval-gram frame — the SAME
    * expression tree from the join on (the corpus side still streams
    * through one narrow stage into a broadcast hash join), so parity
    * with the audit is structural whether the eval side was shingled
    * now or read back from the cached asset.
    */
  def contaminationGrams(docs: DataFrame, evalGrams: DataFrame, gramK: Int = 8): DataFrame =
    docs
      .select(col("doc_id"), explode(sketch.tokenShingles(col("text"), gramK)).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy("doc_id")
      .agg(countDistinct(col("eval_id")).as("n_eval_docs"), count(lit(1)).as("shared_grams"))

  def contaminationQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    contamination(docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25))
      .orderBy("doc_id")
  }

  /** [[contamination]] with the eval set read from its own directory's
    * `documents.parquet` (round 19 — the r18 verdict's item 3: a real
    * decontamination run brings an eval TABLE, not an id-slice of the
    * corpus). The whole corpus is scanned — no id range is carved out
    * for the eval side, so a corpus doc that verbatim-contains an eval
    * doc's text surfaces whatever its id. Eval ids are the caller's
    * namespace. Same scale shape as [[contamination]]: the (small)
    * eval side's grams broadcast; the corpus streams.
    */
  def contaminationAgainst(spark: SparkSession, dir: String, evalDir: String,
      gramK: Int = 8): DataFrame =
    contamination(Tables.documents(spark, dir),
      Tables.documents(spark, evalDir), gramK).orderBy("doc_id")

  /** CONTAMINATION BY SOURCE (round 20) — the attribution chart an
    * operator reads after the audit fires: per ingest source, docs
    * scanned, docs sharing ≥1 eval `gramK`-gram, total shared-gram
    * mass, and the contaminated share in basis points. The per-doc
    * audit says THAT the eval set leaked; this says WHICH pipeline
    * source is leaking it — the number that decides whether to
    * quarantine a feed or just drop the flagged docs. Same fixture
    * convention as `contamination` (eval = doc_id < 25, corpus the
    * rest); production use composes [[contaminationAgainst]]'s evalDir
    * form the same way.
    *
    * Scale shape: the audit join itself (eval grams broadcast, corpus
    * one narrow stage), a doc-keyed left join back to the corpus's
    * (doc_id, source) projection, then a sources-sized rollup —
    * nothing beyond the audit's own exchange plus one map-side-combined
    * aggregation.
    */
  def contaminationBySource(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("doc_id") >= 25)
    val hits = contamination(corpus, docs.filter(col("doc_id") < 25))
    corpus.select(col("doc_id"), col("source"))
      .join(hits.select(col("doc_id"), col("shared_grams")), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("shared_grams").isNotNull, lit(1L)).otherwise(lit(0L)))
          .as("n_contaminated"),
        coalesce(sum(col("shared_grams")), lit(0L)).as("shared_grams"))
      .withColumn("contaminated_bp", expr("(10000 * n_contaminated) DIV n_docs"))
      .orderBy("source")
  }

  /** Within-document repetition scoring (the standard repetition filter):
    * distinct-token and distinct-3-gram fractions plus the most-frequent
    * token's count. Shuffles are keyed by (doc_id[, token]) — partial
    * aggregation makes them cheap, and nothing is corpus-global.
    */
  def repetition(docs: DataFrame): DataFrame =
    // max_tok_freq is a PER-ROW quantity: the r20 shape answered it by
    // exploding the corpus token stream through a (doc_id, token)
    // exchange, a second (doc_id) exchange and a join — at 100 TB that
    // first shuffle IS the corpus. The TokenMaxFreq kernel (one linear
    // hash-count pass per row, codegen'd) folds the whole operator into
    // the single narrow scan the other signals already share: ZERO
    // shuffles, identical values (r21, guide §2.4 / §2.3).
    docs
      .select(col("doc_id"), text.tokens(col("text")).as("t"))
      .filter(size(col("t")) > 0)
      .select(
        col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        size(array_distinct(col("t"))).cast("long").as("n_distinct"),
        sketch.tokenMaxFreq(col("t")).as("max_tok_freq"),
        size(sketch.shingleSet(col("t"), 3)).cast("long").as("n_distinct_3g")
      )
      .withColumn(
        "rep3_ratio",
        when(col("n_tokens") > lit(2),
          lit(1.0) - col("n_distinct_3g").cast("double") / (col("n_tokens") - 2))
          .otherwise(lit(0.0))
      )
      .select("doc_id", "n_tokens", "n_distinct", "max_tok_freq", "rep3_ratio")

  def repetitionQuery(spark: SparkSession, dir: String): DataFrame =
    repetition(Tables.documents(spark, dir)).orderBy("doc_id")

  /** Deterministic stratified sampling: per-stratum keep thresholds out
    * of 65536, decided by a 16-bit content-hash bucket — the
    * training-mix control (up/down-weight sources) as a pure filter.
    * Narrow and shuffle-free; reproducible across runs, engines, and
    * retries (no RNG state), and consistent under resharding since the
    * decision depends only on row content.
    */
  /** The shared 16-bit content-hash bucket (first 4 hex digits of
    * md5(text), 0..65535) — [[stratifiedSample]] and [[mixEpochs]] MUST
    * agree on this expression: several oracles replicate it digit by
    * digit, and the mixEpochs docstring promises "the same bucket as
    * stratifiedSample".
    */
  private def md5Bucket16: Column =
    conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long")

  def stratifiedSample(
      docs: DataFrame,
      thresholds: Map[String, Int],
      defaultThreshold: Int
  ): DataFrame = {
    val thr = thresholds.foldLeft(lit(defaultThreshold)) {
      case (acc, (s, t)) => when(col("source") === s, lit(t)).otherwise(acc)
    }
    docs.filter(md5Bucket16 < thr)
  }

  /** EPOCH-weighted upsampling by REPETITION — the other half of mix
    * compilation (quota selection downsamples big sources; multi-epoch
    * repetition upsamples small ones: "src1 x 2.5 epochs" emits every
    * src1 doc twice plus a deterministic half of them a third time).
    * Epoch factors are quantized to MILLI-epochs on the driver's
    * integer grid; the fractional copy goes to docs whose 16-bit
    * content-hash bucket (same md5 bucket as [[stratifiedSample]])
    * falls under `(milli % 1000) * 65536 / 1000` — exact integer
    * arithmetic end to end, so any engine replays the same copy set.
    * Entirely narrow (per-row when-chain + bounded `sequence` fan-out,
    * no shuffle); `copy_id` lets downstream packing treat repeats as
    * distinct rows while provenance survives.
    */
  def mixEpochs(
      docs: DataFrame,
      epochs: Map[String, Double],
      defaultEpochs: Double = 1.0
  ): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0 && e <= 100),
      "epoch factors must be in [0, 100]")
    def milli(e: Double): Long = math.floor(e * 1000 + 0.5).toLong
    val bucket = md5Bucket16
    val base = epochs.foldLeft(lit((milli(defaultEpochs) / 1000).toInt)) {
      case (acc, (s, e)) => when(col("source") === s, lit((milli(e) / 1000).toInt)).otherwise(acc)
    }
    val thr = epochs.foldLeft(lit(milli(defaultEpochs) % 1000 * 65536 / 1000)) {
      case (acc, (s, e)) => when(col("source") === s, lit(milli(e) % 1000 * 65536 / 1000)).otherwise(acc)
    }
    docs
      .select(col("doc_id"), col("source"),
        (base + when(bucket < thr, 1).otherwise(0)).as("__copies"))
      .filter(col("__copies") > 0)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), col("__copies"))).as("__i"))
      .select(col("doc_id"), col("source"), col("__i").cast("long").as("copy_id"))
  }

  def mixEpochsQuery(spark: SparkSession, dir: String): DataFrame =
    mixEpochs(
      Tables.documents(spark, dir),
      Map("src0" -> 0.5, "src1" -> 2.5),
      defaultEpochs = 1.0
    ).orderBy("doc_id", "copy_id")

  def stratifiedSampleQuery(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(
      Tables.documents(spark, dir),
      // upweight three sources to 75%, the rest to 25%
      Map("src0" -> 49152, "src1" -> 49152, "src2" -> 49152),
      defaultThreshold = 16384
    ).select("doc_id", "source").orderBy("doc_id")

  /** EXACT-k per-group uniform sample — the other sampling contract
    * next to [[stratifiedSample]]'s Bernoulli thresholds: "give me
    * exactly k eval docs per source", deterministic across runs and
    * engines. Classic reservoir sampling is sequential state; the
    * order-statistics formulation is the same distribution with no
    * state at all: rank every row by a uniform content hash and keep
    * each group's k smallest. The hash is the first 12 md5 hex digits
    * (48 bits — EXACT in an IEEE double, which the top-k aggregate
    * orders by; 15 digits would collapse distinct hashes to the same
    * double), tiebreak doc_id ascending.
    *
    * Dataflow at 100 TB: the naive window (`row_number` over each
    * source) sorts every group's full row set and puts any mega-source
    * on one task; [[graft.functions.TopKOrdTie]] instead carries at
    * most k rows of state per group through map-side partials, so the
    * exchange moves `sources x k` rows regardless of corpus size or
    * source skew — sampling a 100 TB source costs one narrow scan.
    */
  def reservoirSample(docs: DataFrame, k: Int, groupCol: String = "source"): DataFrame = {
    require(k >= 1, s"sample size k must be >= 1, got $k")
    val h48 = conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long")
    docs
      .select(col(groupCol), col("doc_id"), h48.as("__h"))
      // TopKOrdTie ranks ord DESC; negate (exact for 48-bit magnitudes)
      // so the k SMALLEST hashes win, ties broken by doc_id ascending
      .groupBy(groupCol)
      .agg(graft.functions.agg.topKOrdTie(-col("__h"), col("doc_id"), k).as("top"))
      .select(col(groupCol), posexplode(col("top")))
      .select(
        col(groupCol),
        (col("pos") + 1).cast("long").as("sample_rank"),
        col("col.tie").as("doc_id"))
  }

  def reservoirSampleQuery(spark: SparkSession, dir: String): DataFrame =
    reservoirSample(Tables.documents(spark, dir), k = 25)
      .orderBy("source", "sample_rank")

  /** Sequence PACKING (token-budget sharding): assign each document to
    * a training sequence of ~`capacity` tokens. Deterministic and
    * shuffle-bounded: documents hash into `groups` independent packing
    * groups, are ordered by doc_id within the group, and get `seq_id =
    * floor(cum_tokens_before / capacity)` — streaming greedy packing
    * where a sequence may overflow by at most its last document (the
    * standard tolerance; an over-capacity document occupies its own
    * sequence). Content-hash grouping (md5, not xxhash) keeps the
    * assignment replicable by any engine. The running sum is
    * [[graft.engine.GlobalRank.withGroupedCumSumBefore]] — ranged
    * partitions sorted in parallel plus broadcast prefix offsets — so
    * a group is NOT a parallelism bound: even `groups = 1` at 100 TB
    * plans with no single-partition sort.
    */
  def packSequences(docs: DataFrame, capacity: Long = 256, groups: Int = 8): DataFrame =
    packCounts(
      docs.select(col("doc_id"), sketch.tokenCount(col("text")).cast("long").as("n_tokens")),
      capacity, groups)
      .select("doc_id", "grp", "seq_id", "n_tokens") // stable public column order

  /** The packing stage itself, over precomputed (doc_id, n_tokens [,
    * carry-through columns]) rows — lets a pipeline that already counted
    * tokens (e.g. [[tokenBudget]]'s output) pack without re-reading doc
    * text. Appends `grp` and `seq_id`, keeps every input column.
    */
  def packCounts(counts: DataFrame, capacity: Long = 256, groups: Int = 8): DataFrame = {
    require(capacity > 0 && groups > 0, "positive capacity/groups")
    val grp = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long"),
      lit(groups.toLong)).cast("int")
    val cum = GlobalRank.withGroupedCumSumBefore(
      counts.withColumn("grp", grp),
      groupCols = Seq("grp"),
      sortCols = Seq(col("doc_id")),
      valueCol = col("n_tokens"),
      outCol = "__cum_before")
      // `div`, not `/`: integer division keeps the id exact int64 on
      // any engine (Spark `/` on longs is double division)
      .withColumn("seq_id", expr(s"__cum_before div ${capacity}L"))
    // restore the caller's column order (the offset join floats the
    // group key to the front)
    cum.select((counts.columns :+ "grp" :+ "seq_id").map(col): _*)
  }

  def packSequencesQuery(spark: SparkSession, dir: String): DataFrame =
    packSequences(Tables.documents(spark, dir)).orderBy("doc_id")

  /** PACKING EFFICIENCY (round 17) — per packing group of
    * [[packSequences]]: sequences produced, documents and tokens
    * packed, and the group's fill rate against `capacity` in basis
    * points. Packing efficiency IS the pretraining cost model — a
    * fill of 8000 bp means one GPU-hour in five computes padding — and
    * the per-group view catches hash-skewed groups before a training
    * run does.
    *
    * Scale shape: [[packSequences]]' own shuffle (ranged cum-sum, no
    * single-partition sort) plus a groups-sized rollup; `n_seqs` is
    * `max(seq_id)+1` because seq ids are dense from 0 within a group
    * by construction.
    */
  def packEfficiency(spark: SparkSession, dir: String,
      capacity: Long = 256, groups: Int = 8): DataFrame =
    packSequences(Tables.documents(spark, dir), capacity, groups)
      .groupBy(col("grp").cast("long").as("grp"))
      .agg(
        (max(col("seq_id")) + 1L).as("n_seqs"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
      .withColumn("fill_bp", expr(s"(10000 * total_tokens) DIV (n_seqs * ${capacity}L)"))
      .orderBy("grp")

  /** QUALITY PROFILE BY SOURCE (round 17) — the [[textQuality]]
    * per-document signals rolled up to the mix-design grain: per
    * source, document/char/token mass plus punctuation, uppercase and
    * stopword totals, with integer-bp ratios. Sources are bought,
    * weighted, and cut at THIS grain — per-doc scores gate documents,
    * this table gates sources (a crawl whose stopword rate sits far
    * from the corpus band is machine-generated or non-target-language
    * long before per-doc filters see it).
    *
    * Scale shape: one corpus pass (all five counting kernels fused in
    * one narrow projection), map-side-combined rollup to sources rows;
    * ratios are single divisions of exact longs.
    */
  def qualityBySource(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("source"),
        length(col("text")).cast("long").as("__c"),
        text.tokenCount(col("text")).cast("long").as("__t"),
        text.punctCount(col("text")).cast("long").as("__p"),
        text.upperCount(col("text")).cast("long").as("__u"),
        text.stopwordCount(col("text")).cast("long").as("__s"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__c")).as("n_chars"),
        sum(col("__t")).as("n_tokens"),
        sum(col("__p")).as("punct_n"),
        sum(col("__u")).as("upper_n"),
        sum(col("__s")).as("stop_n"))
      .withColumn("stop_bp", expr("(10000 * stop_n) DIV n_tokens"))
      .withColumn("punct_bp", expr("(10000 * punct_n) DIV n_chars"))
      .orderBy("source")

  /** WORD-LENGTH HISTOGRAM (round 18) — whitespace tokens bucketed by
    * character length, with token count and document reach per bucket:
    * the tokenizer-sizing chart (mean word length × fertility predicts
    * tokens-per-byte, the storage/compute planning constant) and a
    * blunt quality probe — anomalous mass at very long "words" is
    * unsegmented markup/URLs/DNA-of-the-web that the quality gates
    * should have caught, surfaced here corpus-wide in one number per
    * bucket.
    *
    * Scale shape: one corpus text pass (the shared trim/split
    * tokenization every n-gram operator uses), token-exploded into a
    * ≤max-word-length-keyed map-side-combined rollup; the doc-reach
    * distinct collapses on (wlen, doc_id) inside the same exchange.
    */
  def wordLenHist(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy(length(col("tok")).cast("long").as("wlen"))
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("wlen")

  /** VOCABULARY DRIFT (round 17) — the [[graft.operators.Similarity]]
    * `embed_drift` report for TEXT: for the corpus's top-`topK` terms,
    * frequency in the first id half vs the second, and the second
    * half's share in basis points. A head term collapsing (or
    * erupting) between halves is how topic drift, crawler breakage and
    * template churn show up FIRST — before any distribution test: the
    * head carries most of the mass, so drift there moves every
    * downstream statistic.
    *
    * Scale shape: one corpus scan into a term-keyed conditional-sum
    * aggregate (map-side combined — the vocabulary exchange every
    * vocab_* query pays); the head cut is a bounded
    * TakeOrderedAndProject (total order: freq desc, term asc — never a
    * single-partition window); the split point is one broadcast
    * scalar.
    */
  def vocabDrift(spark: SparkSession, dir: String, topK: Int = 50): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // coalesce: an empty corpus aggregates max() to null — return the
    // honest empty frame instead of an NPE (same guard as ivfCellStats)
    val split = docs.agg(coalesce(expr("max(doc_id) div 2"), lit(0L)).cast("long"))
      .head().getLong(0)
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(text.tokens(col("text"))).as("term"))
      .groupBy("term")
      .agg(
        sum(when(col("doc_id") < split, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("doc_id") >= split, 1L).otherwise(0L)).as("n_second"))
      .withColumn("freq", col("n_first") + col("n_second"))
      .withColumn("second_share_bp", expr("(10000 * n_second) DIV freq"))
      .orderBy(desc("freq"), asc("term"))
      .limit(topK)
  }

  /** Balanced source MIX: every source contributes exactly the size of
    * the smallest source, members chosen by content-hash rank — the
    * "equal mixing weights" training-mix primitive as a deterministic,
    * RNG-free filter (stratifiedSample covers proportional weights;
    * this covers exact per-source quotas). Scale shape: a per-source
    * rank window would sort each source in ONE task, so instead this is
    * a [[graft.engine.GlobalRank.rowsAtRanks]] boundary-hash lookup —
    * per-source counts (one tiny row per source) place each source's
    * quota boundary at a global rank in the (source, __h, doc_id) total
    * order, the point lookup sorts ONLY the partitions holding a
    * boundary, and one shuffle-free broadcast-filter pass keeps rows at
    * or below their source's boundary key. Driver state: one (count)
    * row per source and one boundary row per source.
    */
  def mixSources(docs: DataFrame): DataFrame = {
    val counts = sourceCounts(docs)
    if (counts.isEmpty) return docs.select("doc_id", "source").limit(0)
    val target = counts.map(_._2).min
    takeBySourceQuota(docs, counts, _ => target)
  }

  /** One tiny row per source. */
  private def sourceCounts(docs: DataFrame): Seq[(String, Long)] =
    // sources are an enum dimension — 4096 is the repo-wide cap
    // (Skew.requirePairwiseKeyBound's constant)
    graft.engine.DriverBudget.collect("TextAnalysis.sourceCounts", 4096L)(
      docs.groupBy(col("source")).agg(count(lit(1)).as("n")))
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** The per-source quota SELECTION kernel shared by [[mixSources]] and
    * [[mixTemperature]]: keep each source's first `quotaOf(source)` docs
    * in (content-hash, doc_id) order, located as a GlobalRank boundary
    * per source (sort only the partitions holding a boundary) followed
    * by one shuffle-free broadcast-filter pass. Quotas are clamped to
    * the source size; quota-0 sources drop entirely.
    */
  private def takeBySourceQuota(
      docs: DataFrame,
      counts: Seq[(String, Long)],
      quotaOf: String => Long
  ): DataFrame = {
    val d = docs.select(col("doc_id"), col("source"), md5(col("text")).as("__h"))
    // boundary rank of source s = rows of all sources BEFORE s in the
    // executors' range-partitioning order + quota(s); that order for
    // strings is unsigned UTF-8 bytes, hence utf8Lt (not compareTo)
    val sorted = counts.sortWith((a, b) => GlobalRank.utf8Lt(a._1, b._1))
    val offsets = sorted.scanLeft(0L)(_ + _._2).init
    val ranks = sorted.zip(offsets).flatMap { case ((s, n), off) =>
      val q = math.min(quotaOf(s), n)
      if (q >= 1L) Some(off + q) else None
    }
    if (ranks.isEmpty) return d.select("doc_id", "source").limit(0)
    val (bounds, _) = GlobalRank.rowsAtRanks(
      d, Seq(col("source"), col("__h"), col("doc_id")), _ => ranks)
    val bsel = bounds.select(
      col("source"), col("__h").as("__bh"), col("doc_id").as("__bid"))
    d.join(broadcast(bsel), Seq("source"))
      .filter(col("__h") < col("__bh") ||
        (col("__h") === col("__bh") && col("doc_id") <= col("__bid")))
      .select("doc_id", "source")
  }

  /** TEMPERATURE-weighted source mix: per-source quotas proportional to
    * n^alpha (the multinomial temperature resampling multilingual LM
    * training uses to upweight small sources — alpha in (0, 1] flattens
    * the source distribution, alpha = 1 is proportional). Quota math is
    * ENGINE-EXACT: each weight is the per-source-count sqrt/pow
    * quantized to integer milli-units (one IEEE-deterministic op per
    * source, no float accumulation), the normalizer is an integer sum,
    * and quota = totalTarget * w / W in int64 division — so an oracle
    * computing the identical expressions lands on identical quotas (a
    * float normalizer would make near-tie quotas a summation-order
    * lottery). Selection is the [[takeBySourceQuota]] boundary cut.
    * Driver state: one row per source.
    */
  def mixTemperature(docs: DataFrame, alpha: Double, totalTarget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0, 1], got $alpha")
    require(totalTarget >= 0, s"totalTarget >= 0, got $totalTarget")
    val counts = sourceCounts(docs)
    if (counts.isEmpty) return docs.select("doc_id", "source").limit(0)
    // alpha = 0.5 pins to sqrt (IEEE-exact, bit-reproducible in any
    // engine); Math.pow's last-ulp freedom is fine for in-engine use
    // but an oracle twin should stick to 0.5 or 1.0
    def w(n: Long): Long = {
      val x = if (alpha == 0.5) math.sqrt(n.toDouble)
              else if (alpha == 1.0) n.toDouble
              else math.pow(n.toDouble, alpha)
      math.floor(x * 1000 + 0.5).toLong
    }
    val weights = counts.map { case (s, n) => s -> w(n) }.toMap
    val totalW = weights.values.sum
    val quota = counts.map { case (s, _) =>
      // BigInt product: totalTarget (up to ~1e12 docs/tokens) times a
      // milli-quantized weight (~1e9 for petascale sources) overflows
      // Long; the quotient is always <= totalTarget, so it fits
      s -> (if (totalW == 0) 0L
            else (BigInt(totalTarget) * weights(s) / totalW).toLong)
    }.toMap
    takeBySourceQuota(docs, counts, quota)
  }

  /** Driver query: sqrt-temperature mix (alpha 0.5, 100-doc target)
    * over the SKEWED stratified sample (src0-2 at 75%, the rest at 25%)
    * — the corpus's raw source counts are uniform, which would make the
    * temperature reweighting a no-op; over the skewed subset the sqrt
    * flattening visibly narrows the big-source/small-source quota gap
    * versus proportional.
    */
  def mixTemperatureQuery(spark: SparkSession, dir: String): DataFrame =
    mixTemperature(
      stratifiedSample(
        Tables.documents(spark, dir),
        Map("src0" -> 49152, "src1" -> 49152, "src2" -> 49152),
        defaultThreshold = 16384),
      alpha = 0.5, totalTarget = 100)
      .orderBy("doc_id")

  def mixSourcesQuery(spark: SparkSession, dir: String): DataFrame =
    mixSources(Tables.documents(spark, dir)).orderBy("doc_id")

  /** Token-BUDGET selection: fill each source's token quota greedily in
    * content-hash order — the "give me 50B tokens of web, 10B of code"
    * primitive a training-mix config compiles down to. Deterministic
    * and RNG-free like [[stratifiedSample]], but the quota is measured
    * in TOKENS (what the training run actually consumes), not docs: a
    * doc is kept while the tokens admitted before it are under budget,
    * so a sequence may overflow by at most its last document (the
    * [[packSequences]] tolerance). The running token sum is the
    * [[graft.engine.GlobalRank.withGroupedCumSumBefore]] ranged shape
    * (the output contract includes `cum_before` for every kept row, so
    * a pure boundary lookup could not skip the prefix-sum pass anyway)
    * — no per-source single-partition sort at any scale.
    */
  def tokenBudget(
      docs: DataFrame,
      budgets: Map[String, Long],
      defaultBudget: Long
  ): DataFrame =
    // null text admits as a zero-token doc (coalesce BEFORE hash and
    // count: a null __h would sort NULLS FIRST here but NULLS LAST in
    // an ASC DuckDB window — the one divergence class the oracle rules
    // can't see until a null row lands on a budget boundary)
    budgetOver(
      docs.select(
        col("doc_id"), col("source"),
        sketch.tokenCount(coalesce(col("text"), lit(""))).cast("long").as("n_tokens"),
        md5(coalesce(col("text"), lit(""))).as("__h")),
      budgets, defaultBudget)

  /** The budget stage itself, over precomputed (doc_id, source,
    * n_tokens, __h) rows — a pipeline that already tokenized and hashed
    * ([[graft.operators.Curation.mixPipeline]]'s gate scan) must not
    * pay those kernels again, and must not carry doc text into this
    * stage's shuffle just to re-derive them.
    */
  def budgetOver(
      d: DataFrame,
      budgets: Map[String, Long],
      defaultBudget: Long
  ): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0), "budgets must be >= 0")
    val b = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (s, t)) => when(col("source") === s, lit(t)).otherwise(acc)
    }
    GlobalRank.withGroupedCumSumBefore(
        d,
        groupCols = Seq("source"),
        sortCols = Seq(col("__h"), col("doc_id")),
        valueCol = col("n_tokens"),
        outCol = "cum_before")
      .filter(col("cum_before") < b)
      .select("doc_id", "source", "n_tokens", "cum_before")
  }

  def tokenBudgetQuery(spark: SparkSession, dir: String): DataFrame =
    tokenBudget(
      Tables.documents(spark, dir),
      Map("src0" -> 4000L, "src1" -> 1000L),
      defaultBudget = 2000L
    ).orderBy("doc_id")

  /** Readability scoring: the Flesch reading-ease heuristic over
    * whitespace tokens, punctuation-run sentences, and vowel-group
    * "syllables" — the classic one-pass quality signal a curation
    * config thresholds on. All three counts are integers from single
    * regex passes (no shuffle, scan-speed); the final score is one
    * fixed double expression tree over them, so the DuckDB twin lands
    * on identical bits (the q_anomaly determinism argument). Docs with
    * no tokens or no sentence terminator carry a null score rather
    * than a division blow-up.
    */
  def readability(docs: DataFrame): DataFrame = {
    val t = coalesce(col("text"), lit(""))
    docs
      .select(
        col("doc_id"),
        sketch.tokenCount(t).cast("long").as("n_tokens"),
        // regexp_count, not size(regexp_extract_all): counting must not
        // materialize every match string (bpeTokenCount precedent)
        regexp_count(t, lit("[.!?]+")).cast("long").as("n_sentences"),
        regexp_count(lower(t), lit("[aeiouy]+")).cast("long").as("n_syllables"))
      .withColumn(
        "flesch",
        when(
          col("n_tokens") > 0 && col("n_sentences") > 0,
          lit(206.835)
            - lit(1.015) * (col("n_tokens").cast("double") / col("n_sentences").cast("double"))
            - lit(84.6) * (col("n_syllables").cast("double") / col("n_tokens").cast("double"))))
  }

  def readabilityQuery(spark: SparkSession, dir: String): DataFrame =
    readability(Tables.documents(spark, dir)).orderBy("doc_id")

  /** GOPHER-rule quality signals (Rae et al. 2021, published
    * repetition/format heuristics) — the rule set web-scale curation
    * thresholds on before any model-based scoring: token-count bounds,
    * mean word length, symbol-to-word ratio (# and ellipsis), fraction
    * of lines that are bullets / end in ellipsis, fraction of tokens
    * with an alphabetic character, and presence of common English stop
    * words. One narrow projection — every count is a single regex or
    * HOF pass, ratios are fixed double expression trees over exact ints
    * (the q_anomaly determinism argument), no shuffle.
    *
    * Like text_pii, the driver query AUGMENTS the corpus with
    * deterministic doc_id-derived lines (the test corpus is
    * single-line), so the line-level rules classify real bullets and
    * ellipses rather than vacuous zeros.
    */
  def gopherQuality(
      docs: DataFrame,
      minStopHits: Int = 2,
      keep: Seq[(String, Column)] = Nil
  ): DataFrame = {
    val t = col("t")
    val nTok = col("n_tokens")
    val lines = expr("split(t, '\n')")
    // `keep` columns (computed against the INPUT row, e.g. more per-row
    // taggers) ride the same single projection — callers composing
    // several narrow taggers fuse them into one scan instead of
    // re-reading the corpus per tagger
    val gopherCols = Set("t", "doc_id", "n_tokens", "n_lines", "n_bullet_lines",
      "n_ellipsis_lines", "n_alpha_tokens", "n_symbols", "n_stop_hits",
      "mean_word_len", "symbol_ratio", "alpha_frac", "bullet_frac",
      "ellipsis_frac", "passes")
    keep.foreach { case (name, _) =>
      require(!gopherCols.contains(name), s"keep column '$name' shadows a gopher column")
    }
    val kept = keep.foldLeft(docs) { case (d, (name, c)) => d.withColumn(name, c) }
    kept
      .withColumn("t", coalesce(col("text"), lit("")))
      .withColumn("n_tokens", sketch.tokenCount(t).cast("long"))
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_bullet_lines",
        size(expr("filter(split(t, '\n'), l -> l LIKE '- %' OR l LIKE '* %')")).cast("long"))
      .withColumn("n_ellipsis_lines",
        size(expr("filter(split(t, '\n'), l -> l LIKE '%...')")).cast("long"))
      .withColumn("n_alpha_tokens",
        size(expr("filter(split(trim(t), '\\\\s+'), x -> x RLIKE '[A-Za-z]')")).cast("long"))
      .withColumn("n_symbols",
        (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\."))).cast("long"))
      .withColumn("n_stop_hits",
        Seq("the", "be", "to", "of", "and", "that", "have", "with")
          .map(wd => when(regexp_count(lower(t), lit(s"\\b$wd\\b")) > 0, 1L).otherwise(0L))
          .reduce(_ + _))
      .withColumn("mean_word_len",
        // non-whitespace chars / tokens — one regex strip, no token
        // array materialization
        when(nTok > 0,
          length(regexp_replace(t, "\\s", "")).cast("double") / nTok.cast("double")))
      .withColumn("symbol_ratio",
        when(nTok > 0, col("n_symbols").cast("double") / nTok.cast("double")))
      .withColumn("alpha_frac",
        when(nTok > 0, col("n_alpha_tokens").cast("double") / nTok.cast("double")))
      .withColumn("bullet_frac", col("n_bullet_lines").cast("double") / col("n_lines"))
      .withColumn("ellipsis_frac", col("n_ellipsis_lines").cast("double") / col("n_lines"))
      .withColumn("passes",
        nTok.between(20, 120) &&
          col("mean_word_len").between(2.0, 12.0) &&
          col("symbol_ratio") < 0.1 &&
          col("alpha_frac") > 0.7 &&
          col("n_stop_hits") >= minStopHits &&
          col("bullet_frac") < 0.9 &&
          col("ellipsis_frac") < 0.3)
      .select((Seq("doc_id", "n_tokens", "n_lines", "n_bullet_lines", "n_ellipsis_lines",
        "n_alpha_tokens", "n_symbols", "n_stop_hits", "mean_word_len", "symbol_ratio",
        "alpha_frac", "bullet_frac", "ellipsis_frac", "passes") ++ keep.map(_._1))
        .map(col): _*)
  }

  /** Driver query: Gopher rules over the corpus, each doc extended with
    * two deterministic doc_id-derived lines (a bullet every 3rd doc, an
    * ellipsis ending every 4th) so the line rules see both outcomes.
    * minStopHits = 1 because the synthetic keyword-soup corpus carries
    * only "the"/"a" from the published stop list (max observed hits =
    * 1) — at the published 2 every doc fails and `passes` is vacuous,
    * the silent-pass-through trap the verify recipe warns about.
    */
  def gopherQuery(spark: SparkSession, dir: String): DataFrame =
    gopherQuality(
      Tables.documents(spark, dir).withColumn(
        "text",
        concat(
          coalesce(col("text"), lit("")), lit("\n"),
          when(col("doc_id") % 3 === 0, lit("- bullet item")).otherwise(lit("plain line")),
          lit("\n"),
          when(col("doc_id") % 4 === 0, lit("trailing thought..."))
            .otherwise(lit("closing line")))),
      minStopHits = 1
    ).orderBy("doc_id")

  /** Overlapping token-window chunking — the training-prep primitive
    * that turns variable-length documents into ~`chunkTokens`-token
    * model inputs with `chunkTokens - stride` tokens of overlap (the
    * sliding-window convention long-context pretraining and RAG
    * indexing both use). Chunk starts are `0, stride, 2*stride, …`;
    * a chunk is kept iff it contributes at least one token beyond the
    * previous chunk's end (`(i-1)*stride + chunkTokens < n_tokens`),
    * which drops tail windows wholly contained in their predecessor —
    * the kept set is therefore a gap-free prefix `0..k` and `chunk_id`
    * needs no re-ranking. Entirely narrow: tokenize + `sequence` +
    * `explode` + `slice` per row, no shuffle, no window — at 100 TB
    * this is scan-speed and the output partitioning inherits the
    * input's. Token arithmetic is exact integers, so the DuckDB twin
    * (list_slice over the same tokenizer) is hash-identical.
    */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 32, stride: Int = 24): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens >= 1, got $chunkTokens")
    require(stride >= 1 && stride <= chunkTokens,
      s"stride in [1, chunkTokens], got $stride")
    val reserved = Seq("__t", "__n", "__i")
    reserved.foreach(c => require(!docs.columns.contains(c), s"reserved column $c"))
    docs
      .select(col("doc_id"), text.tokens(col("text")).as("__t"))
      .select(col("doc_id"), col("__t"), size(col("__t")).as("__n"))
      .filter(col("__n") > 0)
      .select(col("doc_id"), col("__t"), col("__n"),
        explode(sequence(lit(0L), floor((col("__n") - 1) / stride))).as("__i"))
      .filter(col("__i") === 0 ||
        (col("__i") - 1) * stride + chunkTokens < col("__n"))
      .select(
        col("doc_id"),
        col("__i").cast("long").as("chunk_id"),
        (col("__i") * stride).cast("long").as("start_tok"),
        least(lit(chunkTokens), col("__n") - col("__i") * stride)
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("__t"), col("__i") * stride + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  def chunkDocumentsQuery(spark: SparkSession, dir: String): DataFrame =
    chunkDocuments(Tables.documents(spark, dir), chunkTokens = 32, stride = 24)
      .orderBy("doc_id", "chunk_id")

  /** Corpus-trained bigram-LM scoring — the CCNet-shape quality signal
    * (score each document under a language model and threshold on the
    * per-token negative log-likelihood; low = looks like the corpus,
    * high = boilerplate/keyword-soup outlier). The model here is the
    * corpus's OWN add-one-smoothed bigram LM, so the operator is fully
    * self-contained: P(v|u) = (c(uv)+1) / (c(u·)+V) with c(u·) the
    * bigram-context count and V the corpus unigram vocabulary size.
    *
    * ENGINE-EXACT determinism: a float sum over a document's bigrams
    * would be a summation-order lottery across engines, so each term
    * ln(P) is quantized ONCE to an integer in 1e-4-nat units
    * (`floor(ln(p)*1e4 + 0.5)`) and the per-doc reduction is an exact
    * BIGINT sum — associative, order-free. The only cross-engine float
    * ops are one exactly-rounded division and one `ln` per DISTINCT
    * bigram (last-ulp `ln` divergence would need ln(p)*1e4 within
    * ~1e-11 of an integer to flip a quantum — the same accepted-risk
    * class as the ~2^-64 hash-collision contract). `mean_nll_q` is one
    * exact-int / exact-int double division, bit-identical everywhere.
    *
    * 100 TB shape: per-doc bigram multiplicities (a map-side-combined
    * shuffle keyed (doc_id, bigram) — evenly spread, hot bigrams
    * collapse per-partition before the exchange), the model built FROM
    * those rows (bigram totals + context totals: aggregations over
    * model-sized, not corpus-sized, output; V is a 1-row scalar
    * broadcast via crossJoin), scoring as a shuffle join keyed on the
    * bigram (both sides high-cardinality; a genuinely hot bigram key is
    * AQE-skew-splittable, which is why the model is NOT derived by
    * per-key window totals — a window partition cannot be split, so a
    * stopword bigram would serialize into one straggler task), then one
    * exact-int sum keyed doc_id. No window over corpus-scale keys, no
    * collect, no all-pairs anything. NOTHING persists and no eager
    * action runs: the bigram subtree is recomputed by its consumers —
    * up to three narrow scan+explode+partial-agg passes, the price of
    * keeping corpus-sized state out of executor caches (measured
    * cheaper than the r11 persist+eager-handoff at bench SF, and the
    * scan is the cheap stage at any SF). Docs with fewer than 2 tokens
    * have no bigrams and are absent from the output by construction.
    */
  def perplexity(docs: DataFrame): DataFrame = {
    val docBg = docs
      .select(col("doc_id"), explode(text.shingles(col("text"), 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("m"))
    val bgTotals = docBg.groupBy(col("bg")).agg(sum(col("m")).as("cbg"))
    docBg
      .join(modelFromCounts(bgTotals, vocabOf(docs)), Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("m")).as("n_bigrams"),
        (-sum(col("m") * col("lnp_q"))).as("nll_q"))
      .withColumn("mean_nll_q",
        col("nll_q").cast("double") / col("n_bigrams").cast("double"))
  }

  /** Corpus vocabulary size as a 1-row frame (broadcast scalar). */
  private def vocabOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(text.tokens(col("text"))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))

  /** The ONE copy of the add-one-smoothed quantized lnP formula, shared
    * by self-scoring ([[perplexity]]) and frozen-model scoring
    * ([[perplexityModel]]) — and mirrored by the DuckDB oracles.
    */
  private def lnpQ(cbg: Column, cu: Column, v: Column): Column =
    floor(log((cbg + 1).cast("double") / (cu + v).cast("double")) * 10000.0 + 0.5)
      .cast("long")

  /** Quantized model table from bigram totals (see [[lnpQ]]). */
  private def modelFromCounts(bgTotals: DataFrame, vocab: DataFrame): DataFrame = {
    val ctxTotals = bgTotals
      .groupBy(substring_index(col("bg"), " ", 1).as("u"))
      .agg(sum(col("cbg")).as("cu"))
    bgTotals
      .withColumn("u", substring_index(col("bg"), " ", 1))
      .join(ctxTotals, Seq("u"))
      .crossJoin(broadcast(vocab))
      .withColumn("lnp_q", lnpQ(col("cbg"), col("cu"), col("v")))
      .select("bg", "lnp_q")
  }

  def perplexityQuery(spark: SparkSession, dir: String): DataFrame =
    perplexity(Tables.documents(spark, dir)).orderBy("doc_id")

  /** Per-occurrence bigram rows — entirely narrow, so a STREAMING
    * DataFrame flows through unchanged (the only aggregation in the
    * scoring path is [[perplexityWith]]'s final per-doc sum).
    */
  private def bigramOccurrences(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(text.shingles(col("text"), 2)).as("bg"))

  /** The frozen (bigram -> quantized ln P) model table from a REFERENCE
    * corpus — the real CCNet deployment shape: the LM is trained on a
    * trusted corpus once, then dirty corpora are scored against it
    * (self-scoring, [[perplexity]], is the special case ref = docs).
    * Model-sized work throughout; persist/bucket the result to reuse
    * across scoring runs.
    */
  def perplexityModel(ref: DataFrame): DataFrame =
    modelFromCounts(
      bigramOccurrences(ref).groupBy(col("bg")).agg(count(lit(1)).as("cbg")),
      vocabOf(ref))

  /** Score documents against a FROZEN [[perplexityModel]] table. Unseen
    * bigrams are not guessed at: they are COUNTED (`n_oov`) and the NLL
    * covers known bigrams only, so callers threshold on the OOV
    * fraction and the known-bigram mean separately — no arbitrary OOV
    * penalty constant to diverge on. All-OOV docs score null, never a
    * fake 0. The join is left-keyed on the bigram (shuffle at corpus
    * scale, broadcast when the model is small enough — AQE's call);
    * because everything upstream of the final per-doc sum is narrow,
    * `docs` may be a STREAMING DataFrame joined stream-static against
    * the model (asserted in StreamingSpec).
    */
  def perplexityWith(docs: DataFrame, model: DataFrame): DataFrame =
    bigramOccurrences(docs)
      .join(model, Seq("bg"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        (count(lit(1)) - count(col("lnp_q"))).as("n_oov"),
        (-sum(col("lnp_q"))).as("nll_q"))
      .withColumn("mean_nll_q",
        when(col("n_bigrams") > col("n_oov"),
          col("nll_q").cast("double") /
            (col("n_bigrams") - col("n_oov")).cast("double")))

  /** Driver query: cross-corpus scoring — model from docs 0..24, scores
    * for the rest (the contamination split convention, which keeps the
    * model side non-empty at every test SF). OOV bigrams genuinely
    * occur: the split shares vocabulary but not all bigrams.
    */
  def perplexityRefQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    perplexityWith(
      docs.filter(col("doc_id") >= 25),
      perplexityModel(docs.filter(col("doc_id") < 25)))
      .orderBy("doc_id")
  }

  /** Markup stripping — the format-normalization pass that runs before
    * any quality scoring on web/wiki-shaped corpora: HTML tags drop,
    * markdown links keep their anchor text, emphasis markers and ATX
    * headers unwrap, code fences drop. A fixed regexp_replace chain in
    * one narrow projection (no shuffle, scan-speed at any size). The
    * pattern subset is deliberately RE2-safe — character classes and
    * counted quantifiers only, no alternation or lookaround — so Java
    * regex (engine) and RE2 (DuckDB oracle) produce identical rewrites;
    * replacement backreferences are `$1` here and `\1` there, same
    * semantics. `n_stripped` (chars removed) doubles as the
    * "how markup-heavy was this doc" signal curation thresholds on.
    */
  def stripMarkup(docs: DataFrame): DataFrame = {
    val t0 = coalesce(col("text"), lit(""))
    val noTags = regexp_replace(t0, "<[^>]+>", "")
    val noLinks = regexp_replace(noTags, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noFence = regexp_replace(noLinks, "```", "")
    val noEmph = regexp_replace(noFence, "\\*{1,2}([^*]+)\\*{1,2}", "$1")
    val clean = regexp_replace(noEmph, "(?m)^#{1,6} +", "")
    docs.select(
      col("doc_id"),
      clean.as("clean_text"),
      (length(t0) - length(clean)).cast("long").as("n_stripped"))
  }

  /** Driver query: the corpus carries no markup, so docs are wrapped
    * with deterministic doc_id-derived markup (the text_pii/text_gopher
    * augmentation convention) — a third each get HTML+bold, markdown
    * link+header, or none, so both the strip and the no-op paths are
    * exercised and `n_stripped` genuinely splits the corpus.
    */
  def stripMarkupQuery(spark: SparkSession, dir: String): DataFrame =
    stripMarkup(
      Tables.documents(spark, dir).withColumn(
        "text",
        when(col("doc_id") % 3 === 0,
          concat(lit("<div class=\"doc\"># header-after-tag-strip "), coalesce(col("text"), lit("")),
            lit(" **closing** words</div>")))
          .when(col("doc_id") % 3 === 1,
            concat(lit("# Title\n[see this](http://example.com/x) "),
              coalesce(col("text"), lit("")), lit(" ```code``` tail")))
          .otherwise(col("text"))))
      .orderBy("doc_id")

  /** Character-distribution Shannon entropy per document — the
    * gibberish/encoded-blob detector (base64 walls and binary spill
    * score near the uniform-distribution ceiling; single-char runs and
    * whitespace padding score near zero; natural text sits in a narrow
    * band between). Same exactness contract as [[perplexity]]: each
    * char's ln(p) is quantized once to a 1e-4-nat integer and the
    * per-doc reduction is an exact integer sum, so the score is
    * independent of evaluation order and engine.
    *
    * 100 TB shape: entirely narrow — chars never explode into rows, so
    * nothing shuffles (a (doc_id, char)-row formulation would shuffle
    * one row PER CHARACTER of the corpus: 100 TB of shuffle). The
    * default path is the fused single-pass codegen kernel
    * [[graft.functions.CharEntropyQ]] (O(length) histogram); the
    * composed-HOF twin (`kernel = false`) is the executable spec it is
    * property-tested against — interpreted and O(distinct x length)
    * with a filtered-array allocation per distinct char, it measured
    * 8.7 s vs sub-second at sf0.1.
    */
  def textEntropy(docs: DataFrame, kernel: Boolean = true): DataFrame = {
    require(!docs.columns.contains("__c"), "reserved column __c")
    val SCALE = 10000.0
    val base =
      if (kernel)
        docs
          .filter(length(col("text")) > 0)
          .select(
            col("doc_id"),
            length(col("text")).cast("long").as("n_chars"),
            sketch.charEntropyQ(col("text")).as("ent_q"))
      else
        docs
          .filter(length(col("text")) > 0)
          .withColumn("__c", split(col("text"), ""))
          .select(
            col("doc_id"),
            size(col("__c")).cast("long").as("n_chars"),
            (-aggregate(
              transform(array_distinct(col("__c")), d => {
                val cnt = size(filter(col("__c"), x => x === d)).cast("long")
                cnt * floor(
                  log(cnt.cast("double") / size(col("__c")).cast("double")) * SCALE +
                    lit(0.5)).cast("long")
              }),
              lit(0L),
              (acc, x) => acc + x)).as("ent_q"))
    base.withColumn("mean_ent_q",
      col("ent_q").cast("double") / col("n_chars").cast("double"))
  }

  def textEntropyQuery(spark: SparkSession, dir: String): DataFrame =
    textEntropy(Tables.documents(spark, dir)).orderBy("doc_id")

  /** Per-source corpus statistics — the dataset-card rollup every
    * published corpus ships (docs, token totals/extremes, language
    * spread per source). One map-side-combined aggregation keyed by
    * source: the token counting rides the narrow scan projection, so
    * the shuffle carries |sources| partial rows per task, not data.
    * `mean_tokens` is exact-int / exact-int in one double division —
    * bit-identical across engines.
    */
  def corpusStats(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("lang"),
        sketch.tokenCount(coalesce(col("text"), lit(""))).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"),
        min(col("nt")).as("min_tokens"),
        max(col("nt")).as("max_tokens"),
        countDistinct(col("lang")).as("n_langs"))
      .withColumn("mean_tokens",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))

  def corpusStatsQuery(spark: SparkSession, dir: String): DataFrame =
    corpusStats(Tables.documents(spark, dir)).orderBy("source")

  /** The MERGEABLE PARTIAL of [[corpusStats]] — counts, token
    * sums/extremes and the language SET per source (the set, not its
    * size: `countDistinct` is the one non-algebraic cell in the
    * rollup, so the partial carries what union-merges). A standing
    * corpus publishes this once; every refresh merges it with the new
    * batch's partial instead of rescanning — the incremental-tier
    * pattern (dedup_incremental, cdc_incremental) applied to
    * reporting.
    */
  def corpusStatsPartial(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("lang"),
        sketch.tokenCount(coalesce(col("text"), lit(""))).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"),
        min(col("nt")).as("min_tokens"),
        max(col("nt")).as("max_tokens"),
        collect_set(col("lang")).as("langs"))

  /** Merge any number of partials into the EXACT full-corpus rollup —
    * provably equal to [[corpusStats]] on the concatenated input
    * because every cell is algebraic: counts and sums add, extremes
    * take min/max, language sets union (sized only here, at the end),
    * and the mean is derived from merged exact integers in ONE double
    * division (the corpusStats determinism argument, unchanged).
    * Partials are |sources|-sized — the merge is broadcast-scale work
    * regardless of corpus size.
    */
  def corpusStatsMerge(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(col("source"))
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"),
        min(col("min_tokens")).as("min_tokens"),
        max(col("max_tokens")).as("max_tokens"),
        size(array_distinct(flatten(collect_list(col("langs")))))
          .cast("long").as("n_langs"))
      .withColumn("mean_tokens",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))
      .select("source", "n_docs", "total_tokens", "min_tokens",
        "max_tokens", "n_langs", "mean_tokens")

  /** Driver query: the standing/batch halves (the incremental-family
    * midpoint cut) rolled up independently and MERGED — pinned
    * bit-identical to the full recompute by sharing corpus_stats'
    * oracle verbatim (the ann_pq_joined precedent: same contract,
    * different physical path).
    */
  def corpusStatsMergeQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    corpusStatsMerge(
      corpusStatsPartial(docs.filter(col("doc_id") < cut)),
      corpusStatsPartial(docs.filter(col("doc_id") >= cut)))
      .orderBy("source")
  }

  /** ROBUST LENGTH OUTLIERS — per-source median + MAD (median absolute
    * deviation) over `n_chars`, flagging docs more than `k`·MAD from
    * their source's median: the robust-statistics twin of a z-score
    * filter (mean/stddev are dragged by the very outliers being
    * hunted; median/MAD are not), and the standard truncation/
    * concatenation-artifact detector in corpus QA.
    *
    * Determinism: `n_chars` is integral and small, so every quantity —
    * the interpolated median (half-integer grid), the absolute
    * deviations, the MAD, and the `k·MAD` comparison — is EXACT in
    * double arithmetic (all values ≪ 2^52; interpolation at f=0.5 of
    * exact halves is exact). No ulp lottery, hence hash-stable across
    * engines — same argument as the integer-grid distances.
    *
    * Scale shape: two map-side-reduced percentile aggregations keyed
    * by source (|sources| groups) plus one broadcast-sized join back;
    * the doc table is scanned twice on a 3-column projection and never
    * shuffled (the per-source stats frames are the only exchanges).
    */
  /** The per-source (median, MAD) length profile — the MODEL side of
    * the robust outlier screen, separated so the streaming
    * [[graft.streaming.ProfileGate]] can broadcast a standing-corpus
    * profile into an ingest stream (the classifierGate pattern: one
    * definition, batch and stream share it).
    */
  def lengthProfile(docs: DataFrame): DataFrame = {
    val slim = docs.select(col("source"), col("n_chars"))
    val med = slim.groupBy("source")
      .agg(expr("percentile(n_chars, 0.5)").as("med_chars"))
    slim.join(broadcast(med), Seq("source"))
      .groupBy("source")
      .agg(max(col("med_chars")).as("med_chars"), // constant per group
        expr("percentile(abs(n_chars - med_chars), 0.5)").as("mad_chars"))
  }

  def lengthOutliers(docs: DataFrame, k: Double = 3.0): DataFrame =
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .join(broadcast(lengthProfile(docs)), Seq("source"))
      .withColumn("adev", abs(col("n_chars") - col("med_chars")))
      .filter(col("mad_chars") > 0 && col("adev") > lit(k) * col("mad_chars"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("med_chars"), col("mad_chars"))
      .orderBy("doc_id")

  def lengthOutliersQuery(spark: SparkSession, dir: String): DataFrame =
    lengthOutliers(Tables.documents(spark, dir))

  /** Winnowing fingerprint (rolling-hash k-grams, min-per-window —
    * SIGMOD'03). Output: per-doc fingerprint count + first fingerprint.
    * The gram hash is a Rabin-Karp polynomial mod 2^64, so the DuckDB
    * oracle replicates it with HUGEINT arithmetic (window minima are
    * hash-value sets — tie-index rules can't affect them); the ScalaTest
    * spec additionally asserts the winnowing guarantees.
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

  /** C4-style rule cleaning (Raffel et al. 2020, the published C4
    * heuristics) — the LINE-level counterpart to [[gopherQuality]]'s
    * document-level rules: a line survives iff it ends in terminal
    * punctuation and carries at least `minLineTokens` tokens; documents
    * containing "lorem ipsum" or a curly brace (the code/boilerplate
    * tells) are rejected outright; `passes` additionally requires at
    * least `minKeptLines` surviving lines and one sentence terminator.
    * `clean_fp` fingerprints the post-filter text (kept lines joined by
    * newline) so downstream consumers can verify the scrub without
    * shipping the text.
    *
    * One narrow projection per document — line split, two HOF filters,
    * three contains/regex probes, one md5 — no shuffle, scan speed at
    * any scale; the kept-lines array is bound once via the `transform
    * (array(...))` let-binding idiom (HOF lambdas don't CSE the outer
    * split, the trap [[graft.functions.text.shingles]] documents).
    */
  def c4Rules(
      docs: DataFrame,
      minLineTokens: Int = 5,
      minKeptLines: Int = 1
  ): DataFrame = {
    val t = col("t")
    // kept line := trimmed line ends in . ! ? or " AND has >= minLineTokens
    // whitespace tokens (C4 keeps only "terminal punctuation" lines and
    // drops short fragments)
    val keptLines = expr(
      s"""element_at(transform(array(split(t, '\n')), ls ->
         |  filter(ls, l -> trim(l) RLIKE '[.!?"]$$'
         |    AND size(split(trim(l), '\\\\s+')) >= $minLineTokens)), 1)""".stripMargin)
    docs
      .withColumn("t", coalesce(col("text"), lit("")))
      .withColumn("__kept", keptLines)
      .select(
        col("doc_id"),
        size(expr("split(t, '\n')")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept_lines"),
        regexp_count(t, lit("[.!?]")).cast("long").as("n_terminals"),
        lower(t).contains("lorem ipsum").as("has_lorem"),
        t.contains("{").as("has_brace"),
        md5(array_join(col("__kept"), "\n")).as("clean_fp"))
      .withColumn(
        "passes",
        col("n_kept_lines") >= minKeptLines && col("n_terminals") >= 1 &&
          !col("has_lorem") && !col("has_brace"))
  }

  /** Driver query: C4 rules over the corpus, each doc extended with
    * deterministic doc_id-derived lines (the single-line word-salad
    * corpus has no terminal punctuation) so every rule classifies both
    * outcomes: a kept sentence every 2nd doc, a short fragment line
    * always, a brace line every 5th, a lorem-ipsum line every 7th.
    */
  def c4RulesQuery(spark: SparkSession, dir: String): DataFrame =
    c4Rules(
      Tables.documents(spark, dir).withColumn(
        "text",
        concat(
          coalesce(col("text"), lit("")), lit("\n"),
          when(col("doc_id") % 2 === 0,
            lit("This added sentence ends with terminal punctuation."))
            .otherwise(lit("fragment without end")), lit("\n"),
          lit("Too short."),
          when(col("doc_id") % 5 === 0, lit("\nvar f = function() { return 1; }"))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit("\nLorem ipsum dolor sit amet."))
            .otherwise(lit(""))))
    ).orderBy("doc_id")

  /** DSIR-style importance resampling (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every candidate document by how much more likely its hashed-unigram
    * features are under a TARGET domain's distribution than under the
    * candidate pool's own, then keep the top-k. Features are md5-hashed
    * token buckets (`nBuckets`); both distributions get add-1 smoothing;
    * a document's log importance weight is the sum over token
    * OCCURRENCES of `ln p_target(b) - ln p_raw(b)`, quantized to int64
    * at 1e4 per bucket (the perplexity convention) so per-doc sums are
    * exact integer arithmetic and hash-match any engine.
    *
    * Dataflow at 100 TB: two narrow scans — a distribution pass whose
    * single `nBuckets`-key aggregation with map-side partials builds
    * BOTH distributions at once (conditional sums — target membership
    * is a column, not a separate scan), and a scoring pass over the
    * candidate stream. The bucket weight table (`nBuckets` rows —
    * bounded, driver-chosen) broadcasts onto the scoring pass; the
    * per-doc sum shuffles skinny (doc_id, weight) pairs; the final
    * top-k is a bounded TakeOrdered, never a full sort. Text never
    * shuffles, and re-scanning beats persisting the corpus-sized token
    * stream (the tfidf persist lesson).
    */
  def dsirSelect(
      docs: DataFrame,
      isTarget: Column,
      nBuckets: Int = 256,
      topK: Int = 100
  ): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 65536, s"nBuckets in [2, 65536], got $nBuckets")
    require(topK >= 1, s"topK >= 1, got $topK")
    val toks = docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), isTarget.as("__t"),
        explode(text.tokens(col("text"))).as("term"))
      // 16 bits of md5 then mod — uniform for any nBuckets <= 65536
      .select(col("doc_id"), col("__t"),
        pmod(conv(substring(md5(col("term")), 1, 4), 16, 10).cast("long"),
          lit(nBuckets.toLong)).as("b"))
    val dist = toks
      .groupBy("b")
      .agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("tc"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("rc"))
    // totals are an aggregate OVER THE BUCKET TABLE (nBuckets rows), not
    // a second corpus pass; broadcast back as a 1-row scalar
    val tot = dist.agg(
      sum(col("tc")).as("__tt"), sum(col("rc")).as("__rt"))
    val weights = dist
      .crossJoin(broadcast(tot))
      .select(col("b"),
        floor(
          (log((col("tc") + 1).cast("double") / (col("__tt") + nBuckets).cast("double"))
            - log((col("rc") + 1).cast("double") / (col("__rt") + nBuckets).cast("double")))
            * 10000 + 0.5).cast("long").as("lw_q"))
    val scored = toks
      .filter(!col("__t"))
      .join(broadcast(weights), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lw_q")).as("logw_q"))
    // rank over the topK rows only — bounded, driver-chosen: collect
    // and rank on the driver (the vocabCoverage pattern; no
    // partition-less WindowExec)
    val spark = docs.sparkSession
    val top = graft.engine.DriverBudget.collect("TextAnalysis.perplexityTop", topK.toLong)(
        scored
          .orderBy(desc("logw_q"), asc("doc_id"))
          .limit(topK)
          .select(col("doc_id"), col("n_tokens"), col("logw_q")))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, _, lw) => (-lw, id) }
    import spark.implicits._
    top.zipWithIndex
      .map { case ((id, nt, lw), i) => ((i + 1).toLong, id, nt, lw) }
      .toSeq.toDF("rank", "doc_id", "n_tokens", "logw_q")
  }

  /** Driver query: resample the non-src0 pool toward src0 as the target
    * domain, top-25.
    */
  def dsirSelectQuery(spark: SparkSession, dir: String): DataFrame =
    dsirSelect(Tables.documents(spark, dir), isTarget = col("source") === "src0",
      nBuckets = 256, topK = 25)
      .orderBy("rank")

  /** Tokenizer APPLICATION — encode every document against a top-K
    * frequency vocabulary (ids 1..K rarest-last, OOV -> 0), the step
    * between [[vocabCoverage]]'s sizing table and [[packSequences]]'s
    * sequence assembly. Per doc: token/OOV counts and a fingerprint of
    * the position-ordered id sequence, so an exported encode can be
    * verified without shipping the ids.
    *
    * Dataflow at 100 TB: the vocabulary is one map-side-combined
    * (term) aggregation cut to K rows by `TakeOrdered` (bounded,
    * driver-chosen) — the id-assignment window runs over those K rows
    * only. Encoding is a BROADCAST join of the (doc, pos, term) stream
    * against the K-row vocab; the re-assembly shuffle carries skinny
    * (doc_id, pos, id) triples with bounded-by-doc-length groups. Term
    * strings leave the plan at the broadcast join.
    */
  def vocabEncode(docs: DataFrame, vocabK: Int = 64): DataFrame = {
    require(vocabK >= 1, s"vocabK >= 1, got $vocabK")
    val toks = docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), posexplode(text.tokens(col("text"))).as(Seq("pos", "term")))
    // id assignment over the K vocab rows only — bounded, driver-chosen
    // (the vocabCoverage pattern): the K-row vocabulary is model state,
    // ranked on the driver and broadcast back, no partition-less window
    val spark = docs.sparkSession
    val vocabRows = graft.engine.DriverBudget.collect(
        "TextAnalysis.vocabEncodeVocab", vocabK.toLong)(
        toks
          .groupBy("term").agg(count(lit(1)).as("freq"))
          .orderBy(desc("freq"), asc("term"))
          .limit(vocabK))
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (term, freq) => (-freq, term) }
    import spark.implicits._
    val vocab = vocabRows.zipWithIndex
      .map { case ((term, _), i) => (term, (i + 1).toLong) }
      .toSeq.toDF("term", "id")
    toks
      .join(broadcast(vocab), Seq("term"), "left")
      .select(col("doc_id"), col("pos"), coalesce(col("id"), lit(0L)).as("id"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("id") === 0, 1L).otherwise(0L)).as("n_oov"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("id")))),
            s => s.getField("id").cast("string")), " ")).as("ids_fp"))
      .withColumn("oov_frac", col("n_oov").cast("double") / col("n_tokens"))
  }

  def vocabEncodeQuery(spark: SparkSession, dir: String): DataFrame =
    vocabEncode(Tables.documents(spark, dir), vocabK = 64).orderBy("doc_id")

  /** Snapshot DELTA audit — what changed between two corpus versions,
    * by CONTENT: per source, how many of the new snapshot's docs carry
    * text absent from the old one (added), how many carry text the old
    * snapshot already had (carried), and how many old docs' text
    * vanished (removed), with token totals for the added/removed sides.
    * The bookkeeping every incremental pipeline (ingest-dedup,
    * re-train triggers, asset invalidation) reads before touching the
    * heavy stages.
    *
    * Dataflow at 100 TB: both snapshots reduce to skinny (digest,
    * side, source, n_tokens) rows in one narrow scan each; membership
    * flags come from ONE digest-keyed aggregation with map-side
    * partials, joined back onto the same digest-partitioned stream
    * (AQE plans both exchanges on the same key — the dedup_lines
    * shape); the per-source rollup exchange carries sources-many rows.
    * Text never shuffles.
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def sided(d: DataFrame, isNew: Boolean) = d.select(
      col("source"), lit(isNew).as("__new"),
      md5(coalesce(col("text"), lit(""))).as("__h"),
      text.tokenCount(coalesce(col("text"), lit(""))).cast("long").as("__nt"))
    val rows = sided(oldDocs, isNew = false).unionByName(sided(newDocs, isNew = true))
    val membership = rows
      .groupBy("__h")
      .agg(
        max(when(!col("__new"), 1L).otherwise(0L)).as("__in_old"),
        max(when(col("__new"), 1L).otherwise(0L)).as("__in_new"))
    rows
      .join(membership, Seq("__h"))
      .groupBy("source")
      .agg(
        sum(when(col("__new") && col("__in_old") === 0, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("__new") && col("__in_old") === 1, 1L).otherwise(0L)).as("n_carried"),
        sum(when(!col("__new") && col("__in_new") === 0, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("__new") && col("__in_old") === 0, col("__nt")).otherwise(0L)).as("tokens_added"),
        sum(when(!col("__new") && col("__in_new") === 0, col("__nt")).otherwise(0L)).as("tokens_removed"))
  }

  /** Driver query: the dedup_incremental snapshot cut (old = below
    * half-max doc_id) against the rest as the new snapshot.
    */
  def corpusDiffQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    corpusDiff(docs.filter(col("doc_id") < cut), docs.filter(col("doc_id") >= cut))
      .orderBy("source")
  }
}
