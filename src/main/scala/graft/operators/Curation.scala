package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.text

/** The capstone pipeline: corpus curation for training data — what every
  * operator in this engine exists to compose into. One declarative plan:
  *
  *   quality gate -> language id -> exact dedup -> near-dup removal
  *
  * Dataflow at scale: the quality/langid stages are narrow per-row
  * expressions fused into the scan projection; exact dedup is one
  * shuffle on the content digest; near-dup removal is a pluggable pair
  * source — exact inverted-index n-gram join by default (oracle-
  * checkable end to end), MinHash LSH banding when the corpus outgrows
  * it — and drops the higher-id member of each verified pair.
  * Everything is deterministic, so retries and incremental re-runs
  * converge.
  */
object Curation {

  final case class Config(
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      requireKnownLang: Boolean = true,
      nearDupJaccard: Double = 0.8
  )

  /** Near-dup pair source: given (doc_id, text) and a Jaccard threshold,
    * return (id_a, id_b, jaccard) pairs at-or-above it. The default is
    * the EXACT inverted-index n-gram join ([[Dedup.ngramJaccardPairs]]),
    * which keeps the whole pipeline oracle-checkable; swap in
    * [[minhashNearDup]] when the corpus outgrows the exact join's
    * per-shingle candidate budget (probabilistic recall, same contract).
    */
  type NearDupPairs = (DataFrame, Double) => DataFrame

  val exactNearDup: NearDupPairs =
    (docs, t) => Dedup.ngramJaccardPairs(docs, k = 3, threshold = t)

  val minhashNearDup: NearDupPairs =
    (docs, t) => Dedup.minhashPairs(docs, threshold = t)

  /** Per-doc curation decision: the kept corpus plus a `drop_reason`
    * column ('kept', 'too_short', 'too_long', 'unknown_lang',
    * 'exact_dup', 'near_dup') — the observability a curation run needs
    * (what got dropped and why, per stage).
    */
  def curateWithReasons(
      docs: DataFrame,
      cfg: Config = Config(),
      nearDupPairs: NearDupPairs = exactNearDup
  ): DataFrame = {
    // The per-row analysis (tokenize + 5 langid regex passes + digest) is
    // the expensive narrow stage and every later branch re-reads it:
    // persist it spill-safely for the duration of the call (released by
    // the Caching.handoff at the end); at 100 TB this becomes a
    // materialized intermediate table instead of a cache.
    val analyzed = docs.select(
      col("doc_id"),
      col("text"),
      text.tokenCount(col("text")).as("n_tokens"),
      text.langId(col("text")).as("pred_lang"),
      md5(col("text")).as("__h")
    ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // stage 1+2: quality + language gates (narrow, fused)
    val gated = analyzed.withColumn(
      "drop_reason",
      // null text first: every later predicate is null on it and would
      // silently skip all gates (null `when` branches never fire)
      when(col("text").isNull || length(trim(col("text"))) === 0, "empty")
        .when(col("n_tokens") < cfg.minTokens, "too_short")
        .when(col("n_tokens") > cfg.maxTokens, "too_long")
        .when(lit(cfg.requireKnownLang) && col("pred_lang") === "unknown", "unknown_lang")
        .otherwise(lit(null).cast("string"))
    )
    val surviving = gated.filter(col("drop_reason").isNull)

    // stage 3: exact dedup — min doc_id per digest survives
    val keep = surviving.groupBy(col("__h")).agg(min(col("doc_id")).as("__keep"))
    val exactTagged = surviving
      .join(keep, Seq("__h"))
      .withColumn(
        "drop_reason",
        when(col("doc_id") =!= col("__keep"), "exact_dup").otherwise(col("drop_reason"))
      )
    val exactSurvivors = exactTagged.filter(col("drop_reason").isNull)

    // stage 4: near-dup removal — higher id of each verified pair drops
    val pairs = nearDupPairs(exactSurvivors.select(col("doc_id"), col("text")), cfg.nearDupJaccard)
      .select(col("id_b").as("doc_id"))
      .distinct()
    val nearTagged = exactTagged
      .join(pairs.withColumn("__near", lit(true)), Seq("doc_id"), "left")
      .withColumn(
        "drop_reason",
        when(col("drop_reason").isNull && col("__near"), "near_dup").otherwise(col("drop_reason"))
      )

    val tagged = gated.filter(col("drop_reason").isNotNull)
      .select(col("doc_id"), col("n_tokens"), col("pred_lang"), col("drop_reason"))
      .unionByName(
        nearTagged.select(
          col("doc_id"), col("n_tokens"), col("pred_lang"),
          coalesce(col("drop_reason"), lit("kept")).as("drop_reason")
        )
      )
    // the tagged output is the skinny 4-column decision table (no text
    // payload); cache it and release the wide analysis stage
    graft.engine.Caching.handoff(tagged, analyzed)
  }

  /** The kept corpus only. */
  def curate(docs: DataFrame, cfg: Config = Config()): DataFrame =
    curateWithReasons(docs, cfg).filter(col("drop_reason") === "kept")
      .drop("drop_reason")

  /** Driver-contract query: per-stage drop accounting, oracle-checked
    * end to end (every stage, including the exact near-dup join, has a
    * DuckDB twin).
    */
  def curateQuery(spark: SparkSession, dir: String): DataFrame = {
    // near-dup runs over the exact-dedup SURVIVORS, but reuses the
    // CORPUS-wide materialized ngram index ([[Dedup.corpusNgramIndex]],
    // shared with the standalone dedup_ngram query) semi-joined to the
    // survivor ids: the corpus-rarest-first order stays exact for any
    // subset — the prefix lemma needs only a consistent shingle order —
    // and the per-call shingling/df/sort stages disappear entirely.
    // Verified output is identical to self-computing over the subset.
    val amortizedNearDup: NearDupPairs =
      (docs, t) => Dedup.ngramJaccardPairsIndexed(
        Dedup.corpusNgramIndex(spark, dir, 3)
          .join(docs.select("doc_id"), Seq("doc_id"), "left_semi"), t)
    curateWithReasons(Tables.documents(spark, dir), nearDupPairs = amortizedNearDup)
      .groupBy("drop_reason")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("drop_reason")
  }

  /** The training-MIX compile pipeline — from raw corpus to packed
    * training sequences in one declarative plan:
    *
    *   token-range gate -> exact dedup -> per-source token budget ->
    *   sequence packing
    *
    * ([[curateQuery]] is the cleaning capstone; this is the mixing one.)
    * Every stage is an already-oracle-checked operator, and the
    * composition is oracle-checked END TO END, so a budget change or a
    * dedup fix can't silently shift downstream sequence assignment
    * without the hash catching it.
    *
    * Sequences are packed PER SOURCE in admission (content-hash) order —
    * the training-mixture shape where each source contributes its own
    * ~capacity-token sequence stream. That choice makes the whole
    * composition pay exactly ONE ranged exchange:
    * [[TextAnalysis.budgetOver]] admits precisely the PREFIX of each
    * source's (__h, doc_id)-ordered stream (`cum_before < budget`), so
    * the budget's running token sum IS the packing prefix sum of the
    * admitted stream, and `seq_id = cum_before div capacity` is a
    * narrow projection on rows the budget stage already ordered — no
    * second repartitionByRange, no re-sort, at any scale. Dataflow:
    * one narrow gate scan, one digest shuffle ([[Dedup.exact]]), one
    * ranged exchange shared by budget + packing; document text is gone
    * from the plan after the gate scan.
    */
  def mixPipeline(
      docs: DataFrame,
      budgets: Map[String, Long],
      defaultBudget: Long,
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      capacity: Long = 256
  ): DataFrame = {
    // ONE narrow gate scan computes every downstream column; doc TEXT
    // leaves the plan here — dedup keys on the digest (same equivalence
    // classes as hashing the text itself) and the budget stage consumes
    // the precomputed (n_tokens, __h) instead of re-running the kernels
    // post-shuffle
    // named __ch, not __h: Dedup.exact reserves __h internally and
    // would silently overwrite a caller column of that name
    val gate = docs
      .select(
        col("doc_id"), col("source"),
        graft.functions.sketch.tokenCount(coalesce(col("text"), lit("")))
          .cast("long").as("n_tokens"),
        md5(coalesce(col("text"), lit(""))).as("__ch"))
      .filter(col("n_tokens").between(minTokens, maxTokens))
    val ded = Dedup.exact(gate, Seq(col("__ch")), col("doc_id"))
    val bud = TextAnalysis.budgetOver(
      ded.withColumnRenamed("__ch", "__h"), budgets, defaultBudget)
    // `div`, not `/`: integer division keeps the id exact int64 on any
    // engine (Spark `/` on longs is double division)
    bud.select(
      col("doc_id"), col("source"),
      expr(s"cum_before div ${capacity}L").as("seq_id"), col("n_tokens"))
  }

  /** Driver query: the standard budgets over the test corpus.
    * minTokens = 12 sits INSIDE the corpus token range (10..99 at
    * sf0.01), so the gate genuinely drops documents and shifts the
    * downstream budget fill — a pass-through gate would leave the
    * composition indistinguishable from plain token_budget + packing.
    * (The corpus has no byte-identical docs, so the dedup stage's drop
    * path is exercised by CurationSpec instead.)
    */
  def mixQuery(spark: SparkSession, dir: String): DataFrame =
    mixPipeline(
      Tables.documents(spark, dir),
      Map("src0" -> 4000L, "src1" -> 1000L),
      defaultBudget = 2000L,
      minTokens = 12
    ).orderBy("doc_id")

  /** The PRE-TOKENIZE capstone — from raw corpus to packed, encoded
    * training sequences in one declarative plan:
    *
    *   token gate -> exact dedup -> top-K vocabulary -> id encoding ->
    *   per-source sequence packing
    *
    * ([[curateQuery]] cleans, [[mixQuery]] mixes; this is the step that
    * turns the result into model inputs.) Per surviving doc: its
    * sequence assignment plus the encoded-id fingerprint and OOV
    * stats — everything an export writer and its auditor need.
    *
    * Design choice, stated: the vocabulary counts the GATED corpus
    * (pre-dedup). Restricting counts to dedup survivors would force the
    * corpus-sized token stream through the survivor join before the
    * term aggregation; counting the gated stream keeps vocab build one
    * narrow scan + one vocab-sized exchange, and exact duplicates can
    * only inflate counts of terms that survive anyway (the oracle
    * mirrors the choice, so parity pins it).
    *
    * Dataflow at 100 TB: control stream = one narrow gate scan to
    * skinny (doc_id, source, n_tokens, digest) rows -> one digest
    * shuffle for dedup. Data stream = one token-explode scan ->
    * broadcast vocab join -> one (doc_id)-keyed encode aggregation.
    * The two streams meet AFTER both are per-doc-sized (skinny
    * equi-join on doc_id), and packing rides [[GlobalRank]]'s ranged
    * exchange. Text and terms never shuffle anywhere.
    */
  def pretokenizePipeline(
      docs: DataFrame,
      minTokens: Int = 10,
      vocabK: Int = 64,
      capacity: Long = 256
  ): DataFrame = {
    val gated = docs.filter(
      graft.functions.sketch.tokenCount(coalesce(col("text"), lit(""))) >= minTokens)
    val gate = gated
      .select(
        col("doc_id"), col("source"),
        graft.functions.sketch.tokenCount(coalesce(col("text"), lit("")))
          .cast("long").as("n_tokens"),
        md5(coalesce(col("text"), lit(""))).as("__ch"))
    val keep = gate.groupBy("__ch").agg(min(col("doc_id")).as("__keep"))
    val survivors = gate.join(keep, "__ch")
      .filter(col("doc_id") === col("__keep"))
      .select("doc_id", "source", "n_tokens", "__ch")
    val enc = TextAnalysis.vocabEncode(gated, vocabK)
      .select(col("doc_id"), col("n_oov"), col("ids_fp"))
    val kept = survivors.join(enc, Seq("doc_id"))
    graft.engine.GlobalRank.withGroupedCumSumBefore(
        kept.withColumnRenamed("__ch", "__h"),
        groupCols = Seq("source"),
        sortCols = Seq(col("__h"), col("doc_id")),
        valueCol = col("n_tokens"),
        outCol = "cum_before")
      .select(
        col("doc_id"), col("source"),
        expr(s"cum_before div ${capacity}L").as("seq_id"),
        col("n_tokens"), col("n_oov"), col("ids_fp"))
  }

  /** Driver query: minTokens = 12 (inside the corpus 10..99 token
    * range, so the gate genuinely drops docs and shifts vocab counts,
    * encoding, and packing — the mixQuery argument).
    */
  def pretokenizeQuery(spark: SparkSession, dir: String): DataFrame =
    pretokenizePipeline(Tables.documents(spark, dir),
      minTokens = 12, vocabK = 64, capacity = 256)
      .orderBy("doc_id")

  /** CURRICULUM ordering — the training-schedule compile step: emit a
    * deterministic easy-to-hard global order over the corpus. Hardness
    * is mean token length (chars per token — the cheap, fully
    * engine-replicable difficulty proxy; swap in perplexity via
    * [[docAnnotate]] when a model-based schedule is wanted), cut into
    * fixed driver-chosen buckets (data-INdependent thresholds — a
    * quantile-based cut would make yesterday's rank depend on today's
    * corpus), and the global order is (bucket, content-hash, doc_id):
    * easy docs first, uniformly shuffled WITHIN each bucket by the
    * same md5 convention every sampler in this engine uses.
    *
    * Dataflow at 100 TB: one narrow scan (length + token-count kernel
    * + md5 — text leaves the plan immediately), then
    * [[GlobalRank.withRowNumber]]'s ranged exchange: parallel
    * per-partition sorts plus broadcast prefix offsets, no
    * single-partition sort at any scale. A window `row_number()` over
    * the whole corpus — the naive formulation — would be exactly that
    * forbidden single-task sort.
    */
  def mixCurriculum(docs: DataFrame, cuts: Seq[Double] = Seq(4.5, 5.5)): DataFrame = {
    require(cuts.nonEmpty && cuts == cuts.sorted, s"cuts must be ascending, got $cuts")
    val scored = docs.select(
      col("doc_id"),
      length(coalesce(col("text"), lit(""))).cast("long").as("n_chars"),
      graft.functions.sketch.tokenCount(coalesce(col("text"), lit("")))
        .cast("long").as("n_tokens"),
      conv(substring(md5(coalesce(col("text"), lit(""))), 1, 15), 16, 10)
        .cast("long").as("__h"))
    // exact-int inputs -> one IEEE division: bit-identical on any engine
    val diff = when(col("n_tokens") > 0,
      col("n_chars").cast("double") / col("n_tokens")).otherwise(lit(0.0))
    val bucket = cuts.zipWithIndex.foldRight(lit(cuts.size).cast("long")) {
      case ((cut, i), acc) => when(col("difficulty") < cut, i.toLong).otherwise(acc)
    }
    val (ranked, _) = graft.engine.GlobalRank.withRowNumber(
      scored.withColumn("difficulty", diff).withColumn("bucket", bucket),
      Seq(col("bucket"), col("__h"), col("doc_id")),
      "curriculum_rank")
    ranked.select(col("doc_id"), col("bucket"), col("difficulty"), col("curriculum_rank"))
  }

  def curriculumQuery(spark: SparkSession, dir: String): DataFrame =
    mixCurriculum(Tables.documents(spark, dir)).orderBy("doc_id")

  /** Thresholds for [[docAnnotate]]'s `keep` verdict. `maxMeanNllQ` is
    * in [[TextAnalysis.perplexity]]'s 1e-4-nat units.
    */
  final case class AnnotateConfig(
      gopherMinStopHits: Int = 2,
      maxRep3Ratio: Double = 0.2,
      maxMeanNllQ: Double = 100000.0
  )

  /** Capstone #3: ATTRIBUTE TAGGING — annotate, don't filter. Each doc
    * gets every quality signal plus a `keep` verdict, and nothing is
    * dropped: the published large-corpus curation architecture (Dolma's
    * tagger/attribute split) keeps signals as per-doc attribute tables
    * so thresholds can be re-tuned without re-running the taggers.
    *
    * Dataflow: one narrow base projection (Gopher rules + langid + TTR
    * + the per-row repetition signals, fused into a single scan via
    * gopherQuality's keep seam), then ONE attribute table joined on
    * `doc_id` — bigram-LM perplexity (the one corpus-model join; it is
    * genuinely aggregate, so it cannot fuse). The joined side is
    * SKINNY (doc_id + a few numeric columns; text never leaves the
    * taggers), so the id-keyed join shuffles attribute rows, not the
    * corpus — and in a 100 TB deployment the attribute tables land
    * bucketed by doc_id, making the join here a zero-shuffle
    * sort-merge over co-located buckets. Perplexity joins LEFT:
    * a doc with no bigrams gets a null score, and the verdict treats
    * an unscorable doc as not-keepable rather than silently passing it.
    */
  def docAnnotate(docs: DataFrame, cfg: AnnotateConfig = AnnotateConfig()): DataFrame = {
    // every per-row tagger (Gopher rules, langid, TTR — and, since the
    // r21 TokenMaxFreq kernel made repetition per-row, the repetition
    // signals too) fuses into ONE base projection via gopherQuality's
    // keep seam — one corpus scan, not one per tagger, and no doc_id
    // join for columns each row can answer alone (r22, guide §2.4: the
    // old left join shuffled the corpus twice to re-attach per-row
    // values). The when(size > 0, ...) guards reproduce the join's
    // null-for-tokenless-docs semantics exactly: repetition() kept only
    // docs with ≥ 1 token, so the left join yielded nulls for the rest.
    // Only the genuinely aggregate tagger (perplexity — a corpus model)
    // remains a separate attribute table.
    val toks = text.tokens(col("text"))
    // NOTHING filters here: empty/null-text docs still get a row (zero
    // tokens, null ratio signals, keep = false) — an attribute table
    // that silently loses rows defeats its own verdicts-join purpose
    val base = TextAnalysis.gopherQuality(docs, cfg.gopherMinStopHits, keep = Seq(
        "pred_lang" -> text.langId(col("text")),
        "ttr" -> when(size(toks) > 0,
          size(array_distinct(toks)).cast("double") / size(toks).cast("double")),
        // same expressions as TextAnalysis.repetition (same casts, same
        // IEEE division) — values identical by construction
        "max_tok_freq" -> when(size(toks) > 0,
          graft.functions.sketch.tokenMaxFreq(toks)),
        "rep3_ratio" -> when(size(toks) > 0,
          when(size(toks).cast("long") > lit(2L),
            lit(1.0) - size(graft.functions.sketch.shingleSet(toks, 3)).cast("long")
              .cast("double") / (size(toks).cast("long") - 2))
            .otherwise(lit(0.0)))))
      .select(col("doc_id"), col("n_tokens"), col("pred_lang"), col("ttr"),
        col("max_tok_freq"), col("rep3_ratio"), col("passes").as("gopher_pass"))
    // the perplexity tree is fully lazy (no persisted stage, no
    // handoff), so the whole composition is ONE action with nothing to
    // release at the boundary
    val ppl = TextAnalysis.perplexity(docs).select("doc_id", "mean_nll_q")
    val out = base
      .join(ppl, Seq("doc_id"), "left")
      .withColumn("keep",
        // Kleene AND: gopher_pass is always false for zero-token docs,
        // so null aggregate signals can never flip an empty doc to kept
        coalesce(
          col("gopher_pass") &&
            col("pred_lang") =!= "unknown" &&
            col("rep3_ratio") <= cfg.maxRep3Ratio &&
            col("mean_nll_q") <= cfg.maxMeanNllQ,
          lit(false)))
      .select("doc_id", "n_tokens", "pred_lang", "ttr", "max_tok_freq",
        "rep3_ratio", "gopher_pass", "mean_nll_q", "keep")
    out
  }

  /** Driver query: annotate the raw corpus. gopherMinStopHits = 1 for
    * the same reason as [[TextAnalysis.gopherQuery]] (the synthetic
    * corpus's stop-word ceiling is 1 — at the published 2 the verdict
    * would be vacuously false for every doc). Thresholds sit inside
    * the corpus's observed signal ranges so `keep` genuinely splits
    * the corpus.
    */
  def annotateQuery(spark: SparkSession, dir: String): DataFrame =
    docAnnotate(
      Tables.documents(spark, dir),
      AnnotateConfig(gopherMinStopHits = 1, maxRep3Ratio = 0.05, maxMeanNllQ = 34000.0)
    ).orderBy("doc_id")

  /** DEDUP FUNNEL — the tiered-deduplication capstone: exact (content
    * digest) → prefix (boilerplate header) → near (MinHash Jaccard ≥
    * 0.7, components, keep-min-id), each tier running only on the
    * previous tier's survivors, reported as per-tier in/removed/out —
    * the accounting table every production dedup pipeline publishes
    * (cheap tiers first so expensive tiers see fewer docs).
    *
    * Scale shape: tier 1 is one digest shuffle; tier 2 is
    * [[Dedup.prefixDup]]'s 8-byte-key aggregate on survivors; tier 3
    * reads the MATERIALIZED verified pair asset
    * ([[Dedup.corpusMinhashPairs]]) semi-joined to survivor ids — the
    * restriction is exact because Jaccard is pairwise (a pair's score
    * does not depend on other documents), so no shingling, banding or
    * verification runs at query time. The only driver-side state is
    * four scalar counts (the bounded-report convention).
    */
  def dedupFunnelQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val hh = docs.select(col("doc_id"), col("text"), col("n_chars"),
      md5(coalesce(col("text"), lit(""))).as("h"))
    // ONE digest aggregation serves the tier-1 survivor pick AND both
    // entry counts (r21, guide §2.4): n0 = Σ group sizes (= every doc,
    // nulls included via the coalesce), n1 = group count (= the semi-
    // join's survivor count by construction). The r20 shape paid a
    // standalone docs.count() corpus scan plus an s1.count() pass over
    // the persisted full-width survivors for numbers this digest-keyed
    // frame already knows. n1 == |s1| assumes doc_id is UNIQUE in
    // documents (ADVICE r21) — the same assumption the min(doc_id)
    // survivor pick already makes: a duplicated doc_id would make the
    // semi-join keep more rows than digest groups.
    val k1 = hh.groupBy("h")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = k1.agg(
      coalesce(sum(col("__n")), lit(0L)).as("n0"), count(lit(1)).as("n1")).head()
    val n0 = tot.getLong(0); val n1 = tot.getLong(1)
    val s1 = hh.join(k1.select("doc_id"), Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rm2 = Dedup.prefixDup(s1).filter(!col("keep")).select("doc_id")
    // tier 3 touches ids only — persist the NARROW id set, not the
    // full-width survivor rows the r20 s2 cached (text never feeds the
    // pair semi-joins; the asset carries the pairs)
    val s2ids = s1.select("doc_id").join(rm2, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n2 = s2ids.count()
    val pairs = Dedup.corpusMinhashPairs(spark, dir, threshold = 0.7)
      .join(s2ids.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_semi")
      .join(s2ids.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_semi")
      .select("id_a", "id_b")
    val labels = Clustering.connectedComponents(pairs)
    val rm3 = labels.filter(col("doc_id") =!= col("cluster_id")).count()
    k1.unpersist(blocking = false)
    s1.unpersist(blocking = false); s2ids.unpersist(blocking = false)
    Seq(
      (1L, "exact", n0, n0 - n1, n1),
      (2L, "prefix", n1, n1 - n2, n2),
      (3L, "near", n2, rm3, n2 - rm3))
      .toDF("ord", "tier", "docs_in", "docs_removed", "docs_out")
  }
}
