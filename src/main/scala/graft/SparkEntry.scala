package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
  * extensions) appears in [[queries]]; everything SQL-expressible has a
  * DuckDB oracle twin in [[oracleSql]] with identical column aliases and
  * a total ORDER BY on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7 end-to-end transfer slice: scan -> pushed-down range
    * predicate -> mutator fold (rename+drop) -> aggregate.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.transferSlice(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- SURVEY §2 parity operators --------------------------------------
    "s5_count"          -> (Relational.s5Count _),
    "s6_stats"          -> (Relational.s6Stats _),
    "s7_range_buckets"  -> (Relational.s7RangeBuckets _),
    "f5_size_range"     -> (Relational.f5SizeRange _),
    "f6_mutator_drop"   -> (Relational.f6MutatorDrop _),
    "m2_index_rollup"   -> (Relational.m2IndexDateRollup _),
    "m2_int_price"      -> (Relational.m2IntPrice _),
    "o1_comparator"     -> (Relational.o1Comparator _),
    "k1_upsert_dedup"   -> (Relational.k1UpsertDedup _),
    "p2_bounds_ntile"   -> (Relational.p2BoundsNtile _),
    "p2_plan_check"     -> (Relational.p2PlanCheck _),
    "p3_flush_size"     -> (Relational.p3FlushSize _),
    "p6_progress"       -> (Relational.p6Progress _),
    "transfer_slice"    -> (Relational.transferSlice _),
    // -- general SQL surface --------------------------------------------
    "q1_agg"            -> (Relational.q1Agg _),
    "q3_join"           -> (Relational.q3Join _),
    "q_window"          -> (Relational.qWindow _),
    "q_rollup"          -> (Relational.qRollup _),
    "q_setops"          -> (Relational.qSetOps _),
    "q_json_extract"    -> (Relational.qJsonExtract _),
    "q_semi_anti"       -> (Relational.qSemiAnti _),
    "q_asof"            -> (Relational.qAsOf _),
    "q_funnel"          -> (Relational.qFunnel _),
    "q_range_frame"     -> (Relational.qRangeFrame _),
    "q_approx_stats"    -> (Relational.qApproxStats _),
    "q_topn_group"      -> (Relational.qTopNPerGroup _),
    "q_topn_agg"        -> (Relational.qTopNPerGroupAgg _),
    "q_distinct_count"  -> (Relational.qDistinctCount _),
    "q_pivot"           -> (Relational.qPivot _),
    "q_unpivot"         -> (Relational.qUnpivot _),
    "q_histogram"       -> ((s, d) => Relational.qHistogram(s, d)),
    "q_cube"            -> (Relational.qCube _),
    "q_grouping_sets"   -> (Relational.qGroupingSets _),
    "q_corr_subquery"   -> (Relational.qCorrSubquery _),
    "q_skew_join"       -> (Relational.qSkewJoin _),
    "q_retention"       -> (Relational.qRetention _),
    "q_group_median"    -> (Relational.qGroupMedian _),
    "q_interval_join"   -> (Intervals.incidentOverlapQuery _),
    // -- training-data pipeline operators --------------------------------
    "dedup_exact"       -> (Dedup.exactClusters _),
    "dedup_incremental" -> (Dedup.incrementalQuery _),
    "dedup_lines"       -> (Dedup.lineStatsQuery _),
    "dedup_substring"   -> (Dedup.substringQuery _),
    "dedup_scrub"       -> (Dedup.substringScrubQuery _),
    "dedup_leakage"     -> (Dedup.leakageQuery _),
    "text_oov"          -> (TextAnalysis.oovQuery _),
    "text_ttr"          -> (TextAnalysis.ttrQuery _),
    "dedup_minhash"     -> (Dedup.minhashQuery _),
    "dedup_simhash"     -> (Dedup.simhashQuery _),
    "dedup_ngram"       -> (Dedup.ngramJaccardQuery _),
    "dedup_clusters"    -> (Clustering.dedupClustersQuery _),
    "embed_neardup"     -> (Dedup.embeddingNearDupQuery _),
    "semdedup"          -> (Similarity.semDedupQuery _),
    "semdedup_kmeans"   -> (Similarity.semDedupKmeansQuery _),
    "ann_topk"          -> (Similarity.annTopKQuery _),
    "ann_lsh"           -> (Similarity.annLshQuery _),
    "ann_ivf"           -> (Similarity.annIvfQuery _),
    "embed_centroids"   -> (Similarity.centroidsQuery _),
    "embed_quantize"    -> (Similarity.quantizeQuery _),
    "embed_assign"      -> (Similarity.assignQuery _),
    "kmeans_step"       -> (Similarity.kmeansStepQuery _),
    "q_transitions"     -> (Relational.qTransitions _),
    "q_asof_join"       -> (Relational.qAsofJoin _),
    "q_anomaly"         -> (Relational.qAnomaly _),
    "text_tokens"       -> (TextAnalysis.textTokens _),
    "text_tokens_bpe"   -> (TextAnalysis.textTokensBpe _),
    "text_quality"      -> (TextAnalysis.textQuality _),
    "text_langid"       -> (TextAnalysis.textLangId _),
    "text_fingerprint"  -> (TextAnalysis.textFingerprint _),
    "text_pii"          -> (TextAnalysis.piiQuery _),
    "text_readability"  -> (TextAnalysis.readabilityQuery _),
    "text_winnow"       -> (TextAnalysis.textWinnow _),
    "winnow_pairs"      -> (TextAnalysis.winnowPairsQuery _),
    "q_percentiles"     -> (Relational.qPercentilesQuery _),
    "sample_stratified" -> (TextAnalysis.stratifiedSampleQuery _),
    "split_assign"      -> (TextAnalysis.splitAssignQuery _),
    "pack_sequences"    -> (TextAnalysis.packSequencesQuery _),
    "mix_sources"       -> (TextAnalysis.mixSourcesQuery _),
    "mix_temperature"   -> (TextAnalysis.mixTemperatureQuery _),
    "text_gopher"       -> (TextAnalysis.gopherQuery _),
    "chunk_documents"   -> (TextAnalysis.chunkDocumentsQuery _),
    "text_perplexity"   -> (TextAnalysis.perplexityQuery _),
    "token_budget"      -> (TextAnalysis.tokenBudgetQuery _),
    "top_ngrams"        -> (TextAnalysis.topNgramsQuery _),
    "tfidf_top_terms"   -> (TextAnalysis.tfidfQuery _),
    "contamination"     -> (TextAnalysis.contaminationQuery _),
    "doc_repetition"    -> (TextAnalysis.repetitionQuery _),
    "multimodal_features" -> (Multimodal.featuresQuery _),
    "pipeline_curate"   -> (Curation.curateQuery _),
    "pipeline_mix"      -> (Curation.mixQuery _),
    "heavy_hitters"     -> (TextAnalysis.heavyHitters _),
    "q_sessionize"      -> (graft.streaming.EventStream.sessionizeBatch _),
    "stream_window_counts" -> (graft.streaming.EventStream.windowedCountsBatch _),
    "stream_topk"          -> ((s, d) => graft.streaming.EventStream.windowedTopKBatch(s, d)),
    "stream_attribution"   -> ((s, d) => graft.streaming.EventStream.attributionBatch(s, d))
  )

  /** The exact hyperplane constants the LSH queries embed in their Spark
    * plans, as DuckDB VALUES rows — ann_lsh and embed_neardup both use
    * bits=4, tables=8, dim=64, seedBase=42, so the oracle recomputes the
    * identical bucketing (see [[Similarity.planesSqlValues]]).
    */
  private lazy val lshPlanesSql: String =
    Similarity.planesSqlValues(bits = 4, tables = 8, dim = 64, seedBase = 42L)

  /** Shared oracle prefix: per-(vector, table) LSH bucket ids. */
  private def lshBucketsCte: String =
    s"""WITH planes AS (SELECT * FROM (VALUES $lshPlanesSql) pl(t, i, v)), allb AS (SELECT e.vec_id, p.t, CAST(sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), p.v) >= 0 THEN CAST(power(2, p.i) AS BIGINT) ELSE 0 END) AS BIGINT) AS b FROM embeddings e CROSS JOIN planes p GROUP BY 1, 2)"""

  def oracleSql: Map[String, String] = Map(
    "s5_count" ->
      "SELECT count(*) AS cnt FROM lineitem",
    "s6_stats" ->
      """SELECT min(l_extendedprice) AS min_size, max(l_extendedprice) AS max_size, count(*) AS cnt FROM lineitem""",
    "s7_range_buckets" ->
      """SELECT CASE WHEN l_extendedprice < 2000 THEN 'b0' WHEN l_extendedprice < 20000 THEN 'b1' ELSE 'b2' END AS bucket, count(*) AS doc_count FROM lineitem GROUP BY 1 ORDER BY bucket""",
    "f5_size_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem WHERE l_quantity >= 5 AND l_quantity < 30 ORDER BY l_orderkey, l_linenumber""",
    "f6_mutator_drop" ->
      """SELECT l_returnflag, count(*) AS kept, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty FROM lineitem WHERE NOT COALESCE(l_discount > 0.06, FALSE) GROUP BY 1 ORDER BY 1""",
    "m2_index_rollup" ->
      """SELECT 'events-' || strftime(ts, '%Y.%m') AS _index, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1""",
    "m2_int_price" ->
      """SELECT p_partkey, p_retailprice, CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents FROM part ORDER BY p_partkey""",
    "o1_comparator" ->
      """WITH names AS (SELECT DISTINCT (CASE WHEN o_orderkey % 7 = 0 THEN 'archive' ELSE 'orders' END) || (CASE WHEN o_orderkey % 11 = 0 THEN '' ELSE '-' || strftime(o_orderdate, '%Y.%m.%d') END) AS index_name FROM orders) SELECT index_name, regexp_extract(index_name, '(\d{4}\.\d{2}\.\d{2})$', 1) AS dt FROM names ORDER BY dt DESC, index_name ASC""",
    "k1_upsert_dedup" ->
      """SELECT user_id, event_type, event_id FROM (SELECT user_id, event_type, event_id, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn FROM events) WHERE rn = 1 ORDER BY user_id, event_type""",
    "p2_bounds_ntile" ->
      """SELECT bucket, count(*) AS cnt, min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM (SELECT l_extendedprice, l_orderkey, l_linenumber, ntile(3) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bucket FROM lineitem) GROUP BY 1 ORDER BY 1""",
    "p2_plan_check" ->
      """SELECT bucket, TRUE AS within_tol, (SELECT count(*) FROM lineitem) AS total FROM (VALUES (0), (1), (2)) AS t(bucket) ORDER BY bucket""",
    "p3_flush_size" ->
      """SELECT p_brand, max(p_size) AS max_size, least(greatest(CAST(floor(50000000.0 / (max(p_size) * 1000000.0)) AS BIGINT), 1), 10000) AS flush_size FROM part GROUP BY 1 ORDER BY 1""",
    "p6_progress" ->
      """SELECT event_type, total, transferred, CAST(floor(transferred * 100.0 / total) AS BIGINT) AS pct FROM (SELECT event_type, count(*) AS total, CAST(sum(CASE WHEN value > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS transferred FROM events GROUP BY 1) ORDER BY event_type""",
    "transfer_slice" ->
      """SELECT 'li-' || l_returnflag AS _index, count(*) AS cnt, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty FROM lineitem WHERE l_quantity >= 5 AND l_quantity < 30 AND NOT COALESCE(l_discount > 0.08, FALSE) GROUP BY 1 ORDER BY 1""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price, count(*) AS count_order FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' GROUP BY 1, 2 ORDER BY 1, 2""",
    "q3_join" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_li, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_window" ->
      """SELECT event_id, user_id, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn, CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS purchases_so_far, lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id FROM events WHERE user_id < 200 ORDER BY user_id, rn""",
    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust, CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY ROLLUP (r_name, n_name) ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",
    "q_setops" ->
      """(SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey AS k FROM orders) EXCEPT SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0 ORDER BY k""",
    "q_range_frame" ->
      """SELECT user_id, event_id, tus, count(*) OVER (PARTITION BY user_id ORDER BY tus RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS events_last_hour FROM (SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS tus FROM events) WHERE user_id < 100 ORDER BY user_id, tus, event_id""",
    "q_asof" ->
      """SELECT user_id, event_id, tus, last_click_us FROM (SELECT user_id, event_id, event_type, tus, max(CASE WHEN event_type = 'click' THEN tus END) OVER (PARTITION BY user_id ORDER BY tus, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_us FROM (SELECT user_id, event_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS tus FROM events)) WHERE event_type = 'purchase' ORDER BY user_id, event_id""",
    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS tus FROM events), v AS (SELECT user_id, min(tus) AS fv FROM ev WHERE event_type = 'view' GROUP BY 1), c AS (SELECT e.user_id, min(e.tus) AS fc FROM ev e JOIN v USING (user_id) WHERE e.event_type = 'click' AND e.tus > v.fv GROUP BY 1), p AS (SELECT e.user_id, min(e.tus) AS fp FROM ev e JOIN c USING (user_id) WHERE e.event_type = 'purchase' AND e.tus > c.fc GROUP BY 1) SELECT count(v.fv) AS n_view, count(c.fc) AS n_click_after_view, count(p.fp) AS n_purchase_after_click FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""",
    "q_semi_anti" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer c WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') GROUP BY 1 ORDER BY 1""",
    "q_topn_group" ->
      """SELECT o_custkey, rnk, o_orderkey FROM (SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk FROM orders WHERE o_custkey < 500) WHERE rnk <= 2 ORDER BY o_custkey, rnk""",
    "q_topn_agg" ->
      """SELECT o_custkey, rnk, o_orderkey FROM (SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk FROM orders WHERE o_custkey < 500) WHERE rnk <= 2 ORDER BY o_custkey, rnk""",
    "q_distinct_count" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q_pivot" ->
      """SELECT strftime(ts, '%Y-%m') AS month, CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click, CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error, CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase, CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup, CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view FROM events GROUP BY 1 ORDER BY 1""",
    "q_histogram" ->
      """WITH s AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem) SELECT bucket, count(*) AS cnt, min(x) AS b_min, max(x) AS b_max FROM (SELECT l_extendedprice AS x, least(CAST(floor((l_extendedprice - s.lo) / ((s.hi - s.lo) / 20)) AS BIGINT), 19) AS bucket FROM lineitem, s) GROUP BY 1 ORDER BY bucket""",
    "q_unpivot" ->
      """WITH w AS (SELECT strftime(ts, '%Y-%m') AS month, CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click, CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error, CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase, CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup, CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view FROM events GROUP BY 1) SELECT month, event_type, cnt FROM w UNPIVOT (cnt FOR event_type IN (click, error, purchase, signup, view)) ORDER BY month, event_type""",
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(grouping(o_orderstatus) AS BIGINT) AS g_status, CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio, count(*) AS n FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_corr_subquery" ->
      """WITH ca AS (SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price FROM orders GROUP BY 1) SELECT o_orderpriority, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM orders o JOIN ca USING (o_custkey) WHERE o_totalprice > avg_price GROUP BY 1 ORDER BY 1""",
    "q_skew_join" ->
      """WITH a AS (SELECT l_returnflag, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty FROM lineitem GROUP BY 1) SELECT l_returnflag, count(*) AS n_above, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM lineitem JOIN a USING (l_returnflag) WHERE l_quantity > avg_qty GROUP BY 1 ORDER BY 1""",
    "q_group_median" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty, quantile_cont(l_quantity, 0.9) AS p90_qty, count(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events), c AS (SELECT user_id, min(d) AS cohort FROM a GROUP BY 1) SELECT strftime(cohort, '%Y-%m-%d') AS cohort_d, CAST(date_diff('day', cohort, d) AS INT) AS days_since, count(*) AS n_users FROM a JOIN c USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_transitions" ->
      """WITH s AS (SELECT user_id, event_type, lead(event_type) OVER (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) AS to_type FROM events) SELECT event_type AS from_type, to_type, count(*) AS n FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_asof_join" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS tus, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS rnk FROM events WHERE event_type IN ('click', 'purchase')), c AS (SELECT user_id, event_id, event_type, tus, last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tus, rnk, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id, last_value(CASE WHEN event_type = 'click' THEN tus END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tus, rnk, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_tus FROM ev) SELECT event_id AS purchase_id, user_id, click_id, tus - click_tus AS gap_us FROM c WHERE event_type = 'purchase' ORDER BY purchase_id""",
    "q_anomaly" ->
      """WITH e AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events), st AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS ss, count(*) AS n FROM e GROUP BY 1), z AS (SELECT e.event_type, CASE WHEN n >= 2 AND CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n > 0 THEN (CAST(c AS DOUBLE) - CAST(s AS DOUBLE) / n) / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)) END AS z FROM e JOIN st USING (event_type)) SELECT event_type, count(*) AS n_events, count(CASE WHEN abs(z) > 3 THEN 1 END) AS n_outliers FROM z GROUP BY 1 ORDER BY 1""",
    "embed_centroids" ->
      """WITH q AS (SELECT label, unnest(range(len(embedding))) AS dim, COALESCE(CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT), 0) AS qe FROM embeddings WHERE embedding IS NOT NULL), a AS (SELECT label, dim, CAST(sum(qe) AS BIGINT) AS qs, count(*) AS n_vecs FROM q GROUP BY 1, 2) SELECT label, dim, n_vecs, CAST(qs AS DOUBLE) / CAST(1000 * n_vecs AS DOUBLE) AS centroid FROM a ORDER BY label, dim""",
    "embed_assign" ->
      """WITH eq AS (SELECT vec_id, label, unnest(range(len(embedding))) AS dim, COALESCE(CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT), 0) AS qe FROM embeddings WHERE embedding IS NOT NULL), cs AS (SELECT label AS c_label, dim, CAST(sum(qe) AS BIGINT) AS s, count(*) AS n FROM eq GROUP BY 1, 2), cq AS (SELECT c_label, dim, CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) AS qc FROM cs), sc AS (SELECT eq.vec_id, eq.label, cq.c_label, CAST(sum((eq.qe - cq.qc) * (eq.qe - cq.qc)) AS BIGINT) AS dist FROM eq JOIN cq USING (dim) GROUP BY 1, 2, 3), r AS (SELECT vec_id, label, c_label, row_number() OVER (PARTITION BY vec_id ORDER BY dist, c_label) AS rn FROM sc) SELECT label, c_label AS assigned, count(*) AS n FROM r WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""",
    "kmeans_step" ->
      """WITH eq AS (SELECT vec_id, label, unnest(range(len(embedding))) AS dim, COALESCE(CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT), 0) AS qe FROM embeddings WHERE embedding IS NOT NULL), cs AS (SELECT label AS c_label, dim, CAST(sum(qe) AS BIGINT) AS s, count(*) AS n FROM eq GROUP BY 1, 2), cq AS (SELECT c_label, dim, CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) AS qc FROM cs), sc AS (SELECT eq.vec_id, cq.c_label, CAST(sum((eq.qe - cq.qc) * (eq.qe - cq.qc)) AS BIGINT) AS dist FROM eq JOIN cq USING (dim) GROUP BY 1, 2), r AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id ORDER BY dist, c_label) AS rn FROM sc), a AS (SELECT vec_id, c_label AS cluster FROM r WHERE rn = 1), nc AS (SELECT a.cluster, eq.dim, CAST(sum(eq.qe) AS BIGINT) AS qs, count(*) AS nv FROM eq JOIN a USING (vec_id) GROUP BY 1, 2) SELECT cluster, dim, nv AS n_vecs, CAST(qs AS DOUBLE) / CAST(1000 * nv AS DOUBLE) AS centroid FROM nc ORDER BY cluster, dim""",
    "embed_quantize" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, e -> CAST(COALESCE(e, CAST(0.0 AS FLOAT)) AS DOUBLE)) AS ve FROM embeddings WHERE embedding IS NOT NULL), m AS (SELECT vec_id, ve, COALESCE(list_max(list_transform(ve, x -> abs(x))), 0.0) AS max_abs FROM v), s AS (SELECT vec_id, ve, max_abs, CASE WHEN max_abs > 0 THEN 127.0 / max_abs ELSE 0.0 END AS sc FROM m), q AS (SELECT vec_id, ve, sc, list_transform(ve, e -> CAST(floor(e * sc + 0.5) AS INT)) AS qv FROM s), e AS (SELECT vec_id, sc, qv, CASE WHEN sc > 0 THEN list_sum(list_transform(list_zip(ve, qv), p -> (p[1] - p[2] / sc) * (p[1] - p[2] / sc))) ELSE 0.0 END AS err FROM q) SELECT vec_id, CAST(len(qv) AS BIGINT) AS n_dims, CAST(floor(sc * 1000000 + 0.5) AS BIGINT) AS scale_q, CAST(list_sum(qv) AS BIGINT) AS sum_q, CAST(list_max(qv) AS BIGINT) AS max_q, CAST(floor(err * 1000000000 + 0.5) AS BIGINT) AS err_q FROM e ORDER BY vec_id""",
    "semdedup" ->
      """WITH eq AS (SELECT vec_id, label, unnest(range(len(embedding))) AS dim, COALESCE(CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT), 0) AS qe FROM embeddings WHERE embedding IS NOT NULL), cs AS (SELECT label AS c_label, dim, CAST(sum(qe) AS BIGINT) AS s, count(*) AS n FROM eq GROUP BY 1, 2), cq AS (SELECT c_label, dim, CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) AS qc FROM cs), sc AS (SELECT eq.vec_id, cq.c_label, CAST(sum((eq.qe - cq.qc) * (eq.qe - cq.qc)) AS BIGINT) AS dist FROM eq JOIN cq USING (dim) GROUP BY 1, 2), r AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id ORDER BY dist, c_label) AS rn FROM sc), a AS (SELECT vec_id, c_label AS cluster FROM r WHERE rn = 1), p AS (SELECT DISTINCT b.vec_id FROM a x JOIN a b ON x.cluster = b.cluster AND x.vec_id < b.vec_id JOIN embeddings ea ON ea.vec_id = x.vec_id JOIN embeddings eb ON eb.vec_id = b.vec_id WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])) >= 0.35) SELECT a.vec_id, a.cluster, CASE WHEN p.vec_id IS NULL THEN 'kept' ELSE 'dup' END AS verdict FROM a LEFT JOIN p USING (vec_id) ORDER BY a.vec_id""",
    "semdedup_kmeans" ->
      """WITH eq AS (SELECT vec_id, unnest(range(len(embedding))) AS dim, COALESCE(CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT), 0) AS qe, CAST(vec_id % 8 AS INT) AS c0 FROM embeddings WHERE embedding IS NOT NULL), cs0 AS (SELECT c0 AS c_label, dim, CAST(sum(qe) AS BIGINT) AS s, count(*) AS n FROM eq GROUP BY 1, 2), cq0 AS (SELECT c_label, dim, CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) AS qc FROM cs0), sc0 AS (SELECT eq.vec_id, cq0.c_label, CAST(sum((eq.qe - cq0.qc) * (eq.qe - cq0.qc)) AS BIGINT) AS dist FROM eq JOIN cq0 USING (dim) GROUP BY 1, 2), r0 AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id ORDER BY dist, c_label) AS rn FROM sc0), a1 AS (SELECT vec_id, c_label AS c1 FROM r0 WHERE rn = 1), cs1 AS (SELECT a1.c1 AS c_label, eq.dim, CAST(sum(eq.qe) AS BIGINT) AS s, count(*) AS n FROM eq JOIN a1 USING (vec_id) GROUP BY 1, 2), cq1 AS (SELECT c_label, dim, CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) AS qc FROM cs1), sc1 AS (SELECT eq.vec_id, cq1.c_label, CAST(sum((eq.qe - cq1.qc) * (eq.qe - cq1.qc)) AS BIGINT) AS dist FROM eq JOIN cq1 USING (dim) GROUP BY 1, 2), r1 AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id ORDER BY dist, c_label) AS rn FROM sc1), a AS (SELECT vec_id, c_label AS cluster FROM r1 WHERE rn = 1), p AS (SELECT DISTINCT b.vec_id FROM a x JOIN a b ON x.cluster = b.cluster AND x.vec_id < b.vec_id JOIN embeddings ea ON ea.vec_id = x.vec_id JOIN embeddings eb ON eb.vec_id = b.vec_id WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])) >= 0.35) SELECT a.vec_id, a.cluster, CASE WHEN p.vec_id IS NULL THEN 'kept' ELSE 'dup' END AS verdict FROM a LEFT JOIN p USING (vec_id) ORDER BY a.vec_id""",
    "q_interval_join" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS tus, CAST(ts AS DATE) AS d FROM events), s AS (SELECT user_id, d, min(tus) AS s_start, max(tus) AS s_end FROM ev GROUP BY 1, 2), inc AS (SELECT event_id AS incident_id, tus AS i_start, tus + 3600000000 AS i_end FROM ev WHERE event_type = 'error' AND event_id % 50 = 0) SELECT incident_id, count(*) AS n_sessions FROM inc JOIN s ON s_start <= i_end AND i_start <= s_end GROUP BY 1 ORDER BY 1""",
    "dedup_lines" ->
      """WITH l AS (SELECT doc_id, trim(x) AS line FROM (SELECT doc_id, unnest(string_split(coalesce(text, ''), chr(10))) AS x FROM documents) WHERE length(trim(x)) > 0), c AS (SELECT line, count(*) AS n FROM l GROUP BY 1) SELECT doc_id, count(*) AS n_lines, CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines, CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac FROM l JOIN c USING (line) GROUP BY 1 ORDER BY 1""",
    "text_ttr" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0) SELECT doc_id, count(*) AS n_tokens, count(DISTINCT term) AS n_types, CAST(count(DISTINCT term) AS DOUBLE) / count(*) AS ttr FROM tok GROUP BY 1 ORDER BY 1""",
    "dedup_substring" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), winh AS (SELECT doc_id, unnest(range(len(t) - 7)) AS pos, t FROM toks WHERE len(t) >= 8), wins AS (SELECT doc_id, pos, array_to_string(t[pos + 1:pos + 8], ' ') AS w FROM winh), dup AS (SELECT w FROM wins GROUP BY w HAVING min(doc_id) <> max(doc_id)), m AS (SELECT doc_id, pos FROM wins JOIN dup USING (w)), g AS (SELECT doc_id, pos, CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 THEN 1 ELSE 0 END AS ns FROM m), si AS (SELECT doc_id, pos, sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS span FROM g), sp AS (SELECT doc_id, span, min(pos) AS s, max(pos) + 7 AS e FROM si GROUP BY 1, 2) SELECT doc_id, count(*) AS n_spans, CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens, CAST(min(s) AS BIGINT) AS first_pos FROM sp GROUP BY 1 ORDER BY doc_id""",
    "dedup_leakage" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), winh AS (SELECT doc_id, unnest(range(len(t) - 7)) AS pos, t FROM toks WHERE len(t) >= 8), wins AS (SELECT doc_id, pos, array_to_string(t[pos + 1:pos + 8], ' ') AS w FROM winh), mn AS (SELECT w, min(doc_id) AS owner_id FROM wins GROUP BY 1), occ AS (SELECT wins.doc_id, mn.owner_id FROM wins JOIN mn USING (w) WHERE wins.doc_id <> mn.owner_id) SELECT downer.source AS src_owner, ddup.source AS src_dup, count(*) AS n_window_occ, count(DISTINCT occ.doc_id) AS n_docs FROM occ JOIN documents downer ON downer.doc_id = occ.owner_id JOIN documents ddup ON ddup.doc_id = occ.doc_id GROUP BY 1, 2 ORDER BY 1, 2""",
    "dedup_scrub" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), winh AS (SELECT doc_id, unnest(range(len(t) - 7)) AS pos, t FROM toks WHERE len(t) >= 8), wins AS (SELECT doc_id, pos, array_to_string(t[pos + 1:pos + 8], ' ') AS w FROM winh), mn AS (SELECT w, min(doc_id) AS mdoc FROM wins GROUP BY 1), remw AS (SELECT wins.doc_id, pos, unnest(range(8)) AS i FROM wins JOIN mn USING (w) WHERE wins.doc_id > mn.mdoc), rem AS (SELECT DISTINCT doc_id, pos + i AS tp FROM remw), tokpos AS (SELECT doc_id, unnest(t) AS tok, unnest(range(len(t))) AS tp FROM toks), keptagg AS (SELECT tokpos.doc_id, string_agg(tok, ' ' ORDER BY tokpos.tp) AS clean FROM tokpos LEFT JOIN rem ON tokpos.doc_id = rem.doc_id AND tokpos.tp = rem.tp WHERE rem.doc_id IS NULL GROUP BY 1), remc AS (SELECT doc_id, count(*) AS n_rem FROM rem GROUP BY 1) SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens, CAST(COALESCE(remc.n_rem, 0) AS BIGINT) AS n_removed, md5(COALESCE(keptagg.clean, '')) AS clean_fp FROM toks t LEFT JOIN keptagg ON t.doc_id = keptagg.doc_id LEFT JOIN remc ON t.doc_id = remc.doc_id ORDER BY t.doc_id""",
    "text_oov" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), cnt AS (SELECT term, count(*) AS n FROM tok GROUP BY 1), vocab AS (SELECT term FROM cnt ORDER BY n DESC, term ASC LIMIT 16) SELECT doc_id, count(*) AS n_tokens, CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov, CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS oov_frac FROM tok LEFT JOIN vocab v ON tok.term = v.term GROUP BY 1 ORDER BY 1""",
    "text_pii" ->
      """WITH aug AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example' || repeat(' alt' || CAST(doc_id AS VARCHAR) || '@example.org', CAST(doc_id % 2 AS INT)) || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS t FROM documents) SELECT doc_id, CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails, CAST(len(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phones, CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips, md5(regexp_replace(regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'), '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS clean_fp FROM aug ORDER BY doc_id""",
    "text_readability" ->
      """WITH m AS (SELECT doc_id, CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0 ELSE len(string_split_regex(trim(coalesce(text, '')), '\s+')) END AS n_tokens, len(regexp_extract_all(coalesce(text, ''), '[.!?]+')) AS n_sentences, len(regexp_extract_all(lower(coalesce(text, '')), '[aeiouy]+')) AS n_syllables FROM documents) SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(n_sentences AS BIGINT) AS n_sentences, CAST(n_syllables AS BIGINT) AS n_syllables, CASE WHEN n_tokens > 0 AND n_sentences > 0 THEN 206.835 - 1.015 * (CAST(n_tokens AS DOUBLE) / CAST(n_sentences AS DOUBLE)) - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_tokens AS DOUBLE)) END AS flesch FROM m ORDER BY doc_id""",
    "q_json_extract" ->
      """SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k, count(*) AS n FROM (SELECT event_type, CASE WHEN props IS NOT NULL AND json_valid(props) THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k FROM events) GROUP BY 1 ORDER BY 1""",
    "dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep_id FROM documents GROUP BY 1 ORDER BY h""",
    "text_tokens" ->
      """SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens FROM documents ORDER BY doc_id""",
    "text_quality" ->
      """SELECT doc_id, n_chars, n_tokens, punct_n, upper_n, stop_n, CASE WHEN n_tokens > 0 THEN CAST(stop_n AS DOUBLE) / n_tokens ELSE 0.0 END AS stop_ratio FROM (SELECT doc_id, length(text) AS n_chars, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens, length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS punct_n, length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS upper_n, len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|a)\b')) AS stop_n FROM documents) ORDER BY doc_id""",
    "text_langid" ->
      """SELECT doc_id, CASE WHEN cc > 0 THEN 'zh' WHEN ce >= greatest(cf, cd, cs) AND ce > 0 THEN 'en' WHEN cf >= greatest(cd, cs) AND cf > 0 THEN 'fr' WHEN cd >= cs AND cd > 0 THEN 'de' WHEN cs > 0 THEN 'es' ELSE 'unknown' END AS pred_lang FROM (SELECT doc_id, len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|you|that|it|for)\b')) AS ce, len(regexp_extract_all(lower(text), '\b(le|la|les|des|et|une|est|que|dans|pour)\b')) AS cf, len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\b')) AS cd, len(regexp_extract_all(lower(text), '\b(el|los|las|y|un|una|es|que|por|para)\b')) AS cs, len(regexp_extract_all(text, '[一-鿿]')) AS cc FROM documents) ORDER BY doc_id""",
    "text_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp FROM documents ORDER BY doc_id""",
    "text_winnow" ->
      """WITH grams AS (SELECT doc_id, list_transform(range(1, length(text) - 8 + 2), s -> list_reduce(list_prepend(CAST(0 AS HUGEINT), list_transform(range(s, s + 8), i -> CAST(ascii(text[i]) AS HUGEINT))), (acc, c) -> (acc * 31 + c) % 18446744073709551616)) AS hu FROM documents), signed AS (SELECT doc_id, list_transform(hu, x -> CASE WHEN x >= 9223372036854775808 THEN CAST(x - 18446744073709551616 AS BIGINT) ELSE CAST(x AS BIGINT) END) AS h FROM grams), mins AS (SELECT doc_id, CASE WHEN len(h) = 0 THEN [] WHEN len(h) <= 4 THEN [list_min(h)] ELSE list_transform(range(1, len(h) - 4 + 2), s -> list_min(h[s:s+3])) END AS m FROM signed) SELECT doc_id, CAST(len(list_distinct(m)) AS BIGINT) AS n_fps, m[1] AS first_fp FROM mins ORDER BY doc_id""",
    "winnow_pairs" ->
      """WITH grams AS (SELECT doc_id, list_transform(range(1, length(text) - 8 + 2), s -> list_reduce(list_prepend(CAST(0 AS HUGEINT), list_transform(range(s, s + 8), i -> CAST(ascii(text[i]) AS HUGEINT))), (acc, c) -> (acc * 31 + c) % 18446744073709551616)) AS hu FROM documents), signed AS (SELECT doc_id, list_transform(hu, x -> CASE WHEN x >= 9223372036854775808 THEN CAST(x - 18446744073709551616 AS BIGINT) ELSE CAST(x AS BIGINT) END) AS h FROM grams), mins AS (SELECT doc_id, CASE WHEN len(h) = 0 THEN [] WHEN len(h) <= 4 THEN [list_min(h)] ELSE list_distinct(list_transform(range(1, len(h) - 4 + 2), s -> list_min(h[s:s+3]))) END AS m FROM signed), inv0 AS (SELECT doc_id, unnest(m) AS fp FROM mins), rare AS (SELECT fp FROM inv0 GROUP BY 1 HAVING count(*) <= 20), inv AS (SELECT doc_id, fp FROM inv0 JOIN rare USING (fp)), sz AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY 1), pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps FROM inv a JOIN inv b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id_a, id_b, shared_fps, containment FROM (SELECT id_a, id_b, shared_fps, shared_fps * 1.0 / least(sa.n, sb.n) AS containment FROM pairs JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id) WHERE containment >= 0.6 ORDER BY id_a, id_b""",
    "multimodal_features" ->
      """WITH base AS (SELECT doc_id, CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality, octet_length(encode(text)) AS n_bytes, list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), list_transform(range(1, length(text) + 1), i -> CAST(ascii(text[i]) AS HUGEINT))), (acc, b) -> (acc * 31 + CASE WHEN b >= 128 THEN b - 256 ELSE b END) % 18446744073709551616) AS hu FROM documents), signed AS (SELECT doc_id, modality, n_bytes, CASE WHEN hu % 18446744073709551616 >= 9223372036854775808 THEN (hu % 18446744073709551616) - 18446744073709551616 ELSE hu % 18446744073709551616 END AS h FROM base), w AS (SELECT doc_id, modality, n_bytes, 64 + (abs(h) % 64) AS width FROM signed) SELECT modality, count(*) AS n_assets, CAST(sum(n_bytes) AS BIGINT) AS total_bytes, avg(width) AS avg_width FROM w GROUP BY 1 ORDER BY 1""",
    "pipeline_curate" ->
      """WITH analyzed AS (SELECT doc_id, text, CASE WHEN length(trim(coalesce(text,''))) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens, CASE WHEN len(regexp_extract_all(text, '[一-鿿]')) > 0 THEN 'zh' WHEN len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|you|that|it|for)\b')) >= greatest(len(regexp_extract_all(lower(text), '\b(le|la|les|des|et|une|est|que|dans|pour)\b')), len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\b')), len(regexp_extract_all(lower(text), '\b(el|los|las|y|un|una|es|que|por|para)\b'))) AND len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|you|that|it|for)\b')) > 0 THEN 'en' WHEN len(regexp_extract_all(lower(text), '\b(le|la|les|des|et|une|est|que|dans|pour)\b')) >= greatest(len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\b')), len(regexp_extract_all(lower(text), '\b(el|los|las|y|un|una|es|que|por|para)\b'))) AND len(regexp_extract_all(lower(text), '\b(le|la|les|des|et|une|est|que|dans|pour)\b')) > 0 THEN 'fr' WHEN len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\b')) >= len(regexp_extract_all(lower(text), '\b(el|los|las|y|un|una|es|que|por|para)\b')) AND len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\b')) > 0 THEN 'de' WHEN len(regexp_extract_all(lower(text), '\b(el|los|las|y|un|una|es|que|por|para)\b')) > 0 THEN 'es' ELSE 'unknown' END AS pred_lang, md5(text) AS h FROM documents), gated AS (SELECT *, CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 'empty' WHEN n_tokens < 10 THEN 'too_short' WHEN n_tokens > 100000 THEN 'too_long' WHEN pred_lang = 'unknown' THEN 'unknown_lang' END AS gate_reason FROM analyzed), surviving AS (SELECT * FROM gated WHERE gate_reason IS NULL), keep AS (SELECT h, min(doc_id) AS keep_id FROM surviving GROUP BY 1), exact_tagged AS (SELECT s.doc_id, s.text, CASE WHEN s.doc_id <> k.keep_id THEN 'exact_dup' END AS exact_reason FROM surviving s JOIN keep k USING (h)), exact_surv AS (SELECT doc_id, text FROM exact_tagged WHERE exact_reason IS NULL), toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM exact_surv), sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM toks WHERE len(t) >= 3), inv AS (SELECT doc_id, unnest(s) AS g FROM sh), cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2), neardrop AS (SELECT DISTINCT id_b AS doc_id FROM cand JOIN (SELECT doc_id, len(s) AS n FROM sh) la ON id_a = la.doc_id JOIN (SELECT doc_id, len(s) AS n FROM sh) lb ON id_b = lb.doc_id WHERE inter * 1.0 / (la.n + lb.n - inter) >= 0.8), final AS (SELECT g.doc_id, coalesce(g.gate_reason, e.exact_reason, CASE WHEN n.doc_id IS NOT NULL THEN 'near_dup' END, 'kept') AS drop_reason FROM gated g LEFT JOIN exact_tagged e ON g.doc_id = e.doc_id LEFT JOIN neardrop n ON g.doc_id = n.doc_id) SELECT drop_reason, count(*) AS n_docs FROM final GROUP BY 1 ORDER BY 1""",
    "q_percentiles" ->
      """WITH o AS (SELECT l_extendedprice, row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn, count(*) OVER () AS n FROM lineitem) SELECT CAST(ps.p AS DOUBLE) AS p, o.l_extendedprice AS value FROM (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.95 AS DOUBLE)), (CAST(0.99 AS DOUBLE))) ps(p) JOIN o ON o.rn = greatest(1, CAST(ceil(ps.p * o.n) AS BIGINT)) ORDER BY p""",
    "sample_stratified" ->
      """SELECT doc_id, source FROM (SELECT doc_id, source, list_reduce(list_transform(range(1, 5), i -> CAST(instr('0123456789abcdef', substr(md5(text), i, 1)) - 1 AS BIGINT)), (a, b) -> a * 16 + b) AS h FROM documents) WHERE h < CASE WHEN source IN ('src0', 'src1', 'src2') THEN 49152 ELSE 16384 END ORDER BY doc_id""",
    "split_assign" ->
      """SELECT doc_id, CASE WHEN substr(md5(text), 1, 1) IN ('c', 'd') THEN 'val' WHEN substr(md5(text), 1, 1) IN ('e', 'f') THEN 'test' ELSE 'train' END AS split FROM documents ORDER BY doc_id""",
    "pack_sequences" ->
      """WITH t AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens, CAST(list_reduce(list_transform(range(1, 5), i -> CAST(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)), (a, b) -> a * 16 + b) % 8 AS INT) AS grp FROM documents), c AS (SELECT doc_id, grp, n_tokens, COALESCE(SUM(n_tokens) OVER (PARTITION BY grp ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM t) SELECT doc_id, grp, CAST(cum_before // 256 AS BIGINT) AS seq_id, n_tokens FROM c ORDER BY doc_id""",
    "mix_sources" ->
      """WITH ranked AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rnk FROM documents), tgt AS (SELECT min(cnt) AS t FROM (SELECT count(*) AS cnt FROM documents GROUP BY source)) SELECT doc_id, source FROM ranked, tgt WHERE rnk <= t ORDER BY doc_id""",
    "mix_temperature" ->
      """WITH d AS (SELECT doc_id, source, text FROM (SELECT doc_id, source, text, list_reduce(list_transform(range(1, 5), i -> CAST(instr('0123456789abcdef', substr(md5(text), i, 1)) - 1 AS BIGINT)), (a, b) -> a * 16 + b) AS h FROM documents) WHERE h < CASE WHEN source IN ('src0', 'src1', 'src2') THEN 49152 ELSE 16384 END), c AS (SELECT source, count(*) AS n FROM d GROUP BY 1), w AS (SELECT source, n, CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS wq FROM c), t AS (SELECT CAST(sum(wq) AS BIGINT) AS tw FROM w), q AS (SELECT source, least(n, 100 * wq // tw) AS quota FROM w, t), r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rnk FROM d) SELECT r.doc_id, r.source FROM r JOIN q USING (source) WHERE rnk <= quota ORDER BY doc_id""",
    "chunk_documents" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), idx AS (SELECT doc_id, t, len(t) AS n, unnest(range(0, (len(t) - 1) // 24 + 1)) AS i FROM toks) SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, CAST(i * 24 AS BIGINT) AS start_tok, CAST(least(32, n - i * 24) AS BIGINT) AS n_chunk_tokens, list_aggregate(t[i * 24 + 1 : i * 24 + 32], 'string_agg', ' ') AS chunk_text FROM idx WHERE i = 0 OR (i - 1) * 24 + 32 < n ORDER BY doc_id, chunk_id""",
    "text_perplexity" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), bgs AS (SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg FROM toks WHERE len(t) >= 2), m AS (SELECT doc_id, bg, count(*) AS m FROM bgs GROUP BY 1, 2), cb AS (SELECT bg, sum(m) AS cbg FROM m GROUP BY 1), cu AS (SELECT split_part(bg, ' ', 1) AS u, sum(cbg) AS cu FROM cb GROUP BY 1), v AS (SELECT count(DISTINCT tok) AS v FROM (SELECT unnest(t) AS tok FROM toks)), mdl AS (SELECT bg, CAST(floor(ln(CAST(cbg + 1 AS DOUBLE) / CAST(cu.cu + v.v AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS lnp_q FROM cb JOIN cu ON split_part(cb.bg, ' ', 1) = cu.u CROSS JOIN v) SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams, CAST(-sum(m * lnp_q) AS BIGINT) AS nll_q, CAST(CAST(-sum(m * lnp_q) AS BIGINT) AS DOUBLE) / CAST(CAST(sum(m) AS BIGINT) AS DOUBLE) AS mean_nll_q FROM m JOIN mdl USING (bg) GROUP BY 1 ORDER BY doc_id""",
    "text_gopher" ->
      """WITH aug AS (SELECT doc_id, coalesce(text, '') || chr(10) || CASE WHEN doc_id % 3 = 0 THEN '- bullet item' ELSE 'plain line' END || chr(10) || CASE WHEN doc_id % 4 = 0 THEN 'trailing thought...' ELSE 'closing line' END AS t FROM documents), m AS (SELECT doc_id, CASE WHEN length(trim(t)) = 0 THEN 0 ELSE len(string_split_regex(trim(t), '\s+')) END AS n_tokens, len(string_split(t, chr(10))) AS n_lines, len(list_filter(string_split(t, chr(10)), l -> l LIKE '- %' OR l LIKE '* %')) AS n_bullet_lines, len(list_filter(string_split(t, chr(10)), l -> l LIKE '%...')) AS n_ellipsis_lines, len(list_filter(string_split_regex(trim(t), '\s+'), x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha_tokens, len(regexp_extract_all(t, '#')) + len(regexp_extract_all(t, '\.\.\.')) AS n_symbols, (CASE WHEN len(regexp_extract_all(lower(t), '\bthe\b')) > 0 THEN 1 ELSE 0 END + CASE WHEN len(regexp_extract_all(lower(t), '\bbe\b')) > 0 THEN 1 ELSE 0 END + CASE WHEN len(regexp_extract_all(lower(t), '\bto\b')) > 0 THEN 1 ELSE 0 END + CASE WHEN len(regexp_extract_all(lower(t), '\bof\b')) > 0 THEN 1 ELSE 0 END + CASE WHEN len(regexp_extract_all(lower(t), '\band\b')) > 0 THEN 1 ELSE 0 END + CASE WHEN len(regexp_extract_all(lower(t), '\bthat\b')) > 0 THEN 1 ELSE 0 END + CASE WHEN len(regexp_extract_all(lower(t), '\bhave\b')) > 0 THEN 1 ELSE 0 END + CASE WHEN len(regexp_extract_all(lower(t), '\bwith\b')) > 0 THEN 1 ELSE 0 END) AS n_stop_hits, length(regexp_replace(t, '\s', '', 'g')) AS n_nonws FROM aug) SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(n_lines AS BIGINT) AS n_lines, CAST(n_bullet_lines AS BIGINT) AS n_bullet_lines, CAST(n_ellipsis_lines AS BIGINT) AS n_ellipsis_lines, CAST(n_alpha_tokens AS BIGINT) AS n_alpha_tokens, CAST(n_symbols AS BIGINT) AS n_symbols, CAST(n_stop_hits AS BIGINT) AS n_stop_hits, CASE WHEN n_tokens > 0 THEN CAST(n_nonws AS DOUBLE) / n_tokens END AS mean_word_len, CASE WHEN n_tokens > 0 THEN CAST(n_symbols AS DOUBLE) / n_tokens END AS symbol_ratio, CASE WHEN n_tokens > 0 THEN CAST(n_alpha_tokens AS DOUBLE) / n_tokens END AS alpha_frac, CAST(n_bullet_lines AS DOUBLE) / n_lines AS bullet_frac, CAST(n_ellipsis_lines AS DOUBLE) / n_lines AS ellipsis_frac, ((n_tokens BETWEEN 20 AND 120) AND (CAST(n_nonws AS DOUBLE) / n_tokens BETWEEN 2.0 AND 12.0) AND (CAST(n_symbols AS DOUBLE) / n_tokens < 0.1) AND (CAST(n_alpha_tokens AS DOUBLE) / n_tokens > 0.7) AND (n_stop_hits >= 1) AND (CAST(n_bullet_lines AS DOUBLE) / n_lines < 0.9) AND (CAST(n_ellipsis_lines AS DOUBLE) / n_lines < 0.3)) AS passes FROM m ORDER BY doc_id""",
    "pipeline_mix" ->
      """WITH d0 AS (SELECT doc_id, source, CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0 ELSE len(string_split_regex(trim(coalesce(text, '')), '\s+')) END AS n_tokens, md5(coalesce(text, '')) AS h FROM documents), gate AS (SELECT * FROM d0 WHERE n_tokens BETWEEN 12 AND 100000), ded AS (SELECT doc_id, source, n_tokens, h FROM (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM gate) WHERE rn = 1), bud AS (SELECT doc_id, source, n_tokens FROM (SELECT doc_id, source, n_tokens, CASE source WHEN 'src0' THEN 4000 WHEN 'src1' THEN 1000 ELSE 2000 END AS budget, COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM ded) WHERE cum_before < budget), g AS (SELECT doc_id, source, n_tokens, CAST(list_reduce(list_transform(range(1, 5), i -> CAST(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)), (a, b) -> a * 16 + b) % 8 AS INT) AS grp FROM bud), c AS (SELECT doc_id, source, grp, n_tokens, COALESCE(SUM(n_tokens) OVER (PARTITION BY grp ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM g) SELECT doc_id, source, grp, CAST(cum_before // 256 AS BIGINT) AS seq_id, CAST(n_tokens AS BIGINT) AS n_tokens FROM c ORDER BY doc_id""",
    "token_budget" ->
      """WITH d AS (SELECT doc_id, source, CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0 ELSE len(string_split_regex(trim(coalesce(text, '')), '\s+')) END AS n_tokens, md5(coalesce(text, '')) AS h, CASE source WHEN 'src0' THEN 4000 WHEN 'src1' THEN 1000 ELSE 2000 END AS budget FROM documents), c AS (SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens, budget, CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM d) SELECT doc_id, source, n_tokens, cum_before FROM c WHERE cum_before < budget ORDER BY doc_id""",
    "top_ngrams" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS s FROM toks WHERE len(t) >= 2), inv AS (SELECT doc_id, unnest(s) AS gram FROM sh) SELECT gram, count(DISTINCT doc_id) AS df FROM inv GROUP BY 1 ORDER BY df DESC, gram ASC LIMIT 20""",
    "tfidf_top_terms" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), tok AS (SELECT doc_id, unnest(t) AS term FROM toks), tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2), dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), n AS (SELECT count(DISTINCT doc_id) AS n FROM tf), scored AS (SELECT doc_id, term, tf, df, CAST(tf * n AS DOUBLE) / df AS score FROM tf JOIN dft USING (term) CROSS JOIN n), ranked AS (SELECT doc_id, term, tf, df, score, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank FROM scored) SELECT doc_id, rank, term, tf, df, score FROM ranked WHERE rank <= 5 ORDER BY doc_id, rank""",
    "contamination" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 6), i -> list_aggregate(t[i:i+7], 'string_agg', ' '))) AS s FROM toks WHERE len(t) >= 8), inv AS (SELECT doc_id, unnest(s) AS g FROM sh) SELECT tr.doc_id, count(DISTINCT ev.eval_id) AS n_eval_docs, count(*) AS shared_grams FROM (SELECT g, doc_id FROM inv WHERE doc_id >= 25) tr JOIN (SELECT g, doc_id AS eval_id FROM inv WHERE doc_id < 25) ev USING (g) GROUP BY 1 ORDER BY doc_id""",
    "doc_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), mf AS (SELECT doc_id, max(c) AS max_tok_freq FROM (SELECT doc_id, tok, count(*) AS c FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY doc_id, tok) GROUP BY 1) SELECT toks.doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct, mf.max_tok_freq, CASE WHEN len(t) > 2 THEN 1.0 - len(list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) * 1.0 / (len(t) - 2) ELSE 0.0 END AS rep3_ratio FROM toks JOIN mf ON toks.doc_id = mf.doc_id ORDER BY toks.doc_id""",
    "embed_neardup" ->
      s"""$lshBucketsCte, cand AS (SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b FROM allb a JOIN allb c ON a.t = c.t AND a.b = c.b AND a.vec_id < c.vec_id), scored AS (SELECT id_a, id_b, list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])) AS c FROM cand JOIN embeddings ea ON ea.vec_id = id_a JOIN embeddings eb ON eb.vec_id = id_b) SELECT id_a, id_b, CAST(floor(c * 10000 + 0.5) AS BIGINT) AS cos_bp FROM scored WHERE c >= 0.2 ORDER BY id_a, id_b""",
    "ann_lsh" ->
      s"""$lshBucketsCte, cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id FROM allb q JOIN allb c ON q.t = c.t AND q.b = c.b WHERE q.vec_id < 16 AND q.vec_id <> c.vec_id), scored AS (SELECT cand.query_id, cand.vec_id, row_number() OVER (PARTITION BY cand.query_id ORDER BY list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]), CAST(ce.embedding AS DOUBLE[])) DESC, cand.vec_id ASC) AS rank FROM cand JOIN embeddings qe ON qe.vec_id = cand.query_id JOIN embeddings ce ON ce.vec_id = cand.vec_id) SELECT query_id, rank, vec_id FROM scored WHERE rank <= 5 ORDER BY query_id, rank""",
    "dedup_incremental" ->
      """WITH cut AS (SELECT max(doc_id) // 2 AS s FROM documents), h AS (SELECT doc_id, md5(coalesce(text, '')) AS h FROM documents), old AS (SELECT DISTINCT h FROM h, cut WHERE doc_id < s), nw AS (SELECT doc_id, h FROM h, cut WHERE doc_id >= s), firstnew AS (SELECT h, min(doc_id) AS first_id FROM nw GROUP BY 1) SELECT n.doc_id, CASE WHEN o.h IS NOT NULL THEN 'dup_of_old' WHEN n.doc_id <> f.first_id THEN 'dup_of_new' ELSE 'kept' END AS verdict FROM nw n LEFT JOIN old o USING (h) JOIN firstnew f USING (h) ORDER BY n.doc_id""",
    "dedup_minhash" ->
      """WITH rep AS (SELECT min(doc_id) AS doc_id, any_value(text) AS text FROM documents GROUP BY md5(text)), toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM rep WHERE text IS NOT NULL AND length(trim(text)) > 0), sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM toks WHERE len(t) >= 3), inv AS (SELECT doc_id, unnest(s) AS g FROM sh), pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id_a, id_b, jaccard FROM (SELECT id_a, id_b, inter * 1.0 / (la.n + lb.n - inter) AS jaccard FROM pairs JOIN (SELECT doc_id, len(s) AS n FROM sh) la ON id_a = la.doc_id JOIN (SELECT doc_id, len(s) AS n FROM sh) lb ON id_b = lb.doc_id) WHERE jaccard >= 0.7 ORDER BY id_a, id_b""",
    "dedup_simhash" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), tok AS (SELECT doc_id, unnest(t) AS tok FROM toks), th AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS HUGEINT), list_transform(range(1, 17), i -> CAST(instr('0123456789abcdef', substr(md5(tok), i, 1)) - 1 AS HUGEINT))), (a, b) -> a * 16 + b) AS h FROM tok), pw AS (SELECT CAST(b AS INTEGER) AS b, CAST(power(2, b) AS HUGEINT) AS p FROM (SELECT unnest(range(0, 64)) AS b)), votes AS (SELECT t.doc_id, pw.b, sum(CASE WHEN (t.h // pw.p) % 2 = 1 THEN 1 ELSE -1 END) AS v FROM th t CROSS JOIN pw GROUP BY 1, 2), sigs AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN p ELSE CAST(0 AS HUGEINT) END) AS hu FROM votes JOIN pw USING (b) GROUP BY 1), signed AS (SELECT doc_id, hu, CAST(CASE WHEN hu >= 9223372036854775808 THEN hu - 18446744073709551616 ELSE hu END AS BIGINT) AS sim FROM sigs), chunked AS (SELECT s.doc_id, s.sim, c.c, CAST((s.hu // CAST(power(2, 16 * c.c) AS HUGEINT)) % 65536 AS BIGINT) AS ck FROM signed s CROSS JOIN (SELECT unnest(range(0, 4)) AS c) c), cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sim AS sim_a, b.sim AS sim_b FROM chunked a JOIN chunked b ON a.c = b.c AND a.ck = b.ck AND a.doc_id < b.doc_id) SELECT id_a, id_b, hamming FROM (SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming FROM cand) WHERE hamming <= 3 ORDER BY hamming, id_a, id_b LIMIT 200""",
    "q_approx_stats" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts, TRUE AS parts_ok, TRUE AS median_ok FROM lineitem GROUP BY 1 ORDER BY 1""",
    "dedup_ngram" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0), sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM toks WHERE len(t) >= 3), inv AS (SELECT doc_id, unnest(s) AS g FROM sh), pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT id_a, id_b, jaccard FROM (SELECT id_a, id_b, inter * 1.0 / (la.n + lb.n - inter) AS jaccard FROM pairs JOIN (SELECT doc_id, len(s) AS n FROM sh) la ON id_a = la.doc_id JOIN (SELECT doc_id, len(s) AS n FROM sh) lb ON id_b = lb.doc_id) WHERE jaccard >= 0.2 ORDER BY id_a, id_b""",
    "dedup_clusters" ->
      """WITH RECURSIVE rep AS (SELECT min(doc_id) AS doc_id, any_value(text) AS text FROM documents GROUP BY md5(text)), toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM rep WHERE text IS NOT NULL AND length(trim(text)) > 0), sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM toks WHERE len(t) >= 3), inv AS (SELECT doc_id, unnest(s) AS g FROM sh), pairs0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2), p AS (SELECT id_a, id_b FROM (SELECT id_a, id_b, inter * 1.0 / (la.n + lb.n - inter) AS jaccard FROM pairs0 JOIN (SELECT doc_id, len(s) AS n FROM sh) la ON id_a = la.doc_id JOIN (SELECT doc_id, len(s) AS n FROM sh) lb ON id_b = lb.doc_id) WHERE jaccard >= 0.7), nodes AS (SELECT id_a AS id FROM p UNION SELECT id_b FROM p), e AS (SELECT id_a AS s, id_b AS d FROM p UNION SELECT id_b AS s, id_a AS d FROM p), cc(id, lbl) AS (SELECT id, id FROM nodes UNION SELECT e.d, cc.lbl FROM cc JOIN e ON cc.id = e.s), lab AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM cc GROUP BY 1), sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1) SELECT l.cluster_id, l.doc_id, s.cluster_size, l.doc_id = l.cluster_id AS keep FROM lab l JOIN sz s USING (cluster_id) ORDER BY cluster_id, doc_id""",
    "ann_ivf" ->
      """WITH c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings WHERE vec_id % (SELECT greatest(count(*) // 16, 1) FROM embeddings) = 0 ORDER BY vec_id LIMIT 16), assigned AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, (SELECT c.cid FROM c ORDER BY list_cosine_similarity(c.cv, CAST(e.embedding AS DOUBLE[])) DESC, c.cid DESC LIMIT 1) AS cluster FROM embeddings e), probed AS (SELECT q.vec_id AS query_id, CAST(q.embedding AS DOUBLE[]) AS qv, p.cid AS cluster FROM embeddings q, LATERAL (SELECT c.cid FROM c ORDER BY list_cosine_similarity(c.cv, CAST(q.embedding AS DOUBLE[])) DESC, c.cid DESC LIMIT 4) p WHERE q.vec_id < 16), cand AS (SELECT p.query_id, a.vec_id, row_number() OVER (PARTITION BY p.query_id ORDER BY list_cosine_similarity(p.qv, a.v) DESC, a.vec_id ASC) AS rank FROM probed p JOIN assigned a ON p.cluster = a.cluster AND p.query_id <> a.vec_id) SELECT query_id, rank, vec_id FROM cand WHERE rank <= 5 ORDER BY query_id, rank""",
    "ann_topk" ->
      """SELECT query_id, rank, vec_id FROM (SELECT q.vec_id AS query_id, c.vec_id AS vec_id, row_number() OVER (PARTITION BY q.vec_id ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id ASC) AS rank FROM embeddings q, embeddings c WHERE q.vec_id < 16 AND q.vec_id <> c.vec_id) WHERE rank <= 5 ORDER BY query_id, rank""",
    "heavy_hitters" ->
      """SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents GROUP BY 1 ORDER BY n_docs DESC, source ASC LIMIT 5""",
    "text_tokens_bpe" ->
      """SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe FROM documents ORDER BY doc_id""",
    "q_sessionize" ->
      """SELECT user_id, session_id, count(*) AS n_events, min(tus) AS start_us, max(tus) AS end_us FROM (SELECT user_id, event_id, tus, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM (SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS tus, CASE WHEN lag(CAST(epoch_us(ts) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) IS NULL OR CAST(epoch_us(ts) AS BIGINT) - lag(CAST(epoch_us(ts) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM events)) GROUP BY 1, 2 ORDER BY 1, 2""",
    "stream_window_counts" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, event_type, count(*) AS cnt FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "stream_topk" ->
      """WITH h AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, event_id, value FROM events), r AS (SELECT hour, event_id, value, row_number() OVER (PARTITION BY hour ORDER BY value DESC, event_id ASC) AS rnk FROM h) SELECT hour, rnk, event_id, value FROM r WHERE rnk <= 3 ORDER BY hour, rnk""",
    "stream_attribution" ->
      """WITH ev AS (SELECT user_id, event_type, event_id, CAST(epoch_us(ts) AS BIGINT) AS tus FROM events), c AS (SELECT user_id, event_id AS click_id, tus AS ctus FROM ev WHERE event_type = 'click'), p AS (SELECT user_id, event_id AS purchase_id, tus AS ptus FROM ev WHERE event_type = 'purchase') SELECT p.purchase_id, p.user_id, count(*) AS n_clicks, max(c.ctus) AS last_click_us FROM p JOIN c ON p.user_id = c.user_id AND c.ctus <= p.ptus AND c.ctus >= p.ptus - 1800000000 GROUP BY 1, 2 ORDER BY purchase_id"""
  )
}
