package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph clustering for the dedup pipeline: near-dup PAIRS (the output
  * of the minhash/simhash/ngram operators) are only half of
  * deduplication — transitive closure must collapse them into duplicate
  * CLUSTERS so each cluster keeps exactly one canonical representative.
  * A pairwise keep-the-min rule is wrong under transitivity: for a
  * chain a~b, b~c (a<b<c) it would drop b (loses to a) and keep c
  * (beats nobody it was paired with), leaving two "representatives" of
  * one duplicate group.
  *
  * The component algorithm is alternating large-star / small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * ACM SoCC 2014): each round is two shuffle stages and the edge set
  * converges to min-rooted stars in O(log^2 n) rounds — independent of
  * component DIAMETER, which is what kills naive label propagation at
  * corpus scale (a chain of boilerplate near-dups propagates one hop
  * per round). Both stars use the min-JOIN formulation (aggregate the
  * per-node min, join it back) rather than `collect_set` neighborhoods:
  * a giant component's star center has degree = component size, and a
  * collected neighbor array for such a node is an OOM on one row at
  * 100 TB, while a partial-aggregated `min` + join never materializes a
  * neighborhood.
  */
object Clustering {

  /** Minimum-label connected components over an undirected edge list.
    *
    * @param edges two LONG columns naming the endpoints (`uCol`,`vCol`);
    *              self-loops and duplicate/reversed pairs are tolerated
    *              (a node appearing ONLY in self-loops labels itself).
    * @return (`doc_id`, `cluster_id`) — one row per distinct endpoint,
    *         `cluster_id` = smallest id reachable from it. The result is
    *         persisted + materialized (caller/harness releases it, as
    *         with every handoff-cached operator result).
    *
    * Each round `localCheckpoint`s the edge frontier: iterative joins
    * otherwise stack lineage (re-deriving round k replays rounds
    * 1..k-1, and the plan itself grows unboundedly). On a real cluster
    * with lossy executors this would be a reliable `checkpoint` to the
    * checkpoint dir; local eager checkpoints are the single-JVM analog.
    * NOTE `Dataset.unpersist` is a no-op on a localCheckpoint'ed frame
    * (the blocks are RDD-level, invisible to the CacheManager), so each
    * round releases its predecessor through the checkpointed RDD itself
    * — without that, up to maxRounds edge-set copies sit in the block
    * manager until the ContextCleaner happens to reap them.
    * Convergence = fixpoint of the canonical edge set, detected by
    * (count, xor of per-edge hashes) — two scalar aggregates, no
    * driver-side edge materialization.
    */
  /** Labels plus run metadata: `converged` is false when the round
    * budget ran out (labels are then BEST-EFFORT: correct for every
    * component that reached its star fixpoint, possibly split for ones
    * still merging); `rounds` is the number of iterations executed.
    */
  final case class CcResult(labels: DataFrame, converged: Boolean, rounds: Int)

  def connectedComponents(
      edges: DataFrame,
      uCol: String = "id_a",
      vCol: String = "id_b",
      maxRounds: Int = 30,
      localThreshold: Long = 1L << 19
  ): DataFrame =
    connectedComponentsWithStats(edges, uCol, vCol, maxRounds, localThreshold).labels

  /** @param localThreshold distinct-edge count at or below which the
    *   closure solves DRIVER-SIDE (union-find over the collected edge
    *   list) instead of iterating distributed star rounds. The near-dup
    *   graphs this operator closes are PAIRS ABOVE A SIMILARITY
    *   THRESHOLD — orders of magnitude smaller than the corpus — so at
    *   any scale the common case is a bounded edge list paying 4-6
    *   fixed-overhead Spark jobs per star round for nothing (measured
    *   2.5 s of round overhead on a few-hundred-edge graph at sf0.1).
    *   The switch is decided by the SAME scalar aggregate the fixpoint
    *   check already runs, the labels are identical by construction
    *   (min-of-component — spec-pinned equal to the distributed path),
    *   and a genuinely corpus-scale edge set (> threshold) still takes
    *   the star iteration. Collected through the primitive tuple
    *   encoder, 512k edges cost ~25 MB of transient driver heap (plus
    *   up to 2× that many distinct node ids as longs) — inside any
    *   driver sized to run Spark at all; raise the threshold only with
    *   driver memory to match. Pass 0 to force the distributed path
    *   (the specs do).
    */
  def connectedComponentsWithStats(
      edges: DataFrame,
      uCol: String = "id_a",
      vCol: String = "id_b",
      maxRounds: Int = 30,
      localThreshold: Long = 1L << 19
  ): CcResult = {
    // one evaluation of the caller's edge pipeline feeds BOTH the first
    // frontier checkpoint and the node set for singleton labeling — an
    // uncached input (the public API takes any edge DataFrame) would
    // otherwise re-run its full upstream pipeline for the final labels
    val raw0 = edges
      .select(col(uCol).cast("long").as("u"), col(vCol).cast("long").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val raw = raw0.filter(col("u") =!= col("v"))

    /** Eagerly checkpoint `df` and hand back a release hook for its
      * RDD-level blocks (see the unpersist note in the scaladoc).
      */
    def checkpointed(df: DataFrame): (DataFrame, () => Unit) = {
      val cp = df.localCheckpoint(true)
      val release = () => cp.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(false); ()
      }.getOrElse(())
      (cp, release)
    }

    def canonical(e: DataFrame): DataFrame =
      e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct()

    /** (#edges, xor of edge hashes): cheap fixpoint fingerprint. The xor
      * is order-independent and exact on the edge MULTISET — which after
      * `canonical`'s distinct is the edge set itself.
      */
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(
        count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h")
      ).head()
      (r.getLong(0), r.getLong(1))
    }

    /** Large-star: every node links its LARGER neighbors to the min of
      * its closed neighborhood. m(u) = least(u, min over N(u)).
      */
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(least(col("u"), min(col("v"))).as("m"))
      sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
    }

    /** Small-star: per larger endpoint, link all SMALLER neighbors (and
      * the node itself) to the smallest of them.
      */
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      val mins = dir.groupBy("u").agg(min(col("v")).as("m"))
      dir.join(mins, "u")
        .select(explode(array(
          struct(col("v").as("x"), col("m")),
          struct(col("u").as("x"), col("m"))
        )).as("p"))
        .select(col("p.x").as("u"), col("p.m").as("v"))
        .filter(col("u") =!= col("v"))
    }

    // Path decision BEFORE any checkpoint: the eager localCheckpoint
    // exists to cut the ITERATIVE path's lineage stacking — on the fast
    // path it is pure waste (materialize + store + release RDD blocks
    // for a frame read exactly once). The count comes from the same
    // scalar fingerprint aggregate, evaluated on the un-checkpointed
    // canonical plan (raw0 is persisted, so nothing upstream replays);
    // the distributed path pays one extra distinct+agg over that plan —
    // noise against its 2-shuffle-per-round iteration.
    val canon0 = canonical(raw)
    val fp0 = fingerprint(canon0)

    // SMALL-GRAPH FAST PATH (see the localThreshold scaladoc): the edge
    // count is already on the driver from the fingerprint aggregate.
    if (fp0._1 <= localThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      // primitive tuple encoder: collect lands specialized
      // Tuple2$mcJJ$sp instances (~48 B/edge with headers), not
      // GenericRows (~100 B/edge + field boxing) — the driver's
      // transient footprint at the threshold is ~25 MB, not hundreds
      val pairs = graft.engine.DriverBudget.collect(
          "Clustering.localEdges", localThreshold)(
          canon0.select(col("u"), col("v")))
        .map(r => (r.getLong(0), r.getLong(1)))
      // union-find, always attaching the larger root under the smaller:
      // every component's final root is its minimum id — the same label
      // the star fixpoint converges to
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
        var c = x
        while (parent.getOrDefault(c, c) != c) {
          val n = parent.getOrDefault(c, c); parent.put(c, r); c = n
        }
        r
      }
      pairs.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
      }
      // every distinct endpoint of the RAW input (self-loop-only nodes
      // included) labels with its component min — itself if unpaired
      // endpoints of ≤ localThreshold edges: ≤ 2x the edge bound
      val nodeRows = graft.engine.DriverBudget.collect(
          "Clustering.localNodes", 2L * localThreshold)(
          raw0.select(col("u")).union(raw0.select(col("v").as("u"))).distinct())
        .map(_.getLong(0))
      val labels = nodeRows.toSeq.map(n => (n, find(n))).toDF("doc_id", "cluster_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      labels.count()
      raw0.unpersist(blocking = false)
      return CcResult(labels, converged = true, rounds = 0)
    }

    var (e, releaseE) = checkpointed(canon0)
    var fp = fp0

    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val (next, releaseNext) = checkpointed(canonical(smallStar(largeStar(e))))
      val nfp = fingerprint(next)
      converged = nfp == fp
      releaseE()
      e = next
      releaseE = releaseNext
      fp = nfp
      rounds += 1
    }
    // Non-convergence is NOT an abort: on a real corpus, throwing at
    // round `maxRounds` forfeits hours of cluster work over (typically)
    // a handful of still-merging giant components. Alternating
    // large/small-star converges in O(log^2 n) rounds regardless of
    // graph diameter (Kiveris et al., SoCC'14), so a blown budget means
    // a pathological input — surface it loudly in the logs and in the
    // returned flag, hand back the best-effort labels (exact for every
    // component that reached its fixpoint), and let the caller decide.
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents stopped at maxRounds=$maxRounds without reaching the " +
          "edge fixpoint; labels are best-effort (unconverged components may be split)")

    // converged edges are min-rooted stars: (member, root). Roots appear
    // only on the right side; emit them as their own cluster_id, and
    // nodes that only ever appeared in self-loops as singletons.
    val members = e.select(col("u").as("doc_id"), col("v").as("cluster_id"))
    val roots = e.select(col("v").as("doc_id"), col("v").as("cluster_id")).distinct()
    // at the fixpoint every node is either a member of exactly one star
    // or a root — the union is already one row per node. Short of the
    // fixpoint a node can be both, so the best-effort path collapses to
    // one (minimal) label per node; the extra aggregation is paid ONLY
    // on the unconverged path.
    val labeledAll = members.union(roots)
    val labeled =
      if (converged) labeledAll
      else labeledAll.groupBy("doc_id").agg(min(col("cluster_id")).as("cluster_id"))
        .select(col("doc_id"), col("cluster_id"))
    val nodes = raw0.select(col("u")).union(raw0.select(col("v").as("u"))).distinct()
    val singletons = nodes.join(labeled, nodes("u") === labeled("doc_id"), "left_anti")
      .select(col("u").as("doc_id"), col("u").as("cluster_id"))
    // materialize into a normal (CacheManager-visible) persist, then drop
    // the final frontier's RDD blocks — the caller releases the result.
    // MEMORY_AND_DISK evicts to disk rather than dropping, which matters
    // here: out's lineage bottoms out in the released checkpoint, so a
    // genuinely LOST partition (executor death on a real cluster) is not
    // recomputable — the cluster deployment swaps localCheckpoint for
    // reliable checkpoint() exactly as the scaladoc prescribes.
    val out = labeled.union(singletons)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    releaseE()
    raw0.unpersist(blocking = false)
    CcResult(out, converged, rounds)
  }

  /** Driver query: minhash near-dup pairs at Jaccard >= 0.7 collapsed
    * into duplicate clusters. Output one row per clustered doc with its
    * canonical representative (`keep` marks the min-id member). The
    * DuckDB oracle recomputes the same pairs and closes them with a
    * recursive CTE, so transitivity itself is hash-checked.
    */
  def dedupClustersQuery(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup
      .corpusMinhashPairs(spark, dir, threshold = 0.7)
      .select("id_a", "id_b")
    val labels = connectedComponents(pairs)
    val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster_id")
      .select(
        col("cluster_id"),
        col("doc_id"),
        col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("keep")
      )
      .orderBy("cluster_id", "doc_id")
  }

  /** CONTENT-AWARE canonical selection over near-dup clusters — the
    * curation policy layered on [[dedupClustersQuery]]'s min-id rule:
    * real pipelines keep the MOST COMPLETE member of a duplicate group
    * (near-dups are usually truncations/excerpts of one another), so
    * the canonical is argmax token count, smallest id on ties. One row
    * per clustered doc with the cluster's keeper; downstream a corpus
    * anti-joins `keep = false` ids exactly as with the min-id rule.
    *
    * Scale shape: labels come from the same pair graph; token counts
    * ride the fused single-pass kernel ([[graft.functions.text]]); the
    * argmax is a min(struct) aggregate with map-side partials (one
    * clusters-sized exchange), joined back on cluster_id — nothing
    * corpus-sized is sorted or collected.
    */
  def dedupCanonicalQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.text
    val docs = Tables.documents(spark, dir)
    val pairBytes = graft.engine.AssetStore.pathBytes(spark,
      Dedup.minhashPairAssetPath(spark, dir, threshold = 0.7))
    val pairs = Dedup
      .corpusMinhashPairs(spark, dir, threshold = 0.7)
      .select("id_a", "id_b")
    val labels = connectedComponents(pairs)
    // token kernel AFTER the join, labels SIZE-GATED broadcast (labels
    // are near-dup-mass-sized — a corpus property): under the gate the
    // corpus scan stays partition-local (no text ever shuffles) and the
    // per-row tokenizer runs only on the matched slice; past it AQE
    // plans the shuffled join
    val lab = graft.engine.Skew.gatedBroadcast(labels, pairBytes)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .withColumn("n_tokens", text.tokenCount(col("text")).cast("long"))
      .drop("text")
    val best = lab.groupBy("cluster_id")
      .agg(min(struct((-col("n_tokens")).as("nt"), col("doc_id").as("d"))).as("b"))
      .select(col("cluster_id"), col("b.d").as("keep_id"))
    lab.join(best, "cluster_id")
      .select(
        col("cluster_id"),
        col("doc_id"),
        col("n_tokens"),
        col("keep_id"),
        (col("doc_id") === col("keep_id")).as("keep"))
      .orderBy("cluster_id", "doc_id")
  }

  /** EFFECTIVE SOURCE SIZES (round 17) — the number every mix weight
    * should actually be computed from: per source, raw documents,
    * exact-dedup survivors (distinct-text representatives, attributed
    * to the min-id doc's source) and near-dup-dedup survivors (reps in
    * no cluster plus each cluster's kept canonical), with the kept
    * fraction in basis points. A source that is 40% self-duplicated
    * contributes 40% less signal than its raw size claims — weighting
    * on raw counts over-trains on its boilerplate; this is the table
    * that corrects it, composing the exact and near tiers the repo
    * already prices separately (dedup_rate_by_source /
    * neardup_rate_by_source).
    *
    * Scale shape: one md5-keyed exchange for the rep set (already paid
    * by every exact tier); cluster labels from the bounded
    * large-star/small-star closure over the broadcastable pair asset;
    * rollups are sources-sized.
    */
  def mixEffectiveSizes(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nd = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val reps = docs.groupBy(md5(col("text")).as("__h")).agg(min(col("doc_id")).as("doc_id"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    val keep = dedupClustersQuery(spark, dir).select(col("doc_id"), col("keep"))
    val agg = reps.join(keep, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_reps"),
        sum(when(col("keep").isNull || col("keep"), 1L).otherwise(0L)).as("n_kept"))
    nd.join(agg, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_reps"), lit(0L)).as("n_reps"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .withColumn("kept_bp", expr("(10000 * n_kept) DIV n_docs"))
      .orderBy("source")
  }

  /** NEAR-DUP CLUSTER SIZE PROFILE (round 17) — doubling histogram of
    * [[dedupClustersQuery]]'s cluster sizes: clusters per size bucket,
    * member mass, and the largest cluster. The size distribution IS
    * the dedup policy input — a long tail of pairs dedups cheaply and
    * safely, while a giant cluster (templated boilerplate, a mirrored
    * site) means canonical-selection policy suddenly governs a visible
    * corpus fraction, and is also the structure every
    * transitive-closure cost estimate keys on.
    *
    * Scale shape: the component labels come from the same bounded
    * large-star/small-star fixpoint (pair-graph-sized, never corpus);
    * the histogram is a clusters-keyed count folded into ≤64 doubling
    * buckets, map-side combined.
    */
  def clusterSizeHist(spark: SparkSession, dir: String): DataFrame =
    dedupClustersQuery(spark, dir)
      .select(col("cluster_id"), col("cluster_size"))
      .dropDuplicates("cluster_id")
      .groupBy((length(bin(col("cluster_size"))) - 1).cast("long").as("k"))
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("total_members"),
        max(col("cluster_size")).as("max_size"))
      .orderBy("k")
}
