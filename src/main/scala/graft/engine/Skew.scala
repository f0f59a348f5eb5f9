package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys — the engine-level complement to
  * AQE's runtime skew-join splitting (which only fires on sort-merge
  * joins past size thresholds).
  *
  * Salted join: the skewed (big) side gets a random salt in [0, n); the
  * small side is exploded n ways so every salted key finds its match.
  * One hot key then spreads over n shuffle partitions at the cost of
  * replicating the small side n-fold — the standard trade.
  */
object Skew {

  /** Content-derived salt in [0, n): hashes EVERY column of the row, so
    * the assignment is a pure function of row content — identical under
    * replays, retries, and any input repartitioning (unlike
    * `monotonically_increasing_id`/`rand`, which depend on partition
    * layout). Trade-off: byte-identical duplicate rows co-locate on one
    * salt; for spreading a hot key that is the right behavior unless the
    * input is dominated by exact duplicates (dedup first in that case).
    */
  def saltExpr(columns: Seq[String], n: Int): Column =
    pmod(xxhash64(columns.map(col): _*), lit(n.toLong))

  /** Inner-join `big` with `small` on `keys`, salting `big` n ways.
    * `small` must be the replicable side (dimension-sized).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String], salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val bigS = big.withColumn("__salt", saltExpr(big.columns.toSeq, salt))
    val smallS = small.withColumn("__salt", explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }

  /** Top-n heavy hitters of a key — feed this to decide whether to salt
    * (the observability half the reference got from its `_size` stats).
    */
  def keyHistogram(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"))
      .limit(topN)

  /** CARDINALITY CONTRACT for pairwise-matrix operators (round 15) —
    * the guard companion to the df-cap convention. An operator that
    * emits a keys×keys matrix (vocab_overlap's sources², audience
    * overlap's event-types²) is only sane while the key space is
    * DIMENSION-sized; fed a corpus where the "dimension" turns out to
    * be high-cardinality (10k sources → 100M pairs) it degrades
    * quadratically with no plan-level warning. This makes the contract
    * executable: one tiny distinct-count job over the (already
    * persisted, key-skinny) input, failing fast with the operator's
    * name and the remedy instead of melting the shuffle.
    */
  val MaxPairwiseKeys = 4096L

  def requirePairwiseKeyBound(df: DataFrame, keyCol: String, op: String,
      max: Long = MaxPairwiseKeys): Unit = {
    val n = df.select(keyCol).distinct().count()
    require(n <= max,
      s"$op: $n distinct '$keyCol' keys exceed the pairwise-matrix cap $max " +
        s"(the operator emits keys² pairs) — bucket or shard '$keyCol' first, " +
        "or raise the cap deliberately for a dimension you know is bounded")
  }

  /** SIZE-GATED broadcast hint (round 18) — for frames whose size is a
    * CORPUS PROPERTY, not a constant. A forced `broadcast()` overrides
    * `autoBroadcastJoinThreshold` AND AQE's runtime re-plan: past
    * driver memory it fails with an OOM the plan audit cannot see (no
    * collect appears in the plan). Near-dup-mass-proportional frames
    * (verified pair tables, cluster labels, hit sets) are tiny on a
    * curated corpus but reach billions of rows at 20–40% near-dup rates
    * on a raw crawl — the 100 TB target. So the hint is earned, not
    * assumed: callers pass the LISTING BYTES of the materialized asset
    * the frame derives from ([[AssetStore.pathBytes]], metadata-only,
    * zero jobs); under the gate the hint keeps the corpus scan
    * partition-local, past it the hint is dropped and the (AQE-planned)
    * shuffled join runs — slower, but it completes.
    *
    * The threshold reads `spark.graft.broadcast.gateBytes` at call time
    * (default 100 MB of on-disk parquet; broadcast in-memory inflation
    * is bounded by a small constant at these row shapes and driver
    * heaps are GBs). Tests force it to 0 to pin the ungated plan;
    * PlanAuditSpec sweeps every query at gate 0 and pins the exact set
    * of queries still carrying a forced hint — so the next UNGATED
    * broadcast of a non-constant-bounded frame fails review
    * mechanically.
    */
  val BroadcastGateBytesKey = "spark.graft.broadcast.gateBytes"
  val DefaultBroadcastGateBytes: Long = 100L << 20

  def gatedBroadcast(df: DataFrame, assetBytes: Long): DataFrame = {
    val gate = df.sparkSession.conf
      .get(BroadcastGateBytesKey, DefaultBroadcastGateBytes.toString).toLong
    if (assetBytes <= gate) broadcast(df) else df
  }
}
