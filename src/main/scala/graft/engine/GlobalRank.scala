package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scalable global ranking. A bare `Window.orderBy(...)` (no partition)
  * collapses the whole table into ONE task — the classic global-sort
  * scale bug (`WindowExec: No Partition Defined` warning). This computes
  * the identical `row_number()`/`ntile()` answers with:
  *
  *   1. `repartitionByRange` on the sort key (total order ACROSS
  *      partitions, parallel sort WITHIN each — Spark's own SortExec
  *      building block),
  *   2. a per-partition window (partitioned by `spark_partition_id`,
  *      so every task ranks only its own slice), and
  *   3. driver-collected per-partition counts (one tiny row per
  *      partition) turned into broadcast rank offsets.
  *
  * Cost: one extra pass for the counts (the ranged shuffle output is
  * persisted and reused). At 100 TB the same shape holds: the only
  * driver-side state is one long per partition.
  */
object GlobalRank {

  /** `df` plus a 1-based global `rankCol` ordered by `sortCols` (must be
    * a total order — include unique tiebreak columns), and the total row
    * count. No single-partition stage anywhere in the plan.
    */
  def withRowNumber(
      df: DataFrame,
      sortCols: Seq[Column],
      rankCol: String
  ): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // tiny: one (pid, count) row per partition
    val counts = DriverBudget.collect("GlobalRank.partitionCounts", parts.toLong)(
        ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt")))
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets = counts
      .scanLeft((-1, 0L, 0L)) { case ((_, off, cnt), (pid, c)) => (pid, off + cnt, c) }
      .drop(1)
      .map { case (pid, off, _) => (pid, off) }

    val offsetDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val ranked = ranged
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(rankCol, (col("__off") + row_number().over(w)).cast(LongType))
      .drop("__pid", "__off")
    // NO Caching.handoff here: `ranked` is FULL-WIDTH (the input plus a
    // rank), so persisting it would cost a second full copy plus a
    // materializing pass for a result both in-tree callers consume in
    // exactly one action. The ranged stage stays the single cached copy
    // backing that action; the caller releases it afterwards via
    // unpersist()/clearCache() (Bench and Verify clear between queries).
    (ranked, total)
  }

  /** Rows at specific 1-based GLOBAL ranks under `sortCols`, plus the
    * total count — WITHOUT ranking every row. `mkRanks` receives the
    * total and names the wanted ranks (so callers can derive them from
    * percentile/ntile formulas).
    *
    * Point lookups don't need the full global rank: after the ranged
    * shuffle, the per-partition counts locate each target rank's
    * (partition, local rank), and only the partitions that HOLD a
    * target get sorted — for k targets that is <= k of the P
    * range-partitions instead of all of them. Output carries the
    * original columns plus `__grank`. Out-of-range ranks are ignored.
    */
  def rowsAtRanks(
      df: DataFrame,
      sortCols: Seq[Column],
      mkRanks: Long => Seq[Long]
  ): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = DriverBudget.collect("GlobalRank.partitionCounts", parts.toLong)(
        ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt")))
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val total = counts.map(_._2).sum
    val cum = counts.scanLeft(0L)(_ + _._2) // rows before the i-th listed partition
    val locs = mkRanks(total).distinct.filter(r => r >= 1 && r <= total).map { r =>
      // cum(i) < r <= cum(i+1) locates rank r in the i-th listed
      // partition (zero-count partitions collapse their cum interval and
      // are skipped by lastIndexWhere)
      val i = cum.lastIndexWhere(_ < r)
      (counts(i)._1, r - cum(i), r)
    }
    if (locs.isEmpty)
      return (ranged.limit(0).withColumn("__grank", lit(0L)).drop("__pid"), total)
    val targetPids = locs.map(_._1).distinct
    val tdf = spark.createDataFrame(locs).toDF("__tpid", "__lrank", "__grank")
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val picked = ranged
      .filter(col("__pid").isin(targetPids: _*))
      .withColumn("__rn", row_number().over(w).cast(LongType))
      .join(broadcast(tdf), col("__pid") === col("__tpid") && col("__rn") === col("__lrank"))
      .drop("__pid", "__rn", "__tpid", "__lrank")
    (picked, total)
  }

  /** Per-group running sum of `valueCol` over the rows strictly BEFORE
    * each row in `sortCols` order — the scale-safe replacement for
    * `sum(v).over(Window.partitionBy(group).orderBy(sort))`: a window
    * partitioned by a low-cardinality group (source, packing group)
    * puts an entire group in ONE task, so a 40-TB source sorts on a
    * single core. Here instead:
    *
    *   1. `repartitionByRange` on (group, sort) — each group spans a
    *      contiguous run of partitions, every partition sorts in
    *      parallel;
    *   2. per-(partition, group) sums — a TINY aggregate: contiguity
    *      bounds it at `partitions + groups - 1` rows — turned into
    *      prefix offsets by a window partitioned by group over those
    *      tiny rows (never the data);
    *   3. one broadcast join + a window partitioned by (partition,
    *      group), so every task scans only its own slice.
    *
    * No driver collect, no single-partition window anywhere. Group
    * values must be non-null (a null group key would drop its rows at
    * the offset join).
    */
  def withGroupedCumSumBefore(
      df: DataFrame,
      groupCols: Seq[String],
      sortCols: Seq[Column],
      valueCol: Column,
      outCol: String
  ): DataFrame = {
    val reserved = Seq("__pid", "__v", "__ps", "__off")
    require(!df.columns.exists(reserved.contains),
      s"input must not carry reserved working columns ${reserved.mkString(", ")}")
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val gcols = groupCols.map(col)
    val ranged = df
      .withColumn("__v", valueCol.cast(LongType))
      .repartitionByRange(parts, (gcols ++ sortCols): _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val psums = ranged
      .groupBy(col("__pid") +: gcols: _*)
      .agg(coalesce(sum(col("__v")), lit(0L)).as("__ps"))
    val wOff = Window.partitionBy(gcols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = psums
      .withColumn("__off", coalesce(sum(col("__ps")).over(wOff), lit(0L)))
      .drop("__ps")
    val wIn = Window.partitionBy(col("__pid") +: gcols: _*).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .join(broadcast(offs), "__pid" +: groupCols)
      .withColumn(outCol,
        (col("__off") + coalesce(sum(col("__v")).over(wIn), lit(0L))).cast(LongType))
      .drop("__pid", "__off", "__v")
  }

  /** Unsigned UTF-8 byte comparison — Spark's `UTF8String` sort order
    * for string columns. Driver-side offset math over collected string
    * keys MUST use this, not `String.compareTo` (UTF-16 code units),
    * or a supplementary character re-orders the offsets relative to
    * the executors' range partitioning.
    */
  def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The rank interval of each `ntile(n)` bucket: (bucket, first rank,
    * last rank), 1-based — the closed form of [[ntileFromRank]]'s
    * bucket boundaries (first `total % n` buckets take `total/n + 1`
    * rows). Empty buckets (total < n) have end < start.
    */
  def ntileCuts(total: Long, n: Int): Seq[(Long, Long, Long)] = {
    require(n >= 1, "ntile n >= 1")
    val base = total / n
    val rem = total % n
    (1L to n.toLong).map { b =>
      val sz = if (b <= rem) base + 1 else base
      val start = (b - 1) * base + math.min(b - 1, rem) + 1
      (b, start, start + sz - 1)
    }
  }

  /** SQL `ntile(n)` bucket (1-based) from a 1-based global rank and the
    * total row count: the first `total % n` buckets take `total/n + 1`
    * rows, the rest `total/n` — exactly the window function's split.
    */
  def ntileFromRank(rank: Column, n: Int, total: Long): Column = {
    require(n >= 1, "ntile n >= 1")
    val base = total / n
    val rem = total % n
    val cut = rem * (base + 1)
    // guard the divisor: when total < n the else-branch divisor would be
    // 0 and Spark evaluates both branches of a `when`
    val safeBase = math.max(base, 1L)
    when(rank <= cut, floor((rank - 1) / lit(base + 1)) + 1)
      .otherwise(lit(rem) + floor((rank - lit(cut) - 1) / lit(safeBase)) + 1)
      .cast(LongType)
  }
}
