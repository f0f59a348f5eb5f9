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
    val counts = ranged
      .groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .collect()
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
