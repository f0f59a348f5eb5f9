package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: the multi-column data-skipping
  * layout. A single-column sort gives parquet min/max row-group skipping
  * on that one column only; interleaving the bits of k normalized
  * columns into one z-value and range-partitioning + sorting on it
  * keeps every file's bounding box tight in ALL k dimensions — a
  * predicate on any clustered column (or a box over several) touches a
  * small fraction of files, because files whose stats exclude the
  * predicate produce zero row groups at scan time.
  *
  * At 100 TB this is the other half of layout next to [[Bucketing]]:
  * bucketing amortizes the dominant JOIN key, z-ordering amortizes the
  * dominant FILTER columns. Both pay one shuffle at write time.
  *
  * Normalization is linear min/max scaling into `bits`-bit ranks — one
  * cheap stats pass and a pure-arithmetic mapping that stays inside
  * whole-stage codegen at any scale. Heavily skewed columns cluster
  * better with quantile binning (the [[Bounds]] machinery can supply
  * cuts) at the cost of a per-value bin search; linear is the default
  * because the z-curve only needs approximate rank locality, not equal
  * bin populations.
  */
object Layout {

  /** Bit-interleave k already-normalized `bits`-bit long columns into
    * one z-value: bit i of column j lands at position i*k + j. Pure
    * shift/mask arithmetic — codegen-friendly, no UDF.
    */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "at least one column")
    require(bits * cols.size <= 63, s"bits*k must fit a signed long, got ${bits * cols.size}")
    val k = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ + _)
  }

  /** Map a numeric column with known [lo, hi] bounds onto [0, 2^bits). */
  def normalize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val maxRank = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else least(
      lit(maxRank),
      greatest(lit(0L),
        floor((c.cast("double") - lo) / (hi - lo) * maxRank).cast("long")))
  }

  /** Z-value over `cols` of `df`, normalizing each by its own min/max
    * (one aggregate pass, collected as 2k scalars of driver state).
    */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val normalized = cols.zipWithIndex.map { case (c, j) =>
      // all-null column (or empty input): null min/max -> rank 0 for the
      // dimension (normalize's hi <= lo path), not a driver NPE
      val (lo, hi) =
        if (stats.isNullAt(2 * j) || stats.isNullAt(2 * j + 1)) (0.0, 0.0)
        else (stats.getDouble(2 * j), stats.getDouble(2 * j + 1))
      normalize(col(c), lo, hi, bits)
    }
    interleaveBits(normalized, bits)
  }

  /** Write `df` z-clustered on `cols` into ~`files` files: range
    * partition on the z-value (parallel global order over the curve),
    * sort within each partition, one file per partition. Parquet row-
    * group stats then exclude non-matching files for predicates on any
    * of `cols`.
    */
  def writeClustered(
      df: DataFrame,
      path: String,
      cols: Seq[String],
      files: Int,
      bits: Int = 16
  ): Unit =
    df.withColumn("__z", zValue(df, cols, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
