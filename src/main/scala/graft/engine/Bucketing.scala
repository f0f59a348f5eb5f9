package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout: the co-located-join tool for keys that two
  * big tables share. A shuffle join on 100 TB moves BOTH sides over the
  * network on every query; writing each side bucketed (hash-partitioned
  * into a fixed bucket count) and sorted on the join key pays that
  * shuffle ONCE at write time — every later equi-join (or groupBy) on
  * the key reads matching buckets pairwise with no Exchange and, with
  * sorted buckets, no per-query Sort either. This is the batch analog
  * of an index: layout amortized across the query stream.
  *
  * Bucket-count discipline: both sides must agree (or be multiples)
  * for the exchange-free path to kick in, and the count bounds write
  * parallelism per partition — pick `buckets` ≈ table size / target
  * file size, NOT the cluster's core count.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table.
    * Bucketing metadata lives in the session catalog — Spark's file
    * formats can't express it standalone (`path`-based writes silently
    * drop bucket specs), which is why this goes through `saveAsTable`.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int
  ): Unit =
    // repartition on the bucket key with the bucket count FIRST: it uses
    // the same Murmur3 hash as the bucket spec, so each write task holds
    // exactly one bucket and emits exactly one file. Without it, every
    // task writes a file per bucket — tasks x buckets small files, and
    // (because Spark only trusts `sortBy` metadata for single-file
    // buckets) the per-query Sort comes back into every downstream join.
    df.repartition(buckets, df.col(key))
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two same-key bucketed tables. The plan this produces is
    * the point: SortMergeJoin whose children are bare bucketed scans —
    * zero Exchange (asserted by BucketingSpec against the executed plan,
    * not just claimed here). A bucket-LOCAL Sort remains: Spark >= 3.0
    * doesn't report sortBy ordering from bucketed scans by default
    * (`spark.sql.legacy.bucketedTableScan.outputOrdering`), but that
    * sort is network-free and O(bucket), not O(table) — the Exchange is
    * the 100 TB cost, and it is gone.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
