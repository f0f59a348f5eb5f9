package graft.engine

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Table maintenance for long-lived parquet datasets. The killer at
  * scale is small files: every micro-batch / subtask / retry leaves
  * fragments, and a 100 TB table fragmented into KB-size files spends
  * more time opening footers than reading data.
  */
object Maintenance {

  final case class CompactionResult(
      filesBefore: Int,
      filesAfter: Int,
      bytes: Long,
      rows: Long
  )

  /** Rewrite a parquet dir into ~targetBytes files. Reads once, writes
    * once; uses a temp dir + swap so a failed compaction never corrupts
    * the live table (poor man's commit protocol — table formats with
    * real transactions replace this at production scale).
    */
  def compact(
      spark: SparkSession,
      path: String,
      targetBytes: Long = 128L * 1024 * 1024
  ): CompactionResult =
    rewrite(spark, path, targetBytes, (df, targetFiles) => df.repartition(targetFiles))

  /** Compaction + CLUSTERING: rewrite range-partitioned and sorted on
    * `cols`, so each output file covers a narrow key range. That is what
    * makes parquet row-group min/max statistics selective — a filter on
    * the cluster key then skips whole files/row-groups at the scan
    * (`PushedFilters` only helps if the layout lets statistics exclude
    * data). At 100 TB, layout is as much of the query plan as the plan.
    */
  def cluster(
      spark: SparkSession,
      path: String,
      cols: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024
  ): CompactionResult =
    rewrite(spark, path, targetBytes, (df, targetFiles) => {
      import org.apache.spark.sql.functions.col
      df.repartitionByRange(targetFiles, cols.map(col): _*)
        .sortWithinPartitions(cols.map(col): _*)
    })

  private def rewrite(
      spark: SparkSession,
      path: String,
      targetBytes: Long,
      layout: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame
  ): CompactionResult = {
    val dir = new java.io.File(path)
    def parquetFiles(d: java.io.File): Array[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty)
        .flatMap(f => if (f.isDirectory) parquetFiles(f) else Array(f))
        .filter(_.getName.endsWith(".parquet"))

    // crash recovery: a previous rewrite may have died after moving the
    // live dir to `.old` but before moving tmp into place — `.old` is
    // then the only copy; restore it instead of (later) deleting it
    val oldAtEntry = new java.io.File(path + ".old")
    if (!dir.exists() && oldAtEntry.exists() && !oldAtEntry.renameTo(dir))
      throw new java.io.IOException(
        s"compaction recovery: cannot restore $oldAtEntry to $path")

    val before = parquetFiles(dir)
    val totalBytes = before.map(_.length()).sum
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(path)
    val tmp = path + ".compacting"
    layout(df, targetFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
    val rows = spark.read.parquet(tmp).count()

    // swap: rename the live dir ASIDE first, then move tmp into place —
    // there is never a window where the live path is destroyed without a
    // replacement. If the second rename fails, roll the original back.
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    val old = new java.io.File(path + ".old")
    if (old.exists()) rm(old)
    if (!dir.renameTo(old))
      throw new java.io.IOException(s"compaction: cannot move $path aside")
    if (!new java.io.File(tmp).renameTo(dir)) {
      if (!old.renameTo(dir))
        throw new java.io.IOException(
          s"compaction swap failed for $path AND rollback failed; original at $old")
      throw new java.io.IOException(s"compaction swap failed for $path (rolled back)")
    }
    rm(old)

    CompactionResult(before.length, parquetFiles(dir).length, totalBytes, rows)
  }
}
