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

  /** All filesystem work goes through the Hadoop `FileSystem` resolved
    * from the path's scheme — a maintenance job must run against the
    * same `hdfs://`/`s3a://` roots the tables live on (`java.io.File`
    * would silently see nothing there). Row counts ride the rewrite job
    * as an `observe` metric; the old read-back counted by re-scanning
    * everything just written.
    */
  private def rewrite(
      spark: SparkSession,
      path: String,
      targetBytes: Long,
      layout: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame
  ): CompactionResult = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: Path): Seq[org.apache.hadoop.fs.LocatedFileStatus] =
      if (!fs.exists(p)) Seq.empty
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.LocatedFileStatus]
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val f = it.next()
          if (f.getPath.getName.endsWith(".parquet")) out += f
        }
        out.toSeq
      }

    // crash recovery: a previous rewrite may have died after moving the
    // live dir to `.old` but before moving tmp into place — `.old` is
    // then the only copy; restore it instead of (later) deleting it
    val old = new Path(path + ".old")
    if (!fs.exists(dir) && fs.exists(old) && !fs.rename(old, dir))
      throw new java.io.IOException(s"compaction recovery: cannot restore $old to $path")

    val before = parquetFiles(dir)
    val totalBytes = before.map(_.getLen).sum
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(path)
    val tmp = new Path(path + ".compacting")
    val rows = graft.sources.WriteMetrics.countingWrite(layout(df, targetFiles))(
      _.write.mode(SaveMode.Overwrite).parquet(tmp.toString))

    // swap: rename the live dir ASIDE first, then move tmp into place —
    // there is never a window where the live path is destroyed without a
    // replacement. If the second rename fails, roll the original back.
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(dir, old))
      throw new java.io.IOException(s"compaction: cannot move $path aside")
    if (!fs.rename(tmp, dir)) {
      if (!fs.rename(old, dir))
        throw new java.io.IOException(
          s"compaction swap failed for $path AND rollback failed; original at $old")
      throw new java.io.IOException(s"compaction swap failed for $path (rolled back)")
    }
    fs.delete(old, true)

    CompactionResult(before.length, parquetFiles(dir).length, totalBytes, rows)
  }
}
