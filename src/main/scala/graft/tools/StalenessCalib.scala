package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** NGRAM-ORDER STALENESS CALIBRATION (round 19) — turns the runbook's
  * "rebuild below ~7000 bp rare overlap" from judgment into a measured
  * curve. For a ladder of drift levels R (how many of the founding
  * corpus's rarest grams an append PUMPS into high frequency), build an
  * independent pinned chain, then measure:
  *
  *   - `overlap_bp`  — [[graft.operators.Dedup.ngramOrderStaleness]]'s
  *     rare-end overlap (the number the runbook thresholds on),
  *   - `cand_pinned` — candidate pairs the increment-built index (the
  *     FOUNDING order, pinned) generates at threshold 0.7,
  *   - `cand_fresh`  — candidates a from-scratch rebuild (current df
  *     order) generates for the same corpus,
  *   - `excess_bp`   — the pruning-efficiency cost of keeping the pin:
  *     (cand_pinned − cand_fresh) · 10⁴ / cand_fresh.
  *
  * Answers stay EXACT either way (the prefix lemma holds under any
  * fixed total order); the curve prices the pin in candidates-verified
  * — the number that says when a rebuild pays. One JSON line to
  * stdout: {"rows": [{r, overlap_bp, new_gram_bp, cand_pinned,
  * cand_fresh, excess_bp}, ...]}.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *   sbt "runMain graft.tools.StalenessCalib"
  */
object StalenessCalib {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val maxId = docs0.agg(max(col("doc_id"))).head().getLong(0)

    // founding rare grams, rarest-first under the index's (df, g) order
    // (bounded head; audited like every driver-side collect)
    val rareGrams = graft.engine.DriverBudget.collect("StalenessCalib.rareGrams", 512L)(
      Dedup.gramDf(docs0, 3)
        .orderBy(col("__df").asc, col("g").asc)
        .select("g").limit(512)).map(_.getString(0))

    def withStream[A](s: java.util.stream.Stream[A])(f: java.util.stream.Stream[A] => Unit): Unit =
      try f(s) finally s.close()

    // one independent pinned chain per drift level: gen0 = the corpus,
    // gen1 = gen0 + a 200-doc batch where doc j carries 4 grams drawn
    // from the R rarest (pumping each ~800/R times) + a unique token
    val gate0 = Dedup.perDocIncrementMinStandingBytes
    val rows = Seq(0, 4, 16, 64, 256).map { r =>
      val oldDir = java.nio.file.Files.createTempDirectory(s"graft_cal_old_$r").toString
      val newDir = java.nio.file.Files.createTempDirectory(s"graft_cal_new_$r").toString
      docs0.coalesce(4).write.parquet(s"$oldDir/documents.parquet")
      val batch = (0 until 200).map { j =>
        val pumped =
          if (r == 0) ""
          else (0 until 4).map(i => rareGrams((j * 4 + i) % r)).mkString(" ", " ", "")
        // filler tokens are per-doc unique: a shared batch template gram
        // would take the unseen-gram df=1 fallback and dominate BOTH
        // sides' candidates (a real effect — template boilerplate — but
        // not the rank-drift signal this curve prices)
        val filler = (0 until 10).map(i => s"u${j}x$i").mkString(" ")
        (maxId + 1 + j, s"$filler$pumped")
      }
      val tmp = java.nio.file.Files.createTempDirectory("graft_cal_batch").toString
      import spark.implicits._
      batch.toDF("doc_id", "text").coalesce(1).write.parquet(s"$tmp/b.parquet")
      val newTable = java.nio.file.Paths.get(s"$newDir/documents.parquet")
      java.nio.file.Files.createDirectories(newTable)
      withStream(java.nio.file.Files.list(java.nio.file.Paths.get(s"$oldDir/documents.parquet")))(
        _.forEach(p => java.nio.file.Files.copy(p, newTable.resolve(p.getFileName.toString),
          java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)))
      withStream(java.nio.file.Files.list(java.nio.file.Paths.get(s"$tmp/b.parquet")))(
        _.filter(_.getFileName.toString.endsWith(".parquet"))
          .forEach(p => java.nio.file.Files.move(p,
            newTable.resolve(s"part-batch-${p.getFileName}"))))
      // pinned chain in its own warehouse
      spark.conf.set("spark.graft.index.dir",
        java.nio.file.Files.createTempDirectory(s"graft_cal_wh_$r").toString)
      Dedup.dropInMemoryNgramTables()
      Dedup.perDocIncrementMinStandingBytes = 0L
      Dedup.corpusNgramIndex(spark, oldDir).count()
      Dedup.corpusGramDf(spark, oldDir).count()
      val pinnedIdx = Dedup.corpusNgramIndexIncrement(spark, oldDir, newDir)
      val stale = Dedup.ngramOrderStaleness(spark, newDir)
        .getOrElse(sys.error("chain must be pinned"))
      val candPinned = Dedup.prefixCandidatesIdx(pinnedIdx, 0.7).count()
      // fresh rebuild in a scratch warehouse (current df order)
      spark.conf.set("spark.graft.index.dir",
        java.nio.file.Files.createTempDirectory(s"graft_cal_wh2_$r").toString)
      Dedup.dropInMemoryNgramTables()
      val candFresh = Dedup.prefixCandidatesIdx(Dedup.corpusNgramIndex(spark, newDir), 0.7).count()
      val excessBp = if (candFresh == 0) 0L else (candPinned - candFresh) * 10000L / candFresh
      s"""{"r": $r, "overlap_bp": ${stale("ngram_order_rare_overlap_bp")}, """ +
        s""""collision_bp": ${stale("ngram_order_collision_bp")}, """ +
        s""""new_gram_bp": ${stale("ngram_order_new_gram_bp")}, """ +
        s""""cand_pinned": $candPinned, "cand_fresh": $candFresh, "excess_bp": $excessBp}"""
    }
    Dedup.perDocIncrementMinStandingBytes = gate0
    println(s"""{"sf_dir": "$sfDir", "rows": [${rows.mkString(", ")}]}""")
    spark.stop()
  }
}
