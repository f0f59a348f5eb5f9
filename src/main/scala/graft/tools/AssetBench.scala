package graft.tools

import org.apache.spark.sql.SparkSession

/** ASSET-BUILD-TIME bench: time each durable corpus asset's BUILD into
  * a fresh warehouse — the number a 100 TB operator plans around (the
  * sf1 query tables measure latency AGAINST prebuilt assets; this
  * measures building them). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.AssetBench"
  *
  * Each family resolves into its own FRESH `spark.graft.index.dir`
  * (and the in-JVM handle caches are dropped first), so every number
  * is a cold build: corpus scan + kernel + parquet/file write. One
  * JSON line to stdout: {"sf_dir": ..., "builds": {name: sec, ...}}.
  */
object AssetBench {
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
    import graft.operators.{Dedup, Similarity, TextAnalysis}

    def freshRoot(): Unit = {
      spark.conf.set("spark.graft.index.dir",
        java.nio.file.Files.createTempDirectory("graft_assetbench").toString)
      Dedup.dropInMemoryNgramTables()
      Dedup.dropInMemoryShardBlooms()
      Similarity.dropInMemoryIndexes()
      TextAnalysis.dropInMemoryBpeTables()
      spark.catalog.clearCache()
    }

    // 10%-append standing corpus for the increment rows: the standing
    // assets are prebuilt in the SETUP phase (outside the timer) — the
    // timed number is what an append workflow actually pays: band the
    // batch, refresh affected sources, publish. Benchmarked at TWO LSH
    // widths: the query default bits=4 (16 buckets — bucket occupancy
    // makes every standing source affected, so the increment honestly
    // measures ≈ a rebuild) and the deployment width bits=12 (4096
    // buckets — the affected set shrinks to the batch's bucket
    // neighborhood, which is where the increment pays).
    //
    // r17: the new corpus is laid out the way a log-structured append
    // actually lands — the standing files byte-identical (copied with
    // attributes) plus fresh batch part files in the same directory —
    // so the metadata-only pure-append proof applies and the timed
    // number includes the REAL precondition cost (a listing + footer
    // reads, no corpus digest join). The r16 fixture rewrote the new
    // corpus into fresh files, which forced every increment through
    // the digest fallback and charged it a full standing-corpus scan
    // the production append shape never pays.
    val incOldDir = java.nio.file.Files.createTempDirectory("graft_assetbench_old").toString
    val incNewDir = java.nio.file.Files.createTempDirectory("graft_assetbench_new").toString
    // directory streams must be CLOSED (they hold an fd until then)
    def withStream[A](s: java.util.stream.Stream[A])(f: java.util.stream.Stream[A] => Unit): Unit =
      try f(s) finally s.close()
    def rmrf(p: java.nio.file.Path): Unit =
      if (java.nio.file.Files.exists(p))
        withStream(java.nio.file.Files.walk(p))(
          _.sorted(java.util.Comparator.reverseOrder())
            .forEach(java.nio.file.Files.delete(_)))
    // cut the corpus at 90% by id; old = standing files, new = those
    // same files + the batch's part files moved alongside
    def appendLayout(table: String, idCol: String): Unit = {
      import org.apache.spark.sql.functions.{col, expr}
      import java.nio.file.{Files => JF, Paths, StandardCopyOption}
      val df =
        if (table.startsWith("embeddings")) graft.Tables.embeddings(spark, sfDir)
        else graft.Tables.documents(spark, sfDir)
      val cut = df.agg((expr(s"max($idCol)") * 9 / 10).cast("long")).head().getLong(0)
      rmrf(Paths.get(s"$incOldDir/$table")); rmrf(Paths.get(s"$incNewDir/$table"))
      df.filter(col(idCol) < cut).write.parquet(s"$incOldDir/$table")
      val newTable = Paths.get(s"$incNewDir/$table")
      JF.createDirectories(newTable)
      withStream(JF.list(Paths.get(s"$incOldDir/$table")))(_.forEach(p =>
        JF.copy(p, newTable.resolve(p.getFileName.toString), StandardCopyOption.COPY_ATTRIBUTES)))
      val batchTmp = JF.createTempDirectory("graft_assetbench_batch").toString
      df.filter(col(idCol) >= cut).write.parquet(s"$batchTmp/b.parquet")
      withStream(JF.list(Paths.get(s"$batchTmp/b.parquet")))(
        _.filter(_.getFileName.toString.endsWith(".parquet"))
          .forEach(p => JF.move(p, newTable.resolve(s"part-batch-${p.getFileName}"))))
    }
    def incSetup(bits: Int, partWidth: Long = 1024L): () => Unit = () => {
      appendLayout("embeddings.parquet", "vec_id")
      Similarity.corpusKnnEdges(spark, incOldDir, bits = bits, partWidth = partWidth).count()
      Similarity.corpusBandedEmbeddings(spark, incOldDir, bits = bits).count()
    }
    // Re-lay a committed pt-partitioned asset into ~`pieces` small part
    // files per pt range, in place (r20): one Spark job scatters rows
    // across `pieces` tasks (each task holding rows of most pt values
    // writes one small file per value), then the fresh files replace
    // the originals per range. Listing-level structure (pt dirs, commit
    // marker) is untouched, so copy-forward increments and touched-range
    // detection behave exactly as on a naturally fragmented store.
    def fragmentPtRanges(assetPath: String, pieces: Int): Unit = {
      import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
      import java.nio.file.{Files => JF, Paths}
      val tmp = JF.createTempDirectory("graft_frag").toString + "/e"
      spark.read.parquet(assetPath)
        .repartition(pieces, pmod(xxhash64(col("vec_id"), col("nbr_id")), lit(pieces.toLong)))
        .write.partitionBy("pt").parquet(tmp)
      def ls(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
        val b = Seq.newBuilder[java.nio.file.Path]
        withStream(JF.list(p))(_.forEach(b += _))
        b.result()
      }
      ls(Paths.get(tmp))
        .filter(p => JF.isDirectory(p) && p.getFileName.toString.startsWith("pt="))
        .foreach { ptDir =>
          val dest = Paths.get(assetPath, ptDir.getFileName.toString)
          ls(dest).filter { f =>
            val n = f.getFileName.toString
            !n.startsWith("_") && !n.startsWith(".")
          }.foreach(JF.delete(_))
          ls(ptDir).filter(_.getFileName.toString.endsWith(".parquet"))
            .foreach(f => JF.move(f, dest.resolve(s"part-frag-${f.getFileName}")))
        }
    }
    def noSetup: () => Unit = () => ()
    val builds = Seq[(String, () => Unit, () => Long)](
      ("ngramidx_k3", noSetup, () => Dedup.corpusNgramIndex(spark, sfDir).count()),
      ("gramdf_k3", noSetup, () => Dedup.corpusGramDf(spark, sfDir).count()),
      ("gramdf_k3_increment", () => {
        appendLayout("documents.parquet", "doc_id")
        // measure the increment MACHINERY (comparable across rounds):
        // the shipped r17 crossover gate would route every local-sized
        // corpus to the rebuild, which the gramdf_k3 row already times
        Dedup.gramIncrementMinStandingBytes = 0L
        Dedup.corpusGramDf(spark, incOldDir).count(); ()
      }, () => Dedup.corpusGramDfIncrement(spark, incOldDir, incNewDir).count()),
      ("cdcdigests", noSetup, () => Dedup.corpusChunkDigests(spark, sfDir).count()),
      ("cdcdigests_increment", () => {
        appendLayout("documents.parquet", "doc_id")
        // machinery row: the shipped gate routes local sizes to rebuild
        Dedup.perDocIncrementMinStandingBytes = 0L
        Dedup.corpusChunkDigests(spark, incOldDir).count(); ()
      }, () => Dedup.corpusChunkDigestsIncrement(spark, incOldDir, incNewDir).count()),
      ("minhashsig_k3_h128", noSetup, () => Dedup.corpusMinhashSignatures(spark, sfDir).count()),
      ("minhashsig_k3_h128_increment", () => {
        appendLayout("documents.parquet", "doc_id")
        // machinery row: the shipped gate routes local sizes to rebuild
        Dedup.perDocIncrementMinStandingBytes = 0L
        Dedup.corpusMinhashSignatures(spark, incOldDir).count(); ()
      }, () => Dedup.corpusMinhashSignaturesIncrement(spark, incOldDir, incNewDir).count()),
      ("simhashsig", noSetup, () => Dedup.corpusSimhashSignatures(spark, sfDir).count()),
      ("simhashsig_increment", () => {
        appendLayout("documents.parquet", "doc_id")
        // machinery row: the shipped gate routes local sizes to rebuild
        Dedup.perDocIncrementMinStandingBytes = 0L
        Dedup.corpusSimhashSignatures(spark, incOldDir).count(); ()
      }, () => Dedup.corpusSimhashSignaturesIncrement(spark, incOldDir, incNewDir).count()),
      ("knnedges_k5", noSetup, () => Similarity.corpusKnnEdges(spark, sfDir).count()),
      ("knnedges_k5_increment", incSetup(4),
        () => Similarity.corpusKnnEdgesIncrement(spark, incOldDir, incNewDir).count()),
      ("knnedges_k5b12", noSetup,
        () => Similarity.corpusKnnEdges(spark, sfDir, bits = 12).count()),
      ("knnedges_k5b12_increment", incSetup(12),
        () => Similarity.corpusKnnEdgesIncrement(spark, incOldDir, incNewDir, bits = 12).count()),
      // band asset alone: full banding vs the r16 copy-forward
      // increment (appends never change standing bands, so the
      // increment pays ~batch-fraction of the scan and write)
      ("embbands_b12", noSetup,
        () => Similarity.corpusBandedEmbeddings(spark, sfDir, bits = 12).count()),
      ("embbands_b12_increment", incSetup(12),
        () => Similarity.corpusBandedEmbeddingsIncrement(spark, incOldDir, incNewDir, bits = 12).count()),
      ("bpemerges_r3", noSetup, () => TextAnalysis.corpusBpeMerges(spark, sfDir, 3).count()),
      // SECOND-TIER assets (r18): the verified pair graph and the
      // triangle stats, full derivation vs their closure/copy-forward
      // increments riding the already-incremented upstream assets
      ("minhashpairs_t700", noSetup, () => Dedup.corpusMinhashPairs(spark, sfDir).count()),
      ("minhashpairs_t700_increment", () => {
        appendLayout("documents.parquet", "doc_id")
        // machinery row: the shipped per-doc gate routes local sizes
        // to the sig rebuild — zero it so the pair increment rides the
        // production-shaped incremented signature asset
        Dedup.perDocIncrementMinStandingBytes = 0L
        Dedup.corpusMinhashPairs(spark, incOldDir).count(); ()
      }, () => Dedup.corpusMinhashPairsIncrement(spark, incOldDir, incNewDir).count()),
      ("tristats_b12", noSetup,
        () => Similarity.corpusTriangleStats(spark, sfDir, bits = 12).count()),
      ("ngramidx_k3_increment", () => {
        appendLayout("documents.parquet", "doc_id")
        // machinery row: the shipped gate routes local sizes to rebuild
        Dedup.perDocIncrementMinStandingBytes = 0L
        Dedup.corpusNgramIndex(spark, incOldDir).count()
        Dedup.corpusGramDf(spark, incOldDir).count(); ()
      }, () => Dedup.corpusNgramIndexIncrement(spark, incOldDir, incNewDir).count()),
      ("tristats_b12_increment_forced", () => {
        incSetup(12)()
        // machinery row: ScaleGen's append touches most edge ranges, so
        // this forces the closure recompute the 50% gate would refuse —
        // the number that PROVES the gate right at this fixture shape
        Similarity.triangleIncrementMaxTouchedPermille = 1000L
        Similarity.triangleIncrementMinStandingBytes = 0L
        Similarity.corpusTriangleStats(spark, incOldDir, bits = 12).count(); ()
      }, () => Similarity.corpusTriangleStatsIncrement(spark, incOldDir, incNewDir, bits = 12).count()),
      ("tristats_b12_increment_gated", () => {
        incSetup(12)()
        // shipped behavior: the default gate measures the touched
        // fraction and degrades to the one-pass full derivation
        Similarity.triangleIncrementMaxTouchedPermille = 500L
        Similarity.corpusTriangleStats(spark, incOldDir, bits = 12).count(); ()
      }, () => Similarity.corpusTriangleStatsIncrement(spark, incOldDir, incNewDir, bits = 12).count()),
      // CROSS-GENERATION fixture rows (r19): on a ScaleGen corpus built
      // with the crossgen mode (plantNearDups + isolateAppendSlice) the
      // append touches a sliver of edge ranges at partWidth 16, so the
      // SHIPPED gate takes the closure path. The edge asset is
      // prebuilt/pre-incremented in SETUP on both sides — in the
      // runbook flow `assets_increment` publishes knn_edges as its own
      // family first, so the tristats step pays ONLY the wedge join
      // (full) vs the closure recompute + copy (increment); the r18
      // tristats rows above keep the edge work inside the timer for
      // round-over-round comparability
      ("tristats_b12_w16", () => {
        Similarity.corpusKnnEdges(spark, sfDir, bits = 12, partWidth = 16L).count(); ()
      }, () => Similarity.corpusTriangleStats(spark, sfDir, bits = 12, partWidth = 16L).count()),
      ("tristats_b12_w16_increment", () => {
        incSetup(12, partWidth = 16L)()
        // machinery row: the shipped r19 bytes gate routes local sizes
        // to the recompute — zero it so the CLOSURE path is what this
        // row tracks round-over-round
        Similarity.triangleIncrementMinStandingBytes = 0L
        Similarity.corpusTriangleStats(spark, incOldDir, bits = 12, partWidth = 16L).count()
        Similarity.corpusKnnEdgesIncrement(spark, incOldDir, incNewDir,
          bits = 12, partWidth = 16L).count(); ()
      }, () => Similarity.corpusTriangleStatsIncrement(spark, incOldDir, incNewDir,
        bits = 12, partWidth = 16L).count()),
      // FRAGMENTED STANDING STORE (r20 — the r19 verdict's item 4): the
      // closure's surviving production claim is an I/O argument ("read
      // a sliver of a TB-scale FRAGMENTED edge store instead of all of
      // it"), which the contiguous local fixtures never price. These
      // two rows re-lay the standing edge asset into ~32 small files
      // per pt range BEFORE the append (listing + per-file open cost
      // becomes real), publish the new edge asset outside the timer
      // (fragments copy forward by name), and time the same tristats
      // publish both ways on the same fragmented store: the shipped
      // recompute (bytes gate at default) vs the forced closure. The
      // verdict this pair renders is written up in SCALING.md.
      ("tristats_b12_w16frag_recompute", () => {
        incSetup(12, partWidth = 16L)()
        fragmentPtRanges(Similarity.corpusKnnEdgesPath(spark, incOldDir,
          bits = 12, partWidth = 16L), 32)
        Similarity.corpusKnnEdgesIncrement(spark, incOldDir, incNewDir,
          bits = 12, partWidth = 16L).count(); ()
      }, () => Similarity.corpusTriangleStatsIncrement(spark, incOldDir, incNewDir,
        bits = 12, partWidth = 16L).count()),
      ("tristats_b12_w16frag_closure", () => {
        incSetup(12, partWidth = 16L)()
        fragmentPtRanges(Similarity.corpusKnnEdgesPath(spark, incOldDir,
          bits = 12, partWidth = 16L), 32)
        // machinery row: zero the bytes gate so the closure runs; the
        // standing tristats asset is prebuilt (untimed) as in the
        // production append flow
        Similarity.triangleIncrementMinStandingBytes = 0L
        Similarity.corpusTriangleStats(spark, incOldDir, bits = 12, partWidth = 16L).count()
        Similarity.corpusKnnEdgesIncrement(spark, incOldDir, incNewDir,
          bits = 12, partWidth = 16L).count(); ()
      }, () => Similarity.corpusTriangleStatsIncrement(spark, incOldDir, incNewDir,
        bits = 12, partWidth = 16L).count())
    )
    // SPARK_GRAFT_ASSETBENCH_ONLY=a,b filters rows for local iteration
    // (same contract as Bench's SPARK_GRAFT_BENCH_ONLY)
    val only = sys.env.get("SPARK_GRAFT_ASSETBENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(builds)(names => builds.filter(b => names(b._1)))
    // machinery rows mutate process-global gates; each row restores
    // them so later rows (and anything after the bench in-process) run
    // under the shipped defaults — same discipline as the specs
    val timed = selected.map { case (name, setup, run) =>
      freshRoot()
      val gram0 = Dedup.gramIncrementMinStandingBytes
      val perDoc0 = Dedup.perDocIncrementMinStandingBytes
      val tri0 = Similarity.triangleIncrementMaxTouchedPermille
      val triBytes0 = Similarity.triangleIncrementMinStandingBytes
      try {
        setup()
        val t0 = System.nanoTime()
        run()
        val sec = (System.nanoTime() - t0) / 1e9
        name -> math.round(sec * 1000) / 1000.0
      } finally {
        Dedup.gramIncrementMinStandingBytes = gram0
        Dedup.perDocIncrementMinStandingBytes = perDoc0
        Similarity.triangleIncrementMaxTouchedPermille = tri0
        Similarity.triangleIncrementMinStandingBytes = triBytes0
      }
    }
    val json = timed.map { case (n, s) => s""""$n": $s""" }.mkString(", ")
    println(s"""{"sf_dir": "$sfDir", "builds": {$json}}""")
    spark.stop()
  }
}
