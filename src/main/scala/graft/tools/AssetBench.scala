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
    val incOldDir = java.nio.file.Files.createTempDirectory("graft_assetbench_old").toString
    def incSetup(bits: Int): () => Unit = () => {
      import org.apache.spark.sql.functions.{col, expr}
      val emb = graft.Tables.embeddings(spark, sfDir)
      val cut = emb.agg((expr("max(vec_id)") * 9 / 10).cast("long")).head().getLong(0)
      emb.filter(col("vec_id") < cut)
        .write.mode("overwrite").parquet(s"$incOldDir/embeddings.parquet")
      Similarity.corpusKnnEdges(spark, incOldDir, bits = bits).count()
      Similarity.corpusBandedEmbeddings(spark, incOldDir, bits = bits).count()
    }
    def noSetup: () => Unit = () => ()
    val builds = Seq[(String, () => Unit, () => Long)](
      ("ngramidx_k3", noSetup, () => Dedup.corpusNgramIndex(spark, sfDir).count()),
      ("gramdf_k3", noSetup, () => Dedup.corpusGramDf(spark, sfDir).count()),
      ("gramdf_k3_increment", () => {
        import org.apache.spark.sql.functions.{col, expr}
        val docs = graft.Tables.documents(spark, sfDir)
        val cut = docs.agg((expr("max(doc_id)") * 9 / 10).cast("long")).head().getLong(0)
        docs.filter(col("doc_id") < cut)
          .write.mode("overwrite").parquet(s"$incOldDir/documents.parquet")
        Dedup.corpusGramDf(spark, incOldDir).count(); ()
      }, () => Dedup.corpusGramDfIncrement(spark, incOldDir, sfDir).count()),
      ("cdcdigests", noSetup, () => Dedup.corpusChunkDigests(spark, sfDir).count()),
      ("minhashsig_k3_h128", noSetup, () => Dedup.corpusMinhashSignatures(spark, sfDir).count()),
      ("simhashsig", noSetup, () => Dedup.corpusSimhashSignatures(spark, sfDir).count()),
      ("knnedges_k5", noSetup, () => Similarity.corpusKnnEdges(spark, sfDir).count()),
      ("knnedges_k5_increment", incSetup(4),
        () => Similarity.corpusKnnEdgesIncrement(spark, incOldDir, sfDir).count()),
      ("knnedges_k5b12", noSetup,
        () => Similarity.corpusKnnEdges(spark, sfDir, bits = 12).count()),
      ("knnedges_k5b12_increment", incSetup(12),
        () => Similarity.corpusKnnEdgesIncrement(spark, incOldDir, sfDir, bits = 12).count()),
      // band asset alone: full banding vs the r16 copy-forward
      // increment (appends never change standing bands, so the
      // increment pays ~batch-fraction of the scan and write)
      ("embbands_b12", noSetup,
        () => Similarity.corpusBandedEmbeddings(spark, sfDir, bits = 12).count()),
      ("embbands_b12_increment", incSetup(12),
        () => Similarity.corpusBandedEmbeddingsIncrement(spark, incOldDir, sfDir, bits = 12).count()),
      ("bpemerges_r3", noSetup, () => TextAnalysis.corpusBpeMerges(spark, sfDir, 3).count())
    )
    val timed = builds.map { case (name, setup, run) =>
      freshRoot()
      setup()
      val t0 = System.nanoTime()
      run()
      val sec = (System.nanoTime() - t0) / 1e9
      name -> math.round(sec * 1000) / 1000.0
    }
    val json = timed.map { case (n, s) => s""""$n": $s""" }.mkString(", ")
    println(s"""{"sf_dir": "$sfDir", "builds": {$json}}""")
    spark.stop()
  }
}
