package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Product quantization: code/encoding invariants, determinism, and the
  * ADC approximation contract measured against the EXACT quantized-L2
  * ranking (the metric ADC estimates — cosine top-k is a different
  * metric on these unnormalized vectors and not the fair baseline).
  */
class PqSpec extends SparkSpec {

  private val M = 16
  private val K = 16

  private def emb = Tables.embeddings(spark, sf)

  test("pqEncode: every vector gets exactly m codes, all within [0, k)") {
    val codes = Similarity.pqEncode(emb, m = M, k = K)
    val perVec = codes.groupBy("vec_id")
      .agg(count(lit(1)).as("n"), count_distinct(col("s")).as("ns"))
      .filter(col("n") =!= M || col("ns") =!= M)
    assert(perVec.count() == 0, "each vector must carry one code per subspace")
    val oob = codes.filter(col("code") < 0 || col("code") >= K || col("err") < 0)
    assert(oob.count() == 0, "codes bounded by the codebook, errors non-negative")
    val nVec = emb.filter(col("embedding").isNotNull).count()
    assert(codes.select("vec_id").distinct().count() == nVec, "full corpus coverage")
    codes.unpersist()
  }

  test("pqEncode is deterministic: two independent trainings agree bit-for-bit") {
    val a = Similarity.pqEncode(emb, m = M, k = K).orderBy("vec_id", "s").collect()
    val b = Similarity.pqEncode(emb, m = M, k = K).orderBy("vec_id", "s").collect()
    assert(a.sameElements(b))
    spark.catalog.clearCache()
  }

  test("annPq: ADC top-k recalls most of the exact quantized-L2 top-k") {
    val queries = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val adc = Similarity.annPq(queries, emb, kTop = 5, m = M, k = K)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    // exact L2 on the same integer grid ADC approximates
    val q = transform(col("embedding"),
      e => coalesce(floor(e.cast("double") * 1000 + lit(0.5)).cast("long"), lit(0L)))
    val g = emb.filter(col("embedding").isNotNull).select(col("vec_id"), q.as("qe"))
    val exact = g.select(col("vec_id").as("query_id"), col("qe").as("qq"))
      .filter(col("query_id") < 16)
      .crossJoin(g)
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("d", graft.functions.vec.sqDistLong(col("qq"), col("qe")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("d"), col("vec_id"))))
      .filter(col("rn") <= 5)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val recalls = exact.map { case (qid, truth) =>
      truth.intersect(adc.getOrElse(qid, Set.empty)).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // 16 codes over 4-dim subvectors on near-uniform random vectors
    // (the documented LSH worst case too); real corpora cluster and do
    // far better — measured 0.375 at m=16, k=16 on this corpus
    assert(mean >= 0.25, s"mean ADC recall@5 vs exact-L2 was $mean")
    spark.catalog.clearCache()
  }

  test("annRefine: corpus-wide shortlist reproduces the exact quantized-L2 ranking") {
    val nVec = emb.filter(col("embedding").isNotNull).count().toInt
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    // rCand = whole corpus -> stage 1 excludes nothing, so the refine
    // output IS the exact ranking (same grid, same tiebreak)
    val got = Similarity.annRefine(queries, Similarity.pqIndex(spark, sf, M, K), emb,
        rCand = nVec, kTop = 5)
      .select("query_id", "rank", "vec_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    val q = transform(col("embedding"),
      e => coalesce(floor(e.cast("double") * 1000 + lit(0.5)).cast("long"), lit(0L)))
    val g = emb.filter(col("embedding").isNotNull).select(col("vec_id"), q.as("qe"))
    val want = g.select(col("vec_id").as("query_id"), col("qe").as("qq"))
      .filter(col("query_id") < 8)
      .crossJoin(g)
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("dist", graft.functions.vec.sqDistLong(col("qq"), col("qe")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("dist"), col("vec_id"))).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "vec_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(got == want, "full-shortlist refine must equal the exact ranking")
    spark.catalog.clearCache()
  }

  test("annRefine: a 4x shortlist strictly improves on raw ADC recall@5") {
    val queries = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val idx = Similarity.pqIndex(spark, sf, M, K)
    def sets(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val adc = sets(Similarity.annPqIndexed(queries, idx, kTop = 5))
    val ref = sets(Similarity.annRefine(queries, idx, emb, rCand = 20, kTop = 5))
    val q = transform(col("embedding"),
      e => coalesce(floor(e.cast("double") * 1000 + lit(0.5)).cast("long"), lit(0L)))
    val g = emb.filter(col("embedding").isNotNull).select(col("vec_id"), q.as("qe"))
    val exact = sets(g.select(col("vec_id").as("query_id"), col("qe").as("qq"))
      .filter(col("query_id") < 16)
      .crossJoin(g)
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("d", graft.functions.vec.sqDistLong(col("qq"), col("qe")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("d"), col("vec_id"))))
      .filter(col("rn") <= 5))
    def recall(got: Map[Long, Set[Long]]) = {
      val rs = exact.map { case (qid, truth) =>
        truth.intersect(got.getOrElse(qid, Set.empty)).size.toDouble / truth.size }
      rs.sum / rs.size
    }
    val (ra, rr) = (recall(adc), recall(ref))
    assert(rr > ra, s"refine recall $rr must beat raw ADC recall $ra")
    assert(rr >= 0.5, s"refine recall@5 with a 4x shortlist was only $rr")
    spark.catalog.clearCache()
  }

  test("annPq ranks by exact integer ADC with vec_id tiebreak (rank contract)") {
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val out = Similarity.annPq(queries, emb, kTop = 5, m = M, k = K)
      .orderBy("query_id", "rank").collect()
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      val pairs = sorted.map(r => (r.getLong(3), r.getLong(2))) // (adc, vec_id)
      assert(pairs.toSeq == pairs.toSeq.sorted, "ascending (adc, vec_id)")
    }
    spark.catalog.clearCache()
  }

  test("pqPrepared rejects a dim not divisible by m") {
    intercept[IllegalArgumentException] {
      Similarity.pqEncode(emb, m = 9, k = K).count()
    }
  }

  test("annIvfPq: rank contract holds and narrowing nprobe only removes candidates") {
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val full = Similarity.annIvfPq(queries, emb, kTop = 5, nlist = 8, nprobe = 8, m = M, k = K)
      .collect()
    // full probe scans every cell: each query gets its full top-5
    full.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length == 5)
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to 5L))
      val pairs = sorted.map(r => (r.getLong(3), r.getLong(2)))
      assert(pairs.toSeq == pairs.toSeq.sorted, "ascending (adc, vec_id)")
    }
    spark.catalog.clearCache()
    val narrow = Similarity.annIvfPq(queries, emb, kTop = 5, nlist = 8, nprobe = 2, m = M, k = K)
      .collect()
    // a narrow probe sees a subset of cells, so each (query, vec) it
    // returns scored identically to the full probe — candidates within
    // the probed cells keep their exact ADC value
    val fullAdc = full.map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    narrow.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      fullAdc.get(key).foreach(adc => assert(adc == r.getLong(3), s"ADC mismatch at $key"))
    }
    assert(narrow.groupBy(_.getLong(0)).forall(_._2.length <= 5))
    spark.catalog.clearCache()
  }

  test("annIvfPq is layout-invariant: repartitioned corpus gives identical results") {
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val a = Similarity.annIvfPq(queries, emb, kTop = 5, nlist = 8, nprobe = 4, m = M, k = K)
      .orderBy("query_id", "rank").collect()
    spark.catalog.clearCache()
    val b = Similarity.annIvfPq(queries, emb.repartition(7), kTop = 5, nlist = 8, nprobe = 4, m = M, k = K)
      .orderBy("query_id", "rank").collect()
    assert(a.sameElements(b), "results must not depend on physical layout")
    spark.catalog.clearCache()
  }

  test("pqIndex asset: second consumer triggers no retraining and shares the code table") {
    val a = Similarity.pqIndex(spark, sf, m = M, k = K)
    val trained = Similarity.pqTrainings.get()
    val b = Similarity.pqIndex(spark, sf, m = M, k = K)
    assert(Similarity.pqTrainings.get() == trained, "second consumer must not retrain")
    assert(a.codesPath == b.codesPath, "both consumers must read the same materialized table")
    // two different consumers of the one asset agree with the one-shot APIs
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val viaAsset = Similarity.annPqIndexed(queries, a, kTop = 5)
      .orderBy("query_id", "rank").collect()
    val oneShot = Similarity.annPq(queries, emb, kTop = 5, m = M, k = K)
      .orderBy("query_id", "rank").collect()
    assert(viaAsset.sameElements(oneShot), "asset path and one-shot path must agree")
    spark.catalog.clearCache()
  }

  test("ivfPqIndex asset: codes table is cid-partitioned and reused without retraining") {
    val a = Similarity.ivfPqIndex(spark, sf, nlist = 8, m = M, k = K)
    val trained = Similarity.pqTrainings.get()
    val b = Similarity.ivfPqIndex(spark, sf, nlist = 8, m = M, k = K)
    assert(Similarity.pqTrainings.get() == trained)
    assert(a.codesPath == b.codesPath)
    // partitioned layout on disk: one directory per coarse cell
    val dirs = new java.io.File(a.codesPath).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cid=")).sorted
    assert(dirs.length == a.coarse.size, s"expected ${a.coarse.size} cid partitions, got ${dirs.toSeq}")
    spark.catalog.clearCache()
  }

  test("durable asset: a fresh JVM (cleared handle map) serves ann_pq from disk without retraining") {
    // isolated warehouse so this spec exercises the publish+load cycle
    // from scratch regardless of what earlier suites left on disk
    val root = java.nio.file.Files.createTempDirectory("graft_idx_spec").toString
    spark.conf.set("spark.graft.index.dir", root)
    try {
      Similarity.dropInMemoryIndexes()
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))

      // first resolution: trains and PUBLISHES (codes + model + manifest)
      val built = Similarity.pqIndex(spark, sf, m = M, k = K)
      val builtIvf = Similarity.ivfPqIndex(spark, sf, nlist = 8, m = M, k = K)
      val viaBuilt = Similarity.annPqIndexed(queries, built, kTop = 5)
        .orderBy("query_id", "rank").collect()
      val viaBuiltIvf = Similarity.annIvfPqIndexed(queries, builtIvf, nprobe = 4, kTop = 5)
        .orderBy("query_id", "rank").collect()
      val assets = new java.io.File(root).listFiles().filter(_.isDirectory).map(_.getName)
      assert(assets.exists(_.startsWith("flat_")) && assets.exists(_.startsWith("ivf_")),
        s"published asset dirs expected under $root, got ${assets.toSeq}")
      assets.filter(d => d.startsWith("flat_") || d.startsWith("ivf_")).foreach { d =>
        assert(new java.io.File(s"$root/$d/manifest.json").isFile, s"$d missing manifest")
        assert(new java.io.File(s"$root/$d/model").isDirectory, s"$d missing model table")
        assert(new java.io.File(s"$root/$d/codes").isDirectory, s"$d missing code table")
      }

      // "new JVM": drop every in-memory handle; resolution must LOAD
      Similarity.dropInMemoryIndexes()
      val trained = Similarity.pqTrainings.get()
      val loaded = Similarity.pqIndex(spark, sf, m = M, k = K)
      val loadedIvf = Similarity.ivfPqIndex(spark, sf, nlist = 8, m = M, k = K)
      assert(Similarity.pqTrainings.get() == trained,
        "fresh-JVM resolution must load the published asset, not retrain")
      assert(loaded.codebooks == built.codebooks && loaded.dsub == built.dsub,
        "rehydrated codebooks must be bit-identical")
      assert(loadedIvf.coarse == builtIvf.coarse,
        "rehydrated coarse centroids must be bit-identical")
      // cid partition layout survives publish (directory pruning intact)
      val cidDirs = new java.io.File(loadedIvf.codesPath).listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cid="))
      assert(cidDirs.length == loadedIvf.coarse.size)
      val viaLoaded = Similarity.annPqIndexed(queries, loaded, kTop = 5)
        .orderBy("query_id", "rank").collect()
      val viaLoadedIvf = Similarity.annIvfPqIndexed(queries, loadedIvf, nprobe = 4, kTop = 5)
        .orderBy("query_id", "rank").collect()
      assert(viaLoaded.sameElements(viaBuilt), "ann_pq from the loaded asset must match")
      assert(viaLoadedIvf.sameElements(viaBuiltIvf), "ann_ivfpq from the loaded asset must match")
    } finally {
      spark.conf.unset("spark.graft.index.dir")
      Similarity.dropInMemoryIndexes() // don't leak handles into the spec-dir warehouse
      spark.catalog.clearCache()
    }
  }

  test("annPqJoined: 1k+ query batch agrees with the literal path on the shared prefix") {
    val idx = Similarity.pqIndex(spark, sf, m = M, k = K)
    // replicate the corpus vectors under fresh query ids to build a
    // >1000-query batch (the regime the joined path exists for)
    val big = (0 until 3).map(r =>
      emb.select((col("vec_id") + lit(r * 10000L)).as("query_id"), col("embedding").as("q_vec")))
      .reduce(_.unionAll(_))
    assert(big.count() >= 1000)
    val joined = Similarity.annPqJoined(big, idx, kTop = 5)
      .filter(col("query_id") < 16)
      .orderBy("query_id", "rank").collect()
    val literal = Similarity.annPqIndexed(
      emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_vec")),
      idx, kTop = 5)
      .orderBy("query_id", "rank").collect()
    assert(joined.sameElements(literal), "joined ADC must equal literal ADC on the shared queries")
    spark.catalog.clearCache()
  }

  test("annIvfPqJoined: large batch agrees with the literal IVFADC path on the shared prefix") {
    val idx = Similarity.ivfPqIndex(spark, sf, nlist = 8, m = M, k = K)
    // replicate corpus vectors under fresh query ids -> >1000 queries
    val big = (0 until 3).map(r =>
      emb.select((col("vec_id") + lit(r * 10000L)).as("query_id"), col("embedding").as("q_vec")))
      .reduce(_.unionAll(_))
    assert(big.count() >= 1000)
    val joined = Similarity.annIvfPqJoined(big, idx, nprobe = 4, kTop = 5)
      .filter(col("query_id") < 16)
      .orderBy("query_id", "rank").collect()
    val literal = Similarity.annIvfPqIndexed(
      emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_vec")),
      idx, nprobe = 4, kTop = 5)
      .orderBy("query_id", "rank").collect()
    assert(joined.sameElements(literal),
      "joined IVFADC must equal literal IVFADC on the shared queries")
    // full probe agrees too (coarse ranking covers every cell)
    val jFull = Similarity.annIvfPqJoined(
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_vec")),
      idx, nprobe = 8, kTop = 5).orderBy("query_id", "rank").collect()
    val lFull = Similarity.annIvfPqIndexed(
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_vec")),
      idx, nprobe = 8, kTop = 5).orderBy("query_id", "rank").collect()
    assert(jFull.sameElements(lFull))
    spark.catalog.clearCache()
  }

  test("empty query set degenerates to an empty result, not an error") {
    val idx = Similarity.pqIndex(spark, sf, m = M, k = K)
    val none = emb.filter(lit(false))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    assert(Similarity.annPqIndexed(none, idx, kTop = 5).count() == 0)
    assert(Similarity.annPqJoined(none, idx, kTop = 5).count() == 0)
    val ivf = Similarity.ivfPqIndex(spark, sf, nlist = 8, m = M, k = K)
    assert(Similarity.annIvfPqIndexed(none, ivf, nprobe = 2, kTop = 5).count() == 0)
    assert(Similarity.annIvfPqJoined(none, ivf, nprobe = 2, kTop = 5).count() == 0)
    spark.catalog.clearCache()
  }

  test("a NULL q_vec query row is dropped, not an NPE (oracle WHERE-IS-NOT-NULL parity)") {
    val idx = Similarity.pqIndex(spark, sf, m = M, k = K)
    val withNull = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
      .unionAll(spark.range(1).select(lit(999L).as("query_id"),
        lit(null).cast("array<float>").as("q_vec")))
    val out = Similarity.annPqIndexed(withNull, idx, kTop = 5)
    assert(out.filter(col("query_id") === 999L).count() == 0, "null query contributes no rows")
    assert(out.select("query_id").distinct().count() == 4)
    val ivf = Similarity.ivfPqIndex(spark, sf, nlist = 8, m = M, k = K)
    assert(Similarity.annIvfPqIndexed(withNull, ivf, nprobe = 2, kTop = 5)
      .filter(col("query_id") === 999L).count() == 0)
    spark.catalog.clearCache()
  }

  test("duplicate coarse seed vectors: empty cells are dropped and relabeled, not a crash") {
    // corpus of 32 vectors where the stride-8 seeds at vec_id 0 and 8
    // are byte-identical -> cell 1 goes empty after the Lloyd step
    val v0 = emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val dup = emb.filter(col("vec_id") < 32)
      .select(col("vec_id"),
        when(col("vec_id") === 8, typedLit(v0)).otherwise(col("embedding")).as("embedding"))
    val queries = dup.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val out = Similarity.annIvfPq(queries, dup, kTop = 3, nlist = 4, nprobe = 4, m = M, k = K)
      .collect()
    assert(out.nonEmpty, "degraded-cell corpus must still answer queries")
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
    }
    spark.catalog.clearCache()
  }

  test("annIvfPq full-probe recall vs exact quantized-L2 is at least PQ-grade") {
    val queries = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val adc = Similarity.annIvfPq(queries, emb, kTop = 5, nlist = 8, nprobe = 8, m = M, k = K)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val q = transform(col("embedding"),
      e => coalesce(floor(e.cast("double") * 1000 + lit(0.5)).cast("long"), lit(0L)))
    val g = emb.filter(col("embedding").isNotNull).select(col("vec_id"), q.as("qe"))
    val exact = g.select(col("vec_id").as("query_id"), col("qe").as("qq"))
      .filter(col("query_id") < 16)
      .crossJoin(g)
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("d", graft.functions.vec.sqDistLong(col("qq"), col("qe")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("d"), col("vec_id"))))
      .filter(col("rn") <= 5)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (qid, truth) =>
      truth.intersect(adc.getOrElse(qid, Set.empty)).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // with Lloyd-refined coarse centroids the residuals are centered
    // (raw sample seeds measured 0.125 here); near-uniform random
    // vectors barely cluster, so residual variance stays ~original and
    // recall sits at PQ-grade (measured 0.275), not above it
    assert(mean >= 0.25, s"mean IVFADC recall@5 vs exact-L2 was $mean")
    spark.catalog.clearCache()
  }
}
