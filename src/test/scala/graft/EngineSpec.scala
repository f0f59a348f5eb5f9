package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.engine.{Bounds, Catalog, Transfer}
import graft.model._
import graft.transform._

/** Engine modules: bounds planner invariants (mirroring the golden
  * expectations of `subtasks.bounds.spec.js`), catalog DDL semantics,
  * and the end-to-end transfer pipeline with idempotent re-run.
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  private def prop(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  // -- Bounds planner ----------------------------------------------------

  test("bounds: buckets partition the domain, counts sum to total") {
    val li = Tables.lineitem(spark, sf)
    val plan = Bounds.plan(li, "lineitem", "l_extendedprice", buckets = 3)
    assert(plan.size == 3)
    assert(plan.map(_.count).sum == li.count())
    // contiguous coverage: each bucket's max is the next one's min
    plan.sliding(2).foreach {
      case Seq(a, b) => assert(a.maxSize == b.minSize)
      case _         =>
    }
    assert(plan.head.minSize.isNegInfinity && plan.last.maxSize == Double.MaxValue)
    // equi-depth-ish: no bucket more than 2x the ideal share
    val ideal = li.count() / 3.0
    plan.foreach(b => assert(b.count < 2 * ideal, s"skewed bucket: $b"))
  }

  test("bounds: null-heavy size column plans without crashing (nulls land in bucket 0)") {
    import spark.implicits._
    // constant non-null value + nulls: quantile cuts collapse to one
    // value, bucket 0 holds ONLY nulls -> its max(size) is null
    val df = Seq[java.lang.Double](5.0, 5.0, 5.0, null, null)
      .toDF("sz")
    val plan = Bounds.plan(df, "t", "sz", buckets = 3)
    assert(plan.map(_.count).sum == 5L)
    assert(plan.head.minSize.isNegInfinity)
    // fully-null column: still a valid (single-bucket-shaped) plan
    val allNull = Seq[java.lang.Double](null, null).toDF("sz")
    val p2 = Bounds.plan(allNull, "t", "sz", buckets = 3)
    assert(p2.map(_.count).sum == 2L)
  }

  test("global rank: matches window row_number/ntile without a single-partition sort") {
    import org.apache.spark.sql.expressions.Window
    val df = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val sortCols = Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val (ranked, total) = graft.engine.GlobalRank.withRowNumber(df, sortCols, "rn")
    assert(total == df.count())
    val got = ranked
      .withColumn("bucket", graft.engine.GlobalRank.ntileFromRank(col("rn"), 7, total))
      .select(col("l_orderkey"), col("l_linenumber"), col("rn"), col("bucket"))
    val w = Window.orderBy(sortCols: _*)
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("bucket", ntile(7).over(w).cast("long"))
      .select(col("l_orderkey"), col("l_linenumber"), col("rn"), col("bucket"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the scalable plan must not contain an unpartitioned window
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition") || !plan.contains("Window"),
      "global rank plan fell back to a single-partition window")
  }

  test("grouped cum-sum: matches the per-group running-sum window exactly") {
    import org.apache.spark.sql.expressions.Window
    val df = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("g"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("v"))
    val got = graft.engine.GlobalRank.withGroupedCumSumBefore(
      df, Seq("g"), Seq(col("l_orderkey"), col("l_linenumber")), col("v"), "cum")
    val w = Window.partitionBy("g").orderBy(col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("cum", coalesce(sum(col("v")).over(w), lit(0L)))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // empty input must not blow up (offset side has zero rows)
    val empty = graft.engine.GlobalRank.withGroupedCumSumBefore(
      df.limit(0), Seq("g"), Seq(col("l_orderkey")), col("v"), "cum")
    assert(empty.count() == 0L)
  }

  test("global rank: ntile formula edge cases (total < n, exact multiples)") {
    import graft.engine.GlobalRank.ntileFromRank
    def buckets(total: Long, n: Int): Seq[Long] = {
      val df = spark.range(1, total + 1).toDF("rn")
      df.select(ntileFromRank(col("rn"), n, total).as("b"))
        .collect().map(_.getLong(0)).toSeq
    }
    assert(buckets(3, 7) == Seq(1L, 2L, 3L))          // total < n: one row each
    assert(buckets(6, 3) == Seq(1L, 1L, 2L, 2L, 3L, 3L)) // exact multiple
    assert(buckets(7, 3) == Seq(1L, 1L, 1L, 2L, 2L, 3L, 3L)) // remainder first
    // closed-form cuts must partition [1, total] into exactly the
    // window formula's buckets, for any (total, n)
    import org.scalacheck.{Gen, Prop}
    prop(Prop.forAll(Gen.choose(0L, 500L), Gen.choose(1, 12)) { (total, n) =>
      val cuts = graft.engine.GlobalRank.ntileCuts(total, n)
      val viaCuts = cuts.flatMap { case (b, s, e) => (s to e).map(r => r -> b) }.toMap
      val viaFormula = if (total == 0) Map.empty[Long, Long] else buckets(total, n).zipWithIndex
        .map { case (b, i) => (i + 1).toLong -> b }.toMap
      cuts.map(_._1) == (1L to n.toLong) && viaCuts == viaFormula
    })
  }

  test("rowsAtRanks: random ranks equal a driver-side sort (boundary ranks included)") {
    import org.scalacheck.{Gen, Prop}
    prop(Prop.forAll(
      Gen.listOf(Gen.zip(Gen.choose(-1000.0, 1000.0), Gen.choose(0L, 1000L))),
      Gen.listOf(Gen.choose(-2L, 40L)) // deliberately includes out-of-range ranks
    ) { (rows, ranks) =>
      val df = spark.createDataFrame(rows.zipWithIndex.map { case ((v, t), i) => (v, t, i.toLong) })
        .toDF("v", "t", "u")
      val (picked, total) = graft.engine.GlobalRank.rowsAtRanks(
        df, Seq(org.apache.spark.sql.functions.col("v"),
          org.apache.spark.sql.functions.col("t"),
          org.apache.spark.sql.functions.col("u")), _ => ranks)
      val got = picked.select("__grank", "v", "t", "u")
        .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
      spark.catalog.clearCache() // release the ranged stage
      val sorted = rows.zipWithIndex.map { case ((v, t), i) => (v, t, i.toLong) }
        .sortBy(x => (x._1, x._2, x._3))
      val want = ranks.distinct.filter(r => r >= 1 && r <= sorted.length)
        .map(r => r -> sorted(r.toInt - 1)).toMap
      total == rows.length && got == want
    })
  }

  test("exact percentiles equal a driver-side sort (quantile_disc pick)") {
    import spark.implicits._
    val got = graft.operators.Relational.qPercentilesQuery(spark, sf)
      .as[(Double, Double)].collect().toMap
    val sorted = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .as[(Double, Long, Long)].collect()
      .sortBy(t => (t._1, t._2, t._3)).map(_._1)
    Seq(0.5, 0.95, 0.99).foreach { p =>
      val want = sorted(math.max(1, math.ceil(p * sorted.length).toLong).toInt - 1)
      assert(got(p) == want, s"p=$p: got ${got(p)}, want $want")
    }
  }

  test("stratified sample: content-determined, per-stratum rates honored") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf)
    val a = TextAnalysis.stratifiedSampleQuery(spark, sf).as[(Long, String)].collect().toSeq
    val b = TextAnalysis.stratifiedSampleQuery(spark, sf).as[(Long, String)].collect().toSeq
    assert(a == b, "sample must be deterministic")
    val perSource = a.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val totals = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    // upweighted sources keep ~75%, others ~25% (loose bounds: 25 docs/stratum)
    Seq("src0", "src1", "src2").foreach { s =>
      val rate = perSource.getOrElse(s, 0.0) / totals(s)
      assert(rate > 0.4, s"$s rate $rate should be ~0.75")
    }
    val restRate = perSource.filterKeys(k => !Set("src0", "src1", "src2")(k)).values.sum /
      totals.filterKeys(k => !Set("src0", "src1", "src2")(k)).values.sum
    assert(restRate < 0.5, s"rest rate $restRate should be ~0.25")
  }

  test("plan audit: range predicate reaches the parquet scan, dims broadcast") {
    val f5 = graft.operators.Relational.f5SizeRange(spark, sf)
      .queryExecution.executedPlan.toString
    assert(f5.contains("PushedFilters:") && f5.contains("GreaterThanOrEqual(l_quantity"),
      s"F5 predicate not pushed to the scan:\n$f5")
    val q3 = graft.operators.Relational.q3Join(spark, sf)
      .queryExecution.executedPlan.toString
    assert(q3.contains("BroadcastHashJoin"), "q3 dim join must broadcast")
  }

  test("plan audit: grouped-index near-dup plans carry no rank window") {
    // winnowPairs and the n-gram prefix stage both used count/row_number
    // windows (a full sort of the exchanged rows); the grouped-posting-
    // list rewrites must keep Window out of these plans for good
    val wp = graft.operators.TextAnalysis
      .winnowPairs(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!wp.contains("Window"), s"winnowPairs regained a window stage:\n$wp")
    val ng = graft.operators.Dedup
      .ngramJaccardPairs(Tables.documents(spark, sf), k = 3, threshold = 0.2)
      .queryExecution.executedPlan.toString
    assert(!ng.contains("Window"), s"ngram prefix regained a window stage:\n$ng")
    spark.catalog.clearCache() // both operators handoff-persist their pairs
  }

  test("plan audit: projection prunes the parquet read schema") {
    val plan = graft.operators.TextAnalysis.textTokens(spark, sf)
      .queryExecution.executedPlan.toString
    // only doc_id and text should be read, not source/lang/n_chars
    assert(plan.contains("ReadSchema") && !plan.contains("n_chars"),
      s"column pruning failed:\n$plan")
  }

  test("bounds: flush size formula clamps to [1, 10000] (subtasks.js:15,267)") {
    prop(Prop.forAll(Gen.choose(0.0, 1e9), Gen.choose(1, 64)) { (maxDoc, shards) =>
      val f = Bounds.flushSize(maxDoc, shards)
      f >= 1 && f <= 10000
    })
    assert(Bounds.flushSize(50.0 * 1000 * 1000, 1) == 1)    // 1 doc fills the batch
    assert(Bounds.flushSize(5000, 1) == 10000)              // clamp high
    assert(Bounds.flushSize(0, 1) == 10000)                 // degenerate
  }

  test("subtask identity is content-addressed minus count (subtask.js:20-25)") {
    val a = SubtaskSpec("t", 0, 100, 50, count = 10)
    val b = SubtaskSpec("t", 0, 100, 50, count = 99)
    assert(a.subtaskId == b.subtaskId)
    assert(a.subtaskId != SubtaskSpec("t", 0, 101, 50, 10).subtaskId)
  }

  // -- Catalog -----------------------------------------------------------

  test("catalog: createIndex drops system settings (transfer.js:235-243)") {
    val c = new Catalog
    val created = c.createIndex(IndexConfig(
      "idx1",
      settings = Map(
        "index.uuid" -> "abc", "index.creation_date" -> "123",
        "index.provided_name" -> "idx1", "index.version.created" -> "7",
        "index.number_of_shards" -> "5"
      )
    ))
    assert(created.settings == Map("index.number_of_shards" -> "5"))
  }

  test("catalog: getTemplates drops dot-templates, errors when none (transfer.js:383-406)") {
    val c = new Catalog
    c.putTemplateRaw(Template(".system", Seq(".sys-*")))
    c.putTemplateRaw(Template("user1", Seq("u-*")))
    assert(c.getTemplates("*").map(_.name) == Seq("user1"))
    intercept[NoSuchElementException](c.getTemplates("nomatch*"))
  }

  test("catalog: glob patterns (transfer.js:364-372)") {
    val c = new Catalog
    Seq("data-2024.01", "data-2024.02", "other").foreach(n => c.putIndexRaw(IndexConfig(n)))
    assert(c.getIndices("data-*").map(_.name) == Seq("data-2024.01", "data-2024.02"))
    assert(c.getIndices("*").size == 3)
  }

  // -- Transfer pipeline -------------------------------------------------

  test("transferTable: mutate+drop+route, idempotent on re-run") {
    val out = Files.createTempDirectory("graft_transfer").toString
    val pipeline = Transfer.Pipeline(columnMutators = Seq(
      WithColumnMutator(ObjectId("tst", "route"), "_index",
        concat(lit("r-"), col("r_name"))),
      DropMutator(ObjectId("tst", "drop"), col("r_regionkey") === 0)
    ))
    val res1 = Transfer.transferTable(spark, s"$sf/region.parquet", out, pipeline)
    val res2 = Transfer.transferTable(spark, s"$sf/region.parquet", out, pipeline)
    assert(res1.rowsWritten == res2.rowsWritten, "overwrite must be idempotent")
    val written = spark.read.parquet(out)
    assert(written.columns.contains("_index"))
    assert(written.filter(col("r_regionkey") === 0).count() == 0)
    assert(res1.rowsWritten == Tables.region(spark, sf).filter(col("r_regionkey") =!= 0).count())
  }

  test("runTask: index filters prune tables before read (F1, README.md:209)") {
    val out = Files.createTempDirectory("graft_task").toString
    val task = TaskSpec("t1", sf, out, tables = Seq("region", "nation"))
    val configs = Seq(IndexConfig("region"), IndexConfig("nation"))
    val results = Transfer.runTask(
      spark, task, Transfer.Pipeline(), configs,
      indexFilters = Seq(_.name == "nation")
    )
    assert(results.size == 1 && results.head.table.contains("nation"))
  }

  test("transferMetadata applies index mutators before DDL (M3, transfer.js:290-292)") {
    val src = new Catalog
    val dst = new Catalog
    src.putIndexRaw(IndexConfig("logs-v1", settings = Map("index.number_of_shards" -> "1")))
    val pipeline = Transfer.Pipeline(indexMutators = Seq(
      ic => ic.copy(name = ic.name.replace("v1", "v2")),
      ic => ic.copy(settings = ic.settings + ("index.number_of_shards" -> "8"))
    ))
    val (ics, _) =
      Transfer.transferMetadata(src, dst, pipeline, tolerateMissingTemplates = true)
    assert(ics.map(_.name) == Seq("logs-v2"))
    assert(dst.getIndices("logs-v2").head.settings("index.number_of_shards") == "8")
  }

  test("transferMetadata surfaces S4's error-if-none for templates (transfer.js:402-405)") {
    val src = new Catalog
    src.putIndexRaw(IndexConfig("logs-v1"))
    // no template matches: the reference FAILS here; the opt-in flag is
    // the only way to get empty-is-fine
    intercept[NoSuchElementException](
      Transfer.transferMetadata(src, new Catalog, Transfer.Pipeline()))
    val (_, tps) = Transfer.transferMetadata(
      src, new Catalog, Transfer.Pipeline(), tolerateMissingTemplates = true)
    assert(tps.isEmpty)
    // a pattern matching ONLY system (dot) templates is as typo'd as one
    // matching nothing: error-if-none runs after the dot filter
    src.createTemplate(graft.model.Template(".monitoring", Seq(".mon-*")))
    intercept[NoSuchElementException](src.getTemplates("*"))
    // the mutator tolerance scope: a NoSuchElementException thrown by a
    // template MUTATOR must propagate even with tolerance on
    src.createTemplate(graft.model.Template("real", Seq("r-*")))
    val boom = Transfer.Pipeline(templateMutators =
      Seq(t => { t.settings("missing.key"); t }))
    intercept[NoSuchElementException](
      Transfer.transferMetadata(src, new Catalog, boom, tolerateMissingTemplates = true))
  }

  test("planner: empty catalog keeps every task table (no silent zero-subtask plan)") {
    val task = TaskSpec("planEmpty", sf, "/tmp/unused", tables = Seq("region", "nation"))
    val potential = graft.engine.Planner.expand(
      spark, task, sizeCols = Map.empty, indexConfigs = Seq.empty)
    assert(potential.map(_.table).toSet == Set("region", "nation"))
  }

  test("planner: expand x buckets, resume diff skips completed (P1/P5, subtasks.js:369-396)") {
    val task = TaskSpec("plan1", sf, "/tmp/unused", tables = Seq("lineitem", "region", "nation"))
    val configs = Seq(IndexConfig("lineitem"), IndexConfig("region"), IndexConfig("nation"))
    val potential = graft.engine.Planner.expand(
      spark, task,
      sizeCols = Map("lineitem" -> "l_extendedprice"),
      indexConfigs = configs,
      indexFilters = Seq(ic => ic.name != "nation") // F1 prunes nation pre-read
    )
    // 3 buckets for lineitem + 1 whole-table subtask for region; nation pruned
    assert(potential.count(_.table == "lineitem") == 3)
    assert(potential.count(_.table == "region") == 1)
    assert(!potential.exists(_.table == "nation"))

    // resume: complete the first lineitem bucket (with a different count
    // to prove identity excludes count), re-plan, only it is skipped
    val done = potential.head.copy(count = -1)
    val backlog = graft.engine.Planner.buildBacklog(potential, Set(done.subtaskId))
    assert(backlog.size == potential.size - 1)
    assert(!backlog.exists(_.subtaskId == done.subtaskId))
  }

  test("type filters OR-combine over mapping types (F2, subtasks.js:165)") {
    val types = Seq("doc", "event", "metric")
    assert(MetadataFilters.applyTypeFilters(types, Seq.empty) == types)
    val kept = MetadataFilters.applyTypeFilters(
      types, Seq(_ == "doc", _.startsWith("m")))
    assert(kept == Seq("doc", "metric"))
  }

  test("subtask execution: union of planned slices equals whole-table transfer (P1+S1+F5)") {
    val li = Tables.lineitem(spark, sf)
    val plan = graft.engine.Bounds.plan(li, "lineitem", "l_extendedprice", buckets = 3)
    val destRoot = Files.createTempDirectory("graft_subtasks").toString
    val pipeline = Transfer.Pipeline(columnMutators = Seq(
      DropMutator(ObjectId("tst", "dropQ"), col("l_quantity") > 45)
    ))
    plan.foreach(st => info(s"planned: $st"))
    val results = plan.map(st =>
      Transfer.transferSubtask(spark, s"$sf/lineitem.parquet", destRoot, st, "l_extendedprice", pipeline))
    results.foreach(r => info(s"written: $r"))
    // every subtask wrote its own dir; union == single whole-table run
    assert(results.map(_.outputPath).distinct.size == 3)
    val unionCount = results.map(_.rowsWritten).sum
    val whole = MutatorPipeline
      .applyColumnar(li, pipeline.columnMutators).count()
    assert(unionCount == whole, s"subtask union $unionCount != whole $whole")
    // no row lands in two slices: the size ranges are disjoint by
    // construction, so the physical union must match the whole count too
    // (note: (l_orderkey, l_linenumber) is NOT unique in this synthetic
    // corpus, so a distinct-key check would undercount)
    val unionRead = spark.read.parquet(results.map(_.outputPath): _*).count()
    assert(unionRead == whole)
  }

  test("subtask union invariant holds for null, NaN, and infinite sizes") {
    import spark.implicits._
    val weird = Seq(
      (1L, Some(5.0)), (2L, Some(500.0)), (3L, Some(50000.0)),
      (4L, None), (5L, Some(Double.NaN)), (6L, Some(Double.PositiveInfinity)),
      (7L, Some(Double.NegativeInfinity)), (8L, Some(0.0))
    ).toDF("id", "sz")
    val src = Files.createTempDirectory("graft_weird").toString + "/t.parquet"
    weird.write.parquet(src)
    val df = spark.read.parquet(src)
    val plan = graft.engine.Bounds.plan(df, "t", "sz", buckets = 3)
    val destRoot = Files.createTempDirectory("graft_weird_out").toString
    val results = plan.map(st =>
      Transfer.transferSubtask(spark, src, destRoot, st, "sz", Transfer.Pipeline()))
    val unionCount = results.map(_.rowsWritten).sum
    assert(unionCount == 8, s"union lost rows: $unionCount != 8 (plan: $plan)")
    // and the planner's per-bucket counts agree with what was written
    assert(plan.map(_.count).sum == 8, s"planner counts: ${plan.map(_.count)}")
  }

  test("Dataset[Doc] distributed fold matches the local fold (schema-agnostic path)") {
    implicit val enc: org.apache.spark.sql.Encoder[Doc] =
      org.apache.spark.sql.Encoders.product[Doc]
    val docs = (1 to 100).map(i => Doc("idx", "t", i.toString, Map("n" -> i.toString)))
    val ds = spark.createDataset(docs)
    val mutators = Seq(
      graft.transform.DocMutator(
        ObjectId("tst", "tag"),
        (d, _) => d.source("n").toInt % 2 == 0,
        (d, _) => Some(d.copy(source = d.source + ("even" -> "yes")))
      ),
      graft.transform.DocMutator(
        ObjectId("tst", "dropBig"),
        (d, _) => d.source("n").toInt > 90,
        (_, _) => None
      )
    )
    val distributed = graft.transform.MutatorPipeline.applyDataset(ds, mutators)
      .collect().sortBy(_.id.toInt)
    val local = graft.transform.MutatorPipeline.applyDocs(docs, mutators)
    assert(distributed.toSeq == local)
    assert(distributed.length == 90)
    assert(distributed.count(_.source.contains("even")) == 45)
  }

  test("bucketed tables join without a shuffle (co-located join at scale)") {
    val s = spark.newSession() // isolated runtime conf; default warehouse dir
    // a fresh in-memory catalog can't overwrite locations it doesn't know:
    // clear leftovers from prior runs
    Seq("orders_b", "customer_b").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(dir)
      }
    }
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    Tables.orders(s, sf).write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.customer(s, sf).write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")
    val joined = s.table("orders_b")
      .join(s.table("customer_b"), col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("upsertLatest: last write wins by version, deterministic tiebreak (K1)") {
    val df = Seq(
      ("k1", 1L, "old"), ("k1", 2L, "new"), ("k2", 5L, "only"),
      ("k3", 7L, "a"), ("k3", 7L, "b") // tie on version
    ).toDF("k", "v", "payload")
    val out = graft.operators.Relational
      .upsertLatest(df, Seq("k"), Seq(col("v").desc, col("payload").desc))
      .orderBy("k").as[(String, Long, String)].collect()
    assert(out.toSeq == Seq(("k1", 2L, "new"), ("k2", 5L, "only"), ("k3", 7L, "b")))
  }

  test("BoundedMemo: access-order LRU cap — insert N+1 evicts the least-recently-used; eviction only re-computes (r18)") {
    val computes = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    val memo = new graft.engine.BoundedMemo[Int, String](3)
    def get(k: Int): String = memo.getOrElseUpdate(k) { computes(k) += 1; s"v$k" }
    (1 to 3).foreach(get)
    assert(memo.size == 3)
    get(1) // touch: LRU order now 2, 3, 1
    get(4) // cap hit: evicts 2, the least recently used
    assert(memo.size == 3 && !memo.contains(2) &&
      memo.contains(1) && memo.contains(3) && memo.contains(4))
    assert(get(2) == "v2" && computes(2) == 2, "an evicted key re-computes, identically")
    assert(get(1) == "v1" && computes(1) == 1, "a cached key never re-computes")
    // a builder that re-enters the memo must not deadlock (compute runs
    // outside the lock — the CHM recursive-update trap, closed by design)
    val reentrant = memo.getOrElseUpdate(10) { get(3); "outer" }
    assert(reentrant == "outer")
  }
}
