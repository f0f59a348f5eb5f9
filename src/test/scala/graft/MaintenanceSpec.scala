package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Maintenance
import graft.model.ObjectId
import graft.transform._

/** Compaction and per-stage pipeline observability. */
class MaintenanceSpec extends SparkSpec {

  test("compact: fragmented table rewritten to few files, rows intact") {
    val path = Files.createTempDirectory("graft_compact").toString + "/t"
    val li = Tables.lineitem(spark, sf)
    li.repartition(16).write.parquet(path)
    val fragmented = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(fragmented >= 16)

    val res = Maintenance.compact(spark, path, targetBytes = 64L * 1024 * 1024)
    assert(res.filesBefore == fragmented)
    assert(res.filesAfter < fragmented / 4, s"still fragmented: $res")
    assert(res.rows == li.count())
    assert(spark.read.parquet(path).count() == li.count(), "post-swap table readable")
  }

  test("compact works on a scheme-qualified root (Hadoop FileSystem path)") {
    val path = "file:" + Files.createTempDirectory("graft_compact_uri").toString + "/t"
    val region = Tables.region(spark, sf)
    region.repartition(8).write.parquet(path)
    val res = Maintenance.compact(spark, path)
    assert(res.filesBefore > 1 && res.filesAfter == 1)
    assert(res.rows == region.count())
    assert(spark.read.parquet(path).count() == region.count())
  }

  test("cluster: rewrite narrows per-file key ranges (statistics become selective)") {
    val path = Files.createTempDirectory("graft_cluster").toString + "/t"
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    // shuffle-random layout: every file spans ~the whole key range
    li.orderBy(rand(7)).repartition(8).write.parquet(path)

    def fileSpans(p: String): Seq[Double] = {
      val files = new java.io.File(p).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("l_extendedprice"), max("l_extendedprice")).collect().head
        r.getDouble(1) - r.getDouble(0)
      }
    }
    val wholeSpan = {
      val r = li.agg(min("l_extendedprice"), max("l_extendedprice")).collect().head
      r.getDouble(1) - r.getDouble(0)
    }
    assert(fileSpans(path).forall(_ > wholeSpan * 0.8), "random layout should span everything")

    val res = Maintenance.cluster(spark, path, Seq("l_extendedprice"), targetBytes = 16L * 1024)
    assert(res.rows == li.count())
    val spans = fileSpans(path)
    assert(spans.size > 1, "need multiple files to demonstrate clustering")
    // after clustering, a typical file covers a small slice of the domain
    assert(spans.count(_ < wholeSpan * 0.5) >= spans.size / 2,
      s"clustered files still span the domain: $spans vs whole $wholeSpan")
  }

  test("compact recovers a crash between the two swap renames") {
    val path = Files.createTempDirectory("graft_crash").toString + "/t"
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    li.repartition(4).write.parquet(path)
    val want = li.count()
    // simulate a process death after rename(live -> .old) and before
    // rename(tmp -> live): the live dir is gone, `.old` holds the data
    assert(new java.io.File(path).renameTo(new java.io.File(path + ".old")))
    val res = Maintenance.compact(spark, path)
    assert(res.rows == want, "recovery must restore .old, not treat it as debris")
    assert(spark.read.parquet(path).count() == want)
    assert(!new java.io.File(path + ".old").exists(), ".old cleaned up after commit")
  }

  test("observed pipeline reports per-stage survivor counts") {
    import org.apache.spark.sql.Observation
    val df = Tables.lineitem(spark, sf)
    val mutators = Seq[ColumnMutator](
      DropMutator(ObjectId("obs", "dropLow"), col("l_quantity") < 10),
      DropMutator(ObjectId("obs", "dropHigh"), col("l_quantity") > 40)
    )
    val (observed, names) = MutatorPipeline.applyColumnarObserved(df, mutators)
    // Observation API needs named registration before the action; the
    // observe() calls inside used literal names, so read metrics off the
    // QueryExecution instead
    val qe = observed.queryExecution
    observed.collect() // same QueryExecution; count() would build a new one
    val metrics = qe.observedMetrics
    assert(names.forall(metrics.contains), s"missing stages: ${metrics.keySet}")
    val stage0 = metrics(names.head).getLong(0)
    val stage1 = metrics(names(1)).getLong(0)
    assert(stage0 == df.filter(col("l_quantity") >= 10).count())
    assert(stage1 == df.filter(col("l_quantity") >= 10 && col("l_quantity") <= 40).count())
    assert(stage1 <= stage0)
  }
}
