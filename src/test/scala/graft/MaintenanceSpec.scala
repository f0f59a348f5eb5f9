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
