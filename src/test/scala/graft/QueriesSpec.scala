package graft

import org.apache.spark.sql.functions._

/** Smoke coverage of the whole driver contract at sf0.001: every
  * registered query runs and returns rows; entry() is non-empty; every
  * oracle key points at a registered query; multimodal plumbing keeps
  * its schema and determinism.
  */
class QueriesSpec extends SparkSpec {

  test("every SparkEntry query executes and returns rows at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"queries with empty results: $empties")
  }

  test("entry() returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("multimodal: feature extraction is deterministic and schema-stable") {
    import graft.operators.Multimodal
    val a = Multimodal.extractFeatures(Multimodal.assets(spark, sf), Multimodal.FakeDecoder)
    assert(a.schema.fieldNames.toSeq ==
      Seq("media_id", "modality", "n_bytes", "width", "height", "features"))
    val r1 = a.orderBy("media_id").limit(5).collect()
    val r2 = a.orderBy("media_id").limit(5).collect()
    assert(r1.map(_.features.toSeq).toSeq == r2.map(_.features.toSeq).toSeq)
    assert(r1.forall(_.features.length == 8))
  }

  test("multimodal: frame sampling emits rows only for video assets") {
    import graft.operators.Multimodal
    val frames = Multimodal.sampleFrames(Multimodal.assets(spark, sf))
    assert(frames.count() > 0)
    assert(frames.select("media_id").distinct().count() ==
      Multimodal.assets(spark, sf).filter(col("modality") === "video").count())
  }
}
