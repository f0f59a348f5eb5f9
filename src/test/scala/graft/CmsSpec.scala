package graft

import org.apache.spark.sql.functions._

import graft.functions.{cms, text}
import graft.operators.TextAnalysis

/** Count-Min sketch: the published one-sided error contract, merge/
  * layout invariance (the property that makes map-side partials and
  * streaming merges sound), and the driver query's exact-vs-estimate
  * shape.
  */
class CmsSpec extends SparkSpec {

  private val D = 4
  private val W = 1024

  private def docs = Tables.documents(spark, sf)

  test("cms estimates never undercount, and respect the epsilon*N bound") {
    val toks = docs.filter(col("text").isNotNull)
      .select(text.tokens(col("text")).as("toks"))
    val sketch = toks.agg(cms.sketch(col("toks"), D, W)).head().getSeq[Long](0).toIndexedSeq
    val n = sketch.slice(0, W).sum // row 0 holds every token once
    val all = docs.filter(col("text").isNotNull)
      .select(explode(text.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n_exact"))
      .withColumn("n_est", cms.estimate(sketch, col("tok"), D, W))
      .collect()
    assert(all.nonEmpty)
    all.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"CMS undercounted ${r.getString(0)}")
    }
    // eps = e/w; the bound holds per token with prob 1 - e^-d (~0.98 at
    // d=4) — the deterministic corpus either satisfies this fraction or
    // the hashing is broken
    val bound = math.ceil(math.E / W * n).toLong
    val within = all.count(r => r.getLong(2) - r.getLong(1) <= bound)
    assert(within.toDouble / all.length >= 0.95,
      s"only $within/${all.length} tokens within the eps*N bound $bound")
  }

  test("cms sketch is layout-invariant: partitioning never changes a counter") {
    val toks = docs.filter(col("text").isNotNull)
      .select(text.tokens(col("text")).as("toks"))
    val a = toks.agg(cms.sketch(col("toks"), D, W)).head().getSeq[Long](0)
    val b = toks.repartition(13).agg(cms.sketch(col("toks"), D, W)).head().getSeq[Long](0)
    assert(a == b, "merge must be order/partition independent")
    // every row of the sketch accounts for every token exactly once
    val rowTotals = (0 until D).map(i => a.slice(i * W, (i + 1) * W).sum)
    assert(rowTotals.distinct.size == 1, s"row totals diverged: $rowTotals")
  }

  test("cmsFreq: top-k rows carry exact and sketched counts, est >= exact") {
    val out = TextAnalysis.cmsFreq(docs, D, W, topK = 10).collect()
    assert(out.length == 10)
    val exacts = out.map(_.getLong(1))
    assert(exacts.toSeq == exacts.toSeq.sorted.reverse, "descending by exact count")
    out.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
  }

  test("cms rejects an over-wide d and a non-token column") {
    intercept[IllegalArgumentException] {
      cms.sketch(col("toks"), d = 5, w = W)
    }
    val bad = intercept[Exception] {
      docs.select(col("doc_id").as("toks"))
        .agg(cms.sketch(col("toks"), D, W)).head()
    }
    assert(bad.getMessage.contains("graft_cms_sketch") ||
      bad.getMessage.toLowerCase.contains("type"))
  }
}
