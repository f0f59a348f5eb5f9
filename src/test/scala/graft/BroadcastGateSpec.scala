package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{ResolvedHint, UnresolvedHint}

/** Size-gated broadcast hints (round 18) — near-dup-mass-proportional
  * frames (pair tables, cluster labels, hit sets) earn their
  * `broadcast()` per corpus via [[graft.engine.Skew.gatedBroadcast]]:
  * under `spark.graft.broadcast.gateBytes` of pair-asset listing bytes
  * the hint is present; past it the hint drops and AQE plans the
  * shuffled join. Both gate sides pinned here on the three gated
  * queries, plus value-parity between the two plans.
  */
class BroadcastGateSpec extends SparkSpec {

  private val gatedQueries =
    Seq("dedup_canonical", "dedup_cross_source", "neardup_rate_by_source")

  private def hintCount(df: DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case h: ResolvedHint => h
      case h: UnresolvedHint => h
    }.size

  test("under the gate (default 100 MB): every gated query carries its broadcast hint") {
    gatedQueries.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      assert(hintCount(df) > 0, s"$name: expected a broadcast hint on the small fixture")
    }
  }

  test("past the gate (forced 0): hints drop, AQE plans the join, values are identical") {
    val hintedRows = gatedQueries.map { name =>
      name -> SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
    }.toMap
    spark.conf.set(graft.engine.Skew.BroadcastGateBytesKey, "0")
    try {
      gatedQueries.foreach { name =>
        val df = SparkEntry.queries(name)(spark, sf)
        assert(hintCount(df) == 0, s"$name: hint must drop past the gate")
        assert(df.collect().map(_.toString).toSeq == hintedRows(name),
          s"$name: gated and ungated plans must agree row-for-row")
      }
    } finally spark.conf.unset(graft.engine.Skew.BroadcastGateBytesKey)
  }

  test("gatedBroadcast: hint iff bytes <= gate; threshold read at call time") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    def hinted(assetBytes: Long): Boolean =
      hintCount(graft.engine.Skew.gatedBroadcast(df, assetBytes)) > 0
    assert(hinted(0L) && hinted(graft.engine.Skew.DefaultBroadcastGateBytes))
    assert(!hinted(graft.engine.Skew.DefaultBroadcastGateBytes + 1))
    spark.conf.set(graft.engine.Skew.BroadcastGateBytesKey, "10")
    try { assert(hinted(10L) && !hinted(11L)) }
    finally spark.conf.unset(graft.engine.Skew.BroadcastGateBytesKey)
  }
}
