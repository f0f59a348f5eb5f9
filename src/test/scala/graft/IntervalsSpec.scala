package graft

import org.apache.spark.sql.functions._

import graft.operators.Intervals

/** The binned overlap join must be EXACTLY the naive theta-join: same
  * pairs, each exactly once, for intervals that span many bins, touch at
  * endpoints, sit inside one bin, or straddle zero.
  */
class IntervalsSpec extends SparkSpec {

  private def naive(
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame
  ) =
    left.crossJoin(right)
      .filter(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))

  test("overlapJoin equals the naive theta-join, pairs emitted exactly once") {
    import spark.implicits._
    // deterministic pseudo-random intervals: spans from sub-bin to 40x bin
    val left = (0L until 200L).map { i =>
      val s = (i * 37) % 1000; (i, s, s + (i * 13) % 400)
    }.toDF("a_id", "a_start", "a_end")
    val right = (0L until 150L).map { j =>
      val s = (j * 53) % 1000; (j, s, s + (j * 7) % 90)
    }.toDF("b_id", "b_start", "b_end")

    val binned = Intervals
      .overlapJoin(left, right, "a_start", "a_end", "b_start", "b_end", binWidth = 10L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    val expected = naive(left, right)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq

    assert(binned.length == binned.distinct.length, "pair emitted more than once")
    assert(binned.sorted == expected.sorted)
  }

  test("overlapJoin handles negative coordinates and endpoint touching") {
    import spark.implicits._
    val left = Seq(
      (1L, -25L, -5L),  // entirely negative, crosses bin -3..-1
      (2L, -5L, 5L),    // straddles zero
      (3L, 10L, 10L)    // degenerate point interval
    ).toDF("a_id", "a_start", "a_end")
    val right = Seq(
      (10L, -5L, -5L),  // touches #1 and #2 exactly at -5
      (11L, 5L, 10L),   // touches #2 at 5 and #3 at 10
      (12L, -100L, -26L) // disjoint from everything
    ).toDF("b_id", "b_start", "b_end")
    val got = Intervals
      .overlapJoin(left, right, "a_start", "a_end", "b_start", "b_end", binWidth = 10L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)))
  }

  test("overlapJoin rejects a reserved-name collision and excludes backwards intervals") {
    import spark.implicits._
    val left = Seq((1L, 0L, 10L)).toDF("a_id", "a_start", "a_end")
    val right = Seq((2L, 5L, 15L)).toDF("b_id", "b_start", "b_end")
    // an input already carrying the working column would silently change
    // the join key — must fail at plan time
    intercept[IllegalArgumentException] {
      Intervals.overlapJoin(
        left.withColumn("graft_bin", col("a_id")),
        right, "a_start", "a_end", "b_start", "b_end", 10L)
    }
    // a backwards interval (end < start) is malformed for a closed
    // interval and is excluded, not silently binned over the reversed
    // range (sequence() DESCENDS when stop < start)
    val withBad = left.union(Seq((3L, 50L, 20L)).toDF("a_id", "a_start", "a_end"))
    val got = Intervals
      .overlapJoin(withBad, right, "a_start", "a_end", "b_start", "b_end", 10L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("overlapJoin is exact at nanosecond-epoch magnitudes (beyond double precision)") {
    import spark.implicits._
    // ~1.7e18 ns epochs: (base + small offsets) are NOT representable in
    // a double, so a float-rounded bin id would mis-bin these endpoints
    val base = 1700000000000000000L
    val w = 3600L * 1000000000L // 1h bins in ns
    val left = Seq(
      (1L, base - 1L, base + 1L),          // straddles a bin boundary iff base % w near 0
      (2L, base + w - 1L, base + w + 1L),  // straddles the next boundary
      (3L, base + 10L, base + 20L)
    ).toDF("a_id", "a_start", "a_end")
    val right = Seq(
      (10L, base, base),                    // point at base
      (11L, base + w, base + w),            // point one bin later
      (12L, base + 15L, base + 16L)
    ).toDF("b_id", "b_start", "b_end")
    val got = Intervals
      .overlapJoin(left, right, "a_start", "a_end", "b_start", "b_end", binWidth = w)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val expected = naive(left, right)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == expected, s"got $got expected $expected")
  }

  test("q_interval_join driver query returns one row per incident") {
    val out = Intervals.incidentOverlapQuery(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    assert(out.forall(_.getLong(1) >= 1L), "each incident overlaps its own user's session")
  }
}
