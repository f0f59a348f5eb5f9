package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Interval analytics: a scalable interval-overlap join.
  *
  * Spark has no native interval-join operator; the naive encoding
  * (`a.start <= b.end && b.start <= a.end` as the join condition) plans as
  * BroadcastNestedLoopJoin — quadratic work unless one side fits in a
  * broadcast. The scale path is the classic BINNED equi-join: chop time
  * into fixed-width bins, explode each interval onto every bin it covers,
  * hash-join on the bin key, then verify true overlap. Each pair can meet
  * in several shared bins, so a pair is emitted only from ONE canonical
  * bin — the bin containing the later of the two starts (which both
  * intervals necessarily cover) — making the join exactly-once with no
  * `distinct` pass.
  *
  * Cost model at 100 TB: rows explode by (interval span / binWidth + 1),
  * the single shuffle carries only binned rows, and per-bin work is
  * |L_bin| x |R_bin| — bounded by choosing binWidth near the typical
  * interval span. AQE splits genuinely hot bins.
  */
object Intervals {

  /** Floor division, exact over the FULL long range and correct for
    * negative epochs (`div` truncates toward zero; bins must tile the
    * line monotonically). Subtracting the non-negative `pmod` remainder
    * makes the numerator an exact multiple of `w`; the division then
    * runs in decimal — `/` on longs is double division, which rounds
    * the numerator above 2^53 and shifts bin ids at boundaries (this
    * codebase carries nanosecond epochs ~1.7e18, well past that).
    */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))).cast(DecimalType(38, 0)) / lit(w).cast(DecimalType(38, 0)))
      .cast("long")

  /** Overlap-join two interval tables on closed intervals
    * `[start, end]` (micros or any monotone long). Column names of the
    * two inputs must be disjoint; each side must carry `startCol`/`endCol`
    * prefixed out by the caller. Emits one row per overlapping pair with
    * all columns from both sides.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // the working bin column must not collide with a caller column of
    // the same name — that would silently change the join key; fail at
    // plan time instead of documenting-and-hoping
    require(!left.columns.contains("graft_bin") && !right.columns.contains("graft_bin"),
      "inputs must not contain a 'graft_bin' column (reserved working name)")
    // backwards intervals (end < start) are excluded explicitly: Spark's
    // `sequence(a, b)` DESCENDS when b < a rather than erroring, so a
    // malformed row would otherwise bin over the reversed range and
    // could still pass the canonical-bin guard against itself
    val lb = left.filter(col(lStart) <= col(lEnd)).withColumn(
      "graft_bin",
      explode(sequence(floorDiv(col(lStart), binWidth), floorDiv(col(lEnd), binWidth)))
    )
    val rb = right.filter(col(rStart) <= col(rEnd)).withColumn(
      "graft_bin",
      explode(sequence(floorDiv(col(rStart), binWidth), floorDiv(col(rEnd), binWidth)))
    )
    lb.join(rb, "graft_bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // exactly-once guard: only the bin holding max(start, start) emits
      .filter(col("graft_bin") === floorDiv(greatest(col(lStart), col(rStart)), binWidth))
      .drop("graft_bin")
  }

  /** Driver query: per-user DAILY activity intervals ([first event,
    * last event] per user per date) overlap-joined against error
    * "incident" windows ([error ts, +1h], one per 50th event id) — how
    * many user-sessions were live during each incident. No equi key
    * exists between the sides; the bin key (6h) is the join key.
    */
  def incidentOverlapQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"), to_date(col("ts")).as("d"))
    val sessions = ev
      .groupBy("user_id", "d")
      .agg(min(col("tus")).as("s_start"), max(col("tus")).as("s_end"))
      .drop("d")
    val hourUs = 3600L * 1000000L
    val incidents = ev
      .filter(col("event_type") === "error" && col("event_id") % 50 === 0)
      .select(col("event_id").as("incident_id"),
        col("tus").as("i_start"), (col("tus") + hourUs).as("i_end"))
    overlapJoin(sessions, incidents, "s_start", "s_end", "i_start", "i_end", 6 * hourUs)
      .groupBy("incident_id")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy("incident_id")
  }

  /** INTERVAL MERGE / coverage — the "union of intervals" primitive
    * (uptime accounting, activity coverage, span coalescing): every
    * event opens a 30-minute activity interval for its user; per user,
    * overlapping/touching intervals coalesce into maximal merged spans
    * and the report is their count, total covered micros, and the
    * longest span. The classic sweep: sort a user's intervals by start,
    * a new span begins where start exceeds the running max of prior
    * ends (half-open semantics: touching intervals chain).
    *
    * Scale shape: the sort is a WINDOW over (user) — per-user event
    * counts bound the partition, never the corpus; the running max and
    * the group-id prefix sum ride the same window sort (one exchange +
    * sort total), and both rollups are merged-spans-sized. Tie order
    * within equal (start, end) rows cannot change the outcome (the
    * running max is order-insensitive across equal rows), so the
    * result is deterministic without a unique sort key.
    */
  def coverageQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val winUs = 30L * 60 * 1000000
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("s"))
      .withColumn("e", col("s") + winUs)
    val w = Window.partitionBy("user_id").orderBy("s", "e")
    val merged = ev
      .withColumn("pmax", max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ns", when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
      .withColumn("grp", sum(col("ns")).over(w))
      .groupBy("user_id", "grp")
      .agg(min(col("s")).as("ms"), max(col("e")).as("me"))
    merged
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("me") - col("ms")).as("covered_us"),
        max(col("me") - col("ms")).as("longest_us"))
      .orderBy("user_id")
  }
}
