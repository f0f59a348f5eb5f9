package graft

import org.apache.spark.sql.functions._

import graft.engine.Bucketing

/** Bucketed-layout co-located joins: the spec asserts the PLAN (no
  * Exchange between bucketed scans and the join), not just the result —
  * the whole point of bucketing is what disappears from the executed
  * plan.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def withSmjSession(tables: String*)(f: org.apache.spark.sql.SparkSession => Unit): Unit = {
    // isolated runtime conf: force the sort-merge path (a broadcast would
    // hide the exchange question entirely) without disturbing other suites
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def rmTree(f: java.io.File): Unit = {
      // recursive: an aborted saveAsTable leaves _temporary/ SUBDIRS that
      // a flat delete can't remove; listFiles is null if racing deletion
      Option(f.listFiles()).foreach(_.foreach(rmTree))
      f.delete(); ()
    }
    def purge(): Unit = tables.foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      // a previous aborted run can leave the managed location behind with
      // no catalog entry; saveAsTable then fails LOCATION_ALREADY_EXISTS
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) rmTree(dir)
    }
    purge()
    try f(s) finally purge()
  }

  test("same-key bucketed tables join with zero Exchange and zero Sort") {
    withSmjSession("b_left", "b_right") { s =>
      import s.implicits._
      val left = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "lv")
      val right = (1L to 500L).map(i => (i % 100, -i)).toDF("k", "rv")
      Bucketing.writeBucketed(left, "b_left", "k", 8)
      Bucketing.writeBucketed(right, "b_right", "k", 8)

      val joined = Bucketing.bucketedJoin(s, "b_left", "b_right", "k")
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // NOTE a per-partition Sort remains: since Spark 3.0 bucketed scans
      // no longer report sortBy output ordering (legacy flag
      // spark.sql.legacy.bucketedTableScan.outputOrdering) — but that
      // Sort is bucket-local (network-free, O(bucket) not O(table)); the
      // Exchange is the cost that matters at 100 TB and it is gone
      assert(plan.contains("Bucketed: true"), s"scan must be bucketed:\n$plan")

      // and the exchange-free plan computes the same rows as a plain join
      val expect = left.join(right, "k").count()
      assert(joined.count() == expect)
    }
  }

  test("unbucketed same join pays two Exchanges (the cost bucketing amortizes)") {
    withSmjSession() { s =>
      import s.implicits._
      val left = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "lv")
      val right = (1L to 500L).map(i => (i % 100, -i)).toDF("k", "rv")
      val plan = left.join(right, "k").queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"), s"control join should shuffle:\n$plan")
    }
  }

  test("partitionBy layout: a filter on the partition column prunes at plan time") {
    val root = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events_p"
    val df = (1L to 300L)
      .map(i => (i, if (i % 3 == 0) "click" else if (i % 3 == 1) "view" else "purchase"))
      .toDF("event_id", "event_type")
    df.write.partitionBy("event_type").parquet(root)

    val q = spark.read.parquet(root).filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.toString
    // pruning must happen in PartitionFilters (directory-level, zero I/O
    // on excluded partitions) — NOT as a row-level post-scan filter
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition filter in scan:\n$scan")
    assert(q.count() == 100L)
  }

  test("groupBy on the bucket key also skips the exchange") {
    withSmjSession("b_agg") { s =>
      import s.implicits._
      val df = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "v")
      Bucketing.writeBucketed(df, "b_agg", "k", 8)
      val agg = s.table("b_agg").groupBy("k").agg(sum("v").as("sv"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed groupBy must not shuffle:\n$plan")
      assert(agg.count() == 50L)
    }
  }
}
