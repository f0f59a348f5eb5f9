package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.engine.{ErrorLog, ResilientSink}
import graft.model.ObjectId
import graft.transform.{ExprMutators, MutatorPipeline}

/** K2 retry triage, P8 error log, and M5 SQL-expression mutators. */
class ResilienceSpec extends SparkSpec {
  import ResilientSink._

  test("K2: overload retries with jittered backoff <= 5, then fails (transfer.js:9-11,306-352)") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = withRetry(
      () => { calls += 1; if (calls < 4) throw new RejectedExecutionOverload("busy") else "ok" },
      sleep = sleeps += _,
      rng = new Random(1)
    )
    assert(out == "ok" && calls == 4)
    assert(sleeps.size == 3)
    assert(sleeps.forall(s => s >= MinBackoffMs && s < MaxBackoffMs))

    calls = 0
    val ex = intercept[RuntimeException] {
      withRetry(
        () => { calls += 1; throw new RejectedExecutionOverload("always busy") },
        sleep = _ => (), rng = new Random(2)
      )
    }
    assert(calls == MaxRetries + 1)
    assert(ex.getMessage.contains("after 5 retries"))
  }

  test("K2: non-overload errors fail immediately, no retry") {
    var calls = 0
    intercept[IllegalArgumentException] {
      withRetry(() => { calls += 1; throw new IllegalArgumentException("bad doc") },
        sleep = _ => ())
    }
    assert(calls == 1)
  }

  test("P8: error log records per task in time order (tasks.js:114-144)") {
    val log = new ErrorLog
    log.record("task1", "sub-b", "second", atMillis = 200)
    log.record("task1", "sub-a", "first", atMillis = 100)
    log.record("task2", "sub-x", "other", atMillis = 50)
    assert(log.getErrors("task1").map(_.message) == Seq("first", "second"))
    assert(log.getErrors("task2").map(_.subtask) == Seq("sub-x"))
    assert(log.getErrors("unknown").isEmpty)
  }

  test("M5: SQL-expression mutators compile and run through the pipeline") {
    import spark.implicits._
    val df = Seq((1, 10.0, "a"), (2, 200.0, "b"), (3, 30.0, "c")).toDF("id", "v", "tag")
    val out = MutatorPipeline.applyColumnar(df, Seq(
      ExprMutators.assign(ObjectId("sqlm", "cap"), "v > 100", "v" -> "100.0"),
      ExprMutators.withColumn(ObjectId("sqlm", "route"), "_index", "concat('t-', tag)"),
      ExprMutators.drop(ObjectId("sqlm", "dropc"), "tag = 'c'")
    )).orderBy("id").select("id", "v", "_index").as[(Int, Double, String)].collect()
    assert(out.toSeq == Seq((1, 10.0, "t-a"), (2, 100.0, "t-b")))
  }
}
