package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The correctness gate's incremental-emission contract (round 15): a
  * partial or failing Verify run must still leave a gradeable artifact
  * trail on disk — oracle_sql.json before any query, one results.jsonl
  * line per query as it completes.
  */
class VerifySpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_verify_spec").toString

  test("run emits oracle_sql.json and one results.jsonl line per query") {
    val out = tmp()
    val names = Set("q1_agg", "text_tokens")
    val rs = Verify.run(spark, sf, out, Some(names))
    assert(rs.map(_.name).toSet == names)
    assert(rs.forall(_.status == "ok"), s"unexpected failures: $rs")
    assert(rs.forall(_.rows > 0))
    val lines = Files.readAllLines(Paths.get(s"$out/results.jsonl")).asScala
    assert(lines.size == names.size)
    names.foreach { n =>
      assert(lines.exists(l => l.contains(s""""name":"$n"""") && l.contains(""""status":"ok"""")),
        s"missing ok line for $n in:\n${lines.mkString("\n")}")
    }
    // oracle json carries the FULL map regardless of the query filter
    val oracle = Files.readString(Paths.get(s"$out/oracle_sql.json"))
    assert(oracle.contains("\"q1_agg\"") && oracle.contains("\"dedup_exact\""))
  }

  test("a failing query still leaves the oracle json and a failed status line") {
    val out = tmp()
    // nonexistent sfDir: every query throws at plan/exec time — the
    // exact shape of a driver-side misconfiguration
    val rs = Verify.run(spark, "/nonexistent/sfdir", out, Some(Set("q1_agg")))
    assert(rs.head.status == "failed" && rs.head.rows == -1L)
    // the oracle json was written BEFORE the query ran (emission-order
    // contract): it exists even though the only query failed
    assert(Files.exists(Paths.get(s"$out/oracle_sql.json")))
    val lines = Files.readAllLines(Paths.get(s"$out/results.jsonl")).asScala
    assert(lines.size == 1 && lines.head.contains(""""status":"failed""""))
  }

  test("per-query watchdog cancels a runaway job group and records a timeout") {
    // a ~50 s job (4 partitions x 50 elements x 1 s sleep / 4 cores)
    // driven through the gate's own timeout plumbing with a 2 s
    // budget: the watchdog must cancel the group, not wait it out.
    // (budget > 0 so the job is SUBMITTED before the cancel fires —
    // cancelJobGroup only reaches active jobs)
    val t0 = System.nanoTime()
    val e = intercept[Throwable] {
      Verify.testTimeoutHook(spark, timeoutS = 2L) {
        import spark.implicits._
        spark.range(0, 200, 1, 4).mapPartitions { it =>
          it.map { i => Thread.sleep(1000); i }
        }.count()
      }
    }
    val elapsedS = (System.nanoTime() - t0) / 1e9
    assert(elapsedS < 30, s"watchdog did not bound the query: ${elapsedS}s")
    // the timeout signal is TYPED (round 16): classification can never
    // be confused by a genuine failure whose message says "cancelled"
    assert(e.isInstanceOf[Verify.VerifyTimeout], s"expected VerifyTimeout, got $e")
  }

  test("watchdog bounds DRIVER-side stalls, not just Spark jobs") {
    // a body that sleeps on the driver before submitting any job — the
    // collect-heavy-builder shape cancelJobGroup alone cannot reach.
    // The r16 worker-thread watchdog interrupts it.
    val t0 = System.nanoTime()
    val e = intercept[Throwable] {
      Verify.testTimeoutHook(spark, timeoutS = 2L) {
        Thread.sleep(120000L)
        42
      }
    }
    val elapsedS = (System.nanoTime() - t0) / 1e9
    assert(elapsedS < 30, s"watchdog did not bound the driver stall: ${elapsedS}s")
    assert(e.isInstanceOf[Verify.VerifyTimeout], s"expected VerifyTimeout, got $e")
  }
}
