package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * EMISSION ORDER IS THE CONTRACT (round 15): everything the driver
  * needs to grade a PARTIAL run exists on disk before/while queries
  * execute, so a timeout or kill mid-suite loses only the unreached
  * queries, never the whole round's correctness record:
  *   1. `oracle_sql.json` is written FIRST, before any query runs;
  *   2. each query appends one status line to `results.jsonl` the
  *      moment it finishes (name, status, rows, ms) — an interrupted
  *      run leaves a well-formed prefix, not an empty file;
  *   3. each query's wall-time is BOUNDED: the action runs in its own
  *      job group and a watchdog cancels the group after
  *      `SPARK_GRAFT_VERIFY_TIMEOUT_S` (default 300 s — ~100× the
  *      sf0.01 per-query median), so one pathological plan cannot
  *      stall the suite past the driver's patience.
  */
object Verify {
  /** One query's outcome, as recorded in `results.jsonl`. */
  final case class QueryResult(name: String, status: String, rows: Long, ms: Long)

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // local-iteration filter (unset in driver runs): comma-separated query
    // names to dump, so one oracle can be cross-checked without the suite
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val timeoutS = sys.env.get("SPARK_GRAFT_VERIFY_TIMEOUT_S").map(_.toLong).getOrElse(300L)
    run(spark, sfDir, outDir, only, timeoutS)
    spark.stop()
  }

  /** The whole gate, separated from `main` so the spec can drive it
    * in-process (and assert the incremental-emission contract above).
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          only: Option[Set[String]] = None,
          perQueryTimeoutS: Long = 300L): Seq[QueryResult] = {
    new java.io.File(outDir).mkdirs()
    // oracle SQL goes out BEFORE any query: the driver can run the
    // DuckDB side against whatever parquet prefix a partial run left
    writeOracleJson(outDir)
    val resultsPath = Paths.get(s"$outDir/results.jsonl")
    Files.deleteIfExists(resultsPath)
    // context cleared when the sweep ENDS (r18): without the finally, a
    // later instrumented collect in the same JVM would be misattributed
    // to whichever query happened to run last
    val out = try SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        // attribution for driver-collect budget failures (r17): a
        // budget excess inside this query names it in the error
        graft.engine.DriverBudget.setContext(name)
        val t0 = System.nanoTime()
        val r =
          try {
            val rows = withTimeout(spark, name, perQueryTimeoutS) {
              fn(spark, sfDir).coalesce(1).write.mode("overwrite")
                .parquet(s"$outDir/$name")
              // row count from the written file's parquet footers —
              // metadata-only, no recompute of the query
              spark.read.parquet(s"$outDir/$name").count()
            }
            QueryResult(name, "ok", rows, (System.nanoTime() - t0) / 1000000L)
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
            // classification is BY TYPE, not message sniffing: only the
            // watchdog throws VerifyTimeout, so a genuine failure whose
            // message happens to contain "cancelled" (or a localized
            // Spark cancellation string) can never be misfiled
            val status = e match {
              case _: VerifyTimeout => "timeout"
              case _                => "failed"
            }
            QueryResult(name, status, -1L, (System.nanoTime() - t0) / 1000000L)
          }
        // one line per query, appended AS IT COMPLETES — the artifact
        // that survives whatever kills the rest of the run
        Files.writeString(resultsPath,
          s"""{"name":${q(r.name)},"status":"${r.status}","rows":${r.rows},"ms":${r.ms}}""" + "\n",
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        // release blocks persisted inside the query before the next one —
        // 50+ queries in one session would otherwise accumulate them
        spark.catalog.clearCache()
        r
      }.toSeq
    finally graft.engine.DriverBudget.clearContext()
    out
  }

  /** Thrown ONLY by the watchdog path of [[withTimeout]] — the typed
    * signal `run` classifies as status "timeout" (no message sniffing).
    */
  private[graft] final class VerifyTimeout(name: String, s: Long)
    extends RuntimeException(s"verify query '$name' exceeded ${s}s budget")

  /** Test seam: the timeout plumbing alone, without the parquet dump. */
  private[graft] def testTimeoutHook[T](spark: SparkSession, timeoutS: Long)(body: => T): T =
    withTimeout(spark, "spec", timeoutS)(body)

  /** Run `body` in its OWN interruptible thread under a named job
    * group; past `timeoutS` the watchdog cancels the job group (stops
    * executor-side work) AND interrupts the worker thread (stops
    * driver-side work — collect-heavy builders, top-K literal prep,
    * driver loops before any job submits), then throws
    * [[VerifyTimeout]]. Bounds every query's wall-time so the suite's
    * total is ≤ queries × timeout even when a plan degenerates.
    *
    * A body that swallows the interrupt can leave its worker thread
    * running as a daemon zombie past the 10 s grace join; the job
    * group is cancelled regardless, so the zombie holds no executor
    * resources — documented residual, same as the pre-r16 behavior.
    */
  private def withTimeout[T](spark: SparkSession, name: String, timeoutS: Long)(body: => T): T = {
    val sc = spark.sparkContext
    val group = s"verify-$name"
    val done = new java.util.concurrent.LinkedBlockingQueue[Either[Throwable, T]](1)
    val worker = new Thread(() => {
      // job group is thread-local: set it in the thread that submits
      sc.setJobGroup(group, s"verify $name", interruptOnCancel = true)
      try done.put(Right(body))
      catch { case t: Throwable => done.put(Left(t)) }
      finally sc.clearJobGroup()
    }, s"verify-worker-$name")
    worker.setDaemon(true)
    worker.start()
    val r = done.poll(timeoutS, java.util.concurrent.TimeUnit.SECONDS)
    if (r == null) {
      sc.cancelJobGroup(group)
      worker.interrupt()
      worker.join(10000L)
      throw new VerifyTimeout(name, timeoutS)
    }
    r.fold(t => throw t, identity)
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeOracleJson(outDir: String): Unit = {
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
