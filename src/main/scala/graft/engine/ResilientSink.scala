package graft.engine

import scala.util.Random

/** K2 bulk-error recovery (`transfer.js:306-352`): the reference triages
  * per-item bulk errors — overload (`es_rejected_execution_exception`)
  * means re-queue the batch and back off with 2-7s jitter for at most 5
  * retries; any other error fails the job.
  *
  * Spark owns task-level retry (`spark.task.maxFailures` — the S2 search
  * retry analog); this wrapper adds the reference's *typed* triage for
  * sink flushes inside `foreachPartition`-style writers, where a
  * connector distinguishes transient back-pressure from real failures.
  */
object ResilientSink {

  /** Transient back-pressure signal — the `es_rejected_execution_exception`
    * analog. Anything else is fatal, matching the reference's triage.
    */
  final class RejectedExecutionOverload(msg: String) extends RuntimeException(msg)

  val MaxRetries = 5            // transfer.js:9
  val MinBackoffMs = 2000       // transfer.js:10
  val MaxBackoffMs = 7000       // transfer.js:11

  /** Run `flush`; on overload retry with jittered backoff (seeded rng for
    * testability); on any other exception fail immediately.
    */
  def withRetry[T](
      flush: () => T,
      sleep: Long => Unit = Thread.sleep,
      rng: Random = new Random()
  ): T = {
    var attempt = 0
    while (true) {
      try return flush()
      catch {
        case e: RejectedExecutionOverload =>
          attempt += 1
          if (attempt > MaxRetries)
            throw new RuntimeException(s"sink overloaded after $MaxRetries retries", e)
          sleep(MinBackoffMs + rng.nextInt(MaxBackoffMs - MinBackoffMs).toLong)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
