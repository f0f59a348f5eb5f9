package graft.engine

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerStageSubmitted}

/** Progress/status surface (`SURVEY.md` §3.3): the reference aggregates
  * per-subtask Redis counters into `{percentComplete, total, completed,
  * backlog}` (`tasks.controller.js:14-27`); here a `SparkListener` feeds
  * the same shape from task-end events — no side-channel store needed.
  */
final class ProgressTracker extends SparkListener {
  private val total     = new AtomicLong(0)
  private val completed = new AtomicLong(0)
  private val failed    = new AtomicLong(0)

  override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
    total.addAndGet(s.stageInfo.numTasks.toLong)

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
    if (t.taskInfo.successful) completed.incrementAndGet() else failed.incrementAndGet()

  /** The reference's status payload shape. */
  def status: ProgressTracker.Status = {
    val t = total.get(); val c = completed.get()
    ProgressTracker.Status(
      total = t,
      completed = c,
      backlog = math.max(0L, t - c),
      failed = failed.get(),
      percentComplete = if (t == 0) 100.0 else math.min(100.0, 100.0 * c / t)
    )
  }
}

/** P8 error log (`tasks.js:114-124,131-144`): per-task error records
  * scored by timestamp, readable back in time order.
  */
final class ErrorLog {
  import scala.jdk.CollectionConverters._
  final case class ErrorRecord(atMillis: Long, message: String, subtask: String)

  private val errors =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ConcurrentLinkedQueue[ErrorRecord]]()

  def record(task: String, subtask: String, message: String,
             atMillis: Long = System.currentTimeMillis()): Unit =
    errors
      .computeIfAbsent(task, _ => new java.util.concurrent.ConcurrentLinkedQueue[ErrorRecord]())
      .add(ErrorRecord(atMillis, message, subtask))

  def getErrors(task: String): Seq[ErrorRecord] =
    Option(errors.get(task)).map(_.asScala.toSeq.sortBy(_.atMillis)).getOrElse(Seq.empty)
}

object ProgressTracker {
  final case class Status(
      total: Long,
      completed: Long,
      backlog: Long,
      failed: Long,
      percentComplete: Double
  )

  /** Attach a fresh tracker to the session's SparkContext. */
  def attach(spark: org.apache.spark.sql.SparkSession): ProgressTracker = {
    val t = new ProgressTracker
    spark.sparkContext.addSparkListener(t)
    t
  }
}
