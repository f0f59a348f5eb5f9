package graft

import org.apache.spark.sql.SparkSession

import graft.engine._
import graft.model._
import graft.transform._

/** The embedding facade — what `Chillastic(redis, port).run()` is to the
  * reference (`index.js:7-41`), minus the Redis/HTTP control plane that
  * Spark's driver/executor model replaces.
  *
  * Task lifecycle (SURVEY §3):
  *   - [[addTask]] = POST /tasks/:id — validate (referenced transforms
  *     must exist, `tasks.js:79-80`), plan subtasks, build the backlog
  *     minus already-completed work (resume, `subtasks.js:369-396`).
  *   - [[runTask]] = the worker loop — execute each backlog subtask,
  *     record completion/errors, continue past failures
  *     (`worker.js:106-111`).
  *   - [[status]] = GET /tasks/:id — `{total, completed, backlog,
  *     percentComplete}` (`tasks.controller.js:14-27`).
  *   - [[removeTask]] = DELETE /tasks/:id — drops the task and its
  *     namespaced transforms (`tasks.js:89-97`).
  */
final class Graft(val spark: SparkSession) {

  val catalog  = new Catalog
  val mutators = new TransformRegistry[ColumnMutator]
  val errors   = new ErrorLog

  private final case class TaskState(
      spec: TaskSpec,
      pipeline: Transfer.Pipeline,
      sizeCols: Map[String, String],
      var backlog: Seq[SubtaskSpec],
      var completed: Set[String]
  )

  private val tasks = new java.util.concurrent.ConcurrentHashMap[String, TaskState]()

  final case class TaskStatus(
      total: Long,
      completed: Long,
      backlog: Long,
      percentComplete: Double
  )

  /** Submit a task: existence pre-check of referenced mutators, subtask
    * planning, resume-aware backlog. Re-adding an existing task replans
    * and subtracts completed subtasks — the reference's resume.
    */
  def addTask(
      spec: TaskSpec,
      sizeCols: Map[String, String] = Map.empty,
      indexFilters: Seq[MetadataFilters.IndexPred] = Seq.empty,
      buckets: Int = 3
  ): Seq[SubtaskSpec] = {
    // semantic validation: every referenced mutator must be registered
    val pipelineMutators = spec.mutators.map(ref => mutators.require(ref.id))
    val pipeline = Transfer.Pipeline(columnMutators = pipelineMutators)

    val configs = spec.tables.map(t => IndexConfig(t))
    val potential = Planner.expand(spark, spec, sizeCols, configs, indexFilters, buckets)
    val prior = Option(tasks.get(spec.name)).map(_.completed).getOrElse(Set.empty[String])
    val backlog = Planner.buildBacklog(potential, prior)
    tasks.put(spec.name, TaskState(spec, pipeline, sizeCols, backlog, prior))
    backlog
  }

  /** Execute the backlog. Failures are recorded (P8) and do not abort the
    * remaining subtasks, matching the worker loop's error handling.
    */
  def runTask(name: String): Seq[Transfer.TableResult] = {
    val st = Option(tasks.get(name))
      .getOrElse(throw new NoSuchElementException(s"no such task: $name"))
    val results = st.backlog.flatMap { sub =>
      try {
        val r = st.sizeCols.get(sub.table) match {
          case Some(sizeCol) =>
            Transfer.transferSubtask(
              spark, s"${st.spec.sourceDir}/${sub.table}.parquet",
              s"${st.spec.destDir}/${sub.table}", sub, sizeCol, st.pipeline)
          case None =>
            Transfer.transferTable(
              spark, s"${st.spec.sourceDir}/${sub.table}.parquet",
              s"${st.spec.destDir}/${sub.table}", st.pipeline)
        }
        st.completed += sub.subtaskId
        Some(r)
      } catch {
        case e: Exception =>
          errors.record(name, sub.subtaskId, e.toString)
          None
      }
    }
    st.backlog = st.backlog.filterNot(s => st.completed.contains(s.subtaskId))
    results
  }

  /** The GET /tasks/:id payload shape. */
  def status(name: String): TaskStatus = {
    val st = Option(tasks.get(name))
      .getOrElse(throw new NoSuchElementException(s"no such task: $name"))
    val total = (st.completed.size + st.backlog.count(s => !st.completed.contains(s.subtaskId))).toLong
    val done = st.completed.size.toLong
    TaskStatus(
      total = total,
      completed = done,
      backlog = total - done,
      percentComplete = if (total == 0) 100.0 else 100.0 * done / total
    )
  }

  def listTasks: Seq[String] = {
    import scala.jdk.CollectionConverters._
    tasks.keySet().asScala.toSeq.sorted
  }

  /** DELETE /tasks/:id — removes the task and its namespaced transforms. */
  def removeTask(name: String): Unit = {
    tasks.remove(name)
    mutators.removeNamespace(name)
  }
}
