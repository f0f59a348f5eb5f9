package graft.engine

import org.apache.spark.sql.SparkSession

import graft.model._
import graft.transform.MetadataFilters

/** P1/P5 task planning (`subtasks.js:369-396`): expand a task into the
  * cross product (filtered tables) x (size buckets), subtract the
  * completed set by content-addressed subtask id, and return only the
  * unfinished backlog — the reference's resume semantics.
  *
  * In Spark the "queue" is the scheduler; this planner exists for
  * resumable multi-table batch runs where each subtask becomes one
  * filtered batch job (and for parity with the reference's observable
  * planning behavior).
  */
object Planner {

  /** Generate all potential subtasks for a task: per surviving table,
    * equi-depth size buckets from [[Bounds.plan]] over `sizeCol`.
    */
  def expand(
      spark: SparkSession,
      task: TaskSpec,
      sizeCols: Map[String, String],
      indexConfigs: Seq[IndexConfig],
      indexFilters: Seq[MetadataFilters.IndexPred] = Seq.empty,
      buckets: Int = 3,
      scan: (SparkSession, String) => org.apache.spark.sql.DataFrame = null
  ): Seq[SubtaskSpec] = {
    // default scan: the parquet layout rooted at the task's sourceDir
    val doScan = Option(scan).getOrElse(
      (s: SparkSession, t: String) => s.read.parquet(s"${task.sourceDir}/$t.parquet"))
    // no catalog metadata at all = nothing to filter AGAINST, keep every
    // task table — the same empty-catalog-keeps-everything invariant
    // Transfer.runTask guards; an empty `kept` here would silently plan
    // zero subtasks and report a vacuous "done"
    val kept =
      if (indexConfigs.isEmpty) task.tables.toSet
      else MetadataFilters.applyIndexFilters(indexConfigs, indexFilters).map(_.name).toSet
    task.tables.filter(kept).flatMap { t =>
      val df = doScan(spark, t)
      sizeCols.get(t) match {
        case Some(sizeCol) => Bounds.plan(df, t, sizeCol, buckets)
        case None          => // unbucketed table: one subtask covering everything —
          // same sentinels as Bounds.plan's first/last buckets, so the
          // null/NaN/open-above handling in transferSubtask applies
          Seq(SubtaskSpec(t, Double.NegativeInfinity, Double.MaxValue, Bounds.MaxFlushSize, df.count()))
      }
    }
  }

  /** `buildBacklog` (`subtasks.js:369-396`): potential minus completed,
    * diffed on the content-addressed id (`subtask.js:20-25` — count is
    * excluded from identity, so a re-count never duplicates work).
    */
  def buildBacklog(
      potential: Seq[SubtaskSpec],
      completed: Set[String]
  ): Seq[SubtaskSpec] =
    potential.filterNot(s => completed.contains(s.subtaskId))
}
