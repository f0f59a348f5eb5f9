package graft

import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

import graft.engine._
import graft.model._
import graft.sources.{DocConnector, ParquetConnector}
import graft.transform._

/** The embedding facade — what `Chillastic(redis, port).run()` is to the
  * reference (`index.js:7-41`), minus the Redis control plane that
  * Spark's driver/executor model replaces (the HTTP surface lives in
  * [[graft.api.HttpApi]]).
  *
  * Task lifecycle (SURVEY §3):
  *   - [[addTask]] = POST /tasks/:id — validate (referenced transforms
  *     must exist, `tasks.js:79-80`), plan subtasks, build the backlog
  *     minus already-completed work (resume, `subtasks.js:369-396`).
  *   - [[runTask]] = the worker loop — execute each backlog subtask,
  *     record completion/errors/progress, continue past failures
  *     (`worker.js:106-111`), stop between subtasks when the run flag
  *     drops (`manager.js:111-118`).
  *   - [[status]] = GET /tasks/:id — `{total, completed, backlog,
  *     percentComplete}` (`tasks.controller.js:14-27`).
  *   - [[progress]] = the per-subtask `{tick, transferred, total,
  *     worker, lastModified}` records (`app/models/progress.js:6-32`).
  *   - [[start]]/[[stop]] = POST /_start, /_stop — the global run flag;
  *     stop also cancels the in-flight Spark job group so a running
  *     subtask is interrupted, not just the backlog drained.
  *   - [[removeTask]] = DELETE /tasks/:id — drops the task and its
  *     namespaced transforms (`tasks.js:89-97`).
  *
  * `connectors` maps a task spec to its (source, sink) connector pair;
  * the default is the parquet layout rooted at the spec's directories,
  * and tests plug an in-memory mock (the worker-E2E seam).
  */
final class Graft(
    val spark: SparkSession,
    connectors: TaskSpec => (DocConnector, DocConnector) = Graft.parquetConnectors
) {

  val catalog  = new Catalog
  val mutators = new TransformRegistry[ColumnMutator]
  val filters  = new TransformRegistry[StoredFilter]
  val errors   = new ErrorLog

  private final case class TaskState(
      spec: TaskSpec,
      pipeline: Transfer.Pipeline,
      sizeCols: Map[String, String],
      source: DocConnector,
      sink: DocConnector,
      var backlog: Seq[SubtaskSpec],
      var completed: Set[String],
      progress: TrieMap[String, Progress],
      typeFilters: Seq[MetadataFilters.TypePred] = Seq.empty
  )

  private val tasks = new java.util.concurrent.ConcurrentHashMap[String, TaskState]()

  // the reference's global run flag (`manager.js:111-118`): workers only
  // pick up subtasks while set; dropping it stops BETWEEN subtasks, and
  // cancelJobGroup interrupts the one in flight
  private val runFlag = new AtomicBoolean(true)
  private val activeGroups = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  final case class TaskStatus(
      total: Long,
      completed: Long,
      backlog: Long,
      percentComplete: Double
  )

  def isRunning: Boolean = runFlag.get

  private def groupFor(name: String): String = s"graft-task-$name"

  /** Whether a drain of this task is in flight (its job group is live). */
  def isTaskRunning(name: String): Boolean = activeGroups.contains(groupFor(name))

  /** POST /_start — allow [[runTask]] to consume backlogs again. */
  def start(): Unit = runFlag.set(true)

  /** POST /_stop — stop consuming backlogs and cancel any in-flight
    * task's Spark job group (interrupt-on-cancel). Unfinished subtasks
    * stay in the backlog, so a later [[start]]+[[runTask]] resumes
    * exactly where the stop landed.
    */
  def stop(): Unit = {
    runFlag.set(false)
    activeGroups.forEach(g => spark.sparkContext.cancelJobGroup(g))
  }

  /** Submit a task: existence pre-check of referenced mutators AND
    * filters (`tasks.js:79-80` checks both stores), subtask planning,
    * resume-aware backlog. Re-adding an existing task replans and
    * subtracts completed subtasks — the reference's resume.
    *
    * Stored filters referenced by `spec.indexFilters` prune the table
    * list at PLAN time (index-kind ones; type-kind stored filters are
    * retained and applied by [[transferTaskMetadata]]), OR-combined with
    * any programmatic `indexFilters` passed directly — multiple filters
    * widen, never narrow (`subtasks.js:164`).
    */
  def addTask(
      spec: TaskSpec,
      sizeCols: Map[String, String] = Map.empty,
      indexFilters: Seq[MetadataFilters.IndexPred] = Seq.empty,
      buckets: Int = 3
  ): Seq[SubtaskSpec] = {
    // re-adding while a drain is in flight would orphan the running
    // TaskState: the drain keeps recording completions into the REPLACED
    // state, the live one re-queues work already done (hours of
    // duplicated transfer at scale). Refuse; stop the run first.
    if (isTaskRunning(spec.name))
      throw new IllegalStateException(
        s"task '${spec.name}' has a run in flight; stop it before re-adding")
    // semantic validation: every referenced transform must be registered
    val pipelineMutators = spec.mutators.map(ref => mutators.require(ref.id))
    val storedFilters = spec.indexFilters.map(ref => filters.require(ref.id))
    val pipeline = Transfer.Pipeline(columnMutators = pipelineMutators)
    val (source, sink) = connectors(spec)

    val allIndexPreds = indexFilters ++
      storedFilters.filter(_.kind == StoredFilter.Index).map(_.indexPred)
    val typePreds = storedFilters.filter(_.kind == StoredFilter.Type).map(_.typePred)
    val configs = spec.tables.map(t => IndexConfig(t))
    val potential = Planner.expand(
      spark, spec, sizeCols, configs, allIndexPreds, buckets, (s, t) => source.scan(s, t))
    val prior = Option(tasks.get(spec.name)).map(_.completed).getOrElse(Set.empty[String])
    val backlog = Planner.buildBacklog(potential, prior)
    val priorProgress = Option(tasks.get(spec.name)).map(_.progress)
      .getOrElse(TrieMap.empty[String, Progress])
    tasks.put(spec.name,
      TaskState(spec, pipeline, sizeCols, source, sink, backlog, prior, priorProgress,
        typePreds))
    backlog
  }

  /** Run a task's METADATA transfer (K3/K4): index configs and templates
    * flow source→dest through the task's index/template mutators, and the
    * task's TYPE-kind stored filters prune mapping types (F2 — the
    * reference applies them at type expansion, `subtasks.js:165`; our
    * data subtasks have no type axis, so the mapping-key prune here is
    * where a stored type filter acts — previously they were validated at
    * add and then silently ignored).
    */
  def transferTaskMetadata(
      name: String,
      source: Catalog,
      dest: Catalog,
      indexPattern: String = "*",
      templatePattern: String = "*",
      tolerateMissingTemplates: Boolean = false
  ): (Seq[IndexConfig], Seq[Template]) = {
    val st = Option(tasks.get(name))
      .getOrElse(throw new NoSuchElementException(s"no such task: $name"))
    Transfer.transferMetadata(
      source, dest, st.pipeline, indexPattern, templatePattern,
      tolerateMissingTemplates, st.typeFilters)
  }

  /** Execute the backlog. Failures are recorded (P8) and do not abort the
    * remaining subtasks, matching the worker loop's error handling; a
    * dropped run flag stops consumption and leaves the rest queued.
    * `onProgress`/`onComplete` are the worker callbacks
    * (`worker.spec.js:92-104`'s updateCallback/completedCallback).
    */
  def runTask(
      name: String,
      worker: String = "driver",
      onProgress: (String, SubtaskSpec, Progress) => Unit = (_, _, _) => (),
      onComplete: (String, SubtaskSpec) => Unit = (_, _) => ()
  ): Seq[Transfer.TableResult] = {
    val st = Option(tasks.get(name))
      .getOrElse(throw new NoSuchElementException(s"no such task: $name"))
    // a run submitted while the manager is stopped would skip every
    // subtask and report a convincing-but-false "done, 0 transferred";
    // reject it instead (409 over HTTP)
    if (!runFlag.get)
      throw new IllegalStateException("manager is stopped; POST /_start before running")
    val group = groupFor(name)
    // per-task single-drain claim at the facade level too (HttpApi has
    // its own; direct embedders get the same protection)
    if (!activeGroups.add(group))
      throw new IllegalStateException(s"task '$name' is already running")
    spark.sparkContext.setJobGroup(group, s"graft task $name", interruptOnCancel = true)
    try {
      val queue = st.synchronized(st.backlog)
      val results = queue.flatMap { sub =>
        if (!runFlag.get) None
        else
          try {
            val r = Transfer.transferSubtask(
              spark, st.source, st.sink, sub, st.sizeCols.get(sub.table), st.pipeline,
              worker = worker,
              onProgress = p => {
                st.progress.put(sub.subtaskId, p)
                onProgress(name, sub, p)
              })
            // resolve outputPath to a real location when the sink has one
            val resolved = st.sink.location(r.outputPath).fold(r)(loc => r.copy(outputPath = loc))
            // synchronized: completed/backlog are read from HTTP threads
            // (status) while the drain thread writes them, and += on an
            // immutable Set var is a lost-update race unguarded
            st.synchronized { st.completed += sub.subtaskId }
            onComplete(name, sub)
            Some(resolved)
          } catch {
            case e: Exception =>
              errors.record(name, sub.subtaskId, e.toString)
              None
          }
      }
      st.synchronized {
        st.backlog = st.backlog.filterNot(s => st.completed.contains(s.subtaskId))
      }
      results
    } finally {
      activeGroups.remove(group)
      spark.sparkContext.clearJobGroup()
    }
  }

  /** The GET /tasks/:id payload shape. */
  def status(name: String): TaskStatus = {
    val st = Option(tasks.get(name))
      .getOrElse(throw new NoSuchElementException(s"no such task: $name"))
    val (completedSnap, backlogSnap) = st.synchronized((st.completed, st.backlog))
    val total = (completedSnap.size + backlogSnap.count(s => !completedSnap.contains(s.subtaskId))).toLong
    val done = completedSnap.size.toLong
    TaskStatus(
      total = total,
      completed = done,
      backlog = total - done,
      percentComplete = if (total == 0) 100.0 else 100.0 * done / total
    )
  }

  /** Per-subtask progress records, keyed by subtask id. */
  def progress(name: String): Map[String, Progress] = {
    val st = Option(tasks.get(name))
      .getOrElse(throw new NoSuchElementException(s"no such task: $name"))
    st.progress.toMap
  }

  def listTasks: Seq[String] = {
    import scala.jdk.CollectionConverters._
    tasks.keySet().asScala.toSeq.sorted
  }

  /** POST /maintenance/assets_gc — sweep the content-addressed asset
    * warehouse ([[graft.engine.AssetStore.gcStale]]) of assets whose
    * corpus was rebuilt, torn staging dirs past the grace window, and
    * (opt-in) older-format assets. `corpora` anchors the LIVE
    * fingerprints: every (dir, table) pair a deployment still queries
    * must be listed, or its current assets are treated as orphaned.
    * `dryRun` previews the delete set without touching disk — the safe
    * default for an operator poking a 100 TB warehouse; the HTTP route
    * makes the sweep reachable without a Scala REPL.
    */
  def gcAssets(
      corpora: Seq[(String, String)],
      graceMs: Long = 60L * 60 * 1000,
      sweepOlderFormats: Boolean = false,
      dryRun: Boolean = true
  ): Seq[String] = {
    val removed =
      graft.engine.AssetStore.gcStale(spark, corpora, graceMs, sweepOlderFormats, dryRun)
    // a real sweep may delete paths the in-JVM handle maps still point
    // at, and it marks a generation boundary anyway — drop every driver
    // handle cache (r18); the next consumer re-resolves from disk
    // (metadata-only) and the append-proof memo re-proves on demand
    if (!dryRun) Graft.dropDriverHandleCaches()
    removed
  }

  /** POST /maintenance/assets_increment — the append workflow's ONE
    * call, made ops-reachable (round 16): after a batch lands under
    * `dir` (a pure append of `oldDir`), publish the requested durable
    * asset families at `dir`'s content addresses by INCREMENT —
    * `knn_edges` (copy-forward partition publish, co-publishes the
    * band asset), `bands` (standalone copy-forward), `gram_stats`
    * (exact vocabulary-sized merge). Each family carries its own
    * pure-append precondition and falls back to the full rebuild on a
    * removed/edited row, so the call is safe to run unconditionally
    * after every append. Returns rows per published family — the
    * smoke number an orchestration step logs.
    */
  def incrementAssets(oldDir: String, dir: String,
      families: Seq[String] = Graft.DefaultIncrementFamilies): Map[String, Long] =
    families.flatMap {
      case "knn_edges" =>
        Seq("knn_edges" -> graft.operators.Similarity.corpusKnnEdgesIncrement(spark, oldDir, dir).count())
      case "bands" =>
        Seq("bands" -> graft.operators.Similarity.corpusBandedEmbeddingsIncrement(spark, oldDir, dir).count())
      case "gram_stats" =>
        Seq("gram_stats" -> graft.operators.Dedup.corpusGramDfIncrement(spark, oldDir, dir).count())
      case "minhash_sigs" =>
        Seq("minhash_sigs" -> graft.operators.Dedup.corpusMinhashSignaturesIncrement(spark, oldDir, dir).count())
      case "simhash_sigs" =>
        Seq("simhash_sigs" -> graft.operators.Dedup.corpusSimhashSignaturesIncrement(spark, oldDir, dir).count())
      case "cdc_digests" =>
        Seq("cdc_digests" -> graft.operators.Dedup.corpusChunkDigestsIncrement(spark, oldDir, dir).count())
      case "minhash_pairs" =>
        Seq("minhash_pairs" -> graft.operators.Dedup.corpusMinhashPairsIncrement(spark, oldDir, dir).count())
      case "tristats" =>
        Seq("tristats" -> graft.operators.Similarity.corpusTriangleStatsIncrement(spark, oldDir, dir).count())
      case "ngram_index" =>
        // a pinned chain also reports its order-staleness rows (r19,
        // 4 rows as of r20) — runbook triggers: collision_bp or
        // new_collision_bp > ~30000 (both calibrated), overlap < ~7000
        // secondary, new-gram share = context
        // oldDir keeps the probe vocabulary-sized: an uncommitted
        // gram-stats asset is published by the increment merge here,
        // never by an implicit full corpus shingle (r20 advice fix)
        val n = graft.operators.Dedup.corpusNgramIndexIncrement(spark, oldDir, dir).count()
        Seq("ngram_index" -> n) ++
          graft.operators.Dedup.ngramOrderStaleness(spark, dir, oldDir = Some(oldDir))
            .toSeq.flatMap(_.toSeq)
      case other =>
        throw new IllegalArgumentException(
          s"unknown asset family '$other' (expected knn_edges | bands | gram_stats | " +
            "minhash_sigs | simhash_sigs | cdc_digests | minhash_pairs | tristats | ngram_index)")
    }.toMap

  /** DELETE /tasks/:id — removes the task and its namespaced transforms
    * (both stores, `tasks.js:89-97`).
    */
  def removeTask(name: String): Unit = {
    // deleting a task with a drain in flight leaves that drain writing
    // into orphaned state — and a re-add + re-run would start a SECOND
    // concurrent drain over the same output paths. Refuse (409 over
    // HTTP); stop the run first.
    if (isTaskRunning(name))
      throw new IllegalStateException(
        s"task '$name' has a run in flight; stop it before deleting")
    tasks.remove(name)
    mutators.removeNamespace(name)
    filters.removeNamespace(name)
  }
}

object Graft {
  /** The asset families an unconditional append publish covers (r17,
    * extended r18): the graph pair (edges + co-published bands), the
    * gram stats, the three per-document signature/digest assets, and
    * the two SECOND-TIER derivations — the verified minhash pair graph
    * and the triangle stats — so every standing consumer serves with
    * zero builds after one `assets_increment` call. `bands` alone stays
    * opt-in (the edge increment co-publishes it). Order matters only
    * for economy: `minhash_pairs` rides the signature asset published
    * by `minhash_sigs`, `tristats` rides the edge asset published by
    * `knn_edges` — each would publish its upstream itself if asked
    * first.
    */
  val DefaultIncrementFamilies: Seq[String] =
    Seq("knn_edges", "gram_stats", "minhash_sigs", "simhash_sigs", "cdc_digests",
      "minhash_pairs", "tristats", "ngram_index")

  /** Forget every driver-side handle cache (asset-path maps, PQ model
    * cache, append-proof memo). Called by a real (non-dry-run) asset
    * gc — the one generation boundary a long-lived service driver
    * crosses — so superseded fingerprints never accumulate; everything
    * re-resolves from the durable store on next touch (metadata-only).
    */
  def dropDriverHandleCaches(): Unit = {
    graft.operators.Similarity.dropInMemoryIndexes()
    graft.operators.Dedup.dropInMemoryNgramTables()
    graft.operators.Dedup.dropInMemoryShardBlooms()
    graft.operators.TextAnalysis.dropInMemoryBpeTables()
    graft.engine.AssetStore.dropAppendProofMemo()
  }

  /** Default connector pair: scheme-dispatched from the task's
    * source/dest roots — `http(s)://` roots get the over-the-wire
    * scroll/bulk connector ([[graft.sources.HttpScrollConnector]]),
    * anything else the parquet layout. A task can mix them (scroll a
    * live store into parquet, or reindex parquet into a live store —
    * the reference's whole use case).
    */
  def parquetConnectors(spec: TaskSpec): (DocConnector, DocConnector) =
    (forRoot(spec.sourceDir), forRoot(spec.destDir))

  private def forRoot(root: String): DocConnector =
    if (root.startsWith("http://") || root.startsWith("https://"))
      new graft.sources.HttpScrollConnector(root)
    else new ParquetConnector(root)
}
