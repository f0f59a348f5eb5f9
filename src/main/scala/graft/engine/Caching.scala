package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache lifecycle for operators that persist a shared intermediate
  * stage (signature tables, inverted indexes, range-shuffled inputs)
  * feeding several consumers of one small-ish result.
  *
  * The leak shape: `stage.persist()` inside a query function, returned
  * plan references the stage, nothing ever unpersists — in a long-lived
  * session (or a 54-query bench run) the blocks accumulate until the
  * ContextCleaner happens to GC the plan. [[handoff]] closes the window
  * eagerly: materialize the RESULT into the cache, then drop the stage
  * blocks before returning, so the only thing that outlives the call is
  * the result itself (released by the caller's `unpersist()` /
  * `spark.catalog.clearCache()`, which Bench and Verify already issue
  * between queries).
  */
object Caching {

  /** Persist and fully materialize `out`, then release every `stage`.
    * After this returns, `out`'s cached blocks answer all further
    * actions and no stage block remains pinned.
    *
    * CONTRACT — use only when BOTH hold:
    *   - `out` is SMALL relative to its stages (candidate pairs, tags,
    *     aggregates). For a full-width result the persisted copy costs
    *     as much as the stage it replaces AND the materializing count()
    *     is a full extra pass — skip the handoff, keep the stage as the
    *     single cached copy, and let the caller release it after its
    *     action (see [[GlobalRank.withRowNumber]] for the pattern).
    *   - the caller (or its harness) eventually releases `out` via
    *     `unpersist()`/`spark.catalog.clearCache()` — Bench and Verify
    *     clear between queries; a long-lived embedding session owns the
    *     release itself.
    * MEMORY_AND_DISK means an oversized result spills rather than OOMs,
    * but spilled full-width results are exactly the shape the first rule
    * exists to prevent.
    */
  def handoff(out: DataFrame, stages: DataFrame*): DataFrame = {
    val cached = out.persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    stages.foreach(_.unpersist(blocking = false))
    cached
  }
}

/** Tiny LRU memo (round 18) for driver-side caches keyed by corpus
  * fingerprint / content address. Those keys change on every append or
  * rebuild, so an UNBOUNDED map grows one entry per corpus generation —
  * fine for a driver that restarts per job, a slow leak in a long-lived
  * service driver crossing thousands of appends. Access-order LRU with
  * a hard cap: eviction only costs a cheap re-compute (the memoized
  * work is metadata I/O or an asset-path resolve, never a data scan).
  *
  * `compute` deliberately runs OUTSIDE the lock: two racing misses may
  * both compute (the memoized operations are idempotent; the first
  * result wins), but a builder that re-enters the memo can never
  * deadlock — the failure mode CHM.computeIfAbsent hides until keys
  * share a bin (the r17 "Recursive update" trap).
  */
final class BoundedMemo[K, V](maxEntries: Int) {
  require(maxEntries >= 1, "maxEntries must be >= 1")
  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > maxEntries
  }

  def getOrElseUpdate(k: K)(compute: => V): V = {
    val cached = map.synchronized(map.get(k))
    if (cached != null) cached
    else {
      val v = compute
      map.synchronized {
        val prior = map.get(k)
        if (prior != null) prior else { map.put(k, v); v }
      }
    }
  }

  def contains(k: K): Boolean = map.synchronized(map.containsKey(k))
  def size: Int = map.synchronized(map.size())
  def clear(): Unit = map.synchronized(map.clear())
}
