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
    */
  def handoff(out: DataFrame, stages: DataFrame*): DataFrame = {
    val cached = out.persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    stages.foreach(_.unpersist(blocking = false))
    cached
  }
}
