package graft.engine

import org.apache.spark.sql.{DataFrame, Row}

/** EXECUTABLE DRIVER-COLLECT BUDGETS (round 16) — every `.collect()`
  * in the operator library pulls driver-side state whose boundedness
  * was, until this round, a per-site comment contract (centroid
  * models, top-K literals, shard manifests). This helper makes each
  * contract EXECUTABLE: the site names its bound at the call, the
  * observed row count is recorded, and exceeding the bound throws —
  * so a plan drift that turns a "nlist-row model collect" into a
  * corpus-proportional pull fails the sweeping plan audit (which
  * executes every registered query) and fails identically in
  * production instead of silently OOMing the driver at 100 TB.
  *
  * What is NOT instrumented, deliberately:
  *   - `.head()` on an aggregate — intrinsically one row;
  *   - result dumps owned by the harness (Verify writes parquet,
  *     Bench counts) — a query's RESULT size is its documented
  *     contract, not driver state;
  *   - diagnostics under `tools/` (PlanProbe, AssetBench) — operator
  *     cost there is the point of the tool.
  *
  * Bounds are stated in ROWS because row counts survive scale-factor
  * changes: a corpus-proportional collect blows through a 16-row
  * centroid bound at sf0.001 just as it would at 100 TB, so the audit
  * catches the drift on the cheap fixture.
  */
object DriverBudget {

  final case class Observation(rows: Long, bound: Long)

  /** Max observed rows per site this JVM — the audit's coverage view. */
  private[graft] val observed =
    new java.util.concurrent.ConcurrentHashMap[String, Observation]()

  /** Collect `df` under `site`'s declared row bound. */
  def collect(site: String, bound: Long)(df: DataFrame): Array[Row] = {
    val rows = df.collect()
    record(site, rows.length.toLong, bound)
    rows
  }

  private def record(site: String, n: Long, bound: Long): Unit = {
    observed.merge(site, Observation(n, bound),
      (a, b) => if (b.rows > a.rows) b else a)
    if (n > bound)
      throw new IllegalStateException(
        s"driver-collect budget exceeded at $site: $n rows > bound $bound " +
          "(a corpus-proportional pull reached the driver; the operator's " +
          "plan no longer matches its documented scale contract)")
  }
}
