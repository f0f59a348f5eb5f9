package graft.engine

import org.apache.spark.sql.SparkSession

/** Durable, content-addressed corpus-asset store — the shared publish/
  * load machinery behind every "build once per corpus, consume many"
  * artifact (PQ/IVF-PQ code tables, the PPJoin n-gram prefix index,
  * the shingle document-frequency table).
  *
  * An asset is a DIRECTORY under the index warehouse whose name
  * content-addresses (builder params, corpus fingerprint, layout
  * version). Publication is crash/race-safe: the builder writes into a
  * hidden staging directory, a commit marker lands last, and one atomic
  * rename makes the asset visible — a reader can never observe a
  * half-written asset, and a torn build leaves only an unreferenced
  * `.build_*` directory that never matches a content address.
  * Concurrent builders race benignly: publish is the rename guarded by
  * a target-existence check; the loser deletes its staging directory
  * and serves the winner's asset.
  *
  * The 100 TB shape: assets live NEXT TO the corpus they derive from
  * (warehouse-relative), survive every JVM, and are retired naturally —
  * a corpus rebuild changes the fingerprint, so old assets simply stop
  * being addressed (GC is `rm` on unreferenced directories).
  */
object AssetStore {

  /** Bump when any published asset layout changes: old assets are then
    * never addressed by newer code (no migration, no stale reads).
    * v1 = per-asset manifest as commit marker; v2 = store-level
    * `_GRAFT_COMMITTED` marker (uniform across asset kinds).
    */
  val FormatVersion = 2

  /** Spark ignores `_`/`.`-prefixed files in a table directory, so the
    * marker can sit inside an asset that IS a parquet table.
    */
  private val Marker = "_GRAFT_COMMITTED"

  // one fallback root per JVM for environments whose warehouse path is
  // not creatable (read-only cwd): durability degrades to JVM-lifetime
  // with a logged warning instead of failing every asset consumer
  private lazy val tmpFallbackRoot: String =
    java.nio.file.Files.createTempDirectory("graft_index_fallback").toString

  /** Root directory for durable assets. Resolution order: session conf
    * `spark.graft.index.dir` (the test/ops override), env
    * `GRAFT_INDEX_DIR`, else `<spark.sql.warehouse.dir>/graft_index`;
    * an un-creatable root falls back to a per-JVM temp directory
    * (loudly — assets are then caches, not durable).
    */
  def warehouse(spark: SparkSession): String = {
    val configured = spark.conf.getOption("spark.graft.index.dir")
      .orElse(sys.env.get("GRAFT_INDEX_DIR"))
      .getOrElse {
        val wh = spark.conf.get("spark.sql.warehouse.dir")
        val base =
          if (wh.startsWith("file:")) new java.net.URI(wh).getPath
          else wh
        base.stripSuffix("/") + "/graft_index"
      }
    try {
      if (fsFor(spark, configured).mkdirs(new org.apache.hadoop.fs.Path(configured)))
        configured
      else sys.error("mkdirs returned false")
    } catch {
      case e: Exception =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"asset warehouse $configured is not creatable (${e.getMessage}); " +
            s"falling back to JVM-lifetime $tmpFallbackRoot — assets will not survive this JVM")
        tmpFallbackRoot
    }
  }

  /** Content address of one corpus table: digest of its file listing
    * (name, length, mtime) — footer-level metadata, no data scan. A
    * corpus rebuild changes the listing, so a stale asset can never be
    * served for refreshed data; identical data re-listed gives the
    * identical address, so nothing rebuilds.
    */
  def corpusFingerprint(spark: SparkSession, dir: String, table: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir, table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    if (fs.exists(p)) {
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        entries += s"${f.getPath.getName}|${f.getLen}|${f.getModificationTime}"
      }
    } else entries += s"absent|$p"
    val md = java.security.MessageDigest.getInstance("MD5")
    entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  private def fsFor(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Is a published, fully-committed asset present at `path`? */
  def committed(spark: SparkSession, path: String): Boolean = {
    val fs = fsFor(spark, path)
    fs.exists(new org.apache.hadoop.fs.Path(path, Marker))
  }

  /** Garbage-collect the warehouse: delete (a) committed assets of the
    * CURRENT `FormatVersion` whose trailing content fingerprint matches
    * none of the given corpora's current fingerprints (their corpus was
    * rebuilt — the address can never be served again), (b) addressed
    * current-version directories without a commit marker and `.build_*`
    * staging directories, but ONLY when older than `graceMs` — younger
    * ones may be a LIVE publish in flight (on a copy-rename filesystem
    * an in-progress publish is indistinguishable from a torn one, and
    * sweeping an active builder's staging dir would let its later
    * marker write silently recreate the path and publish an empty
    * committed asset), and (c) assets of OLDER format versions only
    * when `sweepOlderFormats` is set — during a rolling upgrade BOTH
    * older and newer versions may be actively served by other nodes,
    * so cross-version cleanup is a deliberate operator action after
    * the fleet converges, never a side effect. Never touches a
    * committed live address, any newer-version asset, or a directory
    * without the store's address suffix. Returns deleted names.
    *
    * This is the maintenance half of the content-addressed contract:
    * publication never overwrites, so reclamation is an explicit sweep
    * a deployment runs after corpus rebuilds.
    */
  def gcStale(spark: SparkSession, corpora: Seq[(String, String)],
      graceMs: Long = 60L * 60 * 1000, sweepOlderFormats: Boolean = false,
      dryRun: Boolean = false): Seq[String] = {
    val root = warehouse(spark)
    val fs = fsFor(spark, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) return Seq.empty
    val live = corpora.map { case (dir, table) => corpusFingerprint(spark, dir, table) }.toSet
    val addressed = raw"_v(\d+)_([0-9a-f]{16})$$".r.unanchored
    val cutoff = System.currentTimeMillis() - graceMs
    fs.listStatus(rootPath).toSeq.flatMap { st =>
      val name = st.getPath.getName
      def agedOut = st.getModificationTime < cutoff
      val stale =
        if (!st.isDirectory) false
        else if (name.startsWith(".build_")) agedOut // crashed builder, not a live one
        else name match {
          case addressed(v, fp) if v.toInt == FormatVersion =>
            if (!committed(spark, st.getPath.toString)) agedOut // torn vs in-flight publish
            else !live.contains(fp)
          case addressed(v, _) => v.toInt < FormatVersion && sweepOlderFormats
          case _               => false // not ours; never touch
        }
      // dryRun reports the would-delete set without touching disk — the
      // operator preview behind the maintenance API's dry_run flag
      if (stale && (dryRun || fs.delete(st.getPath, true))) Some(name) else None
    }
  }

  /** Resolve `assetId` under the warehouse: serve the published asset
    * if present, else run `build` against a staging directory and
    * publish it. Returns the asset's directory; `onBuilt` tells the
    * caller whether THIS call produced it (false = loaded/lost race).
    */
  def resolve(spark: SparkSession, assetId: String,
      build: String => Unit, onBuilt: Boolean => Unit = _ => ()): String = {
    val root = warehouse(spark)
    val assetDir = s"$root/$assetId"
    if (committed(spark, assetDir)) { onBuilt(false); return assetDir }
    val fs = fsFor(spark, root)
    val staging = s"$root/.build_${java.util.UUID.randomUUID().toString.take(12)}"
    val sPath = new org.apache.hadoop.fs.Path(staging)
    val aPath = new org.apache.hadoop.fs.Path(assetDir)
    fs.mkdirs(sPath)
    try {
      build(staging)
      val out = fs.create(new org.apache.hadoop.fs.Path(staging, Marker), true)
      try out.write(Array.emptyByteArray) finally out.close()
      if (!fs.exists(aPath) && fs.rename(sPath, aPath)) { onBuilt(true); assetDir }
      else if (committed(spark, assetDir)) { // lost the race: serve the winner
        fs.delete(sPath, true); onBuilt(false); assetDir
      } else sys.error(s"could not publish asset at $assetDir")
    } catch {
      case t: Throwable => fs.delete(sPath, true); throw t
    }
  }
}
