package graft

import graft.engine.AssetStore

/** Publish/load lifecycle of the durable corpus-asset store: commit
  * marker semantics, build-failure cleanup, and the pre-published
  * short-circuit (the crash/race contracts the PQ and n-gram assets
  * rely on).
  */
class AssetStoreSpec extends SparkSpec {

  private def withRoot(f: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_store_spec").toString
    spark.conf.set("spark.graft.index.dir", root)
    try f(root) finally spark.conf.unset("spark.graft.index.dir")
  }

  test("resolve publishes atomically: content lands with the commit marker") {
    withRoot { root =>
      var built = 0
      val dir = AssetStore.resolve(spark, "spec_a", staging => {
        built += 1
        java.nio.file.Files.writeString(java.nio.file.Paths.get(staging, "data.txt"), "payload")
      })
      assert(built == 1 && dir == s"$root/spec_a")
      assert(AssetStore.committed(spark, dir))
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(dir, "data.txt")) == "payload")
      // no staging residue
      assert(!new java.io.File(root).listFiles().exists(_.getName.startsWith(".build_")))
    }
  }

  test("a published asset short-circuits: the builder is never invoked again") {
    withRoot { _ =>
      AssetStore.resolve(spark, "spec_b", staging =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(staging, "d"), "x"))
      var calls = 0
      val dir2 = AssetStore.resolve(spark, "spec_b", _ => calls += 1)
      assert(calls == 0, "existing committed asset must be served, not rebuilt")
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(dir2, "d")) == "x")
    }
  }

  test("a failing build cleans its staging directory and publishes nothing") {
    withRoot { root =>
      intercept[RuntimeException] {
        AssetStore.resolve(spark, "spec_c", staging => {
          java.nio.file.Files.writeString(java.nio.file.Paths.get(staging, "half"), "torn")
          sys.error("builder died mid-write")
        })
      }
      assert(!AssetStore.committed(spark, s"$root/spec_c"))
      assert(!new java.io.File(s"$root/spec_c").exists(), "nothing may be published")
      assert(!new java.io.File(root).listFiles().exists(_.getName.startsWith(".build_")),
        "staging residue must be deleted on failure")
      // and the NEXT resolve builds cleanly
      var built = 0
      AssetStore.resolve(spark, "spec_c", staging => {
        built += 1
        java.nio.file.Files.writeString(java.nio.file.Paths.get(staging, "d"), "ok")
      })
      assert(built == 1)
    }
  }

  test("an UNCOMMITTED directory at the asset path is not served (marker is the contract)") {
    withRoot { root =>
      // simulate a torn publish from a crashed process: dir exists, no marker
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "spec_d"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(root, "spec_d", "half"), "torn")
      assert(!AssetStore.committed(spark, s"$root/spec_d"))
      // resolve must refuse to serve it; with the path occupied and
      // uncommitted it errors loudly rather than reading torn data
      intercept[RuntimeException] {
        AssetStore.resolve(spark, "spec_d", staging =>
          java.nio.file.Files.writeString(java.nio.file.Paths.get(staging, "d"), "new"))
      }
    }
  }

  test("an un-creatable warehouse falls back to a JVM temp root instead of failing") {
    // parent is a FILE, so the configured root can never be created
    val blocker = java.nio.file.Files.createTempFile("graft_block", "").toString
    spark.conf.set("spark.graft.index.dir", blocker + "/sub")
    try {
      val dir = AssetStore.resolve(spark, "spec_fb", staging =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(staging, "d"), "x"))
      assert(AssetStore.committed(spark, dir), "fallback root must still publish")
      assert(!dir.startsWith(blocker), "must not claim the un-creatable root")
    } finally spark.conf.unset("spark.graft.index.dir")
  }

  test("gcStale sweeps rebuilt-corpus assets, old formats and torn staging; keeps live addresses") {
    withRoot { root =>
      // a fake corpus whose fingerprint anchors the LIVE asset
      val corpus = java.nio.file.Files.createTempDirectory("graft_gc_corpus").toString
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(corpus, "t.parquet"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(corpus, "t.parquet", "f"), "v1")
      val fp = AssetStore.corpusFingerprint(spark, corpus, "t.parquet")
      def publish(id: String): Unit = AssetStore.resolve(spark, id, staging =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(staging, "d"), "x"))
      val v = AssetStore.FormatVersion
      publish(s"live_k3_v${v}_$fp")
      publish(s"stale_k3_v${v}_${"0" * 16}")   // fingerprint of a rebuilt corpus
      publish(s"oldfmt_k3_v${v - 1}_$fp")      // older layout version
      publish(s"newer_k3_v${v + 1}_$fp")       // rolling upgrade: NOT ours to sweep
      publish("unaddressed_misc")              // no address suffix: never touched
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, ".build_torn"))
      // torn publish at a LIVE address (non-atomic rename crash): dir
      // present, no marker — must be swept once aged, or the address wedges
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(root, s"tornlive_k3_v${v}_$fp"))
      // default grace: fresh uncommitted dirs may be a publish IN
      // FLIGHT — only the dead-fingerprint committed asset is swept
      val cautious = AssetStore.gcStale(spark, Seq(corpus -> "t.parquet")).sorted
      assert(cautious == Seq(s"stale_k3_v${v}_${"0" * 16}"),
        s"default grace must spare fresh staging/torn dirs and other versions: $cautious")
      // grace elapsed (graceMs=0): torn dirs sweep; older formats still
      // need the explicit opt-in
      val aged = AssetStore.gcStale(spark, Seq(corpus -> "t.parquet"), graceMs = 0L).sorted
      assert(aged == Seq(".build_torn", s"tornlive_k3_v${v}_$fp"),
        s"unexpected aged sweep set: $aged")
      val crossVersion = AssetStore.gcStale(spark, Seq(corpus -> "t.parquet"),
        graceMs = 0L, sweepOlderFormats = true)
      assert(crossVersion == Seq(s"oldfmt_k3_v${v - 1}_$fp"))
      assert(AssetStore.committed(spark, s"$root/live_k3_v${v}_$fp"), "live asset must survive")
      assert(new java.io.File(s"$root/newer_k3_v${v + 1}_$fp").exists,
        "newer-format assets may be in use by upgraded nodes")
      assert(new java.io.File(s"$root/unaddressed_misc").exists, "non-addressed dirs are not ours to delete")
      // corpus rebuild: the previously-live asset becomes sweepable
      java.nio.file.Files.writeString(java.nio.file.Paths.get(corpus, "t.parquet", "f2"), "v2")
      val deleted2 = AssetStore.gcStale(spark, Seq(corpus -> "t.parquet"))
      assert(deleted2 == Seq(s"live_k3_v${v}_$fp"))
    }
  }

  test("corpusFingerprint changes with content and is stable under re-listing") {
    withRoot { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft_fp_corpus").toString
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "t.parquet"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "t.parquet", "f1"), "aaa")
      val fp1 = AssetStore.corpusFingerprint(spark, dir, "t.parquet")
      val fp1b = AssetStore.corpusFingerprint(spark, dir, "t.parquet")
      assert(fp1 == fp1b, "same listing -> same address")
      assert(fp1.length == 16)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "t.parquet", "f2"), "bb")
      val fp2 = AssetStore.corpusFingerprint(spark, dir, "t.parquet")
      assert(fp1 != fp2, "a corpus rebuild must change the address")
      // absent table still fingerprints (distinctly), never throws
      val fpAbsent = AssetStore.corpusFingerprint(spark, dir, "missing.parquet")
      assert(fpAbsent != fp2)
    }
  }
}
