package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** Connected components: checked against a driver-side union-find on
  * random graphs, plus shape cases a star-contraction bug would break
  * (chains, self-loops, reversed duplicates, singleton-free input).
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Reference union-find, small-n driver-side ground truth. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-label normalization: root of the path-compressed forest is the
    // component min because unions always attach the larger root
    parent.keys.map(k => k -> find(k)).toMap
  }

  // localThreshold = 0 forces the DISTRIBUTED star iteration: these
  // specs exist to pin the large/small-star semantics; the small-graph
  // fast path is pinned against it separately below
  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clustering
      .connectedComponents(edges.toDF("id_a", "id_b"), localThreshold = 0L)
      .as[(Long, Long)].collect().toMap

  test("a transitive chain collapses to one min-rooted cluster") {
    // a~b, b~c, c~d: pairwise keep-min would leave two "representatives"
    val got = components(Seq((10L, 7L), (10L, 12L), (12L, 99L)))
    assert(got == Map(7L -> 7L, 10L -> 7L, 12L -> 7L, 99L -> 7L))
  }

  test("self-loops and reversed duplicate edges are tolerated") {
    // a node appearing ONLY in self-loops must still be labeled (its own
    // singleton cluster), not silently dropped from the output
    val got = components(Seq((5L, 5L), (3L, 9L), (9L, 3L), (3L, 9L)))
    assert(got == Map(3L -> 3L, 9L -> 3L, 5L -> 5L))
  }

  test("disjoint components stay disjoint") {
    val got = components(Seq((1L, 2L), (3L, 4L), (5L, 6L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L, 6L -> 5L))
  }

  test("random graphs match a driver-side union-find") {
    val rng = new Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 20
      val edges = Seq.fill(n) {
        (rng.nextInt(40).toLong, rng.nextInt(40).toLong)
      }.filter { case (a, b) => a != b }
      val expect = unionFind(edges)
      val got = components(edges)
      assert(got == expect, s"trial $trial: $got vs $expect")
    }
  }

  test("long path converges within the round cap (log-round contraction)") {
    // a 200-node path has diameter 199: label propagation would need 199
    // rounds; star contraction must finish well inside maxRounds=30
    val edges = (0L until 199L).map(i => (i, i + 1))
    val got = components(edges)
    assert(got.size == 200 && got.values.forall(_ == 0L))
  }

  test("2000-node path: rounds stay O(log^2 n), far under the diameter") {
    import spark.implicits._
    // diameter 1999 — an adversarial input for any propagation scheme;
    // alternating large/small-star must close it in ~log^2 rounds
    val edges = (0L until 1999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val res = Clustering.connectedComponentsWithStats(edges, localThreshold = 0L)
    assert(res.converged, "chain must reach the star fixpoint")
    assert(res.rounds <= 15, s"expected O(log^2 n) rounds, took ${res.rounds}")
    val labels = res.labels.as[(Long, Long)].collect()
    assert(labels.length == 2000 && labels.forall(_._2 == 0L))
    res.labels.unpersist()
  }

  test("blown round budget returns best-effort labels and converged=false, no abort") {
    import spark.implicits._
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val res = Clustering.connectedComponentsWithStats(edges, maxRounds = 1, localThreshold = 0L)
    assert(!res.converged && res.rounds == 1)
    // every node still gets a label (possibly split components), and
    // labels never invent nodes
    val labels = res.labels.as[(Long, Long)].collect()
    assert(labels.map(_._1).sorted.toSeq == (0L until 200L))
    assert(labels.forall { case (doc, root) => root <= doc })
    res.labels.unpersist()
  }

  test("fast/distributed boundary property: adversarial graphs near the threshold agree on labels") {
    // The switch is decided on the DISTINCT CANONICAL edge count (the
    // fingerprint aggregate), so the adversarial inputs are raw edge
    // lists whose canonical size straddles a tiny threshold while the
    // raw list is padded with exactly the shapes that could diverge:
    // duplicate pairs, reversed pairs, self-loops (dropped from the
    // canonical set but label-relevant), and self-loop-ONLY nodes.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val T = 8L // threshold under test; canonical sizes generated in [T-3, T+3]
    val edgeGen = for {
      nCanon <- Gen.choose((T - 3).toInt, (T + 3).toInt)
      // build nCanon distinct canonical pairs over a small id space
      ids = (0L to 11L).flatMap(a => ((a + 1) to 12L).map(b => (a, b)))
      canon <- Gen.pick(nCanon, ids)
      dups <- Gen.someOf(canon)             // duplicate pairs
      revs <- Gen.someOf(canon)             // reversed pairs
      loopNodes <- Gen.someOf(20L to 24L)   // self-loop-only nodes
      loopOnCanon <- Gen.someOf(canon.map(_._1)) // self-loops on connected nodes
    } yield (canon.toSeq ++ dups ++ revs.map(_.swap) ++
      loopNodes.map(n => (n, n)) ++ loopOnCanon.map(n => (n, n)), nCanon)
    val p = Prop.forAll(edgeGen) { case (edges, nCanon) =>
      val df = edges.toDF("id_a", "id_b")
      val viaFast = Clustering.connectedComponentsWithStats(df, localThreshold = T)
      val viaStar = Clustering.connectedComponentsWithStats(df, localThreshold = 0L)
      val a = viaFast.labels.as[(Long, Long)].collect().toMap
      val b = viaStar.labels.as[(Long, Long)].collect().toMap
      // independent ground truth: union-find over non-loop edges plus
      // self-labels for loop-only nodes
      val uf = unionFind(edges.filter(e => e._1 != e._2))
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expect = nodes.map(n => n -> uf.getOrElse(n, n)).toMap
      viaFast.labels.unpersist(); viaStar.labels.unpersist()
      // the path taken must actually switch AT the boundary (<= engages)
      val pathOk = if (nCanon <= T) viaFast.rounds == 0 else viaFast.rounds > 0
      pathOk && a == b && a == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.status.toString)
  }

  test("small-graph fast path: engages under the threshold, labels equal the star iteration") {
    import spark.implicits._
    val rng = new Random(7)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(60 + trial * 30) {
        (rng.nextInt(50).toLong, rng.nextInt(50).toLong)
      } :+ ((77L, 77L)) // a self-loop-only singleton rides along
      val df = edges.toDF("id_a", "id_b")
      val local = Clustering.connectedComponentsWithStats(df)
      assert(local.converged && local.rounds == 0,
        "under the default threshold the driver-side solve must engage (rounds == 0)")
      val dist = Clustering.connectedComponentsWithStats(df, localThreshold = 0L)
      assert(dist.rounds > 0, "forcing threshold 0 must run star rounds")
      val a = local.labels.as[(Long, Long)].collect().toMap
      val b = dist.labels.as[(Long, Long)].collect().toMap
      assert(a == b, s"trial $trial: local $a vs distributed $b")
      local.labels.unpersist(); dist.labels.unpersist()
    }
  }
}
