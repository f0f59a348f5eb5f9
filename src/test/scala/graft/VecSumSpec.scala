package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{VecSumBuffer, vecagg}
import graft.operators.Similarity

/** The elementwise vector-sum aggregate and the centroid operator built
  * on it: algebra, null/ragged handling, partial-merge correctness
  * across partitions, the SQL surface, and the centroid's exactness
  * contract (quantized-integer arithmetic == order-independent).
  */
class VecSumSpec extends SparkSpec {
  import spark.implicits._

  test("vecSumLong sums elementwise with map-side partials across partitions") {
    val df = (1 to 100)
      .map(i => (i % 4, Array(i.toLong, 2L * i, -i.toLong)))
      .toDF("k", "v")
      .repartition(8) // force partial buffers + exchange merge
    val out = df.groupBy("k").agg(vecagg.vecSumLong(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val expect = (1 to 100).groupBy(_ % 4).map { case (k, is) =>
      k -> Seq(is.map(_.toLong).sum, is.map(2L * _).sum, -is.map(_.toLong).sum)
    }
    assert(out == expect)
  }

  test("vecSumLong skips null arrays, zero-fills element nulls and ragged tails") {
    val df = Seq(
      (1, Some(Seq(Some(1L), None, Some(3L)))),
      (1, None),
      (1, Some(Seq(Some(10L)))),
      (2, Some(Seq.empty[Option[Long]]))
    ).toDF("k", "v")
    val out = df.groupBy("k").agg(vecagg.vecSumLong(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(out(1) == Seq(11L, 0L, 3L)) // ragged: dim = longest seen
    assert(out(2) == Seq.empty[Long])  // only-empty group -> empty vector
  }

  test("property: VecSumBuffer merge is order-independent and matches the flat sum") {
    val genVecs = Gen.listOfN(
      12,
      Gen.listOf(Gen.chooseNum(-1000000L, 1000000L)).map(_.take(8)))
    val p = Prop.forAll(genVecs, Gen.long) { (vecs, seed) =>
      def sumInto(buf: VecSumBuffer, v: Seq[Long]): Unit = {
        buf.ensure(v.length)
        v.zipWithIndex.foreach { case (x, i) => buf.sums(i) += x }
      }
      // sequential single-buffer update
      val seq = new VecSumBuffer
      vecs.foreach(v => sumInto(seq, v))
      // random partitioning into partial buffers, merged in shuffled order
      val rnd = new scala.util.Random(seed)
      val parts = vecs.groupBy(_ => rnd.nextInt(4)).values.toSeq
      val partials = parts.map { vs =>
        val b = new VecSumBuffer; vs.foreach(v => sumInto(b, v)); b
      }
      val merged = new VecSumBuffer
      rnd.shuffle(partials).foreach { b =>
        merged.ensure(b.dim)
        (0 until b.dim).foreach(i => merged.sums(i) += b.sums(i))
      }
      val d = math.max(seq.dim, merged.dim)
      (0 until d).forall { i =>
        val a = if (i < seq.dim) seq.sums(i) else 0L
        val b = if (i < merged.dim) merged.sums(i) else 0L
        a == b
      } && seq.dim == merged.dim
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("graft_vec_sum is callable from SQL") {
    Seq((1, Seq(1L, 2L)), (1, Seq(3L, 4L))).toDF("k", "v")
      .createOrReplaceTempView("vs_in")
    val out = spark.sql("SELECT graft_vec_sum(v) AS s FROM vs_in GROUP BY k")
      .collect().map(_.getSeq[Long](0))
    assert(out.toSeq == Seq(Seq(4L, 6L)))
  }

  test("integer kernels accept array<int> natively and reject fractional arrays at analysis") {
    // int elements read natively (no cast pass over the array)
    val ints = spark.sql(
      "SELECT graft_vec_sum(v) AS s FROM VALUES (array(1, 2)), (array(3, 4)) t(v)")
      .collect().map(_.getSeq[Long](0))
    assert(ints.toSeq == Seq(Seq(4L, 6L)))
    // a fractional array into an integer kernel is a silent-truncation
    // trap — must fail the query at analysis, like the float kernels do
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_vec_sqdist(array(1.5d, 2.0d), array(1.0d, 1.0d))").collect()
    }
    assert(e1.getMessage.contains("array<integral>"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_vec_sum(v) FROM VALUES (array(1.5d)) t(v)").collect()
    }
    assert(e2.getMessage.contains("array<integral>"))
  }

  test("centroids matches the posexplode formulation exactly") {
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.centroids(emb)
      .orderBy("label", "dim")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    // naive d-times-inflation twin: posexplode + groupBy(label, pos)
    val naive = emb.filter(col("embedding").isNotNull)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "e")))
      .groupBy("label", "dim")
      .agg(
        sum(expr("COALESCE(CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT), 0)")).as("qs"),
        count(lit(1)).as("n_vecs"))
      .select(
        col("label"), col("dim").cast("long").as("dim"), col("n_vecs"),
        (col("qs").cast("double") / (lit(1000L) * col("n_vecs")).cast("double"))
          .as("centroid"))
      .orderBy("label", "dim")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    assert(got.length == naive.length && got.nonEmpty)
    // exact bit equality, not tolerance: the quantized-integer contract
    assert(got.sameElements(naive))
  }

  test("nearestCentroid assigns every vector once and beats the window twin") {
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.nearestCentroid(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(got.map(_._3).sum == emb.filter(col("embedding").isNotNull).count())

    // window-based twin over the same quantized-integer distances
    import org.apache.spark.sql.expressions.Window
    val q = transform(col("embedding"),
      e => coalesce(floor(e.cast("double") * 1000 + lit(0.5)).cast("long"), lit(0L)))
    val cents = emb.filter(col("embedding").isNotNull)
      .groupBy(col("label").as("c_label"))
      .agg(vecagg.vecSumLong(q).as("qsum"), count(lit(1)).as("n"))
      .select(col("c_label"),
        transform(col("qsum"), s => floor(s.cast("double") / col("n") + lit(0.5)).cast("long")).as("qc"))
    val w = Window.partitionBy("vec_id").orderBy(col("dist"), col("c_label"))
    val naive = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("label"), q.as("qe"))
      .crossJoin(broadcast(cents))
      .withColumn("dist",
        aggregate(zip_with(col("qe"), col("qc"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("label"), col("c_label").as("assigned"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "assigned")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(got.sameElements(naive))
    // the labels carry signal: own-label assignment dominates
    val own = got.filter(t => t._1 == t._2).map(_._3).sum
    assert(own * 3 > got.map(_._3).sum)
  }

  test("sqDistLong kernel equals the zip_with/aggregate fold and handles nulls") {
    import graft.functions.vec
    val df = Seq(
      (Seq(Some(1L), Some(2L), Some(3L)), Seq(4L, 6L, 3L)),   // 9 + 16 = 25
      (Seq(Some(-5L), None), Seq(0L, 7L)),                    // 25 + 49 = 74 (null -> 0)
      (Seq.empty[Option[Long]], Seq(9L))                      // empty prefix -> 0
    ).toDF("a", "b")
    val got = df.select(vec.sqDistLong(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(25L, 74L, 0L))
    // randomized fold-vs-kernel equivalence on the shapes the operators
    // feed it: equal-length, null-free (the quantizer coalesces nulls
    // away before either implementation runs; on null elements the fold
    // null-propagates where the kernel zero-fills, BY DESIGN — row 2
    // above pins the kernel side of that difference)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(64)((
      Seq.fill(16)(rnd.nextLong() % 1000L),
      Seq.fill(16)(rnd.nextLong() % 1000L)))
    val rdf = rows.toDF("a", "b")
    val kernel = rdf.select(vec.sqDistLong(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    val fold = rdf.select(
      aggregate(
        zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(kernel == fold)
    // SQL surface — int literals must widen to bigint implicitly
    val sql = spark.sql(
      "SELECT graft_vec_sqdist(array(1L, 2L), array(3L, 0L)) AS d UNION ALL " +
      "SELECT graft_vec_sqdist(array(1, 2), array(3, 0)) AS d")
      .collect().map(_.getLong(0)).toSeq
    assert(sql == Seq(8L, 8L))
  }

  test("kmeansStep moves mass toward assigned clusters and conserves vectors") {
    val emb = Tables.embeddings(spark, sf)
    val step = Similarity.kmeansStep(emb).collect()
    val n = emb.filter(col("embedding").isNotNull).count()
    val dims = step.map(_.getLong(1)).distinct.length
    // every (cluster, dim) row carries the full cluster population;
    // summed over one dim the populations partition the corpus
    assert(step.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum == n)
    assert(dims == 64)
    // the step's cluster sizes equal the confusion matrix's column sums
    val assignedSizes = Similarity.nearestCentroid(emb).collect()
      .groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val stepSizes = step.filter(_.getLong(1) == 0L)
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(stepSizes == assignedSizes)
  }

  test("q_transitions edge counts equal a driver-side recount") {
    val rows = operators.Relational.qTransitions(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    val ev = Tables.events(spark, sf)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    // sum of all edges = events - one sequence-end per user
    assert(total == nEvents - nUsers)
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("q_anomaly outlier counts are sane and deterministic across runs") {
    val a = operators.Relational.qAnomaly(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = operators.Relational.qAnomaly(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.sameElements(b))
    assert(a.map(_._2).sum == Tables.events(spark, sf).count())
    // outliers are a small minority per type
    a.foreach { case (_, n, out) => assert(out >= 0 && out < n / 10) }
  }

  test("q_gapfill: full spine, empty buckets explicit, forward fill carries the last observed sum") {
    val out = operators.Relational.qGapfill(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byType = out.groupBy(_._1)
    // every type covers the IDENTICAL full hour range (the spine)
    val spans = byType.values.map(rs => (rs.map(_._2).min, rs.map(_._2).max, rs.length)).toSet
    assert(spans.size == 1, s"all types must share one spine: $spans")
    val (lo, hi, n) = spans.head
    assert(n == hi - lo + 1, "spine must be dense — one row per hour")
    // gaps exist and are explicit; fill carries the last non-empty q_sum
    assert(out.exists(_._3 == 0), "expected at least one empty bucket at sf0.001")
    byType.values.foreach { rs =>
      var lastSeen = 0L
      rs.sortBy(_._2).foreach { case (_, _, nEv, qSum, qFilled) =>
        if (nEv > 0) lastSeen = qSum
        assert(qFilled == lastSeen, s"fill must carry $lastSeen, got $qFilled")
        if (nEv == 0) assert(qSum == 0L)
      }
    }
  }

  test("q_changepoint: shifts recompute from the gapfilled series; edge hours excluded") {
    val series = operators.Relational.qGapfill(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))) // (type, hb, q_sum)
      .groupBy(_._1).map { case (t, rs) => t -> rs.sortBy(_._2).map(r => (r._2, r._3)) }
    val out = operators.Relational.qChangepoint(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.foreach { case (t, hb, before, after, shift, _) =>
      val s = series(t)
      val idx = s.indexWhere(_._1 == hb)
      assert(idx >= 24 && idx + 24 <= s.length, s"hour $hb lacks a full window side")
      val b = s.slice(idx - 24, idx).map(_._2).sum
      val a = s.slice(idx, idx + 24).map(_._2).sum
      assert((b, a, a - b) == ((before, after, shift)), s"window sums diverge at ($t, $hb)")
    }
    // ranks are per-type, 1..10, magnitude-sorted
    out.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._6)
      assert(sorted.map(_._6).toSeq == (1L to sorted.length).toSeq)
      val mags = sorted.map(r => math.abs(r._5))
      assert(mags.toSeq == mags.sortBy(-_).toSeq, "rank must be |shift| descending")
    }
  }

  test("property: vec.nearestCode == the struct-array_min spelling (incl. ties, ragged, null elements)") {
    // the codebook includes DUPLICATE centroids under different labels so
    // the smallest-label tiebreak is actually exercised, plus a short
    // centroid (common-prefix distance) — the semantics VecNearestCode
    // must reproduce bit-for-bit from the old unrolled spelling
    val genCent = Gen.listOfN(4, Gen.chooseNum(-50L, 50L))
    val genBook = Gen.listOfN(6, genCent).map { cs =>
      val withDup = cs ++ List(cs.head, cs(1).take(2))
      withDup.zipWithIndex.map { case (qc, i) => (i, qc: Seq[Long]) }.toIndexedSeq
    }
    val genVecs = Gen.listOfN(40,
      Gen.listOfN(4, Gen.option(Gen.chooseNum(-50L, 50L))))
    val p = Prop.forAll(genBook, genVecs) { (book, vecs) =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "__sv0")
      val kernel = df.select(col("id"),
          graft.functions.vec.nearestCode(col("__sv0"), book).as("best"))
        .collect().map(r => r.getInt(0) ->
          (r.getStruct(1).getLong(0), r.getStruct(1).getInt(1))).toMap
      val unrolled = df.select(col("id"), array_min(array(book.map { case (c, qc) =>
          struct(
            graft.functions.vec.sqDistLong(col("__sv0"), typedLit(qc)).as("dist"),
            lit(c).as("c_label"))
        }: _*)).as("best"))
        .collect().map(r => r.getInt(0) ->
          (r.getStruct(1).getLong(0), r.getStruct(1).getInt(1))).toMap
      // and a driver-side reference: null elements as 0, common prefix,
      // smallest (dist, label)
      val ref = vecs.zipWithIndex.map { case (v, i) =>
        val x = v.map(_.getOrElse(0L))
        i -> book.map { case (c, qc) =>
          val n = math.min(x.length, qc.length)
          ((0 until n).map(j => { val d = x(j) - qc(j); d * d }).sum, c)
        }.min
      }.toMap
      kernel == unrolled && kernel == ref
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  test("property: vec.lutSum == the element_at spelling on the production contract (non-null codes)") {
    // production plans always feed exactly m NON-NULL codes in [0, k) —
    // the equality property pins that contract. (On null codes the old
    // element_at spelling hits a Catalyst nullability quirk — a
    // non-nullable literal LUT array makes ElementAt non-nullable, so
    // codegen substitutes 0 for the null index's null — while the
    // kernel is strict-null; asserted separately below.)
    val m = 5; val k = 7
    val genLuts = Gen.listOfN(m, Gen.listOfN(k, Gen.chooseNum(-1000L, 1000L)))
      .map(_.map(_.toIndexedSeq).toIndexedSeq)
    val genCodes = Gen.listOfN(30, Gen.listOfN(m, Gen.chooseNum(0, k - 1)))
    val p = Prop.forAllNoShrink(genLuts, genCodes) { (luts, rows) =>
      val df = rows.zipWithIndex.map { case (cs, i) => (i, cs) }.toDF("id", "codes")
      val kernel = df.select(col("id"),
          graft.functions.vec.lutSum(col("codes"), luts).as("adc"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val unrolled = df.select(col("id"), (0 until m).map(s =>
          element_at(typedLit(luts(s)), element_at(col("codes"), s + 1) + 1))
          .reduce(_ + _).as("adc"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val ref = rows.zipWithIndex.map { case (cs, i) =>
        i -> cs.zipWithIndex.map { case (c, s) => luts(s)(c) }.sum
      }.toMap
      kernel == unrolled && kernel == ref
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  test("property: bowScore == driver-side model application on whitespace-rich text") {
    import graft.operators.TextAnalysis
    val weights = TextAnalysis.classifierWeights(64)
    val genText = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaChar, 3 -> Gen.const(' '),
      1 -> Gen.oneOf('\t', '\n', '\u000B', '\f', '\r'))).map(_.mkString)
    val p = Prop.forAllNoShrink(Gen.listOfN(30, genText)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      val got = df.select(col("id"),
          graft.functions.sketch.bowScore(col("text"), weights).as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val trimmed = t.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
        val want = trimmed.split("[ \t\n\u000B\f\r]+").filter(_.nonEmpty).map { tok =>
          val h = tok.foldLeft(0L)((a, c) => a * 31L + c.toLong)
          weights(java.lang.Long.remainderUnsigned(h, weights.length.toLong).toInt)
        }.sum
        got(i) == want
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.status.toString)
  }

  test("vec.lutSum nulls out on a null code element or null array (strict-null contract)") {
    val luts = IndexedSeq(IndexedSeq(10L, 20L), IndexedSeq(30L, 40L))
    val rows = Seq(
      (1, Some(Seq(Some(1), Some(0)))),
      (2, Some(Seq(Some(1), None))),
      (3, Option.empty[Seq[Option[Int]]]))
      .toDF("id", "codes")
      .select(col("id"), graft.functions.vec.lutSum(col("codes"), luts).as("adc"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows == Map(1 -> Some(50L), 2 -> None, 3 -> None))
  }

  test("vec.nearestCode is null-in-null-out and rejects fractional arrays at analysis") {
    val book = IndexedSeq((0, Seq(0L, 0L)), (1, Seq(5L, 5L)))
    val rows = Seq((1, Some(Seq(4L, 4L))), (2, Option.empty[Seq[Long]]))
      .toDF("id", "v")
      .select(col("id"), graft.functions.vec.nearestCode(col("v"), book).as("best"))
      .collect().map(r => r.getInt(0) -> Option(r.getStruct(1))).toMap
    assert(rows(1).map(s => (s.getLong(0), s.getInt(1))).contains((2L, 1)))
    assert(rows(2).isEmpty)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(Seq(1.5d))).toDF("v")
        .select(graft.functions.vec.nearestCode(col("v"), book)).collect()
    }
    assert(e.getMessage.contains("array<integral>"))
  }
}
