package graft

/** SQL-registered custom functions: the spark.sql surface. */
class SqlFunctionsSpec extends SparkSpec {

  test("extensions-injected functions work from SQL with no registration call") {
    // SparkSpec's session sets spark.sql.extensions=graft.functions.GraftExtensions
    // and never calls Register.registerAll before this suite
    val r = spark.sql(
      """SELECT graft_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS d,
        |       size(graft_shingles(array('a','b','c'), 2)) AS s
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 6.0)
    assert(r.getInt(1) == 2)
  }

  test("round-6 text kernels are SQL functions on both registration surfaces") {
    graft.functions.Register.registerAll(spark) // exercise the twin too
    val r = spark.sql(
      """SELECT graft_token_shingles('b a c a b', 2) AS sh,
        |       graft_token_count('  a b  c ') AS tc,
        |       graft_langid('the cat and the hat is on the mat') AS lang,
        |       graft_sorted_intersect(array('a','b','d'), array('b','c','d')) AS i
        |""".stripMargin).collect().head
    // sorted distinct shingles of tokens [b a c a b]
    assert(r.getSeq[String](0) == Seq("a b", "a c", "b a", "c a"))
    assert(r.getInt(1) == 3)
    assert(r.getString(2) == "en")
    assert(r.getInt(3) == 2)
  }

  test("graft_window_hashes is a SQL function; equal windows share a hash") {
    graft.functions.Register.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_window_hashes('a b c a b c', 3) AS hs,
        |       graft_window_hashes('x', 3) AS short
        |""".stripMargin).collect().head
    val hs = r.getSeq[Long](0)
    assert(hs.length == 4, "6 tokens, k=3 -> 4 windows")
    assert(hs(0) == hs(3), "'a b c' at pos 0 and 3 must collide")
    assert(hs(0) != hs(1) && hs(1) != hs(2))
    assert(r.getSeq[Long](1).isEmpty, "fewer than k tokens -> no windows")
  }

  test("graft_topk aggregate from SQL equals the window formulation") {
    val got = spark.sql(
      s"""SELECT o_custkey, top FROM (
         |  SELECT o_custkey, graft_topk(o_totalprice, o_orderkey, 2) AS top
         |  FROM parquet.`$sf/orders.parquet`
         |  WHERE o_custkey < 100
         |  GROUP BY o_custkey)
         |""".stripMargin)
      .selectExpr("o_custkey", "transform(top, x -> x.tie) AS ids")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val want = graft.operators.Relational.qTopNPerGroupAgg(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_custkey") < 100)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toList).toMap
    assert(got == want)
  }

  test("graft_topk coerces DECIMAL/STRING ord and BIGINT literal k") {
    // DECIMAL ord + CAST(... AS BIGINT) k: both surfaces must coerce
    // instead of ClassCastException-ing on Decimal/Long literals
    val r = spark.sql(
      s"""SELECT graft_topk(CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey,
         |                  CAST(2 AS BIGINT)) AS top
         |FROM parquet.`$sf/orders.parquet`
         |WHERE o_custkey = 1
         |""".stripMargin)
      .selectExpr("transform(top, x -> x.tie) AS ids").collect().head
    assert(r.getSeq[Long](0).nonEmpty)
    // STRING ord coerces too (numeric strings)
    val s = spark.sql(
      """SELECT graft_topk(v, t, 2) AS top FROM VALUES ('3.5', 1L), ('9.0', 2L), ('1.0', 3L) AS d(v, t)"""
    ).selectExpr("transform(top, x -> x.tie) AS ids").collect().head
    assert(s.getSeq[Long](0).toList == List(2L, 1L))
  }

  test("topKLongOrdTie: exact past 2^53 where the double-ord variant silently collapses") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // three ords that are DISTINCT as longs but IDENTICAL as doubles
    // (2^60 and its ±1 neighbors round to the same double) — the exact
    // failure mode of routing an int64 distance through a double ord
    val base = 1L << 60
    val df = Seq((base - 1, 10L), (base, 20L), (base + 1, 30L)).toDF("ord", "tie")
    val viaLong = df.agg(graft.functions.agg.topKLongOrdTie(col("ord"), col("tie"), 2).as("t"))
      .selectExpr("transform(t, x -> x.tie) AS ids", "transform(t, x -> x.ord) AS ords")
      .collect().head
    // long path: true order is (base+1, base, base-1) -> ties (30, 20)
    assert(viaLong.getSeq[Long](0).toList == List(30L, 20L))
    assert(viaLong.getSeq[Long](1).toList == List(base + 1, base))
    // double path: all three ords collapse, tie-ASC wins -> a WRONG set
    val viaDouble = df.agg(graft.functions.agg.topKOrdTie(col("ord"), col("tie"), 2).as("t"))
      .selectExpr("transform(t, x -> x.tie) AS ids").collect().head
    assert(viaDouble.getSeq[Long](0).toList == List(10L, 20L),
      "this documents WHY the long variant exists; if doubles got exact, revisit")
    // and the long variant agrees with the double one on safe ords
    val safe = Seq((5L, 1L), (9L, 2L), (1L, 3L), (9L, 0L)).toDF("ord", "tie")
    val a = safe.agg(graft.functions.agg.topKLongOrdTie(col("ord"), col("tie"), 3).as("t"))
      .selectExpr("transform(t, x -> x.tie) AS ids").collect().head.getSeq[Long](0).toList
    val b = safe.agg(graft.functions.agg.topKOrdTie(col("ord"), col("tie"), 3).as("t"))
      .selectExpr("transform(t, x -> x.tie) AS ids").collect().head.getSeq[Long](0).toList
    assert(a == List(0L, 2L, 1L) && a == b)
  }

  test("topKLongOrdTie property: equals the sort-based reference on random longs, any k") {
    import org.apache.spark.sql.functions._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // duplicated ords and ties across a small domain force the
    // tiebreak and the bounded-buffer eviction paths
    val rowGen = for {
      ord <- Gen.oneOf(Gen.choose(-5L, 5L), Gen.choose(Long.MinValue, Long.MaxValue))
      tie <- Gen.choose(0L, 6L)
    } yield (ord, tie)
    val p = Prop.forAll(Gen.listOf(rowGen), Gen.choose(1, 6)) { (rows, k) =>
      rows.isEmpty || {
        val got = rows.toDF("ord", "tie")
          .repartition(3) // exercise merge() across partial buffers
          .agg(graft.functions.agg.topKLongOrdTie(col("ord"), col("tie"), k).as("t"))
          .selectExpr("transform(t, x -> struct(x.ord, x.tie)) AS r")
          .as[Seq[(Long, Long)]].collect().head.toList
        // reference: full sort by (ord DESC, tie ASC), first k rows;
        // duplicate (ord, tie) rows are real rows and survive like any
        // tie (no -ord negation: Long.MinValue would overflow)
        val want = rows.sorted(Ordering.fromLessThan[(Long, Long)] {
          case ((o1, t1), (o2, t2)) => o1 > o2 || (o1 == o2 && t1 < t2)
        }).take(k)
        got == want
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  test("floor-division bucketing: (a - pmod(a, d)) DIV d equals Math.floorDiv on 20k random longs") {
    import spark.implicits._
    // the exact identity every time-bucketing site relies on (Spark's
    // bare div truncates toward zero; DuckDB's // floors) — checked
    // against the JDK's floorDiv across signs, including pre-1970-style
    // negatives and the divisors actually used (us, hour-ns, day-us)
    val rnd = new scala.util.Random(1234)
    val divisors = Seq(1000L, 3600L * 1000 * 1000 * 1000, 86400000000L, 7L)
    val rows = Seq.tabulate(20000) { i =>
      val a = i % 4 match {
        case 0 => rnd.nextLong() % 2000000000000000000L
        case 1 => -(rnd.nextLong().abs % 4000000000L)   // pre-1970 micros scale
        case 2 => rnd.nextLong().abs % 4000000000L
        case _ => Seq(0L, -1L, 1L, Long.MinValue / 2, Long.MaxValue / 2)(i % 5)
      }
      (a, divisors(i % divisors.length))
    }
    val got = rows.toDF("a", "d")
      .selectExpr("a", "d", "(a - pmod(a, d)) DIV d AS f")
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, d, f) =>
      assert(f == Math.floorDiv(a, d), s"floorDiv($a, $d): got $f want ${Math.floorDiv(a, d)}")
    }
  }

  test("registerAll accepts any numeric literal type for int args") {
    graft.functions.Register.registerAll(spark)
    val r = spark.sql(
      """SELECT size(graft_minhash(graft_shingles(array('a','b','c'), 2), CAST(128 AS BIGINT))) AS m"""
    ).collect().head
    assert(r.getInt(0) == 128)
  }

  test("graft_* functions usable from SQL") {
    graft.functions.Register.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |       graft_simhash(array('a','b')) AS s,
        |       size(graft_minhash(graft_shingles(array('a','b','c'), 2), 64)) AS m,
        |       size(graft_winnow('abcdefghij', 3, 2)) AS w
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getInt(2) == 64)
    assert(r.getInt(3) > 0)
  }
}
