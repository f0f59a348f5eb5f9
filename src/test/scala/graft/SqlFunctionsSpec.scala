package graft

/** SQL-registered custom functions: the spark.sql surface. */
class SqlFunctionsSpec extends SparkSpec {

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
