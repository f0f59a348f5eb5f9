package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's custom expressions, so `spark.sql`
  * users get them as first-class functions:
  *
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  *   SELECT graft_minhash(graft_shingles(tokens, 3), 128) FROM ...
  */
object Register {
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot", es => VecDot(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine", es => VecCosine(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_minhash",
      es => MinHashSignature(es(0), es(1).eval().asInstanceOf[Int]),
      "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash", es => SimHash64(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_shingles",
      es => ShingleSet(es(0), es(1).eval().asInstanceOf[Int]),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_winnow",
      es => WinnowFingerprint(es(0), es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int]),
      "scala_udf")
  }
}
