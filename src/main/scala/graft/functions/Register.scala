package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration for the engine's custom expressions, so `spark.sql`
  * users get them as first-class functions:
  *
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  *   SELECT graft_minhash(graft_shingles(tokens, 3), 128) FROM ...
  */
object Register {

  /** Literal integer argument of a SQL-surface builder — tolerant of any
    * numeric literal type (`CAST(128 AS BIGINT)` included), shared with
    * [[GraftExtensions]] so both registration surfaces behave alike.
    */
  private[functions] def intArg(es: Seq[Expression], i: Int, what: String): Int =
    es(i).eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(s"$what must be a literal int, got $other")
    }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot", es => VecDot(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine", es => VecCosine(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_minhash",
      es => MinHashSignature(es(0), intArg(es, 1, "numHashes")),
      "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash", es => SimHash64(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_shingles",
      es => ShingleSet(es(0), intArg(es, 1, "k")),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_winnow",
      es => WinnowFingerprint(es(0), intArg(es, 1, "k"), intArg(es, 2, "w")),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_topk",
      es => TopKOrdTie(es(0), es(1), intArg(es, 2, "k")),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_token_shingles",
      es => TokenShingleSet(es(0), intArg(es, 1, "k")),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_token_count", es => TokenCountExpr(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_window_hashes",
      es => TokenWindowHashes(es(0), intArg(es, 1, "k")),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_langid", es => LangIdGuess(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_sorted_intersect", es => SortedIntersectCount(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_scrub_join", es => ScrubJoin(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_vec_sum", es => VecSumLong(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_vec_sqdist", es => VecSqDistLong(es(0), es(1)), "scala_udf")
  }
}
