package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` entry point: injects every graft expression
  * as a first-class SQL function, so any session enables the engine with
  * nothing but configuration:
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * (the config-based twin of [[Register.registerAll]], which does the
  * same for an already-built session). Builders construct the same
  * Catalyst expressions the Column API uses — one implementation, two
  * surfaces.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def intArg(es: Seq[Expression], i: Int, what: String): Int =
    Register.intArg(es, i, what)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float vectors"),
      (es: Seq[Expression]) => VecDot(es(0), es(1))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float vectors"),
      (es: Seq[Expression]) => VecCosine(es(0), es(1))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(tokens, n) - n-hash MinHash signature"),
      (es: Seq[Expression]) => MinHashSignature(es(0), intArg(es, 1, "numHashes"))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens) - 64-bit SimHash"),
      (es: Seq[Expression]) => SimHash64(es(0))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(tokens, k) - distinct word k-gram shingles"),
      (es: Seq[Expression]) => ShingleSet(es(0), intArg(es, 1, "k"))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_winnow"),
      info("graft_winnow", "graft_winnow(text, k, w) - winnowing fingerprint hashes"),
      (es: Seq[Expression]) => WinnowFingerprint(es(0), intArg(es, 1, "k"), intArg(es, 2, "w"))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_topk"),
      info("graft_topk", "graft_topk(ord, tie, k) - bounded top-k rows per group, (ord DESC, tie ASC)"),
      (es: Seq[Expression]) => TopKOrdTie(es(0), es(1), intArg(es, 2, "k"))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_token_shingles"),
      info("graft_token_shingles",
        "graft_token_shingles(text, k) - sorted distinct word k-gram shingles, one text pass"),
      (es: Seq[Expression]) => TokenShingleSet(es(0), intArg(es, 1, "k"))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_token_count"),
      info("graft_token_count", "graft_token_count(text) - whitespace token count, one text pass"),
      (es: Seq[Expression]) => TokenCountExpr(es(0))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_window_hashes"),
      info("graft_window_hashes",
        "graft_window_hashes(text, k) - hash of every k-token window, index = start position"),
      (es: Seq[Expression]) => TokenWindowHashes(es(0), intArg(es, 1, "k"))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_langid"),
      info("graft_langid", "graft_langid(text) - marker-heuristic language guess (en/fr/de/es/zh/unknown)"),
      (es: Seq[Expression]) => LangIdGuess(es(0))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_vec_sum"),
      info("graft_vec_sum", "graft_vec_sum(arr) - elementwise sum of array<bigint> per group"),
      (es: Seq[Expression]) => VecSumLong(es(0))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_vec_sqdist"),
      info("graft_vec_sqdist", "graft_vec_sqdist(a, b) - exact int64 squared L2 of two array<bigint>"),
      (es: Seq[Expression]) => VecSqDistLong(es(0), es(1))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_sorted_intersect"),
      info("graft_sorted_intersect",
        "graft_sorted_intersect(a, b) - |a INTERSECT b| of two sorted distinct string arrays"),
      (es: Seq[Expression]) => SortedIntersectCount(es(0), es(1))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_scrub_join"),
      info("graft_scrub_join",
        "graft_scrub_join(text, removed) - space-join of tokens whose positions are not in the sorted removed set"),
      (es: Seq[Expression]) => ScrubJoin(es(0), es(1))
    ))
  }
}
