package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketching expressions for large-scale dedup (SURVEY north-star ops).
  *
  * All hashes are Spark's own XXH64 over the token's UTF-8 bytes, so
  * signatures are deterministic across JVMs, partitions, and executors.
  * These are `CodegenFallback` (array-in/array-out loops); each replaces
  * 100+ per-permutation Catalyst expressions, so one interpreted call per
  * row beats a wide codegen'd projection — and the surrounding pipeline
  * stays codegen'd.
  */

private[functions] object TokenHash {
  /** xxh64 of a UTF8String's bytes with the given seed. */
  @inline def hash(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
}

/** MinHash signature of a token/shingle array: `numHashes` 64-bit minima.
  *
  * Uses the Kirsch-Mitzenmacher construction h_j(x) = h1(x) + j*h2(x)
  * (two base hashes per token instead of `numHashes` passes over the
  * bytes), the standard trick for MinHash families.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes > 0 && numHashes <= 1024, s"numHashes out of range: $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (tok != null) {
        val h1 = TokenHash.hash(tok, 0x9747b28cL)
        val h2 = TokenHash.hash(tok, 0x85ebca6bL)
        var j = 0
        while (j < numHashes) {
          val h = h1 + j * h2
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash of a token array: per-bit vote of each token's xxh64;
  * near-duplicate texts land within a small Hamming distance.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (tok != null) {
        val h = TokenHash.hash(tok, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03): rolling
  * xxh64 over character k-grams, keep the minimum hash in each window of
  * `w` consecutive k-grams (rightmost min on ties), dedup. The selected
  * hash set is a position-robust document fingerprint: shared substrings
  * of length >= k+w-1 are guaranteed to share a fingerprint.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, "k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val n = text.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val grams = new Array[Long](n - k + 1)
    var i = 0
    while (i < grams.length) {
      val bytes = text.substring(i, i + k).getBytes("UTF-8")
      grams(i) = XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 77L)
      i += 1
    }
    if (grams.length <= w) {
      var mi = 0
      var j = 1
      while (j < grams.length) { if (grams(j) <= grams(mi)) mi = j; j += 1 }
      return new GenericArrayData(Array(grams(mi)))
    }
    val picked = scala.collection.mutable.LinkedHashSet.empty[Long]
    var start = 0
    while (start + w <= grams.length) {
      var mi = start
      var j = start + 1
      while (j < start + w) { if (grams(j) <= grams(mi)) mi = j; j += 1 }
      picked += grams(mi)
      start += 1
    }
    new GenericArrayData(picked.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word k-gram shingles of a token array, one pass.
  *
  * Replaces the `transform(sequence(...), slice+array_join)` composition:
  * higher-order functions evaluate their lambda interpreted per element
  * and `slice` copies — measured ~60x slower than this loop on the
  * benchmark corpus. Output order is first-occurrence, deduplicated.
  */
case class ShingleSet(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + k <= n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-level API. */
object sketch {
  def shingleSet(tokens: Column, k: Int): Column =
    GraftExpressionBridge.column(ShingleSet(GraftExpressionBridge.expression(tokens), k))
  def minhash(tokens: Column, numHashes: Int): Column =
    GraftExpressionBridge.column(MinHashSignature(GraftExpressionBridge.expression(tokens), numHashes))
  def simhash(tokens: Column): Column =
    GraftExpressionBridge.column(SimHash64(GraftExpressionBridge.expression(tokens)))
  def winnow(text: Column, k: Int = 5, w: Int = 4): Column =
    GraftExpressionBridge.column(WinnowFingerprint(GraftExpressionBridge.expression(text), k, w))
}
