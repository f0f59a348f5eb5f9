package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-Min sketch aggregate over `array<string>` token columns — the
  * fixed-memory frequency summary (Cormode & Muthukrishnan, J.
  * Algorithms 2005) a 100 TB corpus needs where an exact
  * `groupBy(token)` would shuffle one row per DISTINCT token (billions
  * for web text). The sketch is `d × w` counters; every update and the
  * final answer touch d cells, and the ε/δ contract is the published
  * one: estimate ≤ true + (e/w)·N with probability ≥ 1 − e^−d,
  * one-sided (never an undercount).
  *
  * Scale shape: the buffer is a single flat `d*w` long array per
  * aggregation state. Counter-wise addition is associative and
  * commutative, so map-side partial aggregation reduces EVERY input
  * partition to one 8·d·w-byte sketch before the exchange — the shuffle
  * carries one sketch per partition, never a token. Consuming a token
  * ARRAY (not pre-exploded rows) means the token stream itself is never
  * materialized into a shuffle either; a streaming `foreachBatch` can
  * merge per-batch sketches the same way (mergeability IS the
  * streaming story).
  *
  * Hash rows come from disjoint nibbles of one md5 per token: row i
  * reads hex digits [7i+1, 7i+7] (1-based, 28 bits) mod w. Like the
  * simhash kernel ([[sketch.simhashMd5]]), md5-hex is what keeps the
  * query oracle-checkable in plain SQL — DuckDB computes the identical
  * buckets from `substr(md5(tok), 7*i+1, 7)`. Requires `7d ≤ 32`
  * (d ≤ 4 rows from one digest); w a power of two ≤ 2^28.
  */
case class CmsSketchAgg(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(d >= 1 && d * 7 <= 32, s"need 1 <= d <= 4 (7 hex digits per row from one md5), got $d")
  require(w >= 2 && w <= (1 << 28), s"need 2 <= w <= 2^28, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_sketch needs array<string> tokens, got ${other.catalogString}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = arr.numElements()
      var t = 0
      while (t < n) {
        if (!arr.isNullAt(t)) {
          val digest = CmsSketchAgg.md5Local.get().digest(arr.getUTF8String(t).getBytes)
          var i = 0
          while (i < d) {
            buf(i * w + CmsSketchAgg.bucket(digest, i, w)) += 1L
            i += 1
          }
        }
        t += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf, buf.length))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](buf.length * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.asLongBuffer().put(buf)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

object CmsSketchAgg {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Row-i bucket: hex digits [7i+1, 7i+7] of the digest (1-based,
    * i.e. nibbles 7i..7i+6 big-endian) as a 28-bit int, mod w —
    * bit-identical to SQL
    * `CAST(concat('0x', substr(md5(tok), 7*i+1, 7)) AS BIGINT) % w`.
    */
  private[functions] def bucket(digest: Array[Byte], i: Int, w: Int): Int = {
    var v = 0L
    var j = i * 7
    val end = j + 7
    while (j < end) {
      val b = digest(j >> 1) & 0xff
      val nib = if ((j & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nib
      j += 1
    }
    (v % w).toInt
  }
}

/** Column-level API (aggregate kin of [[vecagg.vecSumLong]]). */
object cms {

  /** The d×w Count-Min sketch of all tokens in an `array<string>`
    * column, as one flat `array<bigint>` row per group.
    */
  def sketch(tokens: Column, d: Int, w: Int): Column =
    GraftExpressionBridge.column(
      CmsSketchAgg(GraftExpressionBridge.expression(tokens), d, w).toAggregateExpression())

  /** Point estimate for `tok` from a COLLECTED sketch (embedded as plan
    * literals — 8·d·w bytes of driver state, the centroid-model
    * pattern): min over rows of the row's counter at `tok`'s bucket.
    * The hash is the same md5-nibble split as the aggregate, expressed
    * in `conv(substring(md5(…)))` so the DuckDB twin is literal.
    */
  def estimate(sketchRow: IndexedSeq[Long], tok: Column, d: Int, w: Int): Column = {
    require(sketchRow.length == d * w, s"sketch length ${sketchRow.length} != d*w = ${d * w}")
    (0 until d).map { i =>
      val row = typedLit(sketchRow.slice(i * w, (i + 1) * w))
      element_at(
        row,
        (conv(substring(md5(tok), i * 7 + 1, 7), 16, 10).cast("long") % w + 1).cast("int"))
    }.reduce(least(_, _))
  }
}
