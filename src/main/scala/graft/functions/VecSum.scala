package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise vector-sum aggregate over `array<bigint>` columns.
  *
  * The naive Spark formulation of "sum vectors per group" is
  * `posexplode` + `groupBy(key, pos)` + re-assemble — which inflates the
  * input d× (d = 64 for the embeddings table, so a 100 TB corpus
  * shuffles as 6.4 PB of (key, pos, value) rows) and then needs a second
  * shuffle to collect elements back into arrays. This aggregate keeps
  * ONE d-length buffer per group per stage: map-side partial aggregation
  * reduces every input partition to `groups × d` longs before the
  * exchange, the shuffle carries one row per group, and no re-assembly
  * pass exists because the buffer already IS the vector.
  *
  * Semantics: null input arrays are skipped; ragged inputs are allowed
  * (the buffer grows to the longest seen; shorter vectors contribute 0
  * to the tail — callers aggregating fixed-dim embeddings never hit
  * this). Element nulls are treated as 0. Overflow wraps like built-in
  * BIGINT addition (callers quantizing unit-scale floats at 1e3 have
  * ~2^43 headroom at a trillion rows per group).
  *
  * Integer, not float, on purpose: elementwise LONG addition is
  * associative and commutative, so the result is bit-identical under any
  * partitioning/merge order — which is what lets a centroid built on it
  * be hash-compared against a single-threaded SQL oracle. Float centroid
  * queries quantize first (see [[graft.operators.Similarity.centroids]]).
  */
case class VecSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[VecSumBuffer] {

  // integral element types read natively; fractional rejected at
  // analysis (see [[graft.functions.IntegralVecType]] — the old
  // ImplicitCastInputTypes surface truncated array<double> silently)
  override def checkInputDataTypes(): TypeCheckResult =
    IntegralVecType.check("graft_vec_sum", Seq(child.dataType))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val getElem = IntegralVecType.getter(child.dataType)

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      buf.ensure(n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) buf.sums(i) += getElem(arr, i)
        i += 1
      }
    }
    buf
  }

  override def merge(a: VecSumBuffer, b: VecSumBuffer): VecSumBuffer = {
    a.ensure(b.dim)
    var i = 0
    while (i < b.dim) { a.sums(i) += b.sums(i); i += 1 }
    a
  }

  override def eval(buf: VecSumBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.sums, buf.dim))

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.dim)
    var i = 0
    while (i < buf.dim) { out.writeLong(buf.sums(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new VecSumBuffer
    buf.ensure(n)
    var i = 0
    while (i < n) { buf.sums(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): VecSumLong =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecSumLong =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

/** Growable long buffer; `dim` tracks the longest vector seen so the
  * output length always matches the input dimensionality (an empty
  * group evals to an empty array, matching "no rows → no vector").
  */
final class VecSumBuffer {
  var dim: Int = 0
  var sums: Array[Long] = new Array[Long](0)

  def ensure(n: Int): Unit = {
    if (n > sums.length) sums = java.util.Arrays.copyOf(sums, n)
    if (n > dim) dim = n
  }
}

/** Column-level API (aggregate kin of [[agg.topKOrdTie]]). */
object vecagg {

  /** Elementwise sum of `array<bigint>` per group; one d-length buffer
    * per group at every stage (map-side partials included).
    */
  def vecSumLong(c: Column): Column =
    GraftExpressionBridge.column(
      VecSumLong(GraftExpressionBridge.expression(c.cast("array<long>")))
        .toAggregateExpression()
    )
}
