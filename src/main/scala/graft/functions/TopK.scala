package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-memory top-k-per-group aggregate.
  *
  * The window-function formulation (`row_number().over(partitionBy(k)
  * .orderBy(...)) <= k`) must SORT every group's full row set — at
  * 100 TB that is a shuffle of the whole table followed by a total sort
  * per partition, with a single giant group (skewed key) sorting on one
  * task. This aggregate keeps only k rows of state per group at every
  * stage, and because it is a real Catalyst aggregate it gets map-side
  * partial aggregation for free: each input partition reduces to at
  * most k rows per group BEFORE the exchange, so the shuffle carries
  * `groups x k` rows, not the table.
  *
  * Ordering contract: rank by `ord` DESC, then `tie` ASC — the standard
  * "largest value wins, stable id tiebreak". NaN ranks above all finite
  * values (java.lang.Double.compare semantics), matching a window
  * `orderBy(desc)` which also places NaN first. Output is an array of
  * `struct(ord, tie)` in rank order, ready for `posexplode`. Rows with
  * a null `ord` or `tie` are EXCLUDED (unlike a window `row_number`,
  * which ranks nulls last in DESC order) — on nullable ordering
  * columns, filter or coalesce explicitly first.
  *
  * State is a bounded insertion-sorted array (k is small by definition
  * of top-k); serialization is a flat (double, long) stream.
  */
case class TopKOrdTie(
    ord: Expression,
    tie: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {
  require(k >= 1 && k <= (1 << 20), s"top-k k out of range: $k")

  // coerce whatever the caller hands us (DECIMAL, STRING, INT) to the
  // buffer types — the SQL surface (`graft_topk`) passes raw children,
  // and without this a DECIMAL ord evals to Decimal (not Number) and
  // throws ClassCastException at runtime
  // (no explicit result type: AbstractDataType is private[sql], the
  // inferred Seq[DataType] conforms)
  override def inputTypes = Seq(DoubleType, LongType)

  override def children: Seq[Expression] = Seq(ord, tie)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType), StructField("tie", LongType))),
    containsNull = false
  )

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ord.eval(input)
    val t = tie.eval(input)
    if (o != null && t != null) {
      buf.insert(o.asInstanceOf[Number].doubleValue(), t.asInstanceOf[Number].longValue())
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = { a.mergeIn(b); a }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = InternalRow(buf.ords(i), buf.ties(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeDouble(buf.ords(i)); out.writeLong(buf.ties(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKOrdTie =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKOrdTie =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(ord = cs(0), tie = cs(1))
}

/** Insertion-sorted bounded buffer: rank order is (ord DESC, tie ASC).
  * k is small, so O(k) insert beats heap constant factors and keeps the
  * state already sorted for eval/serialize.
  */
final class TopKBuffer(val k: Int) {
  var size: Int = 0
  val ords: Array[Double] = new Array[Double](k)
  val ties: Array[Long] = new Array[Long](k)

  /** true if (o1,t1) ranks strictly better than (o2,t2).
    * `Double.compare` semantics: NaN ranks above every finite value
    * (so DESC puts NaN first, matching Spark's window `orderBy(desc)`),
    * and -0.0 sorts below 0.0.
    */
  @inline private def better(o1: Double, t1: Long, o2: Double, t2: Long): Boolean = {
    val c = java.lang.Double.compare(o1, o2)
    c > 0 || (c == 0 && t1 < t2)
  }

  def insert(o: Double, t: Long): Unit = {
    if (size == k && !better(o, t, ords(size - 1), ties(size - 1))) return
    // find insertion point (first slot this row beats)
    var i = size
    while (i > 0 && better(o, t, ords(i - 1), ties(i - 1))) i -= 1
    if (i >= k) return
    val last = math.min(size, k - 1)
    var j = last
    while (j > i) { ords(j) = ords(j - 1); ties(j) = ties(j - 1); j -= 1 }
    ords(i) = o
    ties(i) = t
    if (size < k) size += 1
  }

  def mergeIn(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.ords(i), other.ties(i)); i += 1 }
  }
}

/** [[TopKOrdTie]] with an INTEGER ordering column: same contract
  * ((ord DESC, tie ASC), bounded k-row state, map-side partials), but
  * the ord never leaves long arithmetic — the variant for exact
  * integer-domain ranks (squared grid distances, counts). The double
  * variant is exact only while |ord| < 2^53; an int64 squared distance
  * can exceed that (dim · (scale · maxCoord)² — real at larger scale
  * grids), and the failure there is a SILENT rank swap, not an error.
  */
case class TopKLongOrdTie(
    ord: Expression,
    tie: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKLongBuffer] with ImplicitCastInputTypes {
  require(k >= 1 && k <= (1 << 20), s"top-k k out of range: $k")

  override def inputTypes = Seq(LongType, LongType)
  override def children: Seq[Expression] = Seq(ord, tie)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", LongType), StructField("tie", LongType))),
    containsNull = false
  )

  override def createAggregationBuffer(): TopKLongBuffer = new TopKLongBuffer(k)

  override def update(buf: TopKLongBuffer, input: InternalRow): TopKLongBuffer = {
    val o = ord.eval(input)
    val t = tie.eval(input)
    if (o != null && t != null)
      buf.insert(o.asInstanceOf[Number].longValue(), t.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(a: TopKLongBuffer, b: TopKLongBuffer): TopKLongBuffer = { a.mergeIn(b); a }

  override def eval(buf: TopKLongBuffer): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = InternalRow(buf.ords(i), buf.ties(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKLongBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeLong(buf.ords(i)); out.writeLong(buf.ties(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKLongBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKLongBuffer(k)
    var i = 0
    while (i < n) { buf.insert(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKLongOrdTie =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKLongOrdTie =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(ord = cs(0), tie = cs(1))
}

/** [[TopKBuffer]] over long ords — total order is plain Long compare
  * (no NaN/-0.0 cases to define away).
  */
final class TopKLongBuffer(val k: Int) {
  var size: Int = 0
  val ords: Array[Long] = new Array[Long](k)
  val ties: Array[Long] = new Array[Long](k)

  @inline private def better(o1: Long, t1: Long, o2: Long, t2: Long): Boolean =
    o1 > o2 || (o1 == o2 && t1 < t2)

  def insert(o: Long, t: Long): Unit = {
    if (size == k && !better(o, t, ords(size - 1), ties(size - 1))) return
    var i = size
    while (i > 0 && better(o, t, ords(i - 1), ties(i - 1))) i -= 1
    if (i >= k) return
    val last = math.min(size, k - 1)
    var j = last
    while (j > i) { ords(j) = ords(j - 1); ties(j) = ties(j - 1); j -= 1 }
    ords(i) = o
    ties(i) = t
    if (size < k) size += 1
  }

  def mergeIn(other: TopKLongBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.ords(i), other.ties(i)); i += 1 }
  }
}

/** Column-level API. */
object agg {

  /** Top-k rows per group as `array<struct<ord, tie>>` ranked by
    * (ord DESC, tie ASC), with k rows of state per group at every
    * aggregation stage (map-side partials included). `ord` is cast to
    * DOUBLE: exact only while |ord| < 2^53 — integer ords that can
    * exceed that (squared grid distances at big scale/dim) must use
    * [[topKLongOrdTie]].
    */
  def topKOrdTie(ord: Column, tie: Column, k: Int): Column =
    GraftExpressionBridge.column(
      TopKOrdTie(
        GraftExpressionBridge.expression(ord.cast("double")),
        GraftExpressionBridge.expression(tie.cast("long")),
        k
      ).toAggregateExpression()
    )

  /** [[topKOrdTie]] with the ord kept in LONG arithmetic end-to-end —
    * exact for any int64 ordering value.
    */
  def topKLongOrdTie(ord: Column, tie: Column, k: Int): Column =
    GraftExpressionBridge.column(
      TopKLongOrdTie(
        GraftExpressionBridge.expression(ord.cast("long")),
        GraftExpressionBridge.expression(tie.cast("long")),
        k
      ).toAggregateExpression()
    )
}
