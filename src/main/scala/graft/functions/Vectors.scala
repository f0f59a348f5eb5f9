package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types._

/** Shared analysis + element-access plumbing for the integer vector
  * kernels ([[VecSqDistLong]], [[graft.functions.VecSumLong]]): accept
  * ANY integral element type (`array<tinyint|smallint|int|bigint>`)
  * read natively — no implicit cast pass over the array — and reject
  * fractional/decimal element types at ANALYSIS. The previous
  * `ImplicitCastInputTypes` surface silently truncated `array<double>`
  * SQL arguments toward zero element-by-element; an integer kernel
  * that quietly eats floats is a wrong-answer factory on the SQL
  * surface, so mistyped queries now fail like the float kernels do.
  */
private[functions] object IntegralVecType {
  def check(fn: String, types: Seq[DataType]): TypeCheckResult =
    if (types.forall {
      case ArrayType(LongType | IntegerType | ShortType | ByteType, _) => true
      case _                                                           => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<integral> arguments (fractional elements would " +
        s"truncate); got ${types.map(_.catalogString).mkString(", ")}")

  /** Boxed-eval element reader for the resolved element type. */
  def getter(dt: DataType): (ArrayData, Int) => Long = dt match {
    case ArrayType(LongType, _)    => (a, i) => a.getLong(i)
    case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toLong
    case ArrayType(ShortType, _)   => (a, i) => a.getShort(i).toLong
    case ArrayType(ByteType, _)    => (a, i) => a.getByte(i).toLong
    case other => throw new IllegalStateException(s"unchecked input type $other")
  }

  /** Codegen element reader: a `long`-valued Java expression. */
  def genGet(arr: String, dt: DataType, idx: String): String = dt match {
    case ArrayType(et, _) => s"(long)(${CodeGenerator.getValue(arr, et, idx)})"
    case other => throw new IllegalStateException(s"unchecked input type $other")
  }
}

/** Native Catalyst expressions for embedding math (`Array[Float]` columns).
  *
  * A single fused, codegen'd loop per row — stays inside whole-stage
  * codegen, unlike higher-order functions (`aggregate`/`zip_with`), which
  * fall back to interpreted lambda evaluation per element. At 100 TB the
  * similarity kernels are the hot path, so they get `doGenCode`.
  *
  * Accumulation is double-precision and strictly sequential, so results
  * are deterministic for a given vector pair.
  */
abstract class FloatVecBinary extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  // array<float> enforced at ANALYSIS: these are also SQL functions
  // (graft_dot/graft_cosine), and a numeric-literal array there is
  // array<double>/array<decimal> — getFloat on those buffers reads
  // misaligned garbage, so reject the query instead
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
}

/** dot(a, b) */
case class VecDot(left: Expression, right: Expression) extends FloatVecBinary {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    java.lang.Double.valueOf(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double)$x.getFloat($i) * (double)$y.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (|a| |b|); 0.0 when either norm is 0.
  * One fused loop for dot and both norms.
  */
case class VecCosine(left: Expression, right: Expression) extends FloatVecBinary {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    java.lang.Double.valueOf(if (d == 0.0) 0.0 else dot / d)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double)$x.getFloat($i);
         |  double $yv = (double)$y.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 distance on QUANTIZED integer vectors (`array<bigint>`):
  * sum((a_i - b_i)^2) over the common prefix, in exact int64 — the
  * codegen'd kernel behind the centroid argmin
  * ([[graft.operators.Similarity.nearestCentroid]]/`kmeansStep`), where
  * the interpreted `zip_with` + `aggregate` fold costs a per-element
  * lambda dispatch × centroids × rows. Null ELEMENTS count as 0,
  * matching [[VecSumLong]]'s null-as-zero contract (and the quantizer,
  * which coalesces them to 0 before this kernel ever sees them).
  * Vectors of unequal length compare over their common prefix
  * (`min(n, m)` — mirroring the oracle's inner join on dim).
  * Integer arithmetic keeps the distance order-independent and
  * engine-exact. Overflow wraps like Java long arithmetic — it does NOT
  * raise under ANSI mode the way built-in BIGINT expressions do; the
  * quantized unit-scale embeddings this kernel serves sit orders of
  * magnitude below the edge, but callers feeding raw unquantized longs
  * through the SQL surface own that check.
  */
case class VecSqDistLong(left: Expression, right: Expression) extends BinaryExpression {
  // Any integral element type is read natively (array<int> literals —
  // the natural SQL spelling — work without a cast pass over the
  // array); fractional/decimal element types are rejected at analysis
  // like the float kernels above, instead of the silent element-wise
  // truncation the old ImplicitCastInputTypes surface performed.
  override def checkInputDataTypes(): TypeCheckResult =
    IntegralVecType.check("graft_vec_sqdist", Seq(left.dataType, right.dataType))
  override def dataType: DataType = LongType

  @transient private lazy val getL = IntegralVecType.getter(left.dataType)
  @transient private lazy val getR = IntegralVecType.getter(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0L else getL(x, i)
      val yv = if (y.isNullAt(i)) 0L else getR(y, i)
      val d = xv - yv
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = ($x.isNullAt($i) ? 0L : ${IntegralVecType.genGet(x, left.dataType, i)})
         |          - ($y.isNullAt($i) ? 0L : ${IntegralVecType.genGet(y, right.dataType, i)});
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Nearest-codebook-entry argmin over QUANTIZED integer vectors: the
  * codebook (labels + centroids, exact int64 grid) is a plan CONSTANT
  * carried as a reference object, and the generated code is one nested
  * loop — O(1) bytecode regardless of codebook size.
  *
  * This replaces the `array_min(array(struct(sqdist, label), ...))`
  * spelling wherever the codebook is large: that spelling unrolls
  * k copies of the distance kernel into the enclosing operator's
  * consume method, and at PQ training's m=16 subspaces × k=16 codes
  * the Generate stage blew janino's 64 KB method limit — Spark then
  * silently fell back to interpreted evaluation for the whole
  * corpus-sized stage (observed on every PqSpec run before this
  * kernel existed).
  *
  * Semantics are IDENTICAL to the struct-array_min spelling, and
  * hash-checkable: distances in exact int64 over the common prefix
  * (`min(|v|, |centroid|)`), null elements count as 0 (the
  * [[VecSqDistLong]] contract), ties break to the smallest label,
  * result is `struct<dist: bigint, c_label: int>`.
  */
case class VecNearestCode(
    child: Expression,
    labels: IndexedSeq[Int],
    centroids: IndexedSeq[IndexedSeq[Long]]) extends UnaryExpression {
  require(labels.nonEmpty && labels.length == centroids.length,
    s"codebook must be non-empty and aligned: ${labels.length} labels, ${centroids.length} centroids")

  override def checkInputDataTypes(): TypeCheckResult =
    IntegralVecType.check("graft_vec_nearest_code", Seq(child.dataType))
  override def dataType: DataType = StructType(Seq(
    StructField("dist", LongType, nullable = false),
    StructField("c_label", IntegerType, nullable = false)))

  @transient private lazy val labArr: Array[Int] = labels.toArray
  @transient private lazy val centArr: Array[Array[Long]] = centroids.map(_.toArray).toArray
  @transient private lazy val get = IntegralVecType.getter(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var bestD = Long.MaxValue
    var bestC = Int.MaxValue
    var c = 0
    while (c < centArr.length) {
      val q = centArr(c)
      val n = math.min(x.numElements(), q.length)
      var s = 0L
      var i = 0
      while (i < n) {
        val d = (if (x.isNullAt(i)) 0L else get(x, i)) - q(i)
        s += d * d
        i += 1
      }
      if (s < bestD || (s == bestD && labArr(c) < bestC)) { bestD = s; bestC = labArr(c) }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](bestD, bestC))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cb = ctx.addReferenceObj("nearestCodeCents", centArr, "long[][]")
      val lab = ctx.addReferenceObj("nearestCodeLabels", labArr, "int[]")
      val bestD = ctx.freshName("bestD"); val bestC = ctx.freshName("bestC")
      val c = ctx.freshName("c"); val q = ctx.freshName("q")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |long $bestD = Long.MAX_VALUE; int $bestC = Integer.MAX_VALUE;
         |for (int $c = 0; $c < $cb.length; $c++) {
         |  long[] $q = $cb[$c];
         |  int $n = java.lang.Math.min($x.numElements(), $q.length);
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = ($x.isNullAt($i) ? 0L : ${IntegralVecType.genGet(x, child.dataType, i)}) - $q[$i];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestD || ($s == $bestD && $lab[$c] < $bestC)) { $bestD = $s; $bestC = $lab[$c]; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$bestD, $bestC});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC lookup-table sum over a PQ code vector: `sum_s luts(s)(codes(s))`
  * — the asymmetric-distance kernel of a product-quantized ANN query
  * (Jégou et al., TPAMI 2011). The per-query LUT matrix (m × k longs)
  * is a plan constant carried as a reference object; generated code is
  * one loop, O(1) bytecode in both m and k.
  *
  * Replaces the `element_at(typedLit(lut), code+1) + ...` spelling:
  * that unrolls m lookups per query, and a 100-query literal batch put
  * queries × m element_at trees into one Generate consume method —
  * past janino's 64 KB limit, silently dropping the corpus-sized ADC
  * scan to interpreted evaluation.
  *
  * Null/shape contract: null codes array or any null code element →
  * null; codes shorter than m sum the common prefix (internal plans
  * always supply exactly m non-null codes, so these cases never arise
  * in production). NOTE the old spelling did NOT null out on a null
  * code: `element_at(<non-nullable literal array>, null_index)` is
  * declared non-nullable by Catalyst, so its codegen substituted the
  * type default 0 for the null — a quirk, not a contract; this kernel
  * takes the strict-null behavior instead. Out-of-range codes raise
  * like a Java array read — codes are by construction in [0, k).
  */
case class VecLutSum(
    child: Expression,
    luts: IndexedSeq[IndexedSeq[Long]]) extends UnaryExpression {
  require(luts.nonEmpty, "LUT matrix must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    IntegralVecType.check("graft_vec_lut_sum", Seq(child.dataType))
  override def dataType: DataType = LongType
  // a null CODE ELEMENT nulls the sum even when the array itself is
  // non-nullable — without this override ev.isNull is the `false`
  // literal and the generated `isNull = true` assignment won't compile
  override def nullable: Boolean = true

  @transient private lazy val lutArr: Array[Array[Long]] = luts.map(_.toArray).toArray
  @transient private lazy val get = IntegralVecType.getter(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), lutArr.length)
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      s += lutArr(i)(get(x, i).toInt)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val lut = ctx.addReferenceObj("adcLuts", lutArr, "long[][]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $lut.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $lut[$i][(int)${IntegralVecType.genGet(x, child.dataType, i)}];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API. */
object vec {
  def dot(a: Column, b: Column): Column =
    GraftExpressionBridge.column(VecDot(GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    GraftExpressionBridge.column(VecCosine(GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
  def sqDistLong(a: Column, b: Column): Column =
    GraftExpressionBridge.column(VecSqDistLong(GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
  /** `struct(dist, c_label)` of the codebook entry nearest to `a` —
    * the codegen-compact argmin (see [[VecNearestCode]]); `codebook`
    * rows are `(label, centroid)`.
    */
  def nearestCode(a: Column, codebook: IndexedSeq[(Int, Seq[Long])]): Column =
    GraftExpressionBridge.column(VecNearestCode(
      GraftExpressionBridge.expression(a),
      codebook.map(_._1),
      codebook.map(_._2.toIndexedSeq)))
  /** `sum_s luts(s)(codes(s))` — the codegen-compact ADC kernel (see
    * [[VecLutSum]]); `codes` is an `array<integral>` column of PQ codes.
    */
  def lutSum(codes: Column, luts: IndexedSeq[IndexedSeq[Long]]): Column =
    GraftExpressionBridge.column(VecLutSum(GraftExpressionBridge.expression(codes), luts))
}
