package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Fused per-vector int8 scalar quantization: struct(qmax, codes) of a
  * vector `v` and its precomputed norm `nrm` in ONE codegen'd pass.
  *
  * The composable form (graft.sim.Similarity.withQuantCols before r18)
  * was three chained higher-order transforms — u = v/nrm,
  * qmax = max|u|, codes = floor(u·(127/qmax)+0.5) — and Spark's HOF
  * expressions are CodegenFallback: the chain ran interpreted with
  * per-element lambda dispatch and three intermediate array
  * allocations, measured ~1 ms/row (≈44 s CPU for 2×20k rows at the
  * r18 10x rehearsal — more CPU than the Q·N scoring join it fed).
  * Same lesson as [[CharHistWord]]: one native node, one loop, no
  * intermediates, stays inside whole-stage codegen.
  *
  * Bit-exactness contract (the int8 family's hash oracles depend on
  * it): every arithmetic step is the SAME single IEEE double op in the
  * same order as both the HOF form and the DuckDB mirror
  * (Similarity.quantSqlCte) — u_i is one divide, qmax is a running
  * max of |u_i| over the same u values (max is order-insensitive),
  * the scale 127.0/qmax is one divide whose result is identical
  * whether computed once or per element, and codes_i is one multiply,
  * one add, one floor. QuantizeSpec pins bitwise agreement with the
  * composed-HOF form on real vectors.
  */
case class QuantCodes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okLeft = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (okLeft && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_quant expects (array<double>, double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("qmax", DoubleType, nullable = false),
    StructField("codes", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "graft_quant"

  override def nullSafeEval(a: Any, n: Any): Any =
    QuantCodes.quant(a.asInstanceOf[ArrayData], n.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) =>
      s"${ev.value} = graft.functions.QuantCodes.quant($a, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantCodes {

  /** One pass: u, qmax, codes — exact op-for-op mirror of the HOF
    * chain (scaladoc above). Public static so generated code can call
    * it. */
  def quant(v: ArrayData, nrm: Double): InternalRow = {
    val n = v.numElements()
    val u = new Array[Double](n)
    var qmax = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      u(i) = v.getDouble(i) / nrm
      val a = math.abs(u(i))
      // NaN is sticky-max, mirroring the HOF form's array_max (Spark
      // orders NaN above any double): a plain `a > qmax` would skip
      // NaN and let a malformed vector (e.g. an Inf element → u_i =
      // Inf/Inf = NaN past the nrm > 0 filter) hash DIFFERENTLY from
      // the HOF/DuckDB mirrors instead of poisoning qmax loudly
      if (a.isNaN || a > qmax) qmax = a
      i += 1
    }
    val scale = 127.0 / qmax
    val codes = new Array[Long](n)
    i = 0
    while (i < n) {
      codes(i) = math.floor(u(i) * scale + 0.5).toLong
      i += 1
    }
    InternalRow(qmax, new GenericArrayData(codes))
  }
}
