package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native elementwise division of an array<double> column by a double
  * scalar column — the unit-vector projection u = v / ‖v‖ every PQ /
  * ADC path takes per row.
  *
  * The composable form — `transform(v, x => x / nrm)` — is a
  * CodegenFallback higher-order function: one interpreted lambda
  * dispatch per element, measured ~1 ms/row on 64-element arrays (the
  * CLAUDE.md HOF gotcha; the r22 stage audit put 8 ms/row on
  * ann_ivf_pq's encode stage, most of it this projection plus the
  * ML-predict UDF it shared the stage with). This expression is one
  * codegen'd loop writing a primitive double[]: no lambda dispatch, no
  * boxing, stays inside whole-stage codegen. Per-element arithmetic is
  * the same single IEEE division, so results are bitwise identical to
  * the HOF form (the streaming/batch ADC equality pins and the
  * determinism gate rely on that).
  */
case class VecDiv(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_vdiv expects (array<double>, double), got " +
        s"${l.simpleString}, ${r.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val s = b.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = x.getDouble(i) / s; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $a.getDouble($i) / $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
