package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Row-local multi-assign IVF cell selection: the `a` nearest coarse
  * cells of a vector, ranked by the quantizer's Euclidean surrogate
  * ||v−c||² − ||v||² = c·c − 2·(v·c), ties broken cell-ascending —
  * EXACTLY the (cdist asc, cell asc) row_number rule of the
  * crossJoin(broadcast(centroids)) + window form it replaces, with
  * both dot products accumulated in [[DotProduct]]'s left-fold order
  * so every comparison sees bit-identical doubles (TopCellsSpec pins
  * the equivalence, ties included).
  *
  * Why an expression and not the window: the window form materializes
  * N·nlist rows through a partition-by-vector sort, and each row
  * carries the full 64-double vector — at the nd1000 decade (N=2M,
  * nlist=1012) that is ~2e9 rows ≈ 1 TB of sort input, which is what
  * actually filled the instrument node's disk (the band join everyone
  * suspected is ~1e8 rows). Assignment is embarrassingly row-local:
  * every vector scans the same broadcast centroid matrix — so this
  * expression does the scan per row, keeps the top-a cells in one
  * small insertion buffer, and the stage becomes a zero-shuffle
  * narrow map at ANY corpus size. The centroid matrix rides the plan
  * as one nested-array literal (a single Literal node — no expression
  * -tree blowup; ~0.5 MB at nlist=1012, ~36 MB at the 10¹⁰-vector
  * ladder point, the same bytes the broadcast table shipped anyway).
  */
case class TopCells(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def vOk = first.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    }
    def cOk = second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true; case _ => false
    }
    if (!vOk) TypeCheckResult.TypeCheckFailure(
      s"graft_top_cells expects array<double> vector, got ${first.dataType.simpleString}")
    else if (!cOk || !second.foldable) TypeCheckResult.TypeCheckFailure(
      "graft_top_cells expects a foldable array<array<double>> centroid literal")
    else if (third.dataType != IntegerType || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_top_cells expects a foldable int cell count")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_top_cells"

  // the centroid literal and count are foldable — convert once per
  // expression instance (per task after deserialization), not per row
  @transient private lazy val mat: Array[Array[Double]] = {
    val rows = second.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(rows.numElements()) { i =>
      rows.getArray(i).toDoubleArray()
    }
  }
  @transient private lazy val cc: Array[Double] = mat.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }
  @transient private lazy val k: Int = third.eval(null).asInstanceOf[Int]

  /** Called from both interpreted eval and generated code. */
  def select(vA: ArrayData): ArrayData = {
    val v = vA.toDoubleArray()
    val kk = math.min(k, mat.length)
    val bd = new Array[Double](kk)
    val bc = new Array[Int](kk)
    var filled = 0
    var c = 0
    while (c < mat.length) {
      val ctr = mat(c)
      val n = math.min(v.length, ctr.length)
      var vc = 0.0
      var i = 0
      while (i < n) { vc += v(i) * ctr(i); i += 1 }
      val d = cc(c) - 2.0 * vc
      // insertion with STRICT < : cells arrive in ascending order, so
      // an equal-distance newcomer stays after the incumbent — the
      // (cdist asc, cell asc) tiebreak of the window form
      if (filled < kk || d < bd(filled - 1)) {
        var p = if (filled < kk) filled else kk - 1
        while (p > 0 && d < bd(p - 1)) { bd(p) = bd(p - 1); bc(p) = bc(p - 1); p -= 1 }
        bd(p) = d; bc(p) = c
        if (filled < kk) filled += 1
      }
      c += 1
    }
    new GenericArrayData(bc.take(filled).map(x => x: Any))
  }

  override def nullSafeEval(vA: Any, cA: Any, aA: Any): Any =
    select(vA.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topCells", this, classOf[TopCells].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) => s"${ev.value} = $ref.select($v);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
