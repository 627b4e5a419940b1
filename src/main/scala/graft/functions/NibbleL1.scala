package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** L1 distance between two longs read as 16 packed 4-bit counters:
  * Σ_i |nibble_i(a) − nibble_i(b)|.
  *
  * Built for the edit-distance family's candidate filter: each doc key
  * carries saturating character-histogram counts packed 16-per-long
  * (graft.dedup.Dedup.edKeys), and for bucketed saturating histograms
  * L1/2 is a LOWER bound on edit distance — so `NibbleL1 > 2·d` rejects
  * a candidate pair without running the O(|k|·d) banded levenshtein.
  * The filter sits inside the compute-amplified block-join stage, which
  * is exactly where CLAUDE.md bans oversized expression trees: the
  * equivalent composed-SQL form is ~100 Catalyst nodes per word (16 ×
  * shift/mask/abs), enough to push the stage off the compiled path like
  * the r16 signWord CASE chain did. As a custom expression it is one
  * node, a 16-iteration counted loop the JIT unrolls, and stays inside
  * whole-stage codegen.
  */
case class NibbleL1(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nibble_l1 expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nibble_l1"

  override def nullSafeEval(a: Any, b: Any): Any =
    NibbleL1.l1(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh names: two NibbleL1 calls can land in one codegen function
    val sum = ctx.freshName("nibbleSum")
    val i = ctx.freshName("nibbleI")
    val va = ctx.freshName("nibbleA")
    val vb = ctx.freshName("nibbleB")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""int $sum = 0;
         |for (int $i = 0; $i < 64; $i += 4) {
         |  int $va = (int) (($a >>> $i) & 15L);
         |  int $vb = (int) (($b >>> $i) & 15L);
         |  $sum += $va > $vb ? $va - $vb : $vb - $va;
         |}
         |${ev.value} = $sum;""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NibbleL1 {
  /** Reference implementation shared by interpreted eval and specs. */
  def l1(a: Long, b: Long): Int = {
    var s = 0
    var i = 0
    while (i < 64) {
      val va = ((a >>> i) & 15L).toInt
      val vb = ((b >>> i) & 15L).toInt
      s += math.abs(va - vb)
      i += 4
    }
    s
  }
}
