package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One packed word of a 32-bucket saturating character histogram:
  * bucket = codePoint mod 32, counters saturate at 15, word w holds
  * buckets [16w, 16w+16) as 16 4-bit counters (counter b at bits
  * [4b, 4b+4)). The companion of [[NibbleL1]] — together they form
  * the edit-distance family's lossless candidate filter (see
  * graft.dedup.Dedup.edKeys for the L1/2 ≤ ed argument).
  *
  * Why an expression and not composed SQL: the first implementation
  * built each word from 16 `filter(split(k, ''), ...)` HOF passes —
  * 32 interpreted lambda traversals and array allocations per row,
  * measured ~1.5-2 s per edit-family query at sf0.1 (a 2-3x floor
  * move). This is one codegen'd pass over the string per word.
  * Buckets count CODE POINTS (surrogate-aware), matching what one
  * levenshtein edit can move: one unit in, one unit out.
  */
case class CharHistWord(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_char_hist expects (string, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_char_hist"

  override def nullSafeEval(s: Any, w: Any): Any =
    CharHistWord.pack(s.asInstanceOf[UTF8String].toString,
      w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w) =>
      s"${ev.value} = graft.functions.CharHistWord.pack($s.toString(), $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CharHistWord {
  /** Reference implementation shared by interpreted eval, codegen
    * (called from generated code — keep signature stable), and specs. */
  def pack(s: String, word: Int): Long = {
    val lo = word * 16
    var out = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val b = cp % 32
      if (b >= lo && b < lo + 16) {
        val sh = (b - lo) * 4
        if (((out >>> sh) & 15L) < 15L) out += 1L << sh
      }
      i += Character.charCount(cp)
    }
    out
  }
}
