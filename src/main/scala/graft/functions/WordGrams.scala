package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The capped word-w-gram array of a document — the corpus family's
  * shared gram generator (`Dedup.gramExpr`): space-split tokens,
  * grams = concat_ws(' ', toks[i..i+w)) for i in 1..min(max(n-w+1,1),
  * 8191).
  *
  * Why an expression: the composed form
  * `transform(array(split(text,' ')), toks -> transform(sequence(...),
  * i -> concat_ws(' ', slice(toks, i, w))))[0]` is a CodegenFallback
  * higher-order function — per-gram interpreted lambda dispatch plus a
  * fresh slice allocation per start (the r22 stage audit put ~12 s of
  * summed task CPU on each of stream_curated's three gram stages at
  * sf0.1). This is one node whose generated code calls a static loop
  * over the SAME UTF8String.split / concatWs kernels the composed
  * expressions bottom out in, so the gram array is byte-identical
  * (FunctionsSpec pins it against the HOF form on adversarial token
  * layouts) and the enclosing stage stays in whole-stage codegen.
  */
case class WordGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType &&
        right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_word_grams expects (string, int literal), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_grams"

  override def nullSafeEval(t: Any, w: Any): Any =
    WordGrams.compute(t.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) =>
      s"${ev.value} = graft.functions.WordGrams.compute($t, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordGrams {

  private val Space = UTF8String.fromString(" ")

  /** Position cap shared with the oracle's `range(1, 8192)` tables
    * (CLAUDE.md invariant 6). */
  private val MaxStarts = 8191

  /** Reference implementation shared by interpreted eval, codegen
    * (called from generated code — keep signature stable), and specs.
    * Tokenization is the same UTF8String.split(" ", -1) call the
    * StringSplit expression makes, and grams are the same
    * UTF8String.concatWs the ConcatWs expression makes, so the output
    * is byte-identical to the composed transform/slice form. */
  def compute(text: UTF8String, width: Int): ArrayData = {
    val toks = text.split(Space, -1)
    val n = toks.length
    val cnt = math.min(math.max(n - (width - 1), 1), MaxStarts)
    val out = new Array[AnyRef](cnt)
    var i = 0
    while (i < cnt) {
      val end = math.min(i + width, n)
      if (end - i == 1) out(i) = toks(i)
      else out(i) = UTF8String.concatWs(
        Space, java.util.Arrays.copyOfRange(toks, i, end): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
