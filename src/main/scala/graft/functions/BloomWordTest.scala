package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-bitmap membership probe against a BROADCAST bitmap.
  *
  * `child` is a bit position in [0, mBits) (the caller computes it with
  * codegen'd xxhash64+pmod columns); the expression tests that bit in
  * the broadcast `long[]` bitmap. This is the large-bitmap twin of
  * `BloomJoin.mightContain`'s array-literal word test: above
  * `BloomJoin.BroadcastThresholdBytes` an inline literal would bloat
  * every serialized task (and every explain string) by the full bitmap,
  * while a broadcast ships it to each executor once via torrent. Only
  * the broadcast HANDLE lives in the expression tree, so the plan stays
  * compact; the generated code hoists `bits.value()` into init and the
  * per-row work is one index + mask — identical to the literal path,
  * still inside whole-stage codegen.
  */
case class BloomWordTest(child: Expression, bits: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_test expects a bigint bit position, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_test"

  override def nullSafeEval(b: Any): Any = {
    val bit = b.asInstanceOf[Long]
    (bits.value((bit >>> 6).toInt) & (1L << (bit & 63))) != 0L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBloomBc", bits,
      classOf[Broadcast[_]].getName)
    // fetch the bitmap once per task, not per row (value() memoizes,
    // but the member read is still cheaper than the call in the loop)
    val words = ctx.addMutableState("long[]", "graftBloomWords",
      v => s"$v = (long[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = ($words[(int)($b >>> 6)] & (1L << ($b & 63))) != 0L;")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
