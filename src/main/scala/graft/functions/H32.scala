package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The library's 32-bit content hash — the first 4 md5 digest bytes as
  * an unsigned big-endian long, bit-identical to the composed form
  * `conv(substring(md5(cast(x AS BINARY)), 1, 8), 16, 10)::LONG` it
  * replaces (the first 8 hex chars ARE the first 4 digest bytes) and
  * to the DuckDB oracle's `('0x'||substr(md5(x),1,8))::BIGINT`
  * (invariant 4; H32Spec property-tests the equivalence).
  *
  * Why an expression and not the composed SQL: the composed form pays
  * four string operations per value AFTER the digest — hex-encode the
  * full 16-byte digest to a 32-char string, substring 8 chars, `conv`
  * base-16 → a DECIMAL STRING, then parse that string back to a long.
  * h32 runs once per exploded span/gram/shingle in every hash-keyed
  * family (tens of millions of values per query at 10x), where the
  * digest is the only part that does work. This is digest → 4 bytes →
  * long in one codegen'd call, with a thread-local MessageDigest so
  * the per-value cost is the md5 block transform alone.
  */
case class H32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h32 expects string or binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h32"

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => H32.hash(s.getBytes)
    case b: Array[Byte] => H32.hash(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (child.dataType == StringType)
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.H32.hash($s.getBytes());")
    else
      nullSafeCodeGen(ctx, ev, b =>
        s"${ev.value} = graft.functions.H32.hash($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object H32 {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Reference implementation shared by interpreted eval, codegen
    * (called from generated code — keep signature stable), and specs. */
  def hash(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(bytes)
    ((b(0) & 255L) << 24) | ((b(1) & 255L) << 16) |
      ((b(2) & 255L) << 8) | (b(3) & 255L)
  }
}
