package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** `nWords` packed 64-bit sign words of an embedding under
  * hash-derived Rademacher (±1) hyperplanes — the signed-random-
  * projection (SRP / hyperplane-LSH, Charikar STOC'02) signature the
  * IVF pair family's in-cell band pruning keys on
  * (graft.sim.Similarity.embeddingNearDupIvf, regime B).
  *
  * Bit `b` of word `w` is `sign(Σ_d s(w,b,d)·v[d]) > 0`, where the
  * sign pattern `s(w,b,·)` is the 64-bit splitmix64 mask of the
  * (w,b) index under a FROZEN seed — no fitted model, no broadcast:
  * any executor (and any future session) derives the identical
  * hyperplanes, the same determinism contract as annLsh's md5
  * hyperplanes. For a ±1 hyperplane the collision probability of a
  * pair at angle θ is the standard 1 − θ/π per bit (Rademacher
  * projections obey the same Goemans–Williamson bound in expectation;
  * the band-knob derivation in Similarity.pairBandKnobsFor consumes
  * exactly that). Masks repeat past dimension 64 (`d mod 64`) — the
  * embeddings contract is 64-dim; for wider vectors the fold simply
  * reuses signs, which weakens independence but stays a valid LSH.
  *
  * Why an expression: one sign word as composed SQL is a 64-term
  * CASE chain (the r16 signWord deopt pathology — see
  * Similarity.signWords); tens of words for the band family would be
  * thousands of Catalyst nodes. This is one node whose generated code
  * calls a static packed loop (same shape as [[CharHistWord]]), so it
  * stays inside whole-stage codegen at any word count.
  */
case class SrpWords(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okLeft = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (okLeft && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_srp_words expects (array<double>, int literal), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_srp_words"

  override def nullSafeEval(a: Any, n: Any): Any =
    new GenericArrayData(
      SrpWords.pack(a.asInstanceOf[ArrayData], n.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.SrpWords.pack($a, $n));")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SrpWords {

  /** FROZEN hyperplane seed — changing it silently re-keys every
    * banded pair family (rows-only outputs, so only the recorded
    * recall measurements would drift, but keep it fixed). */
  private val Seed = 0x9e3779b97f4a7c15L

  private def splitmix64(x0: Long): Long = {
    var x = x0 + Seed
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  // sign masks for (word, bit) pairs, grown on demand; index = w*64+b
  @volatile private var maskCache: Array[Long] = Array.emptyLongArray

  /** Deterministic sign masks for the first `nWords` words. */
  def masks(nWords: Int): Array[Long] = {
    val need = nWords * 64
    var m = maskCache
    if (m.length < need) synchronized {
      m = maskCache
      if (m.length < need) {
        m = Array.tabulate(need)(i => splitmix64(i.toLong))
        maskCache = m
      }
    }
    m
  }

  /** Reference implementation shared by interpreted eval, codegen
    * (called from generated code — keep signature stable), and specs. */
  def pack(arr: ArrayData, nWords: Int): Array[Long] = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var d = 0
    while (d < n) { v(d) = arr.getDouble(d); d += 1 }
    val m = masks(nWords)
    val out = new Array[Long](nWords)
    var w = 0
    while (w < nWords) {
      var word = 0L
      var b = 0
      while (b < 64) {
        val mask = m(w * 64 + b)
        var acc = 0.0
        d = 0
        while (d < n) {
          val x = v(d)
          acc += (if (((mask >>> (d & 63)) & 1L) == 1L) x else -x)
          d += 1
        }
        if (acc > 0) word |= (1L << b)
        b += 1
      }
      out(w) = word
      w += 1
    }
    out
  }
}
