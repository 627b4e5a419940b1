package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col

import graft.io.Tables

/** Typed custom aggregates (`Aggregator[IN, BUF, OUT]`) — the Spark
  * surface for the reference's juice-side folds (SURVEY.md §2.2 D3):
  * arbitrary per-key accumulation in Scala with a mergeable buffer,
  * instead of a Python subprocess folding a key's value file.
  */
object Aggs {

  /** Exact monetary/quantity sum: doubles quantized to 4 decimal places
    * (same HALF_UP quantization as a CAST to DECIMAL(18,4)) accumulated
    * in scaled-long units — overflow-safe to ~9e14 units and mergeable
    * associatively, then converted to double once at finish. Matches
    * the engine-portable decimal-sum pattern bitwise.
    */
  def decimalSumOf[T](f: T => Double): Aggregator[T, Long, Double] =
    new Aggregator[T, Long, Double] {
      override def zero: Long = 0L
      override def reduce(b: Long, a: T): Long =
        b + JBigDecimal.valueOf(f(a)).setScale(4, RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
      override def merge(b1: Long, b2: Long): Long = b1 + b2
      override def finish(units: Long): Double =
        new JBigDecimal(java.math.BigInteger.valueOf(units), 4).doubleValue()
      override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Plain Double form. */
  val decimalSum: Aggregator[Double, Long, Double] = decimalSumOf[Double](identity)

  // public: the Catalyst-generated encoder code must reach this class
  final case class LiSlice(l_returnflag: String, l_linestatus: String,
                           l_quantity: Double)

  /** q1-shaped sum through the typed Aggregator surface — oracle-backed
    * proof that custom typed folds reproduce the declarative result.
    */
  def typedSumQuery(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.lineitem
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      .as[LiSlice]
      .groupByKey(r => (r.l_returnflag, r.l_linestatus))
      .agg(decimalSumOf[LiSlice](_.l_quantity).toColumn.name("sum_qty"))
      .select(col("key._1").as("l_returnflag"), col("key._2").as("l_linestatus"),
        col("sum_qty"))
  }

  val typedSumSql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " ")
}
