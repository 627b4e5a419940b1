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

  /** Map-side-combinable per-group top-k: a bounded buffer of the k
    * best (value desc, id asc — total order) pairs, trimmed on every
    * reduce/merge. This is the scale-correct alternative to the
    * `row_number() OVER (PARTITION BY g ORDER BY ...)` window for
    * SMALL k over LARGE groups: the window shuffles and sorts every
    * row of every group (a hot group = one reducer sorting its full
    * volume), while this buffer ships at most k pairs per (partition,
    * group) into the exchange — the per-group analog of what
    * TakeOrderedAndProject does globally for q8. State is O(k) per
    * group per task by construction.
    *
    * Ordering matches SQL `ORDER BY v DESC, id ASC` on the IEEE
    * corners too: the comparator is `java.lang.Double.compare(b, a)` —
    * NOT `sortBy(-v)`, whose negation maps every NaN to NaN and so
    * loses DESC's NaN-ranks-first placement, and flips -0.0/0.0.
    * Under Double.compare, NaN > +Inf, so NaN rows rank FIRST in DESC
    * — exactly Spark's and DuckDB's sort order. Residual caveat: SQL
    * engines compare -0.0 = 0.0 (tie broken by id), while
    * Double.compare distinguishes them (0.0 ranks above -0.0); only a
    * group holding BOTH signed zeros with adversarial ids can diverge,
    * and no shipped query produces signed zeros.
    */
  def topKOf[T](k: Int)(value: T => Double, id: T => Long): Aggregator[T, Seq[(Double, Long)], Seq[(Double, Long)]] =
    new Aggregator[T, Seq[(Double, Long)], Seq[(Double, Long)]] {
      private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
        def compare(x: (Double, Long), y: (Double, Long)): Int = {
          val c = java.lang.Double.compare(y._1, x._1) // v DESC, -0.0 < 0.0
          if (c != 0) c else java.lang.Long.compare(x._2, y._2) // id ASC
        }
      }
      private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
        s.sorted(ord).take(k)
      override def zero: Seq[(Double, Long)] = Seq.empty
      override def reduce(b: Seq[(Double, Long)], a: T): Seq[(Double, Long)] =
        trim(b :+ ((value(a), id(a))))
      override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
        trim(b1 ++ b2)
      override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(b)
      override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
      override def outputEncoder: Encoder[Seq[(Double, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    }

  final case class OrderSlice(o_orderpriority: String, o_totalprice: Double,
                              o_orderkey: Long)

  /** Top-3 orders by price per priority through the bounded-buffer
    * Aggregator; the exploded (rank, key, price) rows hash-match the
    * row_number-window oracle because the buffer order is total
    * (price desc, orderkey asc) and prices pass through unmodified.
    */
  def topKPerGroupQuery(t: Tables): DataFrame = {
    import t.spark.implicits._
    import org.apache.spark.sql.functions.posexplode
    t.orders
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .as[OrderSlice]
      .groupByKey(_.o_orderpriority)
      .agg(topKOf[OrderSlice](3)(_.o_totalprice, _.o_orderkey).toColumn.name("top"))
      .toDF("prio", "top")
      .select(col("prio"), posexplode(col("top")))
      .select(col("prio"), (col("pos") + 1).cast("long").as("rnk"),
        col("col._2").as("o_orderkey"), col("col._1").as("price"))
  }

  val topKPerGroupSql: String =
    """SELECT o_orderpriority AS prio, rnk, o_orderkey, price FROM (
      | SELECT o_orderpriority,
      |  row_number() OVER (PARTITION BY o_orderpriority
      |   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk,
      |  o_orderkey, o_totalprice AS price
      | FROM orders)
      |WHERE rnk <= 3""".stripMargin.replace("\n", " ")
}
