package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** As-of (point-in-time) join: for each event, the most recent order of
  * the same customer at or before the event time. Spark has no native
  * as-of join; rather than a custom SparkPlan, this composes the
  * union-and-carry-forward pattern: tag both sides, sort within key by
  * (time, side), and carry the last order attributes forward with
  * last(_, ignoreNulls) over an unbounded-preceding window — one
  * shuffle on the key, no per-row probing. DuckDB's native ASOF JOIN is
  * the oracle, which makes this an independent cross-check of the
  * semantics.
  *
  * Orders are first deduped to one per (custkey, orderdate) — keeping
  * the highest orderkey — so the as-of match is unique and both engines
  * agree on ties.
  */
object AsOf {

  def eventsAsOfOrders(t: Tables): DataFrame = {
    import t.spark.implicits._
    val dedup = Window.partitionBy($"o_custkey", $"o_orderdate")
      .orderBy($"o_orderkey".desc)
    val ord = t.orders
      .withColumn("rn", row_number().over(dedup)).filter($"rn" === 1)
      .select($"o_custkey".as("key"), $"o_orderdate".as("t"),
        lit(1).as("is_order"), $"o_orderkey", $"o_totalprice",
        lit(null).cast("long").as("event_id"))
    val ev = t.events
      .select($"user_id".as("key"), $"ts".as("t"),
        lit(0).as("is_order"), lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("double").as("o_totalprice"), $"event_id")

    // order rows sort before events at equal t (as-of is inclusive)
    val w = Window.partitionBy($"key").orderBy($"t".asc, $"is_order".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pinned width: the union is ~60 B rows, so AQE's byte-based
    // coalescing shrank the keyed window exchange to 3 tasks at sf0.1
    // (r22 stage audit) — the q32/signWords compute-amplified-stage
    // rule; HashPartitioning(key) satisfies the window's distribution,
    // so this replaces the exchange rather than adding one
    ord.unionByName(ev)
      .repartition(t.spark.sparkContext.defaultParallelism, $"key")
      .withColumn("m_orderkey", last($"o_orderkey", ignoreNulls = true).over(w))
      .withColumn("m_totalprice", last($"o_totalprice", ignoreNulls = true).over(w))
      .filter($"is_order" === 0 && $"m_orderkey".isNotNull)
      .select($"event_id", $"key".as("user_id"),
        $"m_orderkey".as("o_orderkey"), $"m_totalprice".as("o_totalprice"))
  }

  /** NEAREST-direction as-of (pandas merge_asof direction='nearest'):
    * for each event, the same customer's order minimizing
    * |ts − orderdate|, ties to the EARLIER order. Distinct semantics
    * from the backward join above: an event whose only orders lie in
    * the FUTURE still matches (attribution backfill for users whose
    * first order follows their first activity), which `t >= orderdate`
    * structurally cannot express.
    *
    * Same one-shuffle union-and-carry shape, run in BOTH directions:
    * the backward window carries the last order forward, the mirrored
    * frame (currentRow..unboundedFollowing) carries the next order
    * backward, and a per-row integer-microsecond compare picks the
    * closer side — no per-event probing, no range join. The µs
    * arithmetic is exact (invariant 11), so the tie compare
    * (prev-gap ≤ next-gap, mirroring the oracle's ORDER BY distance,
    * order-time) is an integer decision on both engines. A same-time
    * order sorts before its event and is picked up by the backward
    * carry at distance 0 — unbeatable, so the forward frame's
    * exclusion of it is immaterial.
    */
  def eventsAsOfNearest(t: Tables): DataFrame = {
    import t.spark.implicits._
    val dedup = Window.partitionBy($"o_custkey", $"o_orderdate")
      .orderBy($"o_orderkey".desc)
    val ord = t.orders
      .withColumn("rn", row_number().over(dedup)).filter($"rn" === 1)
      .select($"o_custkey".as("key"), $"o_orderdate".as("t"),
        lit(1).as("is_order"), $"o_orderkey", $"o_totalprice",
        lit(null).cast("long").as("event_id"))
    val ev = t.events
      .select($"user_id".as("key"), $"ts".as("t"),
        lit(0).as("is_order"), lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("double").as("o_totalprice"), $"event_id")
    val wPrev = Window.partitionBy($"key").orderBy($"t".asc, $"is_order".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy($"key").orderBy($"t".asc, $"is_order".desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val ot = when($"is_order" === 1, $"tt")
    // pinned width — same r22 stage-audit finding as eventsAsOfOrders
    ord.unionByName(ev)
      .repartition(t.spark.sparkContext.defaultParallelism, $"key")
      .withColumn("tt", unix_micros($"t".cast("timestamp")))
      .withColumn("pk", last($"o_orderkey", ignoreNulls = true).over(wPrev))
      .withColumn("pp", last($"o_totalprice", ignoreNulls = true).over(wPrev))
      .withColumn("pt", last(ot, ignoreNulls = true).over(wPrev))
      .withColumn("nk", first($"o_orderkey", ignoreNulls = true).over(wNext))
      .withColumn("np", first($"o_totalprice", ignoreNulls = true).over(wNext))
      .withColumn("nt", first(ot, ignoreNulls = true).over(wNext))
      .filter($"is_order" === 0 && ($"pk".isNotNull || $"nk".isNotNull))
      .withColumn("usePrev",
        $"pk".isNotNull && ($"nk".isNull || ($"tt" - $"pt") <= ($"nt" - $"tt")))
      .select($"event_id", $"key".as("user_id"),
        when($"usePrev", $"pk").otherwise($"nk").as("o_orderkey"),
        when($"usePrev", $"pp").otherwise($"np").as("o_totalprice"))
  }

  /** TOLERANCE-bounded as-of (pandas merge_asof's third knob): the
    * backward join, but a match older than `toleranceMicros` is
    * discarded — "most recent order, unless it's gone stale". Same
    * one-shuffle union-and-carry as [[eventsAsOfOrders]] with the
    * matched order's event-time carried alongside its attributes; the
    * staleness gate is a single integer-microsecond compare (exact on
    * both engines, invariant 11), applied AFTER the carry — semantics
    * are "the as-of match, filtered", not "the nearest in-window
    * order", exactly like pandas: an event whose latest order is too
    * old matches NOTHING even if an older window would contain one.
    * The default window (8400 days) is calibrated to SPLIT the
    * testdata's gap distribution (events 2024, orders 1995–2001 →
    * backward gaps of ~8200–9200 days; the median is ~8370), so the
    * gate genuinely partitions the matches instead of passing or
    * dropping everything.
    */
  /** The calibrated default staleness window (8400 days in µs) —
    * shared between [[eventsAsOfTolerance]]'s default parameter and
    * [[eventsAsOfToleranceSql]]'s interpolated literal so the two
    * cannot drift (a non-default `toleranceMicros` still diverges from
    * the registered oracle by design: the oracle pins the default).
    */
  val DefaultToleranceMicros: Long = 8400L * 86400 * 1000000

  def eventsAsOfTolerance(t: Tables,
                          toleranceMicros: Long = DefaultToleranceMicros): DataFrame = {
    import t.spark.implicits._
    val dedup = Window.partitionBy($"o_custkey", $"o_orderdate")
      .orderBy($"o_orderkey".desc)
    val ord = t.orders
      .withColumn("rn", row_number().over(dedup)).filter($"rn" === 1)
      .select($"o_custkey".as("key"), $"o_orderdate".as("t"),
        lit(1).as("is_order"), $"o_orderkey", $"o_totalprice",
        lit(null).cast("long").as("event_id"))
    val ev = t.events
      .select($"user_id".as("key"), $"ts".as("t"),
        lit(0).as("is_order"), lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("double").as("o_totalprice"), $"event_id")
    val w = Window.partitionBy($"key").orderBy($"t".asc, $"is_order".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ot = when($"is_order" === 1, $"tt")
    // pinned width — same r22 stage-audit finding as eventsAsOfOrders
    ord.unionByName(ev)
      .repartition(t.spark.sparkContext.defaultParallelism, $"key")
      .withColumn("tt", unix_micros($"t".cast("timestamp")))
      .withColumn("m_orderkey", last($"o_orderkey", ignoreNulls = true).over(w))
      .withColumn("m_totalprice", last($"o_totalprice", ignoreNulls = true).over(w))
      .withColumn("m_t", last(ot, ignoreNulls = true).over(w))
      .filter($"is_order" === 0 && $"m_orderkey".isNotNull &&
        $"tt" - $"m_t" <= toleranceMicros)
      .select($"event_id", $"key".as("user_id"),
        $"m_orderkey".as("o_orderkey"), $"m_totalprice".as("o_totalprice"))
  }

  /** Oracle: DuckDB's native ASOF JOIN plus the same integer-µs
    * staleness filter (the literal is pre-multiplied Scala-side from
    * [[DefaultToleranceMicros]] — DuckDB folds small-int products in
    * INT32, invariant 10). */
  val eventsAsOfToleranceSql: String =
    s"""WITH ord AS (
      | SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
      |  FROM orders) WHERE rn = 1)
      |SELECT e.event_id, e.user_id, ord.o_orderkey, ord.o_totalprice
      |FROM events e ASOF JOIN ord
      | ON e.user_id = ord.o_custkey AND e.ts >= ord.o_orderdate
      |WHERE epoch_us(e.ts) - epoch_us(ord.o_orderdate) <= $DefaultToleranceMicros""".stripMargin.replace("\n", " ")

  /** Oracle: the naive per-event minimum over the customer's orders —
    * tiny per-user order lists make the quadratic form cheap at oracle
    * scale; the Spark side is the one-shuffle carry. */
  val eventsAsOfNearestSql: String =
    """WITH ord AS (
      | SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
      |  FROM orders) WHERE rn = 1),
      |j AS (SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
      |  abs(epoch_us(e.ts) - epoch_us(o.o_orderdate)) AS d,
      |  epoch_us(o.o_orderdate) AS ot
      | FROM events e JOIN ord o ON e.user_id = o.o_custkey)
      |SELECT event_id, user_id, o_orderkey, o_totalprice FROM (
      | SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY d, ot) AS rn FROM j)
      |WHERE rn = 1""".stripMargin.replace("\n", " ")

  val eventsAsOfOrdersSql: String =
    """WITH ord AS (
      | SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
      |  FROM orders) WHERE rn = 1)
      |SELECT e.event_id, e.user_id, ord.o_orderkey, ord.o_totalprice
      |FROM events e ASOF JOIN ord
      | ON e.user_id = ord.o_custkey AND e.ts >= ord.o_orderdate""".stripMargin.replace("\n", " ")
}
