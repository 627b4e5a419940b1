package graft

import java.sql.Timestamp

import graft.ops.AsOf

class AsOfSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** orders: customer 1 has orders on day 1 and day 5 (two on day 5 —
    * dedup keeps orderkey 12); customer 2 has one order after all
    * events.
    */
  private lazy val t = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    tempTables { dir =>
      Seq(
        (10L, 1L, ts("2020-01-01 00:00:00"), 100.0),
        (11L, 1L, ts("2020-01-05 00:00:00"), 200.0),
        (12L, 1L, ts("2020-01-05 00:00:00"), 300.0), // same day, higher key wins
        (13L, 2L, ts("2030-01-01 00:00:00"), 400.0)
      ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .write.parquet(s"$dir/orders.parquet")
      Seq(
        (1000L, 1L, ts("2020-01-03 00:00:00")), // between orders → matches 10
        (1001L, 1L, ts("2020-01-05 00:00:00")), // same instant → inclusive → 12
        (1002L, 1L, ts("2020-02-01 00:00:00")), // after both → 12
        (1003L, 2L, ts("2020-01-01 00:00:00")), // before cust 2's order → dropped
        (1004L, 3L, ts("2020-01-01 00:00:00"))  // no orders at all → dropped
      ).toDF("event_id", "user_id", "ts")
        .write.parquet(s"$dir/events.parquet")
    }
  }

  test("as-of join picks the latest order at or before each event") {
    val got = AsOf.eventsAsOfOrders(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      1000L -> (10L, 100.0),
      1001L -> (12L, 300.0),
      1002L -> (12L, 300.0)))
  }

  test("nearest as-of picks the closer side, ties to earlier, matches future-only users") {
    val got = AsOf.eventsAsOfNearest(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      // Jan 3 sits 2 days after order 10 and 2 days before order 12 —
      // an exact tie, broken toward the EARLIER order
      1000L -> (10L, 100.0),
      1001L -> (12L, 300.0), // distance 0: same-instant order
      1002L -> (12L, 300.0), // only past orders are nearer
      // cust 2's sole order is in the FUTURE: backward as-of drops this
      // event, nearest matches it — the semantic the variant exists for
      1003L -> (13L, 400.0)))
    // user 3 (no orders) still yields nothing
    assert(!got.contains(1004L))
  }

  test("tolerance as-of keeps the backward match only while it is fresh") {
    // 10-day window: the Jan 3 and Jan 5 events keep their matches
    // (gaps 2 and 0 days); the Feb 1 event's latest order (Jan 5) is 27
    // days stale -> dropped, NOT replaced by any other order
    val tenDays = 10L * 86400 * 1000000
    val got = AsOf.eventsAsOfTolerance(t, toleranceMicros = tenDays).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      1000L -> (10L, 100.0),
      1001L -> (12L, 300.0)))
    // the boundary is inclusive: a window of exactly the 2-day gap keeps 1000
    val twoDays = 2L * 86400 * 1000000
    val tight = AsOf.eventsAsOfTolerance(t, toleranceMicros = twoDays).collect()
      .map(r => r.getLong(0)).toSet
    assert(tight == Set(1000L, 1001L))
  }
}
