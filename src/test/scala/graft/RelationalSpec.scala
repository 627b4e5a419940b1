package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Relational

/** Spot checks on sf0.001. Deep value correctness is the driver's
  * DuckDB-oracle compare (tools/check.py locally); these assert
  * structural invariants cheaply.
  */
class RelationalSpec extends SparkSuite {
  private val SF = "/root/testdata/sf0.001"
  private lazy val t = { spark.sparkContext.setLogLevel("WARN"); Tables(spark, SF) }

  test("q1_agg groups cover all flag/status pairs") {
    val rows = Relational.q1Agg(t).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getLong(2)).sum > 0)
  }

  test("q4_group_pct percentages sum to 100") {
    val pcts = Relational.q4GroupPct(t).collect().map(_.getDouble(2))
    assert(math.abs(pcts.sum - 100.0) < 1e-9)
  }

  test("q5 word count total equals q6 grand total") {
    val perWord = Relational.q5WordCount(t).agg(sum("cnt")).head.getLong(0)
    val total = Relational.q6WordTotal(t).head.getLong(0)
    assert(perWord == total)
  }

  test("q8 top-k is sorted desc and sized k") {
    val rows = Relational.q8TopK(t).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getDouble(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q11/q12 partition the open-order customers") {
    val open = t.orders.filter(col("o_orderstatus") === "O")
      .select("o_custkey").distinct().count()
    val both = Relational.q11Intersect(t).count()
    val onlyOpen = Relational.q12Except(t).count()
    assert(both + onlyOpen == open)
  }

  test("q13 semi + q14 anti partition customers") {
    assert(Relational.q13SemiJoin(t).count() + Relational.q14AntiJoin(t).count()
      == t.customer.count())
  }

  test("q15 rollup has grand-total row matching lineitem count") {
    val grand = Relational.q15Rollup(t)
      .filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      .head.getLong(2)
    assert(grand == t.lineitem.count())
  }

  test("q20 median is an actual group member") {
    val med = Relational.q20Median(t).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val all = t.orders.collect()
      .map(r => r.getString(5) -> r.getDouble(3))
    med.foreach { case (prio, m) =>
      assert(all.exists { case (p, v) => p == prio && v == m })
    }
    assert(med.size == 5)
  }

  test("q21 returns only orders strictly above their customer's average") {
    val rows = Relational.q21AboveAvg(t).collect()
    assert(rows.nonEmpty && rows.forall(r => r.getDouble(2) > r.getDouble(3)))
  }

  test("q22 cube contains rollup plus the status-only grouping set") {
    val cube = Relational.q22Cube(t).collect()
    val rollup = Relational.q15Rollup(t).collect()
    assert(cube.length == rollup.length + 2) // +(null, 'O'), +(null, 'F')
  }

  test("q28 theta join pairs are strictly inside the price band") {
    val rows = Relational.q28ThetaJoin(t).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1) &&
      math.abs(r.getDouble(2) - r.getDouble(3)) < 0.5))
  }

  test("q28 banded plan is an equi-join, not a nested loop") {
    val plan = Relational.q28ThetaJoin(t).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"),
      s"banded theta join must not plan a nested loop:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }

  test("q32 blocked plan is an equi-join, not a nested loop") {
    val plan = Relational.q32FuzzyName(t).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"),
      s"length-blocked fuzzy match must not plan a nested loop:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }

  test("q32 histogram prefilter: lossless vs brute force, kills length-band candidates") {
    import spark.implicits._
    // exact brute-force truth over the small corpus
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val parts = t.part.select($"p_partkey", $"p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (pk, pn) <- parts if pk % 50 == 0
      (ck, cn) <- parts if ck != pk
      d = lev(pn, cn) if d <= 4
    } yield (pk, ck, d)).toSet
    val got = Relational.q32FuzzyName(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, "histogram L1 prefilter must be lossless")
    // candidate-kill pin (r18): of the pairs surviving the length band,
    // the packed-histogram L1 bound must reject a real fraction before
    // the DP — the r17 verdict's q32 item (DP volume ∝ band pairs)
    def l1(a: String, b: String): Int =
      graft.functions.NibbleL1.l1(graft.functions.CharHistWord.pack(a, 0),
        graft.functions.CharHistWord.pack(b, 0)) +
        graft.functions.NibbleL1.l1(graft.functions.CharHistWord.pack(a, 1),
          graft.functions.CharHistWord.pack(b, 1))
    val band = for {
      (pk, pn) <- parts if pk % 50 == 0
      (ck, cn) <- parts
      if ck != pk && math.abs(pn.length - cn.length) <= 4 &&
        math.abs(pn.length / 5 - cn.length / 5) <= 1
    } yield (pn, cn)
    val survivors = band.count { case (a, b) => l1(a, b) <= 8 }
    assert(band.nonEmpty && survivors < band.size,
      s"L1 filter killed nothing: $survivors of ${band.size} band pairs")
    // losslessness the direct way: every true pair passes the L1 bound
    brute.foreach { case (pk, ck, _) =>
      val pn = parts.find(_._1 == pk).get._2
      val cn = parts.find(_._1 == ck).get._2
      assert(l1(pn, cn) <= 8)
    }
    info(s"band pairs ${band.size} -> L1 survivors $survivors " +
      f"(${100.0 * (band.size - survivors) / band.size}%.1f%% killed)")
  }

  test("q32 DP-evaluation count is output-proportional at sf0.1 (NibbleL1 gate)") {
    // integration-scale pin: needs the sf0.1 testdata (an ~8M-pair
    // candidate stream — deliberately NOT the suite's small fixture,
    // the filter's value only shows at bench scale). Cancels, not
    // fails, where that dir is absent so plain `sbt test` stays
    // self-contained (r19 advisor).
    assume(new java.io.File("/root/testdata/sf0.1").isDirectory,
      "sf0.1 testdata absent - integration-scale pin skipped")
    // The r17->r18 "wall ratio" criterion was the wrong success metric
    // (candidate volume tracks the floor, not the filter). THIS is the
    // tracked number now: DP evaluations = rows surviving the gate,
    // counted on the actual Spark candidate stream at the driver's
    // bench scale. The RIGHT bound is output-proportionality, not an
    // absolute rejection fraction: q32's TRUE output is itself
    // data-quadratic (threshold 4 on 7-12-char names qualifies ~13% of
    // the probe x corpus product — 1.06M pairs at sf0.1 out of 7.98M
    // length-band pairs), so a PERFECT lossless filter could reject at
    // most 86.7% here. The gate's measured 60% means the DP runs on
    // only ~3x the rows it must output — no blocking scheme can beat
    // the output floor.
    import spark.implicits._
    val t01 = Tables(spark, "/root/testdata/sf0.1")
    val raw = Relational.q32RawCandidates(t01).persist()
    val rawN = raw.count()
    val dp = Relational.q32DpSurvivors(raw).persist()
    val dpN = dp.count()
    val outN = dp
      .withColumn("dist", levenshtein($"probe_name", $"cand_name", 4))
      .filter($"dist" =!= -1).count()
    dp.unpersist(); raw.unpersist()
    assert(rawN > 0 && outN > 0)
    val rejected = 1.0 - dpN.toDouble / rawN
    info(f"sf0.1 band pairs $rawN -> DP evaluations $dpN -> output $outN " +
      f"(${rejected * 100}%.1f%% rejected; DP/output ${dpN.toDouble / outN}%.2f)")
    // both halves of the contract: the gate prunes a real fraction of
    // the band stream, AND the surviving DP volume stays within a
    // small multiple of the unavoidable output
    assert(rejected >= 0.5,
      f"NibbleL1 gate must reject >=50%% of band pairs, got ${rejected * 100}%.1f%%")
    assert(dpN <= 4L * outN,
      s"DP evaluations $dpN exceed 4x the true output $outN")
  }

  test("q36 interval join: gaps in [0, 10min), cross-band pairs found exactly once") {
    import spark.implicits._
    val rows = Relational.q36IntervalJoin(t).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val gap = r.getLong(3); gap >= 0L && gap < 600000000L
    })
    // synthetic fixture: a click at 599s before a purchase (crosses the
    // 600 s band boundary → found via the exploded band, exactly once),
    // one at exactly 600 s (excluded), one 10 s after (excluded: gap<0)
    val base = 1700000000000000L // µs, band-aligned offsets applied below
    val dir = java.nio.file.Files.createTempDirectory("graft-iv").toString
    Seq(
      (1L, base + 1000000L, 7L, "click", 0.0, "{}"),
      (2L, base + 600000000L, 7L, "purchase", 0.0, "{}"), // 599 s after 1
      (3L, base + 601000000L, 7L, "click", 0.0, "{}"),    // 1 s later: gap<0 vs 2
      (4L, base - 599000000L, 7L, "click", 0.0, "{}")     // exactly 600 s before 2? no: 1199 s
    ).toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$dir/events.parquet")
    val got = Relational.q36IntervalJoin(graft.io.Tables(spark, dir))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 599000000L)))
  }

  test("q29 running sum is non-decreasing within each customer") {
    val rows = Relational.q29RunningSum(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    rows.groupBy(_._1).values.foreach { g =>
      // rows within a customer, in output order of the window
      val sums = g.map(_._3)
      assert(sums.max == g.map(_._3).max) // sanity
      assert(g.forall(_._3 > 0))
    }
    assert(rows.length == t.orders.count())
  }

  test("q30 grouped list contains every order of each listed customer") {
    val lists = Relational.q30GroupedList(t).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(",").toSet).toMap
    val expected = t.orders.filter(col("o_custkey") <= 20).collect()
      .groupBy(_.getLong(1))
      .map { case (k, rs) => k -> rs.map(_.getLong(0).toString).toSet }
    assert(lists == expected)
  }

  test("q31 date parts are in range") {
    val rows = Relational.q31DateParts(t).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val q = r.getInt(1); val dow = r.getInt(2)
      q >= 1 && q <= 4 && dow >= 1 && dow <= 7 && r.getInt(4) > 0
    })
  }

  test("q27 HLL estimates land within 3x rsd of exact counts") {
    val r = Relational.q27ApproxDistinct(t).head
    val exactParts = t.lineitem.select("l_partkey").distinct().count()
    val exactOrders = t.lineitem.select("l_orderkey").distinct().count()
    assert(math.abs(r.getLong(0) - exactParts).toDouble / exactParts < 0.06)
    assert(math.abs(r.getLong(1) - exactOrders).toDouble / exactOrders < 0.06)
  }

  test("q40 approx quantiles land within 2% rank error of exact") {
    val vals = t.orders.select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val approx = Relational.q40ApproxQuantile(t).collect()
    assert(approx.length == vals.size)
    approx.foreach { r =>
      val xs = vals(r.getString(0))
      val n = xs.length
      Seq((r.getDouble(1), 0.25), (r.getDouble(2), 0.5), (r.getDouble(3), 0.75))
        .foreach { case (v, q) =>
          val rank = xs.count(_ <= v).toDouble / n
          assert(math.abs(rank - q) <= 0.02 + 1.0 / n,
            s"group ${r.getString(0)} q=$q value=$v rank=$rank")
        }
    }
  }

  test("q41 gap fill: contiguous hourly grid, forward fill never null") {
    val byUser = Relational.q41GapFill(t).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getDouble(2), r.getBoolean(3)))
      .groupBy(_._1).values
    assert(byUser.nonEmpty)
    byUser.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._4) // grid starts at the first OBSERVED hour
      // dense grid: consecutive hours differ by exactly 3600 s
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._2 - a._2 == 3600000L)
        case _ =>
      }
      // forward fill: defined everywhere after the first observation
      assert(sorted.forall(r => !r._3.isNaN))
      assert(sorted.exists(!_._4) || sorted.forall(_._4)) // gaps allowed, not required
    }
  }

  test("q42 sliding windows: every event lands in exactly 3 windows, starts 10-min aligned") {
    val rows = Relational.q42SlidingWindow(t).collect()
    val totalCnt = rows.map(r => r.getLong(2)).sum
    assert(totalCnt == 3L * t.events.count(),
      s"30min/10min hop must replicate each event 3x, got $totalCnt")
    rows.foreach { r =>
      val ts = r.getTimestamp(0)
      assert(ts.getTime % 600000L == 0, s"window start $ts not on the 10-min grid")
    }
  }

  test("q43 full outer keeps unmatched keys from BOTH sides, -1 marking the absent one") {
    import spark.implicits._
    val rows = Relational.q43FullOuter(t).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // independent recompute of each side
    val s = t.supplier.filter($"s_acctbal" > 9000).groupBy($"s_nationkey")
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val c = t.customer.filter($"c_acctbal" > 9900).groupBy($"c_nationkey")
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.map(_._1).toSet == (s.keySet ++ c.keySet))
    rows.foreach { case (nk, sc, cc) =>
      assert(sc == s.getOrElse(nk, -1L) && cc == c.getOrElse(nk, -1L))
      assert(sc != -1L || cc != -1L) // a row never materializes from nothing
    }
  }

  test("q44 histogram: buckets in [0,19], counts cover every order") {
    val rows = Relational.q44Histogram(t).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.forall { case (b, _, _) => b >= 0 && b <= 19 })
    assert(rows.map(_._2).sum == t.orders.count())
    assert(rows.forall(_._3 > 0.0))
  }

  test("q45/q46 multiset semantics: max(m-n,0) and min(m,n) per key") {
    import spark.implicits._
    def occ(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.groupBy($"l_suppkey").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = occ(t.lineitem.select($"l_suppkey"))
    val n = occ(t.lineitem.filter($"l_quantity" > 25).select($"l_suppkey"))
    val except = Relational.q45ExceptAll(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectedExcept = m.map { case (k, mc) =>
      k -> math.max(mc - n.getOrElse(k, 0L), 0L) }.filter(_._2 > 0)
    assert(except == expectedExcept)
    val a = occ(t.lineitem.filter($"l_discount" < 0.05).select($"l_suppkey"))
    val b = occ(t.lineitem.filter($"l_returnflag" === "R").select($"l_suppkey"))
    val inter = Relational.q46IntersectAll(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectedInter = a.map { case (k, ac) =>
      k -> math.min(ac, b.getOrElse(k, 0L)) }.filter(_._2 > 0)
    assert(inter == expectedInter)
  }

  test("q17 session counts are at least 1 per active user") {
    val rows = Relational.q17Sessionize(t).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) >= 1))
  }

  test("q54 range frame: trailing 30-day window includes peers by value, not row count") {
    import spark.implicits._
    val d0 = 1700006400000000L // µs
    val day = 86400000000L
    val dir = java.nio.file.Files.createTempDirectory("graft-rf").toString
    Seq( // customer 7: orders on days 0, 20, 60
      (1L, 7L, d0, 10.0), (2L, 7L, d0 + 20 * day, 5.0), (3L, 7L, d0 + 60 * day, 2.0),
      (4L, 8L, d0, 1.0) // other customer: frames never cross partitions
    ).toDF("o_orderkey", "o_custkey", "us", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"), lit("O").as("o_orderstatus"),
        col("o_totalprice"), timestamp_micros(col("us")).as("o_orderdate"),
        lit("1-URGENT").as("o_orderpriority"))
      .write.parquet(s"$dir/orders.parquet")
    val got = Relational.q54RangeFrame(graft.io.Tables(spark, dir)).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getLong(3)))).toMap
    assert(got(1L) == ((10.0, 1L)))       // nothing precedes
    assert(got(2L) == ((15.0, 2L)))       // day 0 inside the 30-day range
    assert(got(3L) == ((2.0, 1L)))        // day 20 is 40 days back: out
    assert(got(4L) == ((1.0, 1L)))        // partition isolation
  }

  test("q52 retention: cohorts by first day, offsets count later activity exactly") {
    import spark.implicits._
    // user 7: days 0,1,3 (cohort d0); user 8: day 1 only (cohort d1);
    // user 9: days 1,3 (cohort d1) — two events on one day dedupe
    val d0 = 1700006400000000L // µs, 00:00 UTC day boundary
    val day = 86400000000L
    val dir = java.nio.file.Files.createTempDirectory("graft-ret").toString
    Seq(
      (1L, d0 + 3600000000L, 7L), (2L, d0 + 7200000000L, 7L), // same day
      (3L, d0 + day, 7L), (4L, d0 + 3 * day, 7L),
      (5L, d0 + day, 8L),
      (6L, d0 + day, 9L), (7L, d0 + 3 * day, 9L)
    ).toDF("event_id", "us", "user_id")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), lit("click").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .write.parquet(s"$dir/events.parquet")
    val got = Relational.q52RetentionCohorts(graft.io.Tables(spark, dir))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1)) -> r.getLong(2)).toMap
    val d0ms = d0 / 1000; val d1ms = d0ms + 86400000L
    assert(got == Map(
      (d0ms, 0L) -> 1L, (d0ms, 1L) -> 1L, (d0ms, 3L) -> 1L, // user 7
      (d1ms, 0L) -> 2L,                                     // users 8+9
      (d1ms, 2L) -> 1L))                                    // user 9
  }
}
