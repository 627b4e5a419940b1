package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.io.Tables
import graft.ops.BloomJoin

/** Bloom-pruned semi-join: no false negatives ever, high pruning rate
  * on disjoint key sets, exact agreement with the plain semi-join, and
  * the filter's plan position (fact side, before the join).
  */
class BloomJoinSpec extends SparkSuite with Matchers {
  private lazy val t = {
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, "/root/testdata/sf0.001")
  }

  test("no false negatives: every dim key passes its own bloom") {
    import spark.implicits._
    // adversarial-ish keys: dense ints, big ints, negatives
    val keys = ((1L to 2000L) ++ Seq(-7L, 0L, Long.MaxValue / 3)).toDF("k")
    val words = BloomJoin.build(keys, "k")
    val passed = keys.filter(BloomJoin.mightContain(col("k"), words)).count()
    assert(passed == keys.count())
  }

  test("pruning: disjoint probe keys are mostly rejected (FPP well under 5%)") {
    import spark.implicits._
    val dim = (1L to 2000L).toDF("k")
    val words = BloomJoin.build(dim, "k")
    val probes = (1000001L to 1004000L).toDF("k") // disjoint range
    val fp = probes.filter(BloomJoin.mightContain(col("k"), words)).count()
    // m=65536, n=2000, k=3 → theoretical FPP ≈ 0.07%; 5% is a loose roof
    assert(fp < probes.count() / 20, s"false-positive count $fp too high")
  }

  test("bloom semi-join equals plain semi-join on testdata") {
    val dim = t.orders.filter(col("o_orderpriority") === "1-URGENT")
    val bloomed = BloomJoin.semiJoin(t.lineitem, "l_orderkey", dim, "o_orderkey")
    val plain = t.lineitem.join(
      dim.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_semi")
    assert(bloomed.count() == plain.count())
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("bitmap is fixed-size and the build collects only finished words") {
    import spark.implicits._
    val small = BloomJoin.build((1L to 10L).toDF("k"), "k", mBits = 1 << 10)
    assert(small.length == (1 << 10) / 64)
    // 50× more keys, same m → identical bitmap size (driver cost is O(m), not O(n))
    val big = BloomJoin.build((1L to 500L).toDF("k"), "k", mBits = 1 << 10)
    assert(big.length == small.length)
  }

  test("bloom filter sits on the fact side before the join, inside codegen") {
    val dim = t.orders.filter(col("o_orderpriority") === "1-URGENT")
    val df = BloomJoin.semiJoin(t.lineitem, "l_orderkey", dim, "o_orderkey")
    val plan = df.queryExecution.executedPlan.toString
    // the probe predicate (seeded xxhash64) must appear in a Filter…
    assert(plan.contains("xxhash64"), s"bloom probe missing from plan:\n$plan")
    // …and the fact scan side must be filtered before the semi join:
    // the Filter node carrying xxhash64 appears below the join in the
    // plan tree (string order: join first, filter deeper).
    val joinIdx = plan.indexOf("Join")
    val probeIdx = plan.indexOf("xxhash64")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"bloom probe should be under the join's fact branch:\n$plan")
  }

  test("MB-scale bitmap rides a broadcast variable, not a plan literal") {
    // 2^23 bits = 1 MiB — over BroadcastThresholdBytes, so semiJoin
    // must auto-switch to the BloomWordTest broadcast probe
    val dim = t.orders.filter(col("o_orderpriority") === "1-URGENT")
    val bloomed = BloomJoin.semiJoin(t.lineitem, "l_orderkey", dim,
      "o_orderkey", mBits = 1 << 23)
    // correctness unchanged vs the plain semi-join
    val plain = t.lineitem.join(
      dim.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_semi")
    assert(bloomed.count() == plain.count())
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
    // plan carries the broadcast probe and is free of the 128k-long
    // literal (which would render ~1 MB of digits in the plan string)
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom"), s"broadcast probe missing:\n$plan")
    assert(plan.length < 100 * 1024,
      s"plan string is ${plan.length} chars — bitmap literal leaked into the plan?")
  }

  test("broadcast probe passes all dim keys and prunes a disjoint range (interpreted + codegen)") {
    import spark.implicits._
    val keys = (1L to 2000L).toDF("k")
    val mBits = 1 << 23
    val words = BloomJoin.build(keys, "k", mBits)
    val bc = spark.sparkContext.broadcast(words)
    val probe = BloomJoin.mightContainBroadcast(col("k"), bc, mBits, spark)
    assert(keys.filter(probe).count() == 2000L) // no false negatives
    val disjoint = (1000001L to 1004000L).toDF("k")
    val fp = disjoint.filter(
      BloomJoin.mightContainBroadcast(col("k"), bc, mBits, spark)).count()
    assert(fp < 200, s"false-positive count $fp too high for a 1 MiB bitmap")
    // interpreted path (nullSafeEval): force codegen off in an
    // isolated session — both eval modes must agree bit-for-bit
    val s = spark.newSession()
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val keys2 = s.range(1L, 2001L).withColumnRenamed("id", "k")
    assert(keys2.filter(
      BloomJoin.mightContainBroadcast(col("k"), bc, mBits, s)).count() == 2000L)
    val fp2 = s.range(1000001L, 1004001L).withColumnRenamed("id", "k").filter(
      BloomJoin.mightContainBroadcast(col("k"), bc, mBits, s)).count()
    assert(fp2 == fp, "interpreted and codegen'd probes must agree")
  }

  test("repeated broadcast-path semiJoins leave zero registry residue") {
    def bloomFns: Int = spark.sessionState.functionRegistry.listFunction()
      .count(_.funcName.startsWith("graft_bloom"))
    val dim = t.orders.filter(col("o_orderpriority") === "1-URGENT")
    val before = bloomFns
    val counts = (1 to 3).map { _ =>
      BloomJoin.semiJoin(t.lineitem, "l_orderkey", dim, "o_orderkey",
        mBits = 1 << 23).count()
    }
    assert(counts.distinct.size == 1, "repeated joins must agree")
    // each call registers its probe fn, binds it into the analyzed
    // plan, and drops it before returning — the registry must not grow
    assert(bloomFns == before,
      s"registry grew from $before to $bloomFns graft_bloom entries")
    // and the deregistered plan must still execute (resolution was eager)
    val df = BloomJoin.semiJoin(t.lineitem, "l_orderkey", dim, "o_orderkey",
      mBits = 1 << 23)
    assert(bloomFns == before)
    assert(df.count() == counts.head)
  }

  test("broadcast probe binds key by expression, not SQL text (backticked names work)") {
    import spark.implicits._
    val keys = (1L to 500L).toDF("weird key.name")
    val mBits = 1 << 23
    val words = BloomJoin.build(keys, "`weird key.name`", mBits)
    val bc = spark.sparkContext.broadcast(words)
    val probe = BloomJoin.mightContainBroadcast(col("`weird key.name`"), bc, mBits, spark)
    assert(keys.filter(probe).count() == 500L)
  }

  test("q47 aggregates only rows whose order survives the dim predicate") {
    val out = BloomJoin.q47BloomSemi(t).collect()
    assert(out.nonEmpty)
    val keys = t.orders
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") >= 150000.0)
      .select("o_orderkey")
    val expected = t.lineitem
      .join(keys.withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"), "left_semi")
      .count()
    assert(out.map(_.getLong(1)).sum == expected)
  }
}
