package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.io.Tables
import graft.mr.MapleJuice
import graft.ops.Relational

/** The "same capabilities" guarantee for arbitrary user jobs
  * (SURVEY.md §5.3): maple∘juice composition equals the declarative
  * groupBy on random inputs. Plain scalacheck Gen with fixed seeds
  * (scalatestplus is not a dependency).
  */
class MapleJuiceSpec extends SparkSuite {

  private val kvGen: Gen[List[(String, String)]] = Gen.listOfN(
    60,
    for {
      k <- Gen.oneOf("k1", "k2", "k3", "k4", "skewed", "skewed", "skewed")
      v <- Gen.chooseNum(0, 99)
    } yield (k, v.toString))

  private def samples(n: Int): Seq[List[(String, String)]] =
    (0 until n).flatMap(i => kvGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("maple . juice count == groupBy count (property, 10 seeds)") {
    import spark.implicits._
    withLogLevel {
      samples(10).foreach { data =>
        val kv = MapleJuice.maple(data.toDS())(p => Iterator(p))
        val folded = MapleJuice.juice(kv)((k, vs) =>
          Iterator((k, vs.size.toString))).collect().toMap
        val expected = data.groupBy(_._1).map { case (k, vs) => k -> vs.size.toString }
        assert(folded == expected)
      }
    }
  }

  test("maple . juice sum == groupBy sum (property, 10 seeds)") {
    import spark.implicits._
    withLogLevel {
      samples(10).foreach { data =>
        val kv = MapleJuice.maple(data.toDS())(p => Iterator(p))
        val folded = MapleJuice.juice(kv)((k, vs) =>
          Iterator((k, vs.map(_.toLong).sum.toString))).collect().toMap
        val expected = data.groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2.toLong).sum.toString }
        assert(folded == expected)
      }
    }
  }

  test("maple flatMap multiplicity (UDTF role)") {
    import spark.implicits._
    withLogLevel {
      val ds = List("a b", "c").toDS()
      val kv = MapleJuice.maple(ds)(line =>
        line.split(" ").iterator.map(w => (w, "1")))
      assert(kv.count() == 3)
    }
  }

  test("mj word count matches declarative word count on sf0.001") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    withLogLevel {
      val mj = MapleJuice.wordCount(t).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val sql = Relational.q5WordCount(t).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(mj == sql)
    }
  }
}
