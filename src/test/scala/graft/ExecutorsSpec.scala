package graft

import scala.io.Source

import org.apache.spark.sql.functions._

import graft.mr.{Executors, MapleJuice}
import graft.ops.RefSql

/** The reference's executors and SQL dialect, behavior-checked against
  * the declarative engine and the shipped goldens.
  */
class ExecutorsSpec extends SparkSuite {

  private def csvPath: String =
    getClass.getClassLoader.getResource("Traffic_Signal_Intersections.csv").getPath

  test("selectmap/selectreduce reproduce the regex filter (golden subset)") {
    import spark.implicits._
    withLogLevel {
      val lines = graft.io.GraftIO.readLines(spark, csvPath)
        .as[String]
      val kv = MapleJuice.maple(lines)(l => Executors.selectMap(l, Seq("Radio")))
      val out = MapleJuice.juice(kv)((k, vs) => Executors.selectReduce(k, vs, Nil))
        .collect().map(_._2).toSet
      val golden = Source.fromFile(
        getClass.getClassLoader.getResource("Traffic_Signal_Intersections_filter").getPath,
        "UTF-8")
      val goldenLines = try golden.getLines().filter(_.nonEmpty).toSet
                        finally golden.close()
      assert(goldenLines.subsetOf(out))
      assert(out.forall(_.contains("Radio")))
    }
  }

  test("wordcount executors equal the declarative word count on regex tokens") {
    import spark.implicits._
    withLogLevel {
      val docs = graft.io.Tables(spark, "/root/testdata/sf0.001").documents
      val lines = docs.select($"text").as[String]
      val kv = MapleJuice.maple(lines)(l => Executors.wordCountMap(l, Nil))
      val mj = MapleJuice.juice(kv)((k, vs) => Executors.wordCountReduce(k, vs, Nil))
        .collect().map { case (k, v) => k -> v.toLong }.toMap
      val sql = docs
        .select(explode(expr("regexp_extract_all(lower(text), '\\\\w+', 0)")).as("w"))
        .groupBy($"w").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(mj == sql)
    }
  }

  test("Sdemo1 executors reproduce the demo percentages") {
    import spark.implicits._
    withLogLevel {
      val lines = graft.io.GraftIO.readLines(spark, csvPath).as[String]
      val kv = MapleJuice.maple(lines)(l => Executors.sdemo1Map(l, Seq("Radio")))
      val counts = MapleJuice.juice(kv)((k, vs) => Executors.sdemo1Reduce(k, vs, Nil))
        .collect().map { case (k, v) => k -> v.toLong }.toMap
      assert(counts.values.sum == 15) // FIXTURES.md: Interconne == Radio → 15 rows
      // independent check: plain-Scala recount
      val src = Source.fromFile(csvPath, "UTF-8")
      val rows = try src.getLines().drop(1).map(_.split(",", -1)).toList
                 finally src.close()
      val expected = rows.filter(p => p.length > 10 && p(10) == "Radio")
        .groupBy(_(9)).map { case (k, vs) => k -> vs.size.toLong }
      assert(counts == expected)
    }
  }

  test("finalize stage reproduces the reference reducers' output shapes") {
    import spark.implicits._
    withLogLevel {
      val folded = Seq(("a", "3"), ("b", "1")).toDF("key", "value")
      // wordcountreduce.py → single grand-total line
      val total = graft.mr.Executors.finalizeByName("wordcountreduce.py")(folded)
        .collect()
      assert(total.toSeq.map(r => (r.getString(0), r.getString(1))) == Seq(("total", "4")))
      // Sdemo1reduce.py → percent-of-total strings per key
      val pct = graft.mr.Executors.finalizeByName("Sdemo1reduce.py")(folded)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(pct == Map("a" -> "75.00%", "b" -> "25.00%"))
    }
  }

  test("lineOf keeps column positions for null (empty) CSV cells") {
    import spark.implicits._
    withLogLevel {
      val df = Seq(("A", null: String, "B")).toDF("c1", "c2", "c3")
      val line = df.select(RefSql.lineOf(df).as("l")).head.getString(0)
      assert(line == "A,,B") // concat_ws alone would yield "A,B" (shifted)
    }
  }

  test("reference SQL dialect: filter statement on a text view") {
    withLogLevel {
      graft.io.GraftIO.readLines(spark, csvPath).createOrReplaceTempView("traffic")
      val df = RefSql.compile(spark, "SELECT ALL FROM traffic WHERE Radio").get
      assert(df.count() == 23) // 15 Interconne=Radio + 8 Fiber/Radio lines
    }
  }

  test("reference SQL dialect: join statement matches declarative join") {
    withLogLevel {
      val t = graft.io.Tables(spark, "/root/testdata/sf0.001")
      t.orders.createOrReplaceTempView("orders_rs")
      t.customer.createOrReplaceTempView("customer_rs")
      val df = RefSql.compile(spark,
        "SELECT ALL FROM orders_rs customer_rs WHERE orders_rs.o_custkey = customer_rs.c_custkey").get
      assert(df.count() == t.orders.count()) // every order joins its customer
      assert(df.columns.length == t.orders.columns.length + t.customer.columns.length)
    }
  }

  test("reference SQL dialect: non-dialect statements fall through") {
    withLogLevel {
      assert(RefSql.compile(spark, "SELECT count(*) FROM somewhere").isEmpty)
      assert(RefSql.compile(spark, "SELECT ALL FROM a b WHERE c.x = d.y").isEmpty)
    }
  }
}
