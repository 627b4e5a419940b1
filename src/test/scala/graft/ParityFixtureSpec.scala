package graft

import scala.io.Source

import org.apache.spark.sql.functions._

import graft.io.GraftIO
import graft.text.TextAnalysis

/** Reference-parity goldens on the traffic CSV (FIXTURES.md §1): the
  * regex filter reproduces `SELECT ALL FROM ds WHERE Radio` semantics
  * (line-level re.search, sdfs/executors/selectmap.py:4-19) including
  * the shipped 10-row golden; the Sdemo1 percent query matches an
  * independent plain-Scala computation (sdfs/executors/Sdemo1map.py +
  * Sdemo1reduce.py).
  */
class ParityFixtureSpec extends SparkSuite {

  private def res(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  test("regex filter matches line-level re.search semantics + golden subset") {
    withLogLevel {
      val lines = GraftIO.readLines(spark, res("Traffic_Signal_Intersections.csv"))
      val ours = lines.filter(col("value").rlike("Radio"))
        .collect().map(_.getString(0)).toSet

      // independent computation: plain-Scala contains on raw lines
      val src = Source.fromFile(res("Traffic_Signal_Intersections.csv"), "UTF-8")
      val expected = try src.getLines().filter(_.contains("Radio")).toSet
                     finally src.close()
      assert(ours == expected)

      // the reference's shipped golden output is a subset (it was produced
      // from a partial input: leader.rs:253 `.take(1)` truncation)
      val golden = Source.fromFile(res("Traffic_Signal_Intersections_filter"), "UTF-8")
      val goldenLines = try golden.getLines().filter(_.nonEmpty).toSet
                        finally golden.close()
      assert(goldenLines.subsetOf(ours))
    }
  }

  test("Sdemo1 percent query matches independent computation incl. %.2f%% format") {
    withLogLevel {
      // Spark pipeline: filter Interconne=='Radio', group by Detection_, pct
      val df = GraftIO.readCsv(spark, res("Traffic_Signal_Intersections.csv"))
      val filtered = df.filter(col("Interconne") === "Radio")
      val total = filtered.count().toDouble
      val sparkPcts = filtered.groupBy(col("Detection_")).count()
        .collect()
        .map(r => Option(r.getString(0)).getOrElse("") ->
          TextAnalysis.percent(r.getLong(1) / total))
        .toMap

      // independent: hand-rolled CSV split (the executors' line.split(','))
      val src = Source.fromFile(res("Traffic_Signal_Intersections.csv"), "UTF-8")
      val rows = try src.getLines().drop(1).map(_.split(",", -1)).toList
                 finally src.close()
      val radio = rows.filter(p => p.length > 10 && p(10) == "Radio")
      val byDet = radio.groupBy(_(9)).map { case (k, vs) =>
        k -> f"${vs.size * 100.0 / radio.size}%.2f%%"
      }
      assert(sparkPcts == byDet)
      assert(radio.size == 15) // FIXTURES.md histogram: Radio == 15
    }
  }

  test("CSV reader handles the BOM header quirk") {
    withLogLevel {
      val df = GraftIO.readCsv(spark, res("Traffic_Signal_Intersections.csv"))
      assert(df.columns.head == "X") // BOM stripped, not "﻿X"
      assert(df.count() == 121)
    }
  }
}
