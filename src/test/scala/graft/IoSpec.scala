package graft

import org.apache.spark.sql.functions._

import graft.io.{GraftIO, Tables}

/** S1-S8 analogs (SURVEY.md §2.1): put/get round-trip and the
  * `{prefix}_{key}` durable-shuffle analog via partitioned write.
  */
class IoSpec extends SparkSuite {
  private lazy val t = {
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, "/root/testdata/sf0.001")
  }

  test("put/get round-trip preserves content (S1/S2)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-io").toString
    val orig = t.nation
    GraftIO.write(orig, s"$dir/nation_copy")
    val back = spark.read.parquet(s"$dir/nation_copy")
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("writeByKey produces one directory per key (the {prefix}_{key} analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-io").toString
    GraftIO.writeByKey(t.orders, "o_orderstatus", s"$dir/by_status")
    val parts = new java.io.File(s"$dir/by_status").listFiles()
      .filter(_.getName.startsWith("o_orderstatus=")).map(_.getName).sorted
    assert(parts.toSeq == Seq("o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"))
    // reading back with partition pruning touches one directory only
    val f = spark.read.parquet(s"$dir/by_status")
      .filter(col("o_orderstatus") === "F")
    assert(f.count() == t.orders.filter(col("o_orderstatus") === "F").count())
  }

  test("line reader yields one row per line (record = text line)") {
    val df = GraftIO.readLines(spark,
      getClass.getClassLoader.getResource("Traffic_Signal_Intersections.csv").getPath)
    assert(df.count() == 122)
    assert(df.columns.toSeq == Seq("value"))
  }
}
