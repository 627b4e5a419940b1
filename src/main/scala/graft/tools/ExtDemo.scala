package graft.tools

import org.apache.spark.sql.SparkSession

/** End-to-end proof of the config-only deployment path: a session built
  * with spark.sql.extensions=graft.functions.GraftExtensions resolves
  * graft_dot from pure SQL, no Scala registration call.
  */
object ExtDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark
      .sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head.getDouble(0)
    println(s"EXT_DEMO graft_dot=$d expected=11.0 ok=${d == 11.0}")
    spark.stop()
  }
}
