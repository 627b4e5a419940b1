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
    // graft_h32 from pure SQL, pinned to the md5-derived contract value
    val h = spark.sql("SELECT graft_h32('abc') AS h").head.getLong(0)
    val hRef = java.lang.Long.parseLong("900150983cbd24fb".take(8), 16)
    println(s"EXT_DEMO graft_h32=$h expected=$hRef ok=${h == hRef}")
    // the injected optimizer rule: a pure-SQL partition-count window
    // must plan as aggregate + join (no Window node), exact results
    val wq = spark.sql(
      "SELECT k, count(*) OVER (PARTITION BY k) AS c FROM VALUES " +
        "(1), (1), (2) AS t(k)")
    val noWindow = !wq.queryExecution.optimizedPlan.toString.contains("Window")
    val rows = wq.collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    val okRows = rows == Seq((1, 2L), (1, 2L), (2, 1L))
    println(s"EXT_DEMO count_window_rewrite no_window=$noWindow rows_ok=$okRows " +
      s"ok=${noWindow && okRows}")
    spark.stop()
  }
}
