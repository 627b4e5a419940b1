package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off r21 instrument: total janino compilation time accumulated
  * over a full sweep (CodegenMetrics), vs sweep wall — quantifies how
  * much of the per-stage barrier tax is whole-stage-codegen
  * recompilation (the default spark.sql.codegen.cache.maxEntries=100
  * cannot hold a 156-query suite's generated classes).
  *
  * Usage: CodegenAudit <sfDir> [maxEntries]
  */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    args.drop(1).headOption.foreach { n =>
      builder.config("spark.sql.codegen.cache.maxEntries", n)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.tools.Quiet.windowWarn()
    val queries = graft.SparkEntry.queries.toSeq
    def compNs(): (Long, Long) = {
      val m = org.apache.spark.metrics.source.CodegenMetrics
      (m.METRIC_COMPILATION_TIME.getSnapshot.size() * 0 +
        m.METRIC_COMPILATION_TIME.getCount,
        m.METRIC_SOURCE_CODE_SIZE.getCount)
    }
    def compTimeMs(): Long = {
      val h = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME
      // histogram of per-compile ms; getCount = #compiles. Sum isn't
      // exposed, so track count * mean from the snapshot.
      val s = h.getSnapshot
      (h.getCount * s.getMean).toLong
    }
    // warmup at sf0.001
    val warmDir = new java.io.File("/root/testdata/sf0.001")
    if (warmDir.isDirectory)
      queries.foreach { case (_, fn) =>
        try fn(spark, warmDir.getPath).count() catch { case _: Throwable => }
      }
    val warmCompiles = compNs()._1
    println(s"CODEGEN after-warmup compiles=$warmCompiles est-ms=${compTimeMs()}")
    for (run <- 1 to 2) {
      graft.tools.SweepCaches.releaseAll()
      val caches = new graft.tools.SweepCaches.Tracker
      val c0 = compNs()._1
      val ms0 = compTimeMs()
      val t0 = System.nanoTime()
      queries.foreach { case (name, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => }
        caches.done(name)
      }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"CODEGEN run$run wall=$wall%8.2f s compiles=${compNs()._1 - c0} est-compile-ms=${compTimeMs() - ms0}")
    }
    spark.stop()
  }
}
