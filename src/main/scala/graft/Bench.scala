package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.tools.Quiet.windowWarn()
    // Warmup at the smallest scale factor: JIT + whole-stage-codegen
    // compile per plan shape, so the timed runs measure steady state
    // (the plans are identical across sf dirs, only the input differs).
    val warmDir = new java.io.File("/root/testdata/sf0.001")
    if (warmDir.isDirectory && warmDir.getPath != sfDir)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir.getPath).count() catch { case _: Throwable => }
      }
    // warmup filled the memo caches for the WARM dir; drop that residue
    // so the timed sweep starts with empty storage memory, then release
    // each family as its last timed consumer finishes (bounds residency
    // — see tools.SweepCaches; r8's corpus_curated outlier motivates).
    graft.tools.SweepCaches.releaseAll()
    val caches = new graft.tools.SweepCaches.Tracker
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      caches.done(name)
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // sbt wraps stdout in [info] prefixes but leaves stderr bare —
    // emit the line there too so a driver scraping the process output
    // can parse it without stripping prefixes
    System.err.println(json)
    // and write it to a file so the structured number survives any
    // log-routing choices (canonical artifact, see README)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"bench_out write failed: $e") }
    spark.stop()
  }
}
