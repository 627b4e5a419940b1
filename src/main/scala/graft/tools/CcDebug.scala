package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off r21 instrument: times the connected-components fixpoint on
  * the MinHash pair table with AQE on vs off (barrier-tax probe).
  */
object CcDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.io.Tables(spark, sfDir)
    val pairs = graft.dedup.Dedup.minhashLsh(t)
      .select("doc_a", "doc_b").localCheckpoint()
    println(s"pairs=${pairs.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"CC $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // warm both paths once
    graft.dedup.Dedup.connectedComponents(pairs).count()
    time("aqe=true")(graft.dedup.Dedup.connectedComponents(pairs).count())
    // stage trace of one more run
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val cpu = si.taskMetrics.executorRunTime / 1e3
        println(f"CCSTAGE id=${si.stageId} tasks=${si.numTasks} wall=$wall%6.2f cpu=$cpu%6.2f  ${si.name.takeWhile(_ != '\n').take(60)}")
      }
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        println(s"CCJOB ${j.jobId} stages=${j.stageInfos.size} t=${System.nanoTime() / 1000000 % 1000000}")
    })
    time("traced")(graft.dedup.Dedup.connectedComponents(pairs).count())
    spark.stop()
  }
}
