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
    for (aqe <- Seq("true", "false"); _ <- 1 to 2) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      time(s"aqe=$aqe")(graft.dedup.Dedup.connectedComponents(pairs).count())
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
