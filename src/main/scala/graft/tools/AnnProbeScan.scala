package graft.tools

import org.apache.spark.sql.SparkSession
import graft.io.Tables
import graft.sim.Similarity

/** Adjudication tool: recall@5 of the pruned ANN variants vs brute
  * force across nprobe values at a given SF dir — the measurement
  * behind the nprobe defaults (see Similarity.annIvf / annIvfInt8
  * scaladoc) and the check.py recall bands. Covers the float IVF path
  * and the int8 ADC path (whose batch output the cell-keyed streaming
  * probe reproduces bit for bit, so its curve is ALSO the streaming
  * probe's curve). Run:
  *   sbt -batch "runMain graft.tools.AnnProbeScan /root/testdata/sf0.1"
  */
object AnnProbeScan {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, dir)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.annBruteForce(t))
    for (np <- Seq(8, 10, 12)) {
      val found = pairs(Similarity.annIvf(t, nprobe = np))
      val r = (truth & found).size.toDouble / truth.size
      println(f"ANNPROBE ivf nprobe=$np recall@5=$r%.3f (${(truth & found).size}/${truth.size})")
    }
    for (np <- Seq(8, 10, 12)) {
      val found = pairs(Similarity.annIvfInt8(t, nprobe = np))
      val r = (truth & found).size.toDouble / truth.size
      println(f"ANNPROBE ivf_int8 nprobe=$np recall@5=$r%.3f (${(truth & found).size}/${truth.size})")
    }
    spark.stop()
  }
}
