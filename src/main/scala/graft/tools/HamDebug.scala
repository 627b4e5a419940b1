package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r21 instrument: the audio Hamming pair join rebuilt inline
  * (no localCheckpoint) so the executed candidate-join plan and its
  * node metrics are visible.
  */
object HamDebug {
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
    val fp0 = graft.mm.Multimodal.audioFingerprint(t).filter(col("n_frames") >= 17)
    val fp = fp0.select(col("media_id").as("doc_id"), col("fp").as("w")).persist()
    val keyExpr = graft.dedup.Dedup.slack1KeyExpr(fp, 8, 7)
    println(s"KEY EXPR: ${keyExpr.take(200)}")
    val blocks = fp.select(col("doc_id"), col("w"),
      explode(expr(keyExpr)).as("b"))
      .select(col("doc_id"), col("w"),
        col("b.blk").as("blk"), col("b.key").as("key"))
    val joined = blocks.toDF("doc_a", "fa", "blk", "key")
      .join(blocks.toDF("doc_b", "fb", "blk", "key"), Seq("blk", "key"))
    val out = joined.filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("fa"), col("fb"))
      .withColumn("hamming", expr("CAST(bit_count(fa ^ fb) AS INT)"))
      .filter(col("hamming") <= 7)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .distinct()
    val t0 = System.nanoTime()
    val n = out.count()
    println(f"rows=$n  ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(out.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
