package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end streaming drive: replays the events parquet through a
  * file-source stream (one file per micro-batch) into the windowed
  * aggregation, printing finalized windows. Usage:
  * runMain graft.streaming.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // File-source streams need a directory + fixed schema; events.ts is
    // nanos-as-long, so convert exactly as graft.io.Tables does.
    val batchEvents = graft.io.Tables(spark, sfDir).events
    val dir = java.nio.file.Files.createTempDirectory("stream-demo").toString
    batchEvents.write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream
      .schema(batchEvents.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")

    val q = Streams.hourlyCounts(stream)
      .writeStream.format("memory").queryName("hourly_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("hourly_stream")
    val rows = got.count()
    val batch = Streams.hourlyCounts(batchEvents).count()
    println(s"STREAM_DEMO windows_emitted=$rows batch_windows=$batch " +
      s"(stream emits only watermark-finalized windows; batch emits all)")
    got.orderBy(col("hour")).show(5, truncate = false)
    spark.stop()
  }
}
