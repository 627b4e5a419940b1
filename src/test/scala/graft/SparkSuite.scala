package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per JVM (getOrCreate), configured like
  * Verify/Bench: UTC, small shuffle partitions, nanos-as-long for the
  * events table.
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def withLogLevel[A](f: => A): A = { spark.sparkContext.setLogLevel("WARN"); f }

  /** Writes rows as a parquet "documents"-style table into a temp dir
    * and returns a Tables bound to it.
    */
  def tempTables(write: String => Unit): graft.io.Tables = {
    val dir = java.nio.file.Files.createTempDirectory("graft-test").toString
    write(dir)
    graft.io.Tables(spark, dir)
  }
}
