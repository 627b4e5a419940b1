package graft.tools

import org.apache.spark.sql.SparkSession

/** Run a SUBSET of SparkEntry.queries — the single-operator iteration
  * loop Verify is too coarse for. Writes each named query's result to
  * `outDir/<name>` parquet plus the matching `oracle_sql.json` subset,
  * in the exact layout Verify produces, so ad-hoc DuckDB compares work
  * on the partial output. (tools/check.py still wants the FULL Verify
  * sweep — its registered band checks fail on missing dirs by design.)
  *
  * Usage: runMain graft.tools.QueryRun <sfDir> <outDir> <query> [query...]
  */
object QueryRun {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: QueryRun <sfDir> <outDir> <query> [query...]")
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
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
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[queryrun] wrote $outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.view.filterKeys(names.contains)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
