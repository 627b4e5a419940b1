package graft.tools

import scala.io.StdIn

import org.apache.spark.sql.SparkSession

/** Interactive command REPL — the reference's user surface
  * (sdfs/src/main.rs:218-306: whitespace-tokenized commands on a prompt
  * loop). Same commands, Spark semantics:
  *
  *   put <local_path> <name>     load a file (parquet/csv/text by
  *                               extension) and register it as <name>
  *   get <name> <local_path>     save table <name> as parquet
  *   ls [name]                   list registered tables (the leader's
  *                               file-table analog, main.rs:246-248)
  *   delete <name>               drop the view (main.rs:243-245)
  *   SELECT ...                  any Spark SQL (supersedes the
  *                               reference's two statements)
  *   explain SELECT ...          show the physical plan
  *   quit
  *
  * maple/juice jobs are the library surface (graft.mr.MapleJuice) —
  * Scala lambdas rather than Python subprocess names, so they have no
  * string form here.
  */
object Repl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("graft> ready (put/get/ls/delete/SELECT/explain/quit)")

    var running = true
    while (running) {
      print("graft> ")
      Console.flush()
      val line = Option(StdIn.readLine()).map(_.trim).getOrElse("quit")
      try {
        line.split("\\s+").toList match {
          case Nil | List("") => ()
          case List("quit") | List("exit") => running = false
          case List("put", path, name) =>
            val df =
              if (path.endsWith(".csv")) graft.io.GraftIO.readCsv(spark, path)
              else if (path.endsWith(".parquet")) spark.read.parquet(path)
              else graft.io.GraftIO.readLines(spark, path)
            df.createOrReplaceTempView(name)
            println(s"ok: $name (${df.count()} rows)")
          case List("get", name, path) =>
            spark.table(name).write.mode("overwrite").parquet(path)
            println(s"ok: $name -> $path")
          case List("ls") =>
            spark.catalog.listTables().collect()
              .foreach(t => println(s"${t.name}\t${t.tableType}"))
          case List("ls", name) =>
            spark.table(name).printSchema()
          case List("delete", name) =>
            spark.catalog.dropTempView(name)
            println(s"ok: deleted $name")
          case "explain" :: _ =>
            spark.sql(line.stripPrefix("explain").trim).explain("formatted")
          case _ if line.toUpperCase.startsWith("SELECT") ||
            line.toUpperCase.startsWith("WITH") =>
            spark.sql(line).show(50, truncate = false)
          case other =>
            println(s"unknown command: ${other.headOption.getOrElse("")}")
        }
      } catch {
        case e: Exception => println(s"error: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
