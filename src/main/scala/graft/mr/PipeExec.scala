package graft.mr

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.col

/** Arbitrary user-supplied executors as subprocess pipes — the
  * reference's single extension point is "run ANY `python3` script as a
  * map or reduce stage" (sdfs/src/server.rs:371-387 spawns
  * `python3 <exe> <file> <prefix> [args]`; :464-472 the reduce
  * analog). The eight pre-registered lambdas in [[Executors]] cover the
  * reference's own demo scripts; this module covers everyone else's.
  *
  * Spark-first re-expression: instead of the reference's
  * file-argument + `{prefix}_{key}`-output-files protocol (a
  * consequence of its SDFS storage layer), scripts speak the
  * Hadoop-Streaming line protocol, which `RDD.pipe` implements
  * natively:
  *
  *  - map stage: the script reads RECORDS (one per line) on stdin and
  *    writes `key\tvalue` lines on stdout;
  *  - reduce stage: the script reads `key\tvalue` lines GROUPED BY KEY
  *    (all lines of one key contiguous, keys sorted within the
  *    partition) and writes folded `key\tvalue` lines.
  *
  * One subprocess per task, streaming both directions with pipe
  * back-pressure — no materialized intermediate files, no driver
  * involvement. At 100 TB this scales exactly like any narrow map
  * (pipe-map) or like a hash aggregate (pipe-reduce: one shuffle on
  * key, then a per-partition streaming fold). Failed scripts fail the
  * task and Spark's retry re-runs them — the reference's re-execution
  * contract (sdfs/src/leader.rs:359-439) for free.
  */
object PipeExec {

  private implicit val kvEnc: org.apache.spark.sql.Encoder[(String, String)] =
    Encoders.tuple(Encoders.STRING, Encoders.STRING)

  /** Split an output line at the FIRST tab; tab-less lines keep the
    * whole line as the key with an empty value (Hadoop-Streaming's
    * convention).
    */
  private def parseKv(line: String): (String, String) = {
    val i = line.indexOf('\t')
    if (i < 0) (line, "") else (line.substring(0, i), line.substring(i + 1))
  }

  /** Resolve a user executor path to a subprocess command line:
    * `.py` scripts run under `python3`, anything else must be
    * executable itself (a shell script, a binary).
    */
  def commandFor(exe: String, args: Seq[String]): Seq[String] =
    (if (exe.endsWith(".py")) Seq("python3", exe) else Seq(exe)) ++ args

  /** Map stage: every record of `ds` goes to the script's stdin (one
    * line per record, per partition), the script's stdout parses back
    * to (key, value) pairs. A narrow transformation — no shuffle.
    */
  def pipeMaple(ds: Dataset[String], exe: String,
      args: Seq[String] = Nil): Dataset[(String, String)] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val piped = ds.rdd.pipe(commandFor(exe, args))
    spark.createDataset(piped.filter(_.nonEmpty).map(parseKv))
  }

  /** Reduce stage: shuffle on key, sort within each partition so one
    * key's lines are contiguous (the grouping contract reduce scripts
    * rely on), then stream `key\tvalue` lines through the script. One
    * shuffle total; fold state lives in the subprocess, which sees each
    * partition as an ordered stream — the same merge shape as a
    * sort-based aggregate.
    */
  def pipeJuice(kv: Dataset[(String, String)], exe: String,
      args: Seq[String] = Nil): Dataset[(String, String)] = {
    val spark = kv.sparkSession
    import spark.implicits._
    val grouped = kv.toDF("key", "value")
      .repartition(col("key"))
      .sortWithinPartitions("key")
      .as[(String, String)]
    val piped = grouped.map { case (k, v) => s"$k\t$v" }
      .rdd.pipe(commandFor(exe, args))
    spark.createDataset(piped.filter(_.nonEmpty).map(parseKv))
  }
}
