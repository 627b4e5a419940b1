package graft.mr

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** The reference's public programming model, as a typed Spark library
  * (SURVEY.md §2.2 D1-D3, §3.2).
  *
  * `maple <exe> <num_workers> <prefix> <input_dir>` shards one file by
  * line ranges and runs a Python subprocess per chunk that emits
  * `{prefix}_{key}` files (sdfs/src/leader.rs:226-472,
  * sdfs/src/server.rs:335-435). `juice` partitions the key set across
  * workers and folds each key's values (sdfs/src/leader.rs:476-635).
  *
  * Here the subprocess surface becomes a Scala lambda: `maple` is a
  * flatMap to key-value pairs (input splits and the per-key shuffle are
  * Spark's native ones — no `{prefix}_{key}` files, no fd-locked
  * appends, sdfs/src/server.rs:517-563); `juice` is
  * groupByKey.flatMapGroups. Worker count, chunk sizing
  * (sdfs/src/leader.rs:370: ceil(lines/num_workers)) and re-execution
  * on failure (sdfs/src/leader.rs:359-439) all disappear into the
  * scheduler. Unlike the reference's `.take(1)` single-file truncation
  * (sdfs/src/leader.rs:253 — a limitation, not a capability), multi-file
  * datasets are read whole.
  */
object MapleJuice {

  private implicit val kvEnc: org.apache.spark.sql.Encoder[(String, String)] =
    Encoders.tuple(Encoders.STRING, Encoders.STRING)

  /** D1 maple: record → zero or more (key, value) pairs. The UDTF role
    * the reference fills with `python3 <exe> <file> <prefix> [args]`.
    */
  def maple[T](ds: Dataset[T])(udf: T => IterableOnce[(String, String)]): Dataset[(String, String)] =
    ds.flatMap(udf(_).iterator.to(Iterator))

  /** D3 juice: fold all values of a key into zero or more output pairs.
    * The shuffle between maple and juice is D2 — native hash shuffle
    * instead of per-key SDFS files.
    */
  def juice(kv: Dataset[(String, String)])(
      udf: (String, Iterator[String]) => IterableOnce[(String, String)]): Dataset[(String, String)] =
    kv.groupByKey(_._1)(Encoders.STRING)
      .flatMapGroups((k: String, rows: Iterator[(String, String)]) =>
        udf(k, rows.map(_._2)).iterator.to(Iterator))

  /** The reference's wordcount demo (sdfs/executors/wordcountmap.py +
    * wordcountreduce.py) run through the maple/juice surface; typed
    * output lifted back to a DataFrame for the oracle compare.
    */
  def wordCount(t: Tables): DataFrame = {
    import t.spark.implicits._
    val lines: Dataset[String] = t.documents.select($"text").as[String]
    val kv = maple(lines)(line =>
      line.split(" ").iterator.filter(_.nonEmpty).map(w => (w, "1")))
    val counts = juice(kv)((k, vs) => Iterator((k, vs.size.toString)))
    counts.toDF("word", "cnt_str")
      .select(col("word"), col("cnt_str").cast("long").as("cnt"))
  }

  // Same semantics as the declarative word count → same oracle shape.
  val wordCountSql: String =
    """SELECT word, count(*) AS cnt FROM
      | (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |WHERE word <> '' GROUP BY word""".stripMargin.replace("\n", " ")
}
