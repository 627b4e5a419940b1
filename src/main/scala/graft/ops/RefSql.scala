package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's two-statement SQL dialect (sdfs/src/main.rs:294-299),
  * compiled to Spark plans instead of hard-coded maple/juice pairs
  * (sdfs/src/client.rs:505-541):
  *
  *   SELECT ALL FROM <ds> WHERE <regex>
  *   SELECT ALL FROM <d1> <d2> WHERE <d1>.<f> = <d2>.<f>
  *
  * Line semantics: the reference matches the regex against the raw CSV
  * line (sdfs/executors/selectmap.py:14). For a text view (single
  * `value` column) the line IS the column; for a structured view the
  * line is reconstructed as the comma-joined row (the reference's CSV
  * convention, SURVEY.md §1.3). The join returns both rows' columns
  * (documented Q2 assumption: inner, key equality).
  */
object RefSql {

  /** The raw-line view of a DataFrame under the reference's CSV
    * convention: a text view's `value` column IS the line; a structured
    * view rejoins its columns with commas, null-as-empty (Spark's CSV
    * reader yields null for empty cells; concat_ws would silently DROP
    * nulls and shift every later column).
    */
  def lineOf(df: DataFrame): org.apache.spark.sql.Column =
    if (df.columns.sameElements(Array("value"))) col("value")
    else concat_ws(",", df.columns.map(c => coalesce(col(c).cast("string"), lit(""))): _*)

  private val FilterRe =
    """(?i)SELECT\s+ALL\s+FROM\s+(\S+)\s+WHERE\s+(.+)""".r
  private val JoinRe =
    """(?i)SELECT\s+ALL\s+FROM\s+(\S+)\s+(\S+)\s+WHERE\s+(\S+)\.(\S+)\s*=\s*(\S+)\.(\S+)""".r

  /** Attempts to parse+plan the reference dialect; None if the text is
    * not one of the two statements (caller falls back to Spark SQL).
    */
  def compile(spark: SparkSession, stmt: String): Option[DataFrame] =
    compileNamed(spark, stmt).map(_._1)

  /** Like compile, but also yields the reference's output name for the
    * result — `<ds>_filter` / `<d1>_<d2>_join` (README.md:114-127) —
    * so callers can register it the way the reference persists it.
    */
  def compileNamed(spark: SparkSession, stmt: String): Option[(DataFrame, String)] =
    stmt.trim match {
      case JoinRe(d1, d2, qd1, f1, qd2, f2) =>
        // field qualifiers must name the two datasets (either order)
        val (lf, rf) =
          if (qd1.equalsIgnoreCase(d1) && qd2.equalsIgnoreCase(d2)) (f1, f2)
          else if (qd1.equalsIgnoreCase(d2) && qd2.equalsIgnoreCase(d1)) (f2, f1)
          else return None
        val a = spark.table(d1)
        val b = spark.table(d2)
        // string-equality join on the named fields, full rows of both
        // sides (disambiguated with dataset prefixes on collision —
        // case-insensitively, matching Spark's default resolution)
        val bCols = b.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
        def collides(c: String) = bCols.contains(c.toLowerCase(java.util.Locale.ROOT))
        val aRenamed = a.columns.foldLeft(a) { (df, c) =>
          if (collides(c)) df.withColumnRenamed(c, s"${d1}_$c") else df
        }
        val lfCol = if (collides(lf)) s"${d1}_$lf" else lf
        Some((aRenamed.join(b,
          aRenamed(lfCol).cast("string") === b(rf).cast("string"), "inner"),
          s"${d1}_${d2}_join"))
      case FilterRe(ds, regex) =>
        val df = spark.table(ds)
        Some((df.filter(lineOf(df).rlike(regex.trim)), s"${ds}_filter"))
      case _ => None
    }
}
