package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) clustering — the lakehouse layout technique
  * for MULTI-column data skipping: bit-interleave two keys so that
  * rows close in (a, b) space land close on the one-dimensional sort
  * key, then range-partition + sort files by it. A single-column sort
  * prunes scans on that column only; the z-curve gives both columns
  * partial locality, so a 2-D range predicate overlaps a small band of
  * files instead of all of them (parquet min/max footer stats make the
  * skip decision file- and row-group-local — no index structure).
  *
  * The interleave here takes the low [[Bits]] bits of each key
  * directly — exact, engine-portable integer arithmetic (the
  * q53_zorder oracle re-derives it in SQL), correct while keys fit in
  * 16 bits. At 100 TB the production step in front is range
  * bucketization (map each column to its 2^16-quantile rank from
  * column stats, the way Delta/Iceberg OPTIMIZE ZORDER does) — that
  * is a monotone per-column transform, so everything downstream
  * (interleave, range partition, footer pruning) is unchanged.
  */
object ZOrder {

  private val Bits = 16

  /** Morton interleave of the low 16 bits of two integer columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Pure
    * shift/mask arithmetic — whole-stage-codegen'd, no UDF.
    */
  def zValue(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The same interleave as a DuckDB SQL expression over columns
    * `a`/`b` — 32 OR'd shift terms, generated from the same constants.
    */
  def zValueSql(a: String, b: String): String =
    (0 until Bits).map { i =>
      // CAST before shifting: bit 15 of b shifts by 31, and DuckDB's
      // 1 << 31 on INT32 raises an overflow error (invariant 10's
      // class) — the Spark side is LongType throughout
      s"(CAST((($a >> $i) & 1) AS BIGINT) << ${2 * i}) | " +
        s"(CAST((($b >> $i) & 1) AS BIGINT) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Write `df` z-clustered on (ca, cb): range-partition into `files`
    * splits of the z-value and sort each file by it, so every parquet
    * footer covers a compact z-range and min/max stats on BOTH columns
    * are tight. The z column is dropped before write — it re-derives
    * from the keys, and the layout (file boundaries + row order) is
    * what carries the information. One range exchange (sampled
    * boundaries) + per-partition sort: the same cost as any sorted
    * write, amortized over every pruned read after.
    */
  def writeZOrdered(df: DataFrame, path: String, ca: String, cb: String,
      files: Int): Unit = {
    df.withColumn("__z", zValue(col(ca), col(cb)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Driver-gated z-value query: the Morton key over lineitem's
    * (l_partkey, l_suppkey), summarized per 2^12-wide z bucket — the
    * full interleave arithmetic runs over every row and the oracle
    * re-derives it bit for bit, so the curve itself is hash-checked
    * (the LAYOUT effect is pinned by ScaleSpec's file-skipping
    * measurement, which needs written files, not a query result).
    */
  def zBuckets(t: Tables): DataFrame = {
    t.lineitem
      .select(zValue(col("l_partkey"), col("l_suppkey")).as("z"))
      .groupBy(shiftright(col("z"), 12).as("zbucket"))
      .agg(count(lit(1)).as("cnt"), min(col("z")).as("z_min"),
        max(col("z")).as("z_max"))
  }

  val zBucketsSql: String = {
    val z = zValueSql("l_partkey", "l_suppkey")
    s"WITH zt AS (SELECT $z AS z FROM lineitem) " +
      "SELECT z >> 12 AS zbucket, count(*) AS cnt, min(z) AS z_min, " +
      "max(z) AS z_max FROM zt GROUP BY 1"
  }

  /** How many of `path`'s parquet files a (ca IN [aLo, aHi]) AND
    * (cb IN [bLo, bHi]) range predicate would touch under footer
    * min/max pruning — measured honestly from the data (per-file
    * min/max via input_file_name, the same stats the parquet footers
    * carry), not simulated. The ScaleSpec pin asserts z-ordered <<
    * natural layout on a 2-D predicate.
    */
  def filesOverlapping(df: DataFrame, ca: String, cb: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): Long = {
    df.groupBy(input_file_name().as("f"))
      .agg(min(col(ca)).as("a_min"), max(col(ca)).as("a_max"),
        min(col(cb)).as("b_min"), max(col(cb)).as("b_max"))
      .filter(col("a_min") <= aHi && col("a_max") >= aLo &&
        col("b_min") <= bHi && col("b_max") >= bLo)
      .count()
  }
}
