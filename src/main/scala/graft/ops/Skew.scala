package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: classic salting. The large
  * (skewed) side spreads each hot key across `buckets` sub-keys; the
  * small side is replicated once per sub-key. Join output is identical
  * to the unsalted join — the salt only changes the partitioning — so
  * a single hot key that would pin one reducer at 100 TB fans across
  * `buckets` tasks instead. (AQE's skew-join split handles this
  * adaptively for sort-merge joins; salting is the explicit form that
  * also works for aggregations and older planners.)
  */
object Skew {

  /** Default salt: xxhash64 over ALL of the row's columns — a pure
    * function of row CONTENT, so the salted exchange stays a
    * DETERMINATE stage. The alternative (`monotonically_increasing_id`
    * or `rand`) is flagged nondeterministic by Spark: a fetch failure
    * in an INDETERMINATE stage forces the whole stage (and its
    * downstream) to roll back and re-run at 100 TB, instead of just the
    * lost tasks — retry cost stops being proportional to the failure.
    * Caveat: rows that are bytewise identical across every column share
    * a bucket, so a hot key whose volume is dominated by exact
    * duplicate rows won't spread; pass a custom salt for that corner
    * (any deterministic column works).
    */
  private def rowContentSalt(df: DataFrame): Column =
    xxhash64(df.columns.map(col).toIndexedSeq: _*)

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 buckets: Int = 16): DataFrame = {
    require(buckets > 0)
    // salt the fact side by a deterministic-per-row content hash; the
    // value doesn't matter, only its spread (and its determinism — see
    // rowContentSalt for the stage-retry argument)
    val saltedLarge = large.withColumn("__salt",
      pmod(rowContentSalt(large), lit(buckets.toLong)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-stage salted aggregation: partial aggregate on (key, __salt),
    * final re-aggregate on key. `partial` runs per (key, salt) bucket;
    * `fin` must recombine the partial columns into the same result the
    * unsalted aggregate would produce (sum of sums, sum of counts, max
    * of maxes, ...) — the caller owns that algebra, which is exactly
    * the combiner decomposition MapReduce asks of a Juice reducer.
    *
    * When it matters: Spark's hash aggregate already combines map-side,
    * but the FINAL aggregation still hash-partitions on the bare key —
    * with ~P partials per key that's usually harmless, EXCEPT when the
    * per-key aggregation STATE doesn't shrink map-side (collect_list /
    * exact distinct sets / large string states): there a hot key ships
    * its full state to one reducer. Salting caps any reducer's input at
    * ~1/buckets of the hot key's volume, and the final stage only sees
    * buckets·|keys| pre-shrunk rows. Same planner-independence argument
    * as [[saltedJoin]]; output is identical to the unsalted aggregate,
    * so the oracle runs the plain GROUP BY (q49, Relational.scala).
    *
    * `saltBy`: None salts by a per-row content hash ([[rowContentSalt]]
    * — deterministic, so the exchange stays a DETERMINATE stage and
    * fetch-failure retries stay task-local) — valid for any
    * commutative-monoid aggregate (sum/count/min/max). Some(col) salts
    * by a VALUE hash, which partitions the aggregation state itself:
    * every occurrence of one value lands in one bucket, so even
    * duplicate-sensitive state decomposes exactly — count(DISTINCT v)
    * salted by v is sum-of-partial-distincts, the classic two-stage
    * exact distinct.
    */
  def saltedAgg(df: DataFrame, key: String, buckets: Int = 16,
                saltBy: Option[Column] = None)(
      partial: Seq[Column], fin: Seq[Column]): DataFrame = {
    require(buckets > 0 && partial.nonEmpty && fin.nonEmpty)
    val salt = saltBy.getOrElse(rowContentSalt(df))
    df.withColumn("__salt",
        pmod(xxhash64(salt), lit(buckets.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(fin.head, fin.tail: _*)
  }
}
