package graft.ops

import org.apache.spark.sql.DataFrame
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

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 buckets: Int = 16): DataFrame = {
    require(buckets > 0)
    // salt the fact side by a cheap deterministic-per-row hash; the
    // value doesn't matter, only its spread
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets.toLong)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
