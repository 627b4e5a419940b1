package graft.text

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Rabin–Karp rolling-hash document fingerprinting: polynomial window
  * hashes over the character stream, O(1) per slide. The winnowed
  * subset (window hashes that are local minima over a selection band —
  * the MOSS/winnowing scheme) forms a compact, position-robust
  * fingerprint set: shared fingerprints locate partial overlaps (e.g.
  * boilerplate or quoted passages) that whole-document hashing misses.
  *
  * Runs per-partition; state is one window per document at a time, so
  * memory is O(window) regardless of corpus size. Rows-only checked
  * (the winnowing selection is not reasonably SQL-expressible);
  * RollingHashSpec pins the hashes against an independent recompute.
  */
object RollingHash {

  private val B = 257L           // base
  private val M = 1000000007L    // modulus (prime, < 2^31 so B*h fits long)
  val Window = 16
  private val SelectBand = 8     // winnowing band: keep min hash per band

  /** All window hashes of a string (positions 0..len-Window). */
  def windowHashes(s: String): Array[Long] = {
    val n = s.length
    if (n < Window) return Array.empty
    val out = new Array[Long](n - Window + 1)
    // B^(Window-1) mod M for the outgoing character
    var pow = 1L
    var i = 0
    while (i < Window - 1) { pow = pow * B % M; i += 1 }
    var h = 0L
    i = 0
    while (i < Window) { h = (h * B + s.charAt(i)) % M; i += 1 }
    out(0) = h
    i = Window
    while (i < n) {
      h = ((h - s.charAt(i - Window) * pow % M + M * B) % M * B + s.charAt(i)) % M
      out(i - Window + 1) = h
      i += 1
    }
    out
  }

  /** Winnowed fingerprint set: the minimum window hash of each
    * SelectBand-sized band (ties keep the rightmost, per winnowing).
    */
  def fingerprints(s: String): Seq[Long] =
    windowHashes(s).grouped(SelectBand).map(_.min).toSeq.distinct

  /** (doc_id, fingerprint) table over documents — join it with itself
    * on the fingerprint to locate partial-overlap candidates.
    */
  def fingerprintTable(t: Tables): DataFrame = {
    import t.spark.implicits._
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    t.documents
      .repartition(t.spark.sparkContext.defaultParallelism)
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .flatMap { case (id, text) => fingerprints(text).map(fp => (id, fp)) }
      .toDF("doc_id", "fingerprint")
  }
}
