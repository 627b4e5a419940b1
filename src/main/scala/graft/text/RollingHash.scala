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
  * memory is O(window) regardless of corpus size. Oracle-checked in
  * FULL since round 15: the banded winnowing selection (min hash per
  * SelectBand-sized position band, distinct) is plain integer
  * arithmetic + GROUP BY, so [[fingerprintTableSql]] reproduces the
  * exact (doc_id, fingerprint) set in DuckDB. RollingHashSpec
  * additionally pins the hashes against an independent recompute, and
  * check.py's [band] entry validates winnow membership/density against
  * the pre-winnowing window-hash table.
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
    * SelectBand-sized band. Start positions are capped at [[MaxStarts]]
    * per the symmetric-cap invariant (CLAUDE.md #6; never binds below
    * ~8 KB docs), mirrored by the oracle's range(0, 8191).
    */
  def fingerprints(s: String): Seq[Long] =
    windowHashes(s).take(MaxStarts).grouped(SelectBand).map(_.min).toSeq.distinct

  /** Per-row work bound shared by [[fingerprints]], [[windowHashStats]]
    * and both oracles' range(0, 8191) tables. */
  val MaxStarts = 8191

  /** (doc_id, fingerprint) table over documents — join it with itself
    * on the fingerprint to locate partial-overlap candidates.
    */
  def fingerprintTable(t: Tables): DataFrame = {
    import t.spark.implicits._
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    t.widen(t.documents)
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .flatMap { case (id, text) => fingerprints(text).map(fp => (id, fp)) }
      .toDF("doc_id", "fingerprint")
  }

  /** Oracle-backed companion to the winnowed fingerprints: per-doc
    * aggregates (count / sum / min / max) of ALL window hashes — the
    * pre-winnowing table, which IS pure integer arithmetic and so
    * DuckDB-reproducible, unlike the winnowing selection itself. Start
    * positions are capped at 8191 per the symmetric-cap invariant
    * (never binds below ~8 KB docs; mirrored by the oracle's
    * range(0, 8191)). Docs shorter than one window emit no row in
    * either engine. Aggregates fit BIGINT exactly: each hash < M ≈
    * 1e9, ≤ 8191 of them → sum < 2^43.
    */
  def windowHashStats(t: Tables): DataFrame = {
    import t.spark.implicits._
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    t.widen(t.documents)
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        windowHashes(text).take(8191).map(h => (id, h))
      }
      .toDF("doc_id", "h")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_hashes"), sum($"h").as("sum_h"),
        min($"h").as("min_h"), max($"h").as("max_h"))
  }

  /** The window-hash polynomial written out with precomputed B^k mod M
    * literals (term sums stay far under 2^63, one final mod; unicode()
    * CAST to BIGINT before the multiply per CLAUDE.md #10): the inner
    * (doc_id, i, h) table both oracles read, positions capped at
    * [[MaxStarts]].
    */
  private val windowHashSqlInner: String = {
    val pows = Array.iterate(1L, Window)(p => p * B % M).reverse
    val poly = pows.zipWithIndex
      .map { case (p, j) =>
        s"CAST(unicode(substr(text, i + ${j + 1}, 1)) AS BIGINT) * $p" }
      .mkString(" + ")
    s"""SELECT doc_id, i, ($poly) % $M AS h
       | FROM (SELECT doc_id, text, CAST(r.range AS INT) AS i
       |       FROM documents d JOIN range(0, $MaxStarts) r
       |       ON r.range <= length(d.text) - $Window)""".stripMargin
  }

  val windowHashStatsSql: String =
    s"""SELECT doc_id, count(*) AS n_hashes, CAST(sum(h) AS BIGINT) AS sum_h,
       | min(h) AS min_h, max(h) AS max_h
       |FROM ($windowHashSqlInner)
       |GROUP BY doc_id""".stripMargin.replace("\n", " ")

  /** Full oracle for [[fingerprintTable]]: the banded winnowing is
    * min-per-(doc, i div SelectBand) + DISTINCT — pure integer
    * arithmetic over the same window-hash table, so DuckDB reproduces
    * the exact fingerprint set (tie handling is value-level min on
    * both sides; which position attains it never surfaces).
    */
  val fingerprintTableSql: String =
    s"""SELECT DISTINCT doc_id, fp AS fingerprint FROM (
       | SELECT doc_id, min(h) AS fp
       | FROM ($windowHashSqlInner)
       | GROUP BY doc_id, i // $SelectBand)""".stripMargin.replace("\n", " ")
}
