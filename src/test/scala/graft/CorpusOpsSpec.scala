package graft

import graft.pipeline.CorpusOps

class CorpusOpsSpec extends SparkSuite {

  /** Constructed documents: doc 0 is a "benchmark" doc (0 % 97 == 0);
    * doc 1 repeats one word heavily; doc 2 shares an 8-gram run with
    * doc 0; doc 3 is fully distinct.
    */
  private lazy val t = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    tempTables { dir =>
      Seq(
        (0L, benchText, "en", "src0", benchText.length.toLong),
        (1L, "spam spam spam spam spam ham", "en", "src1", 28L),
        (2L, "intro " + benchText + " outro", "en", "src2", 10L),
        (3L, "one two three four five six seven eight nine ten", "en", "src3", 49L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }
  }

  test("repetition: duplicate-2gram and top-word fractions are exact") {
    val r = CorpusOps.repetition(t).collect()
      .map(row => row.getLong(0) -> row).toMap
    // doc 1: 2-grams = [spam spam]x4, [spam ham] → 5 total, 2 distinct
    val d1 = r(1L)
    assert(d1.getLong(1) == 5)
    assert(d1.getDouble(2) == 3.0 / 5.0)
    assert(d1.getDouble(3) == 5.0 / 6.0) // "spam" 5 of 6 words
    // doc 3: all words distinct → no duplicate 2-grams, top word 1/10
    val d3 = r(3L)
    assert(d3.getDouble(2) == 0.0)
    assert(d3.getDouble(3) == 0.1)
  }

  test("ngram novelty: unseen-bigram occurrence counts vs the reference half are exact") {
    import spark.implicits._
    val t2 = tempTables { dir =>
      Seq(
        (0L, "alpha beta gamma delta", "en", "s", 22L), // reference (even)
        (1L, "alpha beta gamma", "en", "s", 16L),       // both bigrams seen
        (2L, "ignored reference text", "en", "s", 22L), // reference (even)
        (3L, "alpha beta novel", "en", "s", 16L)        // one seen, one unseen
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }
    val r = CorpusOps.ngramNovelty(t2).collect()
      .map(row => row.getLong(0) -> ((row.getLong(1), row.getLong(2), row.getDouble(3)))).toMap
    assert(r(1L) == ((2L, 0L, 0.0)))
    assert(r(3L) == ((2L, 1L, 0.5)))
    assert(!r.contains(0L) && !r.contains(2L)) // reference docs are not scored
  }

  test("text embedding: signed-hash counts match an independent md5 recompute, unit norm") {
    import spark.implicits._
    import graft.text.TextAnalysis
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    }
    val t2 = tempTables { dir =>
      Seq(
        (1L, "alpha beta gamma alpha", "en", "s", 22L),
        (2L, "gamma alpha beta alpha", "en", "s", 22L), // same multiset as 1
        (3L, "delta epsilon", "en", "s", 13L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }
    val rows = TextAnalysis.embed(t2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // independent recompute for doc 1
    val expect = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    "alpha beta gamma alpha".split(" ").foreach { w =>
      expect(h32(w) % 64) += (if (h32(w + ":s") % 2 == 0) 1L else -1L)
    }
    val nz = expect.filter(_._2 != 0L)
    val ss = nz.values.map(c => c * c).sum
    nz.foreach { case (dim, cnt) =>
      assert(rows((1L, dim)) == ((cnt, cnt / math.sqrt(ss.toDouble))), s"dim $dim")
    }
    // permutation invariance: same token multiset → identical cells
    val d1 = rows.collect { case ((1L, dim), v) => dim -> v }
    val d2 = rows.collect { case ((2L, dim), v) => dim -> v }
    assert(d1 == d2)
    // unit norm per doc
    Seq(1L, 2L, 3L).foreach { d =>
      val s2 = rows.collect { case ((`d`, _), (_, w)) => w * w }.sum
      assert(math.abs(s2 - 1.0) < 1e-12, s"doc $d norm $s2")
    }
  }

  test("stratified sample matches an independent md5 recompute") {
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val docs = t.documents.select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.collect {
      case (id, src) if h32(id.toString) % 100 < h32(src) % 40 + 10 => id
    }.toSet
    val got = CorpusOps.stratifiedSample(t).collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // rates stay inside the declared [10, 50) band
    val rates = CorpusOps.stratifiedSample(t).collect().map(_.getLong(2))
    assert(rates.forall(r => r >= 10 && r < 50))
  }

  test("budget sample matches an independent integer-arithmetic recompute") {
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val docs = t.documents.selectExpr("doc_id", "source",
      "cast(size(filter(split(text, ' '), x -> x != '')) as long) n").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ts = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val expected = docs.collect {
      case (id, src, _) if h32(id.toString) < 800L * 4294967296L / ts(src) => id
    }.toSet
    val got = CorpusOps.budgetSample(t).collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // fixture sources are all under the 800-token budget: kept whole
    // (threshold exceeds the h32 range, rate = 1)
    assert(ts.values.forall(_ < 800L))
    assert(got == docs.map(_._1).toSet)
  }

  test("budget sample: a source of all-empty-token docs keeps them, no div-by-zero") {
    // t_s = 0 for src_empty; the greatest(t_s, 1) clamp makes the
    // threshold 800·2^32, above the h32 range → every doc kept, and
    // the ANSI `div` never sees a zero divisor.
    val t2 = tempTables { dir =>
      import spark.implicits._
      Seq(
        (1L, "", "en", "src_empty", 0L),
        (2L, "   ", "en", "src_empty", 3L),
        (3L, "one two three", "en", "src_words", 13L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }
    val got = CorpusOps.budgetSample(t2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.contains(1L) && got.contains(2L)) // zero-token docs survive
    assert(got(1L) == 0L && got(2L) == 0L)
    assert(got.contains(3L)) // 3 tokens ≪ 800 budget: kept whole too
  }

  test("vocab coverage: bounds, totals, and a doc of only head tokens") {
    val rows = graft.text.TextAnalysis.vocabCoverage(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 4) // every doc reports, even zero-coverage ones
    rows.foreach { case (id, n, iv, cov) =>
      assert(iv >= 0 && iv <= n, s"doc $id in_vocab $iv out of [0,$n]")
      assert(cov == iv.toDouble / n)
    }
    // doc 1 = "spam spam spam spam spam ham": "spam" (count 5) tops the
    // vocab; "ham" (count 1) loses the tie-break to the ten count-2
    // bench words → coverage 5/6
    val d1 = rows.find(_._1 == 1L).get
    assert(d1._2 == 6L && d1._3 == 5L && d1._4 == 5.0 / 6.0)
  }

  test("profile reports one row per column with exact nulls/distincts") {
    val rows = CorpusOps.profile(t).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("text", "lang", "source"))
    // fixture: 4 docs, no nulls, all texts distinct, 1 lang, 4 sources
    assert(rows("text") == ((0L, 4L, 4L)))
    assert(rows("lang") == ((0L, 1L, 4L)))
    assert(rows("source") == ((0L, 4L, 4L)))
  }

  test("split assignment matches an independent md5 recompute; leakage matrix covers all pairs") {
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    def expectedSplit(id: Long): String = {
      val r = h32(s"$id:split") % 100
      if (r < 80) "train" else if (r < 90) "val" else "test"
    }
    val got = CorpusOps.assignSplits(t).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.size == 4)
    got.foreach { case (id, s) => assert(s == expectedSplit(id), s"doc $id") }
    // leakage matrix: unordered split pairs, total == near-dup pair count
    val leak = CorpusOps.splitLeakage(t).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(leak.forall { case (x, y, _) => x <= y }) // canonical order
    assert(leak.map(_._3).sum == graft.dedup.Dedup.minhashLsh(t).count())
  }

  test("chunking: chunks rejoin to the original token stream, counts and caps hold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a doc longer than one chunk: 150 tokens -> 3 chunks (64/64/22)
    val longText = (1 to 150).map(i => s"w$i").mkString(" ")
    val tl = tempTables { dir =>
      Seq((7L, longText, "en", "s", 1L), (8L, "short doc", "en", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }
    val chunks = CorpusOps.chunk(tl).orderBy($"doc_id", $"chunk_idx").collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc(7L).length == 3 && byDoc(8L).length == 1)
    assert(byDoc(7L).map(_.getLong(2)).toSeq == Seq(64L, 64L, 22L))
    // lossless: concatenating chunk_texts in order rebuilds the doc
    assert(byDoc(7L).map(_.getString(3)).mkString(" ") == longText)
    assert(byDoc(8L).head.getString(3) == "short doc")
  }

  test("packing: offsets stay inside the sequence and are contiguous within a shard") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = CorpusOps.pack(t)
      .join(CorpusOps.chunk(t).select($"doc_id", $"chunk_idx", $"n_toks"),
        Seq("doc_id", "chunk_idx"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    for ((_, _, shard, seqId, off, _) <- rows) {
      assert(off >= 0 && off < CorpusOps.SeqTokens)
      assert(seqId / CorpusOps.SeqIdStride == shard, "seq_id must encode its shard")
    }
    // within a shard, running offsets are exactly the cumulative token
    // count: replay each shard's (doc_id, chunk_idx) order and check
    for ((shard, rs) <- rows.groupBy(_._3)) {
      var cum = 0L
      for ((_, _, _, seqId, off, nToks) <- rs.sortBy(r => (r._1, r._2))) {
        assert(seqId == shard * CorpusOps.SeqIdStride + cum / CorpusOps.SeqTokens,
          s"shard $shard: seq_id drifted from the running total")
        assert(off == cum % CorpusOps.SeqTokens)
        cum += nToks
      }
    }
  }

  test("packing: non-default shard count re-buckets but keeps per-shard running totals exact") {
    import spark.implicits._
    val shards = 5 // deliberately != PackShards
    val rows = CorpusOps.pack(t, shards)
      .join(CorpusOps.chunk(t).select($"doc_id", $"chunk_idx", $"n_toks"),
        Seq("doc_id", "chunk_idx"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._3 >= 0 && r._3 < shards), "shard = h32(doc_id) mod shards")
    for ((shard, rs) <- rows.groupBy(_._3)) {
      var cum = 0L
      for ((_, _, _, seqId, off, nToks) <- rs.sortBy(r => (r._1, r._2))) {
        assert(seqId == shard * CorpusOps.SeqIdStride + cum / CorpusOps.SeqTokens)
        assert(off == cum % CorpusOps.SeqTokens)
        cum += nToks
      }
    }
    // the dial is real: a different shard count must move at least one
    // chunk's shard assignment on this 4-doc corpus
    val defaultShards = CorpusOps.pack(t).select($"doc_id", $"shard").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val movedAny = rows.exists { case (doc, _, shard, _, _, _) => defaultShards(doc) != shard }
    assert(movedAny, "expected some doc to land in a different shard under shards=5")
    intercept[IllegalArgumentException] { CorpusOps.pack(t, 0) }
  }

  test("boilerplate profile and strip agree on real data (n_boiler == n_removed)") {
    // the two operators count the SAME df>=2 lines through different
    // plans (agg-side vs anti-filter side of the shared lineDf); on
    // the sf0.001 corpus every doc's n_removed must equal its
    // n_boiler, and token conservation must hold per doc
    val t001 = graft.io.Tables(spark, "/root/testdata/sf0.001")
    val prof = CorpusOps.boilerplate(t001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap // n_lines, n_boiler
    val strip = CorpusOps.stripBoilerplate(t001).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap // n_lines, n_removed
    assert(prof.keySet == strip.keySet)
    for ((doc, (nLines, nBoiler)) <- prof) {
      assert(strip(doc)._1 == nLines, s"doc $doc line counts differ")
      assert(strip(doc)._2 == nBoiler, s"doc $doc: n_removed != n_boiler")
    }
    assert(prof.values.exists(_._2 > 0), "corpus should contain boilerplate")
  }

  test("sequence shuffle: per-shard rank of the salted md5 key, dense and reproducible") {
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val packed = CorpusOps.pack(t).collect().map(r => (r.getLong(2), r.getLong(3)))
    val nChunks = packed.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    for (salt <- Seq(0L, 7L)) {
      val expected = nChunks.keys.toSeq.groupBy(_._1).values.flatMap { ks =>
        ks.map { case (sh, sid) => (sh, sid, h32(s"$sid:$salt")) }
          .sortBy { case (_, sid, key) => (key, sid) }
          .zipWithIndex
          .map { case ((sh, sid, key), i) =>
            (sh, sid) -> ((nChunks((sh, sid)), key, i + 1L)) }
      }.toMap
      val got = CorpusOps.shuffleSequences(t, salt = salt).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == expected, s"salt=$salt")
    }
  }

  test("curated pass composes dedup, repetition filter, decontamination, sampling") {
    val curated = CorpusOps.curated(t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    // doc 0 is a benchmark doc (excluded); doc 1 fails the repetition
    // filter (top word 5/6); doc 2 is contaminated by doc 0's grams.
    // doc 3 is clean — it survives iff its sampling hash keeps it.
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val sampled3 = h32("3") % 100 < h32("src3") % 40 + 10
    val expected = if (sampled3) List((3L, "src3", 10L)) else Nil
    assert(curated == expected)
  }

  test("token budget: shares sum to 1, cumulative reaches the grand total in packing order") {
    val rows = CorpusOps.tokenBudget(t).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(rows.length == 4) // one row per source
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12)
    val packed = rows.sortBy(r => (-r._3, r._1))
    assert(packed.last._5 == rows.map(_._3).sum) // cum of last == total
    assert(packed.map(_._5).toSeq == packed.map(_._3).scanLeft(0L)(_ + _).tail.toSeq)
  }

  test("scrub removes exactly the stopword tokens and counts them") {
    import org.apache.spark.sql.functions._
    val rows = graft.text.TextAnalysis.scrub(t).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(!rows.values.exists { case (txt, _) =>
      txt.split(" ").exists(w => w == "a" || w == "the") })
    // fixture has no stopwords -> identity scrub, zero removed
    assert(rows.values.forall(_._2 == 0))
    // and a doc WITH stopwords gets them cut
    val t2 = tempTables { dir =>
      import spark.implicits._
      Seq((1L, "the quick a fox the end", "en", "s", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }
    val r2 = graft.text.TextAnalysis.scrub(t2).collect().head
    assert(r2.getString(1) == "quick fox end" && r2.getInt(2) == 3)
  }

  test("boilerplate: cross-doc line df counts docs (not occurrences), fractions exact") {
    val l1 = "a b c d e f g h"
    val l2 = "i j k l m n o p"
    val l3 = "q r s t u v w x"
    val l4 = "u1 u2 u3 u4 u5 u6 u7 u8"
    val l5 = "r1 r2 r3 r4 r5 r6 r7 r8"
    val tb = tempTables { dir =>
      import spark.implicits._
      Seq(
        (0L, s"$l1 $l2", "en", "s", 0L),          // shares l1 with doc 1
        (1L, s"$l1 $l3", "en", "s", 0L),
        (2L, l4, "en", "s", 0L),                   // fully unique
        (3L, "p1 p2 p3 p4 p5 p6 p7 p8 p9", "en", "s", 0L), // ragged tail line
        (4L, s"$l5 $l5", "en", "s", 0L)            // WITHIN-doc repeat only
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }
    val r = CorpusOps.boilerplate(tb).collect()
      .map(row => row.getLong(0) ->
        (row.getLong(1), row.getLong(2), row.getLong(3), row.getDouble(4))).toMap
    assert(r(0L) == ((2L, 1L, 2L, 0.5)))
    assert(r(1L) == ((2L, 1L, 2L, 0.5)))
    assert(r(2L) == ((1L, 0L, 1L, 0.0)))
    // 9 words → two lines (8-word + 1-word tail), neither cross-doc
    assert(r(3L) == ((2L, 0L, 1L, 0.0)))
    // the same line twice in ONE doc is df=1: repetition, not boilerplate
    assert(r(4L) == ((2L, 0L, 1L, 0.0)))

    // the strip pass drops exactly the df>=2 lines, preserves order,
    // and keeps all-boilerplate docs with empty text
    val s = CorpusOps.stripBoilerplate(tb).collect()
      .map(row => row.getLong(0) ->
        (row.getString(1), row.getLong(2), row.getLong(3))).toMap
    assert(s(0L) == ((l2, 2L, 1L)))         // l1 stripped, l2 survives
    assert(s(1L) == ((l3, 2L, 1L)))
    assert(s(2L) == ((l4, 1L, 0L)))         // unique doc untouched
    assert(s(3L)._1.endsWith(" p9") && s(3L)._3 == 0L) // ragged tail kept in order
    assert(s(4L) == ((s"$l5 $l5", 2L, 0L))) // within-doc repeat survives
    // a doc that is ENTIRELY shared lines strips to empty
    val tbAll = tempTables { dir =>
      import spark.implicits._
      Seq((0L, l1, "en", "s", 0L), (1L, l1, "en", "s", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }
    val sAll = CorpusOps.stripBoilerplate(tbAll).collect()
      .map(row => row.getLong(0) -> (row.getString(1), row.getLong(3))).toMap
    assert(sAll(0L) == (("", 1L)) && sAll(1L) == (("", 1L)))
  }

  test("contamination flags the 4-gram overlap with the benchmark doc only") {
    val rows = CorpusOps.contamination(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 2 contains the benchmark doc's full 10-word run → shares all
    // seven of its distinct 4-grams
    assert(rows.contains(2L))
    assert(rows(2L) == 7L)
    // docs 1 and 3 share no 4-gram with doc 0
    assert(!rows.contains(1L) && !rows.contains(3L))
    // the benchmark doc itself is never reported
    assert(!rows.contains(0L))
  }

  /** Skewed multi-lang corpus for the temperature mixture: en 400,
    * fr 100, de 25 docs. √-flattening at budget 300 gives integer
    * targets 171/85/25 (de caps at its size) where proportional
    * allocation would give 228/57/14.
    */
  private lazy val tempT = {
    import spark.implicits._
    tempTables { dir =>
      val rows = (0 until 400).map(i => (i.toLong, s"en doc $i", "en", "web", 10L)) ++
        (0 until 100).map(i => (1000L + i, s"fr doc $i", "fr", "web", 10L)) ++
        (0 until 25).map(i => (2000L + i, s"de doc $i", "de", "web", 10L))
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }
  }

  test("temperature mix: sqrt-flattened integer allocation matches an exact recompute") {
    val rows = CorpusOps.temperatureMix(tempT).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val n = Map("en" -> 400L, "fr" -> 100L, "de" -> 25L)
    // same arithmetic path as the engine: int64→double cast, correctly
    // rounded sqrt, floor, then pure integer division
    val w = n.map { case (l, v) =>
      l -> math.floor(math.sqrt((v * 1000000L).toDouble)).toLong
    }
    val wTot = w.values.sum
    for ((lang, nd) <- n) {
      val target = math.min(nd, 300L * w(lang) / wTot)
      assert(rows(lang) == ((nd, w(lang), target)), s"allocation for $lang")
    }
    // α=1/2 flattening: tail languages gain share vs proportional,
    // the head loses, and a tail target never exceeds its size
    assert(rows("de")._3 == 25L, "capped tail language keeps everything")
    assert(rows("fr")._3 > 300L * 100 / 525, "tail share must exceed proportional")
    assert(rows("en")._3 < 300L * 400 / 525, "head share must shrink vs proportional")
  }

  test("temperature sample: threshold draw matches an independent md5 recompute") {
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val alloc = CorpusOps.temperatureMix(tempT).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val docs = tempT.documents.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.collect {
      case (id, lang) if h32(id.toString + ":tmix") % 1048576L <
        math.min(1048576L, alloc(lang)._2 * 1048576L / math.max(alloc(lang)._1, 1L)) => id
    }.toSet
    val got = CorpusOps.temperatureSample(tempT).collect().map(_.getLong(0)).toSet
    assert(got == expected, "draw must match the integer-threshold recompute")
    // de's target equals its size → threshold caps at 2^20 → whole lang kept
    val deIds = docs.collect { case (id, "de") => id }.toSet
    assert(deIds.subsetOf(got), "capped language must be kept whole")
    // expected-size draw lands near the budget on the capped-head mix
    val targetSum = alloc.values.map(_._2).sum
    assert(math.abs(got.size - targetSum) < 60,
      s"drew ${got.size} vs target sum $targetSum")
  }

  test("dedup lines: later within-doc repeats drop, first stays, order preserved") {
    import spark.implicits._
    val lineA = (1 to 8).map(i => s"a$i").mkString(" ")
    val lineB = (1 to 8).map(i => s"b$i").mkString(" ")
    val t2 = tempTables { dir =>
      Seq(
        // doc 1: A B A B -> A B (both repeats drop, order kept)
        (1L, s"$lineA $lineB $lineA $lineB", "en", "s", 0L),
        // doc 2: same line in ANOTHER doc is untouched (within-doc only)
        (2L, s"$lineA", "en", "s", 0L),
        (3L, (1 to 16).map(i => s"u$i").mkString(" "), "en", "s", 0L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }
    val got = CorpusOps.dedupLines(t2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((s"$lineA $lineB", 4L, 2L)))
    assert(got(2L) == ((lineA, 1L, 0L)))
    assert(got(3L)._3 == 0L)
  }

  test("scrub spans: shared passage removed at any alignment, survivors rejoin in order") {
    import spark.implicits._
    val shared = (1 to 16).map(i => s"p$i").mkString(" ")
    val t2 = tempTables { dir =>
      Seq(
        // the 16-word passage sits at DIFFERENT offsets — only the
        // exact shared window matches across docs (mixed windows
        // contain a-words vs b-words), so covered = the passage alone
        (1L, s"a1 a2 a3 $shared a4 a5", "en", "s", 0L),
        (2L, s"b1 b2 $shared b3 b4 b5 b6", "en", "s", 0L),
        (3L, (1 to 20).map(i => s"u$i").mkString(" "), "en", "s", 0L),
        // sub-window identical docs: the whole-text short span dups →
        // fully scrubbed, kept in the output with empty text
        (4L, "s1 s2 s3 s4 s5", "en", "s", 0L),
        (5L, "s1 s2 s3 s4 s5", "en", "s", 0L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }
    val got = CorpusOps.scrubSpans(t2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("a1 a2 a3 a4 a5", 21L, 16L)))
    assert(got(2L) == (("b1 b2 b3 b4 b5 b6", 22L, 16L)))
    assert(got(3L)._3 == 0L && got(3L)._1.startsWith("u1 u2"))
    assert(got(4L) == (("", 5L, 5L)) && got(5L) == (("", 5L, 5L)))
  }
}
