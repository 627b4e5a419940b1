package graft

import graft.text.RollingHash

class RollingHashSpec extends SparkSuite {

  /** Independent per-window recompute: hash each window from scratch. */
  private def direct(s: String): Array[Long] = {
    val B = 257L; val M = 1000000007L; val W = RollingHash.Window
    (0 to s.length - W).map { i =>
      var h = 0L
      var j = i
      while (j < i + W) { h = (h * B + s.charAt(j)) % M; j += 1 }
      h
    }.toArray
  }

  test("rolling window hashes equal from-scratch hashes (the O(1) slide is exact)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a" * 40, // degenerate repeats
      "spark shuffle partition window",
      "x" * 15, // below window size → empty
      "abcdefghijklmnop" // exactly one window
    )
    texts.foreach { s =>
      assert(RollingHash.windowHashes(s).toSeq == direct(s).toSeq, s"text: $s")
    }
  }

  test("shared passages produce shared fingerprints; disjoint texts share none") {
    val boiler = "this exact boilerplate sentence appears in both documents verbatim"
    val a = s"unique leading content alpha beta. $boiler"
    val b = s"$boiler. completely different trailing material gamma delta"
    val shared = RollingHash.fingerprints(a).toSet
      .intersect(RollingHash.fingerprints(b).toSet)
    assert(shared.nonEmpty)
    val c = "zq wv xy kj pq mn bt lr dc fg hs"
    assert(RollingHash.fingerprints(a).toSet
      .intersect(RollingHash.fingerprints(c).toSet).isEmpty)
  }

  test("fingerprint table joins locate overlapping documents") {
    import spark.implicits._
    withLogLevel {
      val boiler = "standard license header text that every file carries along"
      val t = tempTables { dir =>
        Seq(
          (1L, s"$boiler plus the body of document one", "en", "s", 0L),
          (2L, s"document two body then $boiler", "en", "s", 0L),
          (3L, "entirely unrelated content with no common passage anywhere", "en", "s", 0L)
        ).toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.parquet(s"$dir/documents.parquet")
      }
      val fp = graft.text.RollingHash.fingerprintTable(t)
      val a = fp.toDF("doc_a", "f")
      val b = fp.toDF("doc_b", "f")
      val pairs = a.join(b, Seq("f")).where($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)))
      assert(!pairs.exists { case (x, y) => x == 3L || y == 3L })
    }
  }

  test("multimodal resize stub: size budget respected, deterministic, derived from input") {
    val payload = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val small = graft.mm.Multimodal.resizeStub(payload, 100)
    assert(small.length == 100)
    assert(small.toSeq == graft.mm.Multimodal.resizeStub(payload, 100).toSeq)
    assert(graft.mm.Multimodal.resizeStub(payload, 2000).length == 1000) // no upscale
  }
}
