package graft

import graft.io.Tables
import graft.text.Tokenizer

class TokenizerSpec extends SparkSuite {

  private lazy val t = withLogLevel(Tables(spark, "/root/testdata/sf0.001"))

  private val P2 = Tokenizer.pieces2.toSet
  private val P3 = Tokenizer.pieces3.toSet
  private val P4 = Tokenizer.pieces4.toSet

  /** Independent greedy longest-match segmenter: a plain while-loop
    * over substring probes, sharing only the piece constants with the
    * Catalyst fold under test.
    */
  private def refTokens(word: String): Int = {
    val w = word.take(Tokenizer.MaxWordChars)
    var pos = 0
    var n = 0
    while (pos < w.length) {
      val len =
        if (pos + 4 <= w.length && P4(w.substring(pos, pos + 4))) 4
        else if (pos + 3 <= w.length && P3(w.substring(pos, pos + 3))) 3
        else if (pos + 2 <= w.length && P2(w.substring(pos, pos + 2))) 2
        else 1
      pos += len
      n += 1
    }
    n
  }

  private def refWords(text: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(text).toSeq

  test("fold matches the independent reference on every sf0.001 document") {
    val got = Tokenizer.bpeTokenCount(t).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val docs = t.documents.select("doc_id", "text").collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val ws = refWords(text)
      val want = (ws.size, ws.map(refTokens(_).toLong).sum)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
  }

  test("hand anchors: vocab words are 1 token, unknown chars fall back to singles") {
    assert(refTokens("the") == 1)     // pieces3 hit
    assert(refTokens("that") == 1)    // pieces4 hit
    assert(refTokens("a") == 1)       // base alphabet
    assert(refTokens("x9") == 2)      // digits: singles only
    // greedy longest-match: "there" takes "ther"+"e", not "the"+"re"
    assert(refTokens("there") == 2)
  }

  test("token count bounds: ceil(len/4) <= ntok <= len for all corpus words") {
    val words = t.documents.select("text").collect()
      .flatMap(r => refWords(r.getString(0))).distinct
    assert(words.nonEmpty)
    words.foreach { w =>
      val n = refTokens(w)
      val len = math.min(w.length, Tokenizer.MaxWordChars)
      assert(n >= (len + 3) / 4 && n <= len, s"word $w: $n tokens, len $len")
    }
  }

  test("fertility is tokens/words and >= 1 when words exist") {
    Tokenizer.bpeTokenCount(t).collect().foreach { r =>
      val (nw, nt) = (r.getInt(1), r.getLong(2))
      if (nw == 0) assert(r.isNullAt(3))
      else {
        val f = r.getDouble(3)
        assert(f == nt.toDouble / nw)
        assert(f >= 1.0, s"fertility $f < 1 (every word is >= 1 token)")
      }
    }
  }

  test("bpeBudget totals equal the per-doc query re-aggregated by source") {
    val perDoc = Tokenizer.bpeTokenCount(t).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1).toLong, r.getLong(2)))).toMap
    val srcOf = t.documents.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = srcOf.groupBy(_._2).map { case (src, docs) =>
      val stats = docs.keys.toSeq.map(perDoc) // toSeq BEFORE map: a set-map collapses equal (nw,nt) pairs
      src -> ((docs.size.toLong, stats.map(_._1).sum, stats.map(_._2).sum))
    }
    val rows = Tokenizer.bpeBudget(t).collect()
    assert(rows.map(_.getString(0)).toSet == want.keySet)
    var shareSum = 0.0
    rows.foreach { r =>
      val src = r.getString(0)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == want(src), s"source $src")
      assert(r.getDouble(5) == r.getLong(3).toDouble / r.getLong(2), s"undercount $src")
      assert(r.getDouble(5) >= 1.0, s"undercount < 1 for $src")
      shareSum += r.getDouble(4)
    }
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
  }

  test("NULL text yields NULL counts; empty text yields zeros (the oracle's CASE mirror)") {
    // The DuckDB oracle can't tell NULL text from empty text through
    // its unnest (both produce zero wi rows), so it branches on
    // `d.text IS NULL` to reproduce what this pins: Spark's
    // size(regexp_extract_all(NULL)) is NULL, not 0.
    val dir = java.nio.file.Files.createTempDirectory("graft-tok-null").toString
    val docs = t.documents.limit(3).collect()
    assert(docs.length == 3)
    import org.apache.spark.sql.Row
    val schema = t.documents.schema
    val ti = schema.fieldIndex("text")
    val edited = spark.createDataFrame(
      java.util.Arrays.asList(
        Row.fromSeq(docs(0).toSeq),                              // real text
        Row.fromSeq(docs(1).toSeq.updated(ti, null)),            // NULL text
        Row.fromSeq(docs(2).toSeq.updated(ti, "!!! ??? ..."))),  // no word matches
      schema)
    edited.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Tokenizer.bpeTokenCount(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) -> r).toMap
    val idOf = (i: Int) => docs(i).getLong(docs(i).fieldIndex("doc_id"))
    val nullRow = rows(idOf(1))
    assert(nullRow.isNullAt(1) && nullRow.isNullAt(2) && nullRow.isNullAt(3),
      s"NULL text must yield NULL n_words/n_tokens/fertility, got $nullRow")
    val emptyRow = rows(idOf(2))
    assert(emptyRow.getInt(1) == 0 && emptyRow.getLong(2) == 0L && emptyRow.isNullAt(3),
      s"no-word text must yield 0/0/NULL, got $emptyRow")
    assert(!rows(idOf(0)).isNullAt(1), "real text row stays non-NULL")
  }

  test("bpeBudget plan: one hash exchange on source, fold stays below the agg") {
    val plan = Tokenizer.bpeBudget(t).queryExecution.executedPlan.toString
    val hashEx = "hashpartitioning\\(source".r.findAllIn(plan).length
    assert(hashEx >= 1, s"expected the source groupBy exchange:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"no join expected:\n$plan")
  }

  test("plan is row-local: no hash exchange, no join (vocab is a plan literal)") {
    val plan = Tokenizer.bpeTokenCount(t).queryExecution.executedPlan.toString
    // widen()'s conditional round-robin split of the single test-file
    // scan is the only exchange allowed (identity at real split counts);
    // any hashpartitioning would mean the fold grew a keyed shuffle.
    assert(!plan.contains("hashpartitioning"),
      s"tokenizer fold must not key-shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"no build side expected:\n$plan")
  }
}
