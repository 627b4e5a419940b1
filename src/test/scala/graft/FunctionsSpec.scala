package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.io.Tables

class FunctionsSpec extends SparkSuite {

  test("graft_dot is bitwise-equal to the aggregate/zip_with fold") {
    import spark.implicits._
    withLogLevel {
      GraftFunctions.register(spark)
      val rng = new scala.util.Random(7)
      val rows = Seq.fill(50)((
        Array.fill(64)(rng.nextDouble() * 2 - 1),
        Array.fill(64)(rng.nextDouble() * 2 - 1)))
      val df = rows.toDF("a", "b")
      val got = df.select(
        expr("graft_dot(a, b)").as("native"),
        aggregate(zip_with($"a", $"b", (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("hof")
      ).collect()
      got.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
    }
  }

  test("graft_vdiv is bitwise-equal to the transform(x / s) HOF") {
    import spark.implicits._
    withLogLevel {
      GraftFunctions.register(spark)
      val rng = new scala.util.Random(13)
      val rows = Seq.fill(50)((
        Array.fill(64)(rng.nextDouble() * 2 - 1),
        rng.nextDouble() * 9 + 0.1))
      val df = rows.toDF("v", "s")
      val got = df.select(
        expr("graft_vdiv(v, s)").as("native"),
        transform($"v", x => x / $"s").as("hof")
      ).collect()
      got.foreach { r =>
        val n = r.getSeq[Double](0); val h = r.getSeq[Double](1)
        assert(n.length == h.length && n.length == 64)
        n.zip(h).foreach { case (a, b) =>
          assert(java.lang.Double.doubleToLongBits(a) ==
            java.lang.Double.doubleToLongBits(b))
        }
      }
      // null array / null scalar both yield null, like the HOF
      val nulls = spark.sql(
        "SELECT graft_vdiv(CAST(NULL AS array<double>), 2.0d) a, " +
          "graft_vdiv(array(1.0d, 2.0d), CAST(NULL AS double)) b").head
      assert(nulls.isNullAt(0) && nulls.isNullAt(1))
    }
  }

  test("graft_word_grams equals the composed transform/slice gram expression") {
    import spark.implicits._
    withLogLevel {
      GraftFunctions.register(spark)
      // the pre-r22 composed form, inlined verbatim as the reference
      def hof(w: Int): String =
        s"transform(array(split(text, ' ')), toks -> " +
          s"transform(sequence(1, least(greatest(size(toks)-${w - 1}, 1), 8191)), " +
          s"i -> concat_ws(' ', slice(toks, i, $w))))[0]"
      val rng = new scala.util.Random(29)
      val words = Vector("alpha", "beta", "g", "δδ", "", "x y".replace(" ", ""))
      val adversarial = Seq(
        "",                       // empty text: one empty token
        " ",                      // two empty tokens
        "one",                    // single word, width > n
        "a  b",                   // consecutive spaces: empty middle token
        " lead", "trail ",        // leading/trailing space
        "ü ö π",                  // multi-byte
        Seq.fill(9000)("w").mkString(" ")) ++ // beyond the 8191 cap
        Seq.fill(40)(Seq.fill(1 + rng.nextInt(30))(
          words(rng.nextInt(words.length))).mkString(" "))
      val df = adversarial.toDF("text")
      for (w <- Seq(2, 4, 5, 16)) {
        val rows = df.select(expr(s"graft_word_grams(text, $w)").as("native"),
          expr(hof(w)).as("ref")).collect()
        rows.foreach { r =>
          assert(r.getSeq[String](0) == r.getSeq[String](1),
            s"width $w mismatch: ${r.getSeq[String](0).take(5)} vs ${r.getSeq[String](1).take(5)}")
        }
      }
      assert(spark.sql("SELECT graft_word_grams(CAST(NULL AS string), 2)").head.isNullAt(0))
    }
  }

  // GraftExtensions is exercised end-to-end by graft.tools.ExtDemo (a
  // fresh JVM builds the session with spark.sql.extensions); inside this
  // shared-session test JVM getOrCreate would silently ignore extensions.

  test("graft_nibble_l1: codegen path equals the reference loop on random words") {
    import spark.implicits._
    withLogLevel {
      GraftFunctions.register(spark)
      val rng = new scala.util.Random(11)
      val rows = Seq.fill(200)((rng.nextLong(), rng.nextLong())) :+
        ((0L, -1L)) :+ ((-1L, -1L)) :+ ((0L, 0L)) // all-15s / equal edges
      val got = rows.toDF("a", "b")
        .select($"a", $"b", expr("graft_nibble_l1(a, b)").as("l1"))
        .collect()
      got.foreach { r =>
        assert(r.getInt(2) == graft.functions.NibbleL1.l1(r.getLong(0), r.getLong(1)))
      }
      // extremes: 16 nibbles all |15-0| apart
      assert(graft.functions.NibbleL1.l1(0L, -1L) == 240)
    }
  }

  test("graft_srp_words: codegen equals reference pack; frozen masks; sign geometry") {
    import spark.implicits._
    withLogLevel {
      GraftFunctions.register(spark)
      // frozen-hyperplane regression pin: mask(0,0) under the FROZEN
      // seed — a seed change silently re-keys every banded pair family
      assert(graft.functions.SrpWords.masks(1)(0) == -2152535657050944081L)
      val rng = new scala.util.Random(13)
      val rows = Seq.fill(40)(Array.fill(64)(rng.nextDouble() * 2 - 1))
      val df = rows.toDF("v")
      val got = df.select($"v", expr("graft_srp_words(v, 3)").as("w")).collect()
      got.foreach { r =>
        val v = r.getSeq[Double](0).toArray
        val ref = graft.functions.SrpWords.pack(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(v), 3)
        assert(r.getSeq[Long](1) == ref.toSeq)
      }
      // negation complements every sign bit (acc != 0 a.s. on random data)
      df.select(expr("graft_srp_words(v, 2)").as("w"),
        expr("graft_srp_words(transform(v, x -> -x), 2)").as("wn")).collect()
        .foreach { r =>
          r.getSeq[Long](0).zip(r.getSeq[Long](1)).foreach { case (a, b) =>
            assert((a ^ b) == -1L)
          }
        }
      // hyperplane-LSH identity: per-bit collision fraction for pairs
      // at a controlled angle θ ≈ 1 − θ/π (the p₁ pairBandKnobsFor
      // consumes). 60° pairs → expect ≈ 2/3; 40 pairs × 512 bits.
      val theta = math.Pi / 3
      val pairs = Seq.fill(40) {
        val u = Array.fill(64)(rng.nextGaussian())
        val r0 = Array.fill(64)(rng.nextGaussian())
        val un = math.sqrt(u.map(x => x * x).sum)
        val uu = u.map(_ / un)
        val proj = r0.zip(uu).map { case (x, e) => x * e }.sum
        val perp0 = r0.zip(uu).map { case (x, e) => x - proj * e }
        val pn = math.sqrt(perp0.map(x => x * x).sum)
        val w = uu.zip(perp0).map { case (a, p) =>
          math.cos(theta) * a + math.sin(theta) * p / pn }
        (uu, w)
      }
      val coll = pairs.toDF("a", "b")
        .select(expr("graft_srp_words(a, 8)").as("wa"),
          expr("graft_srp_words(b, 8)").as("wb"))
        .collect().map { r =>
          r.getSeq[Long](0).zip(r.getSeq[Long](1))
            .map { case (x, y) => 64 - java.lang.Long.bitCount(x ^ y) }.sum
        }.sum.toDouble / (40.0 * 512.0)
      val expected = 1.0 - theta / math.Pi
      assert(math.abs(coll - expected) < 0.05,
        f"measured $coll%.4f vs 1-θ/π = $expected%.4f")
    }
  }

  test("edit histogram: packing matches a direct recompute and L1/2 lower-bounds levenshtein") {
    import spark.implicits._
    withLogLevel {
      GraftFunctions.register(spark) // edHistWord = graft_char_hist
      val rng = new scala.util.Random(13)
      val alpha = "abcdefghijklmnopqrstuvwxyz "
      def word(n: Int) = Seq.fill(n)(alpha(rng.nextInt(alpha.length))).mkString
      val docs = (1L to 60L).map(i => (i, word(4 + rng.nextInt(60))))
      // reference: saturating 32-bucket counts packed 16 per long
      def histRef(s: String): (Long, Long) = {
        val c = new Array[Int](32)
        s.foreach { ch => val b = ch.toInt % 32; c(b) = math.min(c(b) + 1, 15) }
        def pack(off: Int) = (0 until 16).map(b => c(off + b).toLong << (4 * b))
          .reduce(_ | _)
        (pack(0), pack(16))
      }
      val got = docs.toDF("doc_id", "k")
        .select($"doc_id", $"k",
          graft.dedup.Dedup.edHistWord($"k", 0).as("h1"),
          graft.dedup.Dedup.edHistWord($"k", 1).as("h2"))
        .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3))))
      got.foreach { case (k, hs) => assert(hs == histRef(k), s"packing for '$k'") }
      // the candidate-filter bound: L1(hist)/2 <= edit distance, so the
      // <= 2d filter can never drop a true pair
      val hs = got.toSeq
      for (i <- hs.indices; j <- i + 1 until hs.size) {
        val ((ka, (a1, a2)), (kb, (b1, b2))) = (hs(i), hs(j))
        val l1 = graft.functions.NibbleL1.l1(a1, b1) +
          graft.functions.NibbleL1.l1(a2, b2)
        val ed = org.apache.commons.text.similarity.LevenshteinDistance
          .getDefaultInstance.apply(ka, kb)
        assert(l1 <= 2 * ed, s"bound violated: l1=$l1 ed=$ed for '$ka' vs '$kb'")
      }
    }
  }

  test("bounded-buffer top-k agrees with the row_number window, independent of partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // skewed groups incl. ties on value (tiebreak must be total) and a
    // group smaller than k
    val rows = (1L to 500L).map(i => (s"g${i % 3}", (i % 7).toDouble, i)) :+
      (("tiny", 1.0, 9001L))
    for (parts <- Seq(1, 7)) {
      val df = spark.createDataset(rows.toDS().rdd.repartition(parts))
        .toDF("o_orderpriority", "o_totalprice", "o_orderkey")
      val typed = df.as[graft.functions.Aggs.OrderSlice]
        .groupByKey(_.o_orderpriority)
        .agg(graft.functions.Aggs.topKOf[graft.functions.Aggs.OrderSlice](5)(
          _.o_totalprice, _.o_orderkey).toColumn.name("top"))
        .toDF("prio", "top")
        .select(col("prio"), posexplode(col("top")))
        .select(col("prio"), (col("pos") + 1).cast("long").as("rnk"),
          col("col._2").as("id"), col("col._1").as("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val windowed = df.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(typed == windowed, s"parts=$parts")
    }
  }

  test("weighted reservoir: deterministic, partition-independent, weight-biased") {
    import spark.implicits._
    // 1000 items, item 777 given 1000x the weight of the rest: A-ES
    // must include it (P(miss) < 1e-3 ~ hash-deterministic here), and
    // the same data in different partitionings must give the SAME set
    val rows = (1L to 1000L).map(i => ("g", if (i == 777L) 100000L else 100L, i))
    val picks = for (parts <- Seq(1, 13)) yield {
      val df = spark.createDataset(rows.toDS().rdd.repartition(parts))
        .toDF("lang", "n_chars", "doc_id")
        .select(col("lang"), col("doc_id"), col("n_chars"))
      df.as[graft.functions.Aggs.DocSlice]
        .groupByKey(_.lang)
        .agg(graft.functions.Aggs.weightedSampleOf[graft.functions.Aggs.DocSlice](10)(
          _.n_chars, _.doc_id).toColumn.name("picked"))
        .collect().head._2.map(_._2).toSet
    }
    assert(picks(0) == picks(1), "sample must not depend on partitioning")
    assert(picks(0).contains(777L), "a 1000x-weight item must be sampled")
    assert(picks(0).size == 10)
  }

  test("A-ES key matches the oracle's SQL formula (md5-derived u, ln/w)") {
    // the Scala aggregator computes keys driver/executor-side; the
    // DuckDB oracle re-derives them in SQL — pin the Spark SQL twin of
    // that formula against the Scala value so all three agree
    import spark.implicits._
    val df = Seq((1L, 10L), (42L, 999L), (777L, 1L), (123456789L, 64437L))
      .toDF("doc_id", "w")
    val sqlKeys = df.selectExpr(
      "doc_id",
      "ln((conv(substring(md5(cast(cast(doc_id AS STRING) AS BINARY)), 1, 8), 16, 10) + 0.5D) / 4294967296.0D) / greatest(w, 1L) AS k")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, w) <- Seq((1L, 10L), (42L, 999L), (777L, 1L), (123456789L, 64437L)))
      assert(graft.functions.Aggs.aesKey(id, w) == sqlKeys(id),
        s"scala vs spark-sql key mismatch for id=$id")
  }

  test("property: MG survivors cover every >n/(counters+1) value for random streams and merge shapes") {
    // the mergeable-summaries guarantee, exercised directly on the
    // Aggregator's reduce/merge over random data, random chunkings,
    // and random merge orders (what Spark's partial/final stages do
    // with arbitrary partition boundaries) — this is the exact path
    // q51HeavyHittersSketch's single-global-group aggregation takes
    // as well as mgHeavyHittersPerGroup's per-group one. counters=15:
    // any value with true count > n/16 must survive.
    val agg = graft.functions.Aggs.mgCandidatesOf[String](15)(identity)
    for (seed <- 0 until 30) {
      val rnd = new scala.util.Random(seed)
      val n = 500 + rnd.nextInt(1500)
      // cubed uniform ~ heavy head: a few values take large shares
      val vals = Seq.fill(n)(s"v${(math.pow(rnd.nextDouble(), 3) * 50).toInt}")
      val chunks = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var rest = vals
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(200)
        chunks += rest.take(take)
        rest = rest.drop(take)
      }
      val bufs = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(bufs).reduce(agg.merge)
      val cands = agg.finish(merged).toSet
      assert(cands.size <= 15, s"seed=$seed: sketch exceeded its bound")
      val counts = vals.groupBy(identity).map { case (v, g) => v -> g.size }
      val mustSurvive = counts.collect { case (v, c) if c.toLong * 16 > n => v }.toSet
      assert(mustSurvive.subsetOf(cands),
        s"seed=$seed n=$n: guarantee violated for ${mustSurvive -- cands}")
    }
  }

  test("grouped MG candidates: superset guarantee holds under any partitioning, query equals exact") {
    import spark.implicits._
    // skewed synthetic group: value "hot" at 40%, "warm" at 12%, 480
    // singletons — with counters=24 (k=8 threshold 12.5%) hot must
    // survive, warm must not be REQUIRED to (12% < 1/8), and the
    // exact recount decides either way
    val rows = (Seq.fill(400)("hot") ++ Seq.fill(120)("warm") ++
      (1 to 480).map(i => s"cold$i")).map(v => ("g", v))
    for (parts <- Seq(1, 13)) {
      val ds = spark.createDataset(rows.toDS().rdd.repartition(parts))
        .toDF("lang", "source").as[graft.functions.Aggs.LangSource]
      val cands = ds.groupByKey(_.lang)
        .agg(graft.functions.Aggs.mgCandidatesOf[graft.functions.Aggs.LangSource](24)(
          _.source).toColumn.name("c"))
        .collect().head._2.toSet
      assert(cands.contains("hot"), s"parts=$parts: 40% value must survive MG")
      assert(cands.size <= 24, s"parts=$parts: sketch must stay bounded")
    }
    // end-to-end on the documents table vs the exact window form
    val t = Tables(spark, "/root/testdata/sf0.001")
    val got = graft.functions.Aggs.mgHeavyHittersPerGroup(t).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    val exact = t.documents.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum(col("cnt")).over(w))
      .filter(col("cnt") * 25 > col("total"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == exact)
    assert(got.nonEmpty)
    // tightest counter budget the guarantee covers: counters+1 > k
    val tight = graft.functions.Aggs.mgHeavyHittersPerGroup(t, k = 25, counters = 25)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(tight == exact)
  }

  test("top-k buffer ranks NaN first under DESC, like Spark's window sort") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = Seq(("g", Double.NaN, 1L), ("g", 5.0, 2L), ("g", Double.NaN, 3L),
      ("g", Double.PositiveInfinity, 4L), ("g", -1.0, 5L))
    val df = rows.toDF("o_orderpriority", "o_totalprice", "o_orderkey")
    val typed = df.as[graft.functions.Aggs.OrderSlice]
      .groupByKey(_.o_orderpriority)
      .agg(graft.functions.Aggs.topKOf[graft.functions.Aggs.OrderSlice](3)(
        _.o_totalprice, _.o_orderkey).toColumn.name("top"))
      .toDF("prio", "top")
      .select(posexplode(col("top"))).select(col("col._2"))
      .collect().map(_.getLong(0)).toSeq
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3).orderBy(col("rnk"))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSeq
    assert(typed == Seq(1L, 3L, 4L)) // NaN,NaN then +Inf — DESC semantics
    assert(typed == windowed)
  }

  test("mixture interleave matches an independent stride-scheduling recompute") {
    import spark.implicits._
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    // three strata: en truncates to k, fr EXHAUSTS below k, zh exact-k
    val docs =
      (1L to 9L).map(i => (i, "en", 10L + i)) ++
        (11L to 13L).map(i => (i, "fr", 40L + i)) ++
        (21L to 24L).map(i => (i, "zh", 5L * i))
    val tb = tempTables { dir =>
      docs.map { case (id, lang, nc) => (id, "x", lang, "s", nc) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }
    val k = 4
    // independent recompute: A-ES top-k per lang, stride 2520/w, total sort
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      val w = h32(lang) % 9 + 1
      ds.map { case (id, _, nc) => (graft.functions.Aggs.aesKey(id, nc), id) }
        .sortBy { case (key, id) => (-key, id) }
        .take(k).zipWithIndex
        .map { case ((_, id), i) =>
          val rnk = i + 1L
          (rnk * (2520L / w), lang, id, rnk)
        }
    }.sortBy { case (sk, lang, id, _) => (sk, lang, id) }
      .zipWithIndex
      .map { case ((sk, lang, id, rnk), p) => (p + 1L, lang, rnk, id, sk) }
    val got = graft.functions.Aggs.mixtureInterleaveQuery(tb, k)
      .orderBy(col("pos")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
    // fr has only 3 docs: the stratum exhausts below k without gaps
    assert(got.count(_._2 == "fr") == 3)
    assert(got.count(_._2 == "en") == k && got.count(_._2 == "zh") == k)
    // the stream key is the emit clock: non-decreasing along pos
    assert(got.map(_._5).sliding(2).forall(s => s.head <= s.last))
  }

  test("property: interleave prefixes hold the stride-scheduling mix for random corpora") {
    import spark.implicits._
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val pool = Seq("en", "fr", "de", "es", "zh", "ja", "ko", "pt")
    val k = 10
    for (seed <- 0 until 5) {
      val rnd = new scala.util.Random(seed)
      val langs = rnd.shuffle(pool).take(2 + rnd.nextInt(4))
      val docs = langs.zipWithIndex.flatMap { case (lang, li) =>
        (1 to 1 + rnd.nextInt(30)).map(j =>
          (li * 1000L + j, "x", lang, "s", 1L + rnd.nextInt(500)))
      }
      val tb = tempTables { dir =>
        docs.toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.parquet(s"$dir/documents.parquet")
      }
      val rows = graft.functions.Aggs.mixtureInterleaveQuery(tb, k)
        .orderBy(col("pos")).collect()
        .map(r => (r.getString(1), r.getLong(4))) // (lang, stream_key)
      val stride = langs.map(l => l -> 2520L / (h32(l) % 9 + 1)).toMap
      val total = langs.map(l => l -> math.min(k, docs.count(_._3 == l))).toMap
      // after consuming every row with stream_key <= K, each stratum
      // must have emitted exactly min(total, K/stride) draws — the
      // prefix-mix guarantee the scaladoc advertises, ties included
      val counts = collection.mutable.Map.empty[String, Int].withDefaultValue(0)
      var i = 0
      while (i < rows.length) {
        val key = rows(i)._2
        while (i < rows.length && rows(i)._2 == key) { counts(rows(i)._1) += 1; i += 1 }
        for (l <- langs)
          assert(counts(l) == math.min(total(l).toLong, key / stride(l)),
            s"seed=$seed lang=$l after key=$key: ${counts(l)} vs " +
              s"min(${total(l)}, ${key / stride(l)})")
      }
      for (l <- langs) assert(counts(l) == total(l), s"seed=$seed $l final count")
    }
  }

  test("graft_dot handles nulls and length mismatch") {
    import spark.implicits._
    withLogLevel {
      GraftFunctions.register(spark)
      val df = Seq(
        (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0, 9.0))), // min-length semantics
        (None, Some(Array(1.0)))
      ).toDF("a", "b")
      val got = df.select(expr("graft_dot(a, b)")).collect()
      assert(got(0).getDouble(0) == 11.0)
      assert(got(1).isNullAt(0))
    }
  }

  test("graft_h32 equals the composed conv∘substring∘md5 form it replaced") {
    import spark.implicits._
    withLogLevel {
      GraftFunctions.register(spark)
      val rng = new scala.util.Random(17)
      val strs = Seq("", " ", "a", "the quick brown fox", "naïve café — ünïcödé",
        " nul ", "🦊emoji🦊", "x" * 10000) ++
        Seq.fill(500)(rng.alphanumeric.take(rng.nextInt(64) + 1).mkString) ++
        Seq.fill(100)(Seq.fill(rng.nextInt(30) + 1)(
          (rng.nextInt(0xffff) + 1).toChar).mkString)
      val got = strs.toDF("s").select(
        expr("graft_h32(s)").as("native"),
        // the exact pre-r18 composed expression (and the DuckDB
        // oracle's semantics, invariant 4)
        conv(substring(md5($"s".cast("binary")), 1, 8), 16, 10)
          .cast("long").as("composed"),
        $"s")
        .collect()
      got.foreach { r =>
        assert(r.getLong(0) == r.getLong(1), s"mismatch on ${r.getString(2)}")
        assert(r.getLong(0) >= 0L && r.getLong(0) <= 0xffffffffL)
      }
      // null propagates
      val n = Seq[Option[String]](None).toDF("s")
        .selectExpr("graft_h32(s)").collect()
      assert(n(0).isNullAt(0))
    }
  }

  test("topKOf reduce/merge/finish equals sort-take on adversarial arrival orders") {
    // Direct pin of the r19 bounded-buffer rewrite (stale-threshold
    // reject, unsorted tail, trim-at-2k): until now its correctness
    // rested on indirect oracles (agg_topk_per_group hash,
    // StreamingSpec batch equality) that never exercise merge-of-
    // partial-buffer shapes or tie-at-threshold arrivals on purpose.
    import graft.functions.Aggs
    val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      def compare(x: (Double, Long), y: (Double, Long)): Int = {
        val c = java.lang.Double.compare(y._1, x._1) // v DESC (NaN first)
        if (c != 0) c else java.lang.Long.compare(x._2, y._2) // id ASC
      }
    }
    def reference(items: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
      items.sorted(ord).take(k)
    // NaN-safe sequence equality: tuple == compares primitive doubles
    // (NaN != NaN), so compare the IEEE bit patterns instead
    def bits(s: Seq[(Double, Long)]): Seq[(Long, Long)] =
      s.map { case (v, i) => (java.lang.Double.doubleToLongBits(v), i) }
    def viaAgg(items: Seq[(Double, Long)], k: Int, nChunks: Int): Seq[(Double, Long)] = {
      val agg = Aggs.topKOf[(Double, Long)](k)(_._1, _._2)
      if (nChunks <= 1)
        agg.finish(items.foldLeft(agg.zero)(agg.reduce))
      else {
        val size = math.max(1, (items.size + nChunks - 1) / nChunks)
        val bufs = items.grouped(size).toSeq
          .map(_.foldLeft(agg.zero)(agg.reduce))
        // fold in both directions plus against zero — the partial-
        // buffer shapes Spark's partial aggregation actually produces
        val l2r = bufs.foldLeft(agg.zero)(agg.merge)
        val r2l = bufs.reverse.foldLeft(agg.zero)(agg.merge)
        assert(bits(agg.finish(l2r)) == bits(agg.finish(r2l)),
          "merge must be order-insensitive")
        agg.finish(agg.merge(l2r, agg.zero))
      }
    }
    val rng = new scala.util.Random(20260816L)
    val n = 257 // not a multiple of any chunk count — ragged last buffers
    val ids = (0 until n).map(_.toLong)
    val arrivals: Seq[(String, Seq[(Double, Long)])] = Seq(
      "random" -> ids.map(i => (rng.nextDouble(), i)),
      "ascending" -> ids.map(i => (i.toDouble, i)),
      "descending" -> ids.map(i => ((n - i).toDouble, i)),
      // heavy ties AT the threshold: only ids break the order, and the
      // stale-kth reject must not drop a tied row with a smaller id
      "tied" -> ids.map(i => ((i % 4).toDouble, i)),
      "all-equal" -> ids.map(i => (1.0, i)),
      // IEEE corners: NaN ranks first under DESC, infinities at the ends
      "ieee" -> ids.map(i => (i % 7 match {
        case 0 => Double.NaN
        case 1 => Double.PositiveInfinity
        case 2 => Double.NegativeInfinity
        case _ => rng.nextDouble() * 10 - 5
      }, i))
    )
    for ((tag, items0) <- arrivals; k <- Seq(1, 2, 3, 5, 16, 300);
         chunks <- Seq(1, 2, 7)) {
      // shuffle separately per case so each (k, chunks) sees its own
      // arrival order of the same multiset
      val items = rng.shuffle(items0)
      val want = reference(items, k)
      val got = viaAgg(items, k, chunks)
      assert(bits(got) == bits(want),
        s"$tag k=$k chunks=$chunks: got $got, want $want")
    }
  }
}
