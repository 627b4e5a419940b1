package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Relational
import graft.streaming.Streams
import graft.streaming.Streams.Evt

class StreamingSpec extends SparkSuite {

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1704067200000L + minutes * 60000L) // 2024-01-01 00:00 UTC

  test("streaming hourly counts emit finalized windows after watermark passes") {
    import spark.implicits._
    withLogLevel {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[Evt]
      val q = Streams.hourlyCounts(input.toDF())
        .writeStream.format("memory").queryName("hourly")
        .outputMode("append").start()
      try {
        input.addData(
          Evt(1, "click", ts(5), 1.0),
          Evt(2, "click", ts(20), 2.0),
          Evt(1, "view", ts(30), 3.0))
        q.processAllAvailable()
        // advance event time 3 hours → watermark passes hour-0 window end
        input.addData(Evt(1, "click", ts(180), 1.0))
        q.processAllAvailable()
        input.addData(Evt(1, "click", ts(200), 1.0))
        q.processAllAvailable()
        val rows = spark.table("hourly").collect()
          .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        assert(rows.contains((ts(0), "click", 2L, 3.0)))
        assert(rows.contains((ts(0), "view", 1L, 3.0)))
      } finally q.stop()
    }
  }

  test("streaming near-dup probes the static corpus index; pairs agree with the batch path") {
    import spark.implicits._
    withLogLevel {
      val base = "the quick brown fox jumps over the lazy dog again and again today"
      // one dir holding corpus (1, 4) AND the would-be stream docs
      // (9 near-dup of 1, 19 unrelated — both %10==9) so the batch
      // incrementalNearDup on the same dir is the expected answer
      val ti = tempTables { dir =>
        Seq(
          (1L, base, "en", "s", 10L),
          (4L, "completely different words about spark shuffles and columnar storage", "en", "s", 10L),
          (9L, base.replace("lazy", "sleepy"), "en", "s", 10L),
          (19L, "unrelated batch text that matches nothing in the corpus at all", "en", "s", 10L)
        ).toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.parquet(s"$dir/documents.parquet")
      }
      val expected = graft.dedup.Dedup.incrementalNearDup(ti).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(expected.keySet == Set((9L, 1L))) // fixture sanity

      val corpusSigs = graft.dedup.Dedup.signatureTable(ti)
        .filter(col("doc_id") % 10 =!= 9)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[Streams.Doc]
      val q = Streams.nearDupStream(input.toDF(), corpusSigs)
        .writeStream.format("memory").queryName("neardup")
        .outputMode("append").start()
      try {
        input.addData(
          Streams.Doc(9L, base.replace("lazy", "sleepy"), ts(0)),
          Streams.Doc(19L, "unrelated batch text that matches nothing in the corpus at all", ts(1)))
        q.processAllAvailable()
        val got = spark.table("neardup").collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        assert(got == expected,
          s"stream pairs $got must equal batch pairs $expected")
      } finally q.stop()
    }
  }

  test("streaming hopping windows agree with the batch q42 plan on the same data") {
    import spark.implicits._
    withLogLevel {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val evts = Seq(
        Evt(1, "click", ts(5), 1.0), Evt(2, "click", ts(14), 2.0),
        Evt(1, "view", ts(27), 3.0), Evt(2, "view", ts(55), 4.0))
      val input = MemoryStream[Evt]
      val q = Streams.hoppingCounts(input.toDF())
        .writeStream.format("memory").queryName("hopping")
        .outputMode("append").start()
      try {
        input.addData(evts: _*)
        q.processAllAvailable()
        input.addData(Evt(9, "click", ts(600), 0.0)) // watermark past all windows
        q.processAllAvailable()
        val stream = spark.table("hopping")
          .filter($"win_start" < lit(ts(90)))
          .collect()
          .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
          .toSet
        // batch twin over the identical rows (drop the watermark pusher)
        val batch = Streams.hoppingCounts(evts.toDF())
          .collect()
          .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
          .toSet
        assert(stream == batch, s"stream $stream != batch $batch")
        // each event appears in exactly 3 windows
        assert(batch.toSeq.map(_._3).sum == 3L * evts.length)
      } finally q.stop()
    }
  }

  test("streaming sessionization closes sessions on gap timeout") {
    import spark.implicits._
    withLogLevel {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[Evt]
      val q = Streams.sessionize(input.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName("sessions")
        .outputMode("append").start()
      try {
        input.addData(Evt(7, "click", ts(0), 1.0), Evt(7, "click", ts(10), 1.0))
        q.processAllAvailable()
        input.addData(Evt(7, "click", ts(120), 1.0)) // 110-min gap → new session
        q.processAllAvailable()
        input.addData(Evt(8, "click", ts(300), 1.0)) // push watermark forward
        q.processAllAvailable()
        input.addData(Evt(8, "click", ts(400), 1.0))
        q.processAllAvailable()
        val rows = spark.table("sessions").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        assert(rows.contains((7L, ts(0), ts(10), 2L)))   // first session: 2 events
        assert(rows.contains((7L, ts(120), ts(120), 1L))) // second session closed later
      } finally q.stop()
    }
  }

  test("stream-static join enriches streaming events with a dimension table") {
    import spark.implicits._
    withLogLevel {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
      val input = MemoryStream[Evt]
      val q = input.toDF().join(dim, Seq("user_id")) // static side broadcast per micro-batch
        .writeStream.format("memory").queryName("enriched")
        .outputMode("append").start()
      try {
        input.addData(Evt(1, "click", ts(0), 1.0), Evt(3, "click", ts(1), 1.0))
        q.processAllAvailable()
        val rows = spark.table("enriched").collect()
          .map(r => (r.getLong(0), r.getString(4)))
        assert(rows.toSeq == Seq((1L, "gold"))) // inner join drops user 3
      } finally q.stop()
    }
  }

  test("streaming dedup drops in-horizon re-ingests, keeps first arrivals") {
    import spark.implicits._
    withLogLevel {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[Streams.Doc]
      val q = Streams.dedupStream(input.toDF(), horizon = "1 hour")
        .writeStream.format("memory").queryName("deduped")
        .outputMode("append").start()
      try {
        input.addData(
          Streams.Doc(1, "hello world", ts(0)),
          Streams.Doc(2, "something else", ts(1)))
        q.processAllAvailable()
        // doc 3 re-ingests doc 1's content inside the horizon → dropped;
        // doc 4 is new → kept
        input.addData(
          Streams.Doc(3, "hello world", ts(10)),
          Streams.Doc(4, "third text", ts(11)))
        q.processAllAvailable()
        val kept = spark.table("deduped").collect().map(_.getLong(0)).toSet
        assert(kept == Set(1L, 2L, 4L))
      } finally q.stop()
    }
  }

  test("streaming curation: dedup + repetition gate + decontamination on ingest") {
    import spark.implicits._
    withLogLevel {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val contam = Seq(4L).toDF("doc_id")
      val input = MemoryStream[Streams.Doc]
      val q = Streams.curatedStream(input.toDF(), contam)
        .writeStream.format("memory").queryName("curated_stream")
        .outputMode("append").start()
      try {
        input.addData(
          Streams.Doc(1, "good doc words vary nicely here", ts(0)),
          Streams.Doc(2, "good doc words vary nicely here", ts(1)), // dup of 1
          Streams.Doc(3, "spam spam spam spam spam spam", ts(2)),   // repetition
          Streams.Doc(4, "contaminated but otherwise fine text", ts(3)), // in contam list
          Streams.Doc(5, "another perfectly varied document arrives", ts(4)))
        q.processAllAvailable()
        val kept = spark.table("curated_stream").collect().map(_.getLong(0)).toSet
        assert(kept == Set(1L, 5L))
      } finally q.stop()
    }
  }

  test("batch-driven curatedStream applies the deterministic min-doc_id keep rule") {
    import spark.implicits._
    withLogLevel {
      val contam = Seq(4L).toDF("doc_id")
      // same five docs as the streaming case, arrival order == doc_id
      // order, so first-arrival (stream) and min-doc_id (batch) keep
      // rules pick the same representatives and the outputs agree
      val docs = Seq(
        Streams.Doc(1, "good doc words vary nicely here", ts(0)),
        Streams.Doc(2, "good doc words vary nicely here", ts(1)),
        Streams.Doc(3, "spam spam spam spam spam spam", ts(2)),
        Streams.Doc(4, "contaminated but otherwise fine text", ts(3)),
        Streams.Doc(5, "another perfectly varied document arrives", ts(4))).toDF()
      val out = Streams.curatedStream(docs, contam).collect()
      assert(out.map(_.getLong(0)).toSet == Set(1L, 5L))
      // dup pair (1,2): the kept row must be doc 1 (min doc_id), with
      // doc 1's ts — not an arbitrary row of the fingerprint group
      val kept1 = out.find(_.getLong(0) == 1L).get
      assert(kept1.getAs[java.sql.Timestamp]("ts") == ts(0))
    }
  }

  test("stream-stream attribution join pairs within the window only") {
    import spark.implicits._
    withLogLevel {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val clicks = MemoryStream[(Long, Long, Timestamp)]
      val purchases = MemoryStream[(Long, Long, Timestamp)]
      val q = Streams.attributionJoin(
        clicks.toDF().toDF("event_id", "user_id", "ts"),
        purchases.toDF().toDF("event_id", "user_id", "ts"))
        .writeStream.format("memory").queryName("attrib")
        .outputMode("append").start()
      try {
        clicks.addData((100L, 1L, ts(0)), (101L, 2L, ts(0)))
        // user 1 purchase 5 min after the click (in-window);
        // user 2 purchase 20 min after (outside the 10-min window)
        purchases.addData((200L, 1L, ts(5)), (201L, 2L, ts(20)))
        q.processAllAvailable()
        val got = spark.table("attrib").collect()
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(got == Set((100L, 200L, 300000000L)))
      } finally q.stop()
    }
  }

  test("attribution join drops a purchase arriving after the watermark passed its click") {
    import spark.implicits._
    withLogLevel {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val clicks = MemoryStream[(Long, Long, Timestamp)]
      val purchases = MemoryStream[(Long, Long, Timestamp)]
      val q = Streams.attributionJoin(
        clicks.toDF().toDF("event_id", "user_id", "ts"),
        purchases.toDF().toDF("event_id", "user_id", "ts"))
        .writeStream.format("memory").queryName("attrib_late")
        .outputMode("append").start()
      try {
        clicks.addData((100L, 1L, ts(0)))
        purchases.addData((900L, 9L, ts(0))) // unrelated user, advances p-side time
        q.processAllAvailable()
        // advance BOTH event-time watermarks far past the click's window
        clicks.addData((101L, 8L, ts(120)))
        purchases.addData((901L, 9L, ts(120)))
        q.processAllAvailable()
        // in-window by event time (5 min after click 100) but arrives
        // after the watermark evicted that click's state → dropped
        purchases.addData((200L, 1L, ts(5)))
        q.processAllAvailable()
        val pairs = spark.table("attrib_late").collect()
          .map(r => (r.getLong(1), r.getLong(2))).toSet
        assert(!pairs.contains((100L, 200L)),
          s"late purchase must be dropped, got $pairs")
      } finally q.stop()
    }
  }

  test("batch and streaming attribution joins agree on the events table") {
    withLogLevel {
      val t = Tables(spark, "/root/testdata/sf0.001")
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val batch = Relational.q36IntervalJoin(t).collect().map(key).toSet
      // on batch inputs the watermark is a no-op and attributionJoin is
      // the plain range join — must equal the banded batch operator
      val stream = Streams.attributionJoin(
        t.events.filter(col("event_type") === "click"),
        t.events.filter(col("event_type") === "purchase"))
        .collect().map(key).toSet
      assert(stream == batch && batch.nonEmpty)
    }
  }

  test("batch and streaming hourly aggregations agree on the events table") {
    withLogLevel {
      val t = Tables(spark, "/root/testdata/sf0.001")
      // hourlyCounts works on a batch DF too (same plan, no watermark effect)
      val fromStreamsCode = Streams.hourlyCounts(t.events)
        .select(col("hour"), col("event_type"), col("cnt"), col("sum_value"))
      val fromBatch = Relational.q16EventsHourly(t)
      assert(fromStreamsCode.exceptAll(fromBatch).isEmpty &&
        fromBatch.exceptAll(fromStreamsCode).isEmpty)
    }
  }

  final case class VecProbe(vec_id: Long, embedding: Seq[Float], ts: Timestamp)

  final case class DocIn(doc_id: Long, lang: String, source: String)

  test("batch-driven temperatureGate equals corpus_temperature_sample bit for bit") {
    withLogLevel {
      val t = Tables(spark, "/root/testdata/sf0.001")
      val alloc = graft.pipeline.CorpusOps.temperatureMix(t)
      val gate = Streams.temperatureGate(t.documents, alloc).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val batch = graft.pipeline.CorpusOps.temperatureSample(t).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(gate.nonEmpty && gate == batch)
    }
  }

  test("streaming temperatureGate admits exactly the batch draw for streamed docs") {
    import spark.implicits._
    withLogLevel {
      val t = Tables(spark, "/root/testdata/sf0.001")
      val alloc = graft.pipeline.CorpusOps.temperatureMix(t).localCheckpoint()
      val docs = t.documents.select("doc_id", "lang", "source").limit(50)
        .collect().map(r => DocIn(r.getLong(0), r.getString(1), r.getString(2)))
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[DocIn]
      val q = Streams.temperatureGate(input.toDF(), alloc)
        .writeStream.format("memory").queryName("tempgate")
        .outputMode("append").start()
      try {
        input.addData(docs.toIndexedSeq)
        q.processAllAvailable()
        val got = spark.table("tempgate").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
        val ids = docs.map(_.doc_id).toSet
        val expected = graft.pipeline.CorpusOps.temperatureSample(t).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
          .filter(p => ids(p._1)).toSet
        assert(got == expected, "stream admissions must equal the batch draw restricted to streamed ids")
        assert(got.size < docs.length, "the gate must actually reject some docs")
      } finally q.stop()
    }
  }

  final case class TextIn(doc_id: Long, text: String)

  test("batch-driven qualityGate equals text_quality_model's admitted subset") {
    withLogLevel {
      val t = Tables(spark, "/root/testdata/sf0.001")
      val gate = Streams.qualityGate(t.documents).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.text.TextAnalysis.qualityModel(t)
        .filter(col("kept") === 1).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(gate.nonEmpty && gate == batch)
    }
  }

  test("streaming qualityGate admits exactly the batch-scored docs for streamed rows") {
    import spark.implicits._
    withLogLevel {
      val t = Tables(spark, "/root/testdata/sf0.001")
      val docs = t.documents.select("doc_id", "text").limit(50)
        .collect().map(r => TextIn(r.getLong(0), r.getString(1)))
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[TextIn]
      val q = Streams.qualityGate(input.toDF())
        .writeStream.format("memory").queryName("qualgate")
        .outputMode("append").start()
      try {
        input.addData(docs.toIndexedSeq)
        q.processAllAvailable()
        val got = spark.table("qualgate").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val ids = docs.map(_.doc_id).toSet
        val expected = graft.text.TextAnalysis.qualityModel(t)
          .filter(col("kept") === 1).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .filter(p => ids(p._1)).toSet
        assert(got == expected, "stream admissions must equal the batch classifier restricted to streamed ids")
        assert(got.size < docs.length, "the gate must actually reject some docs")
      } finally q.stop()
    }
  }

  test("batch-driven annStream equals ann_int8 minus qdot bit for bit") {
    withLogLevel {
      val t = Tables(spark, "/root/testdata/sf0.001")
      val probes = t.widen(t.embeddings).filter(col("vec_id") % 13 === 0)
        .select(col("vec_id"), col("embedding"),
          timestamp_seconds(col("vec_id")).as("ts"))
      val stream = Streams.annStream(probes, graft.sim.Similarity.quantizedIndex(t))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = graft.sim.Similarity.annInt8(t).collect()
        .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"),
          r.getAs[Int]("rnk").toLong, r.getAs[Double]("score"))).toSet
      assert(stream.nonEmpty && stream == batch)
    }
  }

  test("batch-driven annStreamIvf equals ann_ivf_int8 minus qdot bit for bit") {
    withLogLevel {
      val t = Tables(spark, "/root/testdata/sf0.001")
      val (idx, cents) = graft.sim.Similarity.quantizedCellIndex(t)
      val probes = t.widen(t.embeddings).filter(col("vec_id") % 13 === 0)
        .select(col("vec_id"), col("embedding"),
          timestamp_seconds(col("vec_id")).as("ts"))
      val stream = Streams.annStreamIvf(probes, idx, cents).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = graft.sim.Similarity.annIvfInt8(t).collect()
        .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"),
          r.getAs[Int]("rnk").toLong, r.getAs[Double]("score"))).toSet
      assert(stream.nonEmpty && stream == batch,
        s"cell-keyed stream path must reproduce the batch IVF+int8 search " +
          s"(stream-only=${(stream -- batch).take(3)}, batch-only=${(batch -- stream).take(3)})")
    }
  }

  test("cell-keyed probe scores ~nprobe/nlist of the candidates the full-index probe does") {
    withLogLevel {
      val t = Tables(spark, "/root/testdata/sf0.001")
      val nlist = 16
      val nprobe = 10
      val (idx0, cents) = graft.sim.Similarity.quantizedCellIndex(t, nlist)
      val idx = idx0.persist()
      val nIndex = idx.count()
      val probes = t.embeddings.filter(col("vec_id") % 13 === 0)
        .select(col("vec_id"), col("embedding"),
          timestamp_seconds(col("vec_id")).as("ts"))
      val nProbes = probes.count()
      // candidate pairs actually scored = probe-cells joined to the
      // cell-keyed index (before top-k); the full-index probe scores
      // every (probe, resident != probe) pair
      val rankedCells = Streams.rankedCellArray(cents, col("v"))
      val probeCells = probes
        .select(col("vec_id").as("probe_id"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("pc", explode(slice(rankedCells, 1, nprobe)))
        .select(col("probe_id"), col("pc.cell").as("cell"))
      val candRows = probeCells.join(idx, Seq("cell"))
        .filter(col("probe_id") =!= col("vec_id")).count()
      val fullRows = nProbes * (nIndex - 1)
      idx.unpersist()
      val frac = candRows.toDouble / fullRows
      info(f"cell-keyed probe scores $candRows of $fullRows pairs " +
        f"(${frac * 100}%.1f%%, nprobe/nlist = ${nprobe * 100.0 / nlist}%.1f%%)")
      assert(candRows > 0)
      // cells aren't perfectly balanced, so allow slack around
      // nprobe/nlist = 62.5%; the point is a REAL reduction, not ~100%
      assert(frac < 0.85, f"expected ~${nprobe.toDouble / nlist}%.2f, got $frac%.2f — " +
        "cell pruning isn't reducing candidate work")
    }
  }

  test("streaming annStreamIvf: MemoryStream probes match the batch-driven path") {
    import spark.implicits._
    withLogLevel {
      val t = Tables(spark, "/root/testdata/sf0.001")
      val (idx0, cents) = graft.sim.Similarity.quantizedCellIndex(t)
      val idx = idx0.localCheckpoint() // file streams need a static plan; pin it
      val probeVecs = t.embeddings.filter(col("vec_id").isin(13L, 26L))
        .collect().map(r => (r.getAs[Long]("vec_id"),
          r.getAs[scala.collection.Seq[Float]]("embedding").toSeq)).toMap

      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[VecProbe]
      val q = Streams.annStreamIvf(input.toDF(), idx, cents)
        .writeStream.format("memory").queryName("annstreamivf")
        .outputMode("append").start()
      try {
        input.addData(
          VecProbe(13L, probeVecs(13L), ts(5)),
          VecProbe(26L, probeVecs(26L), ts(10)))
        q.processAllAvailable()
        input.addData(VecProbe(13L, probeVecs(13L), ts(185)))
        q.processAllAvailable()
        val got = spark.table("annstreamivf").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
        val expected = Streams.annStreamIvf(
            t.embeddings.filter(col("vec_id").isin(13L, 26L))
              .select(col("vec_id"), col("embedding"),
                timestamp_seconds(col("vec_id")).as("ts")), idx, cents)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
        assert(expected.nonEmpty && got == expected,
          "stream rows must equal the batch path for the flushed probes")
      } finally q.stop()
    }
  }

  test("batch-driven annStreamIvfPq equals ann_ivf_pq bit for bit") {
    withLogLevel {
      val t = Tables(spark, "/root/testdata/sf0.001")
      val (idx, cents, floats, rr) = graft.sim.Similarity.ivfPqStreamIndex(t)
      val probes = t.widen(t.embeddings).filter(col("vec_id") % 13 === 0)
        .select(col("vec_id"), col("embedding"),
          timestamp_seconds(col("vec_id")).as("ts"))
      val stream = Streams.annStreamIvfPq(probes, idx, cents, floats, rr).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = graft.sim.Similarity.annIvfPq(t).collect()
        .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"),
          r.getAs[Int]("rnk").toLong, r.getAs[Double]("cos"))).toSet
      assert(stream.nonEmpty && stream == batch,
        s"IVFPQ stream path must reproduce the batch search " +
          s"(stream-only=${(stream -- batch).take(3)}, batch-only=${(batch -- stream).take(3)})")
    }
  }

  test("streaming annStreamIvfPq: MemoryStream probes match the batch-driven path") {
    import spark.implicits._
    withLogLevel {
      val t = Tables(spark, "/root/testdata/sf0.001")
      val (idx0, cents, floats0, rr) = graft.sim.Similarity.ivfPqStreamIndex(t)
      val idx = idx0.localCheckpoint()
      val floats = floats0.localCheckpoint()
      val probeVecs = t.embeddings.filter(col("vec_id").isin(13L, 26L))
        .collect().map(r => (r.getAs[Long]("vec_id"),
          r.getAs[scala.collection.Seq[Float]]("embedding").toSeq)).toMap

      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[VecProbe]
      // the chained stateful form (ADC top-rr agg -> static join ->
      // exact top-k agg) must actually run on a real stream, not just
      // batch-driven — this is the multiple-stateful-operators path
      val q = Streams.annStreamIvfPq(input.toDF(), idx, cents, floats, rr)
        .writeStream.format("memory").queryName("annstreamivfpq")
        .outputMode("append").start()
      try {
        input.addData(
          VecProbe(13L, probeVecs(13L), ts(5)),
          VecProbe(26L, probeVecs(26L), ts(10)))
        q.processAllAvailable()
        // advance the watermark past the first window so append mode
        // emits it through BOTH stateful operators
        input.addData(VecProbe(13L, probeVecs(13L), ts(7805)))
        q.processAllAvailable()
        val got = spark.table("annstreamivfpq").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
        val expected = Streams.annStreamIvfPq(
            t.embeddings.filter(col("vec_id").isin(13L, 26L))
              .select(col("vec_id"), col("embedding"),
                timestamp_seconds(lit(5)).as("ts")), idx, cents, floats, rr)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
        assert(expected.nonEmpty && got == expected,
          s"stream rows must equal the batch path for the flushed probes " +
            s"(got=${got.size}, expected=${expected.size})")
      } finally q.stop()
    }
  }

  test("index append: expression cell pick equals the MLlib builder; stream matches batch") {
    import spark.implicits._
    withLogLevel {
      val t = Tables(spark, "/root/testdata/sf0.001")
      val (idx0, cents) = graft.sim.Similarity.quantizedCellIndex(t)
      val idx = idx0.localCheckpoint()
      val vecs = t.embeddings.select(col("vec_id"), col("embedding"))
      val appended = Streams.indexAppend(vecs, cents).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getString(3)))).toMap
      // vs the batch MLlib-built index: same rows, same cells, same codes
      val built = idx.collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2),
          r.getSeq[Double](3).map(_.toLong).mkString(":")))).toMap
      assert(appended.keySet == built.keySet)
      val cellAgree = appended.count { case (id, (c, _, _)) => built(id)._1 == c }
      info(s"cell agreement: $cellAgree/${appended.size}")
      assert(appended == built,
        "row-local append must reproduce the batch-built index exactly")

      // real micro-batch drive equals the batch-driven rows
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[VecProbe]
      val q = Streams.indexAppend(
          input.toDF().select(col("vec_id"), col("embedding")), cents)
        .writeStream.format("memory").queryName("idxappend")
        .outputMode("append").start()
      try {
        val probeVecs = t.embeddings.filter(col("vec_id").isin(13L, 26L))
          .collect().map(r => (r.getAs[Long]("vec_id"),
            r.getAs[scala.collection.Seq[Float]]("embedding").toSeq)).toMap
        input.addData(
          VecProbe(13L, probeVecs(13L), ts(5)),
          VecProbe(26L, probeVecs(26L), ts(10)))
        q.processAllAvailable()
        val got = spark.table("idxappend").collect()
          .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getString(3)))).toMap
        assert(got == appended.view.filterKeys(Set(13L, 26L)).toMap)
      } finally q.stop()
    }
  }

  test("streaming annStream: probes search the static int8 index; rows match batch") {
    import spark.implicits._
    withLogLevel {
      val t = Tables(spark, "/root/testdata/sf0.001")
      val index = graft.sim.Similarity.quantizedIndex(t)
      val probeVecs = t.embeddings.filter(col("vec_id").isin(13L, 26L))
        .collect().map(r => (r.getAs[Long]("vec_id"),
          r.getAs[scala.collection.Seq[Float]]("embedding").toSeq)).toMap
      assert(probeVecs.keySet == Set(13L, 26L))

      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[VecProbe]
      val q = Streams.annStream(input.toDF(), index)
        .writeStream.format("memory").queryName("annstream")
        .outputMode("append").start()
      try {
        input.addData(
          VecProbe(13L, probeVecs(13L), ts(5)),
          VecProbe(26L, probeVecs(26L), ts(10)))
        q.processAllAvailable()
        // advance event time 3 hours so the watermark closes hour 0
        input.addData(VecProbe(13L, probeVecs(13L), ts(185)))
        q.processAllAvailable()
        val got = spark.table("annstream").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
        // expected: the batch path restricted to the two flushed probes,
        // which includes each other as candidates (both are in the index)
        val expected = Streams.annStream(
            t.embeddings.filter(col("vec_id").isin(13L, 26L))
              .select(col("vec_id"), col("embedding"),
                timestamp_seconds(col("vec_id")).as("ts")), index)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
        assert(expected.nonEmpty && got == expected,
          s"stream rows must equal the batch path for the flushed probes")
      } finally q.stop()
    }
  }

  test("streaming semantic dedup probes the cell index; keep/drop through real micro-batches") {
    import spark.implicits._
    withLogLevel {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      // two cells along the first two axes; corpus: a two-member
      // cluster (1 is the keeper, 2 its near-dup) in cell 0 and a
      // singleton rep 3 in cell 1
      val centroids = Seq(
        (0, Seq(1.0, 0.0, 0.0, 0.0)),
        (1, Seq(0.0, 1.0, 0.0, 0.0)))
      val n2 = math.sqrt(0.9 * 0.9 + 0.1 * 0.1)
      val semIndex = Seq(
        (0, 1L, 1L, Seq(1.0, 0.0, 0.0, 0.0), 1.0),
        (0, 2L, 1L, Seq(0.9, 0.1, 0.0, 0.0), n2),
        (1, 3L, 3L, Seq(0.0, 1.0, 0.0, 0.0), 1.0)
      ).toDF("cell", "cand_id", "rep_id", "vc", "nc")
      val input = MemoryStream[VecProbe]
      val q = Streams.semanticDedupStream(input.toDF(), semIndex, centroids,
        assign = 1)
        .writeStream.format("memory").queryName("sem_stream")
        .outputMode("append").start()
      try {
        input.addData(
          VecProbe(10L, Seq(1f, 0.05f, 0f, 0f), ts(5)),  // near cluster 1 -> drop
          VecProbe(11L, Seq(0f, 0.1f, 1f, 0f), ts(6)))   // near nothing -> keep
        q.processAllAvailable()
        // advance event time past the 1-hour horizon so window 0 closes
        input.addData(
          VecProbe(12L, Seq(0.05f, 1f, 0f, 0f), ts(70)), // near rep 3 -> drop
          VecProbe(13L, Seq(1f, 0f, 0f, 0f), ts(200)))
        q.processAllAvailable()
        input.addData(VecProbe(14L, Seq(0f, 0f, 0f, 1f), ts(400)))
        q.processAllAvailable()
        val got = spark.table("sem_stream").collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
        assert(got.get(10L).contains((1L, 0)), s"got $got")  // mapped to keeper 1
        assert(got.get(11L).contains((11L, 1)), s"got $got") // no match: kept
        assert(got.get(12L).contains((3L, 0)), s"got $got")  // mapped to rep 3
      } finally q.stop()
    }
  }

  test("streaming fuzzy-key dedup probes the static block index through real micro-batches") {
    import spark.implicits._
    withLogLevel {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val base = "the quick brown fox jumps over the lazy dog again and again today"
      val corpusDocs = Seq(
        (1L, base),
        (4L, "completely different words about spark shuffles and columnar storage"),
        (5L, "abcde") // sub-7-char corpus key: the banded residue's static side
      ).toDF("doc_id", "text")
      val corpusKeys = graft.dedup.Dedup.edKeys(corpusDocs).localCheckpoint()
      val input = MemoryStream[Streams.Doc]
      val q = Streams.editDedupStream(input.toDF(), corpusKeys)
        .writeStream.format("memory").queryName("edit_stream")
        .outputMode("append").start()
      try {
        input.addData(
          Streams.Doc(9, base.replace("again and", "again nad"), ts(0)), // typo dup of 1
          Streams.Doc(19, "unrelated arriving text that matches nothing at all here", ts(1)),
          Streams.Doc(39, "abcxy", ts(1))) // sub-7-char arrival: residue path in a real micro-batch
        q.processAllAvailable()
        input.addData(
          Streams.Doc(29, base, ts(2)),         // exact dup across a later micro-batch
          Streams.Doc(49, "abcde fghij", ts(3))) // 11 chars: residue's longer-side orientation
        q.processAllAvailable()
        val got = spark.table("edit_stream").collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
        assert(got.keySet == Set((9L, 1L), (29L, 1L), (39L, 5L), (49L, 5L)), s"got $got")
        assert(got((29L, 1L)) == 0 && got((9L, 1L)) > 0 && got((9L, 1L)) <= 6)
        assert(got((39L, 5L)) == 2 && got((49L, 5L)) == 6)
      } finally q.stop()
    }
  }
}
