package graft

import graft.io.Tables
import graft.mm.Multimodal

class MultimodalSpec extends SparkSuite {

  private lazy val t = {
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, "/root/testdata/sf0.001")
  }

  test("feature extraction is deterministic and schema-complete") {
    val media = Multimodal.mediaFromDocuments(t)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == t.documents.count())
    assert(f1.forall(f => f.width >= 1 && f.width <= 1920))
    assert(f1.forall(f => f.height >= 1 && f.height <= 1080))
  }

  test("payload byte count survives the binary round-trip") {
    import org.apache.spark.sql.functions._
    val meta = Multimodal.binaryMeta(t)
      .select(col("doc_id"), col("n_bytes")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chars = t.documents.select(col("doc_id"), length(col("text")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(meta == chars) // ASCII text: bytes == chars
  }

  test("frame sampling: empty payloads yield zero frames (no phantom frame 0)") {
    import spark.implicits._
    val t2 = tempTables { dir =>
      Seq(
        (1L, "", "en", "s", 0L),
        (2L, "x" * 200, "en", "s", 200L) // 400 hex chars → 4 frames → idx 0 kept
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }
    val rows = Multimodal.frameSample(t2).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(!rows.exists(_._1 == 1L))
    assert(rows.count(_._1 == 2L) == 1 && rows.contains((2L, 0)))
  }

  test("real image decode: a 2x3 PNG decodes to (2,3) end-to-end") {
    System.setProperty("java.awt.headless", "true")
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def encode(fmt: String): Array[Byte] = {
      val img = new BufferedImage(2, 3, BufferedImage.TYPE_INT_RGB)
      img.setRGB(1, 2, 0xff8040)
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    val png = encode("png")
    assert(Multimodal.decodeImage(png).contains((2, 3)))
    assert(Multimodal.decodeImage(encode("jpg")).contains((2, 3)))
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)

    import spark.implicits._
    val ds = Seq(Multimodal.MediaRow(7L, "image", png)).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head
    assert(f.width == 2 && f.height == 3 && f.n_bytes == png.length)
  }

  test("BMP round-trip: ImageIO decodes buildBmp back to the exact synthesized pixels") {
    System.setProperty("java.awt.headless", "true")
    val id = 42L
    val bmp = Multimodal.buildBmp(16, 16, (x, y) => Multimodal.imagePixel(id, x, y))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img != null, "JDK BMP reader did not recognize the container")
    assert(img.getWidth == 16 && img.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = img.getRGB(x, y) & 0xff
      assert(v == Multimodal.imagePixel(id, x, y), s"pixel ($x,$y)")
      // grayscale: all three channels equal
      assert((img.getRGB(x, y) >> 8 & 0xff) == v && (img.getRGB(x, y) >> 16 & 0xff) == v)
    }
  }

  test("aHash: batch-mates are near-identical, distinct batches differ") {
    val rows = Multimodal.imageAHash(t).collect()
    val ah = rows.map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(ah.size == t.documents.count())
    // the media table is container-MIXED: both the raw-BMP and the
    // zlib'd-PNG decode paths must be represented
    assert(rows.map(_.getString(1)).toSet == Set("bmp", "png"))
    // batch-mates straddle the id parity, so every near-identical pair
    // below crosses containers somewhere — re-encodes collide
    // same id-div-16 batch: corner noise only → Hamming <= 1 bit of 64
    val mates = ah.keys.groupBy(_ / 16).values.filter(_.size >= 2)
    assert(mates.nonEmpty)
    // corner noise flips block 0's bit; its small shift of the global
    // mean can additionally flip a block level sitting near the mean
    // boundary — so mates are within the <=7 near-dup threshold, and
    // typically within 1 bit
    val mateHams = mates.flatMap { g =>
      val ids = g.toSeq.sorted
      val ref = ah(ids.head)
      ids.tail.map(d => java.lang.Long.bitCount(ah(d) ^ ref))
    }.toSeq
    assert(mateHams.forall(_ <= 7), s"batch mates beyond the near-dup threshold: $mateHams")
    assert(mateHams.count(_ <= 1) * 2 >= mateHams.size)
    // distinct batches: scrambled base patterns → mostly far apart
    val reps = ah.toSeq.groupBy(_._1 / 16).map(_._2.minBy(_._1)._2).toSeq
    val far = for (i <- reps.indices; j <- i + 1 until reps.size)
      yield java.lang.Long.bitCount(reps(i) ^ reps(j))
    assert(far.count(_ > 7) > far.size / 2, "base patterns insufficiently separated")
  }

  test("image near-dup blocking is lossless vs brute-force all-pairs at threshold 7") {
    val ah = Multimodal.imageAHash(t).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toSeq.sortBy(_._1)
    val brute = (for {
      (a, fa) <- ah; (b, fb) <- ah if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 7
    } yield (a, b, h)).toSet
    val blocked = Multimodal.imageNearDup(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked == brute)
    assert(brute.nonEmpty, "expected batch-mate near-dup pairs to exist")
  }

  test("JPEG aHash: real lossy round trip stays within the re-encode budget") {
    System.setProperty("java.awt.headless", "true")
    // encode is deterministic: the band/determinism gates rely on it
    val id = 42L
    val b1 = Multimodal.buildJpeg(16, 16, (x, y) => Multimodal.imagePixel(id, x, y))
    val b2 = Multimodal.buildJpeg(16, 16, (x, y) => Multimodal.imagePixel(id, x, y))
    assert(b1.sameElements(b2), "JPEG encode is not deterministic")
    // the round trip is REALLY lossy at the pixel level (else the query
    // tests nothing), but bounded — a few gray levels, not a new image
    val deltas = (0L until 8L).flatMap { d =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.buildJpeg(16, 16, (x, y) => Multimodal.imagePixel(d, x, y))))
      for (y <- 0 until 16; x <- 0 until 16)
        yield math.abs((img.getRGB(x, y) & 0xff) - Multimodal.imagePixel(d, x, y))
    }
    assert(deltas.exists(_ > 0), "JPEG round trip was pixel-exact — not lossy")
    assert(deltas.max <= 32, s"DCT error beyond a few gray levels: ${deltas.max}")

    val rows = Multimodal.jpegAHash(t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.size == t.documents.count())
    val exactWords = Multimodal.imageAHash(t).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    rows.foreach { case (docId, (nBytes, jpegWord, exactWord, ham)) =>
      assert(nBytes > 0)
      // the formula half is pinned to the oracle-backed query bitwise
      assert(exactWord == exactWords(docId), s"doc $docId exact-word drift")
      assert(ham == java.lang.Long.bitCount(jpegWord ^ exactWord))
      // re-encode budget, distribution form (matches the check.py
      // band): rare boundary blocks flip on tiny DCT error (max 9
      // observed over 50k at 10x), never a quarter of the word
      assert(ham <= 16, s"doc $docId lossy hamming $ham beyond re-encode budget")
    }
    // ...and the typical image is exactly preserved (mean gap ~0.02)
    assert(rows.values.count(_._4 == 0L) * 10 >= rows.size * 9)
  }

  test("AVI: buildAvi round-trips through parseAvi; walker skips junk, rejects garbage") {
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7),
      Array[Byte](8)) // odd sizes exercise RIFF padding
    val avi = Multimodal.buildAvi(16, 12, 33333L, frames)
    val (meta, got) = Multimodal.parseAvi(avi).get
    assert(meta == Multimodal.AviMeta(16, 12, 3, 33333L))
    assert(got.size == 3 && got.zip(frames).forall { case (a, b) => a.sameElements(b) })
    // a real-world file has chunks the walker must skip by size (idx1,
    // JUNK): append one and re-parse — chunk walk, not offset math
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      Array[Byte](9, 9, 9, 9)
    val withJunk = java.util.Arrays.copyOf(avi, avi.length + junk.length)
    System.arraycopy(junk, 0, withJunk, avi.length, junk.length)
    // fix up the RIFF size field (u32 LE at offset 4)
    val newSize = withJunk.length - 8
    for (i <- 0 until 4) withJunk(4 + i) = ((newSize >> (8 * i)) & 0xff).toByte
    assert(Multimodal.parseAvi(withJunk).get._2.size == 3)
    // non-AVI payloads: None, never a crash
    assert(Multimodal.parseAvi("not an avi at all".getBytes).isEmpty)
    assert(Multimodal.parseAvi(Multimodal.buildWav(44100, 2, 16,
      Array[Byte](1, 2, 3, 4))).isEmpty)
    // truncated mid-chunk: the walker stops instead of reading past end
    assert(Multimodal.parseAvi(java.util.Arrays.copyOf(avi, avi.length - 2))
      .forall(_._2.size <= 3))
  }

  test("AVI frame sample: real MJPEG decode, exact words pin to source images") {
    System.setProperty("java.awt.headless", "true")
    val nDocs = t.documents.count()
    val rows = Multimodal.aviFrameAHash(t).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    val exactWords = Multimodal.imageAHash(t).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(rows.map(_._1).distinct.length == nDocs)
    rows.foreach { case (id, f, src, nf, bytes, jw, ew, ham) =>
      assert(f % 2 == 0 && f < nf, s"doc $id frame $f not an even sample")
      assert(nf == 4 + (id % 5) * 2, s"doc $id header frame count $nf")
      assert(src == (id + f) % nDocs)
      assert(bytes > 0)
      // the decoded frame's exact companion IS the source image's
      // oracle-backed aHash word — zero formula duplication
      assert(ew == exactWords(src), s"doc $id frame $f source-word drift")
      assert(ham == java.lang.Long.bitCount(jw ^ ew) && ham <= 16)
    }
    // per-media sample count = ceil(n_frames / 2)
    rows.groupBy(_._1).foreach { case (id, rs) =>
      assert(rs.length == (rs.head._4 + 1) / 2, s"doc $id sample count")
    }
    // the lossy decode really happened AND is typically exact
    assert(rows.count(_._8 == 0L) * 10 >= rows.length * 9)
  }

  test("audio fingerprint equals a direct energy-contour recompute from the text bytes") {
    import org.apache.spark.sql.functions.col
    val texts = t.documents.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val fp = Multimodal.audioFingerprint(t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(fp.size == texts.size)
    texts.foreach { case (id, text) =>
      val data = text.getBytes("US-ASCII").take(520)
      val nf = (data.length + 7) / 8
      val e = Array.tabulate(nf)(f =>
        data.slice(f * 8, (f + 1) * 8).map(b => (b & 0xff).toLong).sum)
      var w = 0L
      for (i <- 0 until math.min(math.max(nf - 1, 0), 64))
        if (e(i + 1) > e(i)) w |= 1L << i
      assert(fp(id) == ((nf.toLong, w, java.lang.Long.bitCount(w).toLong)), s"doc $id")
    }
  }

  test("audio near-dup blocking is lossless vs brute force; dup texts pair at distance 0") {
    val fp = Multimodal.audioFingerprint(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._2 >= 17).map(r => (r._1, r._3)).sortBy(_._1)
    val brute = (for {
      (a, fa) <- fp; (b, fb) <- fp if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 7
    } yield (a, b, h)).toSet
    val blocked = Multimodal.audioNearDup(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked == brute)
    // the corpus has exact-dup texts (Dedup.exact copies>1): identical
    // data chunks give identical contours, so distance-0 pairs exist
    assert(brute.exists(_._3 == 0), "expected distance-0 pairs from duplicate texts")
  }

  test("resizeMeta digests match a driver-side resizeStub recompute") {
    val got = Multimodal.resizeMeta(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val docs = t.documents.selectExpr("doc_id", "cast(text as binary) p").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { case (id, p) =>
      val resized = Multimodal.resizeStub(p, 64)
      val md = java.security.MessageDigest.getInstance("MD5").digest(resized)
        .map("%02x".format(_)).mkString
      val (nIn, nOut, gotMd5) = got(id)
      assert(nIn == p.length && nOut == math.min(p.length, 64))
      assert(gotMd5 == md, s"doc $id resize digest mismatch")
    }
  }

  test("decode stub: stable width/height for same payload, varied across payloads") {
    val a = Multimodal.decodeStub("payload-a".getBytes)
    val b = Multimodal.decodeStub("payload-b".getBytes)
    assert(a == Multimodal.decodeStub("payload-a".getBytes))
    assert(a != b)
  }

  test("WAV golden: a hand-laid 44.1k stereo 16-bit file parses exactly") {
    // hand-assembled bytes, NOT buildWav — pins the wire format itself
    val bb = java.nio.ByteBuffer.allocate(48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(40)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(44100 * 2 * 2)
      .putShort(4).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(4)
      .put(Array[Byte](1, 2, 3, 4))
    val m = Multimodal.parseWav(bb.array()).get
    assert(m == Multimodal.WavMeta(1, 2, 44100, 16, 4L,
      4L * 1000000L / (44100L * 2 * 2), 44))
  }

  test("WAV parse is a real chunk walker: extra LIST chunk and odd-size padding survive") {
    // LIST metadata chunk (odd 7-byte body -> 1 pad byte) between fmt
    // and data: offset-44 arithmetic would misread this file
    val info = "INFOxyz".getBytes("US-ASCII")
    val data = Array[Byte](9, 8, 7, 6, 5) // odd data size too
    val bb = java.nio.ByteBuffer.allocate(12 + 24 + (8 + 7 + 1) + 8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 24 + 16 + 8 + 6)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
      .put("LIST".getBytes("US-ASCII")).putInt(7).put(info).put(0.toByte)
      .put("data".getBytes("US-ASCII")).putInt(5).put(data).put(0.toByte)
    val m = Multimodal.parseWav(bb.array()).get
    // LIST (8 + 7 + 1 pad) shifts the data body to 12 + 24 + 16 + 8 = 60
    assert(m == Multimodal.WavMeta(1, 1, 8000, 8, 5L, 5L * 1000000L / 8000L, 60))
    // non-WAV payloads refuse loudly (None), not garbage
    assert(Multimodal.parseWav("not audio at all".getBytes).isEmpty)
    assert(Multimodal.parseWav(Array[Byte](82, 73)).isEmpty) // truncated "RI"
  }

  test("buildWav round-trips through parseWav, odd data sizes padded per RIFF") {
    for ((rate, ch, bits, n) <- Seq((8000, 1, 8, 0), (22050, 2, 16, 7),
      (44100, 1, 16, 64), (16000, 2, 8, 33))) {
      val data = Array.tabulate[Byte](n)(i => (i * 7 % 251).toByte)
      val wav = Multimodal.buildWav(rate, ch, bits, data)
      assert(wav.length % 2 == 0, "RIFF files are even-sized (pad byte)")
      val m = Multimodal.parseWav(wav).get
      assert(m.audioFormat == 1 && m.channels == ch &&
        m.sampleRate == rate && m.bits == bits && m.dataBytes == n)
      assert(m.durationUs == n.toLong * 1000000L / (rate.toLong * ch * (bits / 8)))
    }
  }

  test("MP4 golden: a hand-laid ISO-BMFF file with a free box parses exactly") {
    // assembled box by box (not buildMp4's layout): ftyp, then moov
    // whose mvhd sits AFTER a free box, then mdat — a fixed-offset
    // reader fails this, a box walker doesn't
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
      b.array()
    }
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0).putInt(90000).putInt(180000)
      b.array() // rest zero — version 0 offsets are all that matter
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(0x7).position(76)
      b.putInt(1280 << 16).putInt(720 << 16)
      b.array()
    }
    val file = box("ftyp", "isom".getBytes) ++
      box("moov", box("free", Array[Byte](1, 2, 3)) ++ box("mvhd", mvhd) ++
        box("trak", box("tkhd", tkhd))) ++
      box("mdat", Array[Byte](9, 9, 9, 9, 9))
    val m = Multimodal.parseMp4(file).get
    assert(m == Multimodal.Mp4Meta(90000L, 180000L, 2000L, 1280, 720, 5L))
    assert(Multimodal.parseMp4("RIFFnotmp4".getBytes).isEmpty)
    assert(Multimodal.parseMp4(Array[Byte](0, 0)).isEmpty)
  }

  test("buildMp4 round-trips through parseMp4 across param grid") {
    for ((ts, dur, w, h, n) <- Seq((600L, 0L, 640, 360, 0), (1000L, 553L, 1280, 720, 553),
      (90000L, 90001L, 1920, 1080, 7))) {
      val data = Array.tabulate[Byte](n)(i => (i % 97).toByte)
      val m = Multimodal.parseMp4(Multimodal.buildMp4(ts, dur, w, h, data)).get
      assert(m == Multimodal.Mp4Meta(ts, dur, dur * 1000L / ts, w, h, n.toLong))
    }
  }

  test("mm_video_meta end-to-end equals the oracle arithmetic on sf0.001") {
    val got = Multimodal.videoMeta(t).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    }.toMap
    val docs = t.documents.selectExpr("doc_id", "octet_length(text)").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    assert(got.keySet == docs.keySet && got.nonEmpty)
    docs.foreach { case (id, n) =>
      val ts = Multimodal.mp4Timescale(id)
      assert(got(id) == ((ts, n, n * 1000L / ts,
        Multimodal.mp4Width(id).toLong, Multimodal.mp4Height(id).toLong, n)),
        s"doc $id video metadata mismatch")
    }
  }

  test("mm_audio_meta end-to-end equals the oracle arithmetic on sf0.001") {
    val got = Multimodal.audioMeta(t).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    }.toMap
    val docs = t.documents.selectExpr("doc_id", "octet_length(text)").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    assert(got.keySet == docs.keySet && got.nonEmpty)
    docs.foreach { case (id, n) =>
      val (rate, ch, bits) =
        (Multimodal.wavRate(id).toLong, Multimodal.wavChannels(id).toLong,
          Multimodal.wavBits(id).toLong)
      assert(got(id) == ((rate, ch, bits, n, n * 1000000L / (rate * ch * (bits / 8)))),
        s"doc $id metadata mismatch")
    }
  }

  test("PNG round trip: hashes agree with the raw-BMP path; deflate actually compresses") {
    // the zlib'd container must decode to the SAME raster the raw BMP
    // path reads — cross-codec agreement pins the inflater bitwise
    val viaPng = Multimodal.pngRoundTrip(t).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val viaMixed = Multimodal.imageAHash(t).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(viaPng.nonEmpty && viaPng == viaMixed)
    // encoded size stays out of the oracle (encoder-version-specific);
    // pin locally that IDAT deflate beats the raw 24-bit raster
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, (Multimodal.imagePixel(7L, x, y) & 0xff) * 0x010101)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(bos.size() < 16 * 16 * 3, s"PNG ${bos.size()} B >= raw raster")
  }

  test("image downscale: 2x2 integer box means match the pixel formula directly") {
    val got = Multimodal.imageDownscale(t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty && got.values.forall(v => v._1 == 8L && v._2 == 8L))
    // independent recompute: per-doc total of (2x2 block sum div 4)
    got.keys.take(5).foreach { id =>
      val want = (for (by <- 0 until 8; bx <- 0 until 8) yield {
        val s = (for (dy <- 0 to 1; dx <- 0 to 1)
          yield Multimodal.imagePixel(id, bx * 2 + dx, by * 2 + dy).toLong).sum
        s / 4
      }).sum
      assert(got(id)._3 == want, s"doc $id px_total ${got(id)._3} != $want")
    }
  }
}
