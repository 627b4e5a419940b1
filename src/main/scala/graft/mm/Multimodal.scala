package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Tables

/** Multimodal columns: media as opaque `binary` payloads with typed
  * metadata alongside. IMAGE decode is REAL: `decodeImage` reads
  * PNG/JPEG/GIF/BMP headers via the JDK's `javax.imageio` (ships with
  * the JRE — no external libs). Payloads no installed reader
  * recognizes (audio/video/plain text — those codecs are not in this
  * container) fall back to `decodeStub`, a deterministic fake; the
  * Spark-side plumbing — schema, per-partition batch processing,
  * partition sizing — is real and tested either way.
  *
  * At 100 TB the shape matters: payloads stay columnar-binary in
  * parquet, decode runs per-partition (one library context per task,
  * not per row), and derived features are small typed columns that
  * downstream filters/joins push down on, so the wide binary column is
  * pruned away unless actually needed.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeature(media_id: Long, kind: String, n_bytes: Int,
                                width: Int, height: Int, sig: Long)

  /** Real image header decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP
    * readers ship with the JRE). Reads only the header
    * (`ImageReader.getWidth/getHeight`), never the pixel raster, so the
    * per-payload cost is O(header) not O(pixels) — the bound that
    * matters when this loop runs over 100 TB of media. Returns None
    * when no installed reader recognizes the bytes (non-image kinds).
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int)] = {
    import javax.imageio.ImageIO
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Some((r.getWidth(0), r.getHeight(0)))
        } catch { case _: java.io.IOException => None }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** STUB: stands in for the audio/video decoders this container lacks.
    * Deterministic in the payload bytes so tests are stable. A real
    * deployment swaps this for a codec call with the same signature.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    var h = 1125899906842597L // FNV-ish fold, deterministic
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    val w = (math.floorMod(h, 1920) + 1).toInt
    val ht = (math.floorMod(h >> 21, 1080) + 1).toInt
    (w, ht)
  }

  /** Feature extraction over binary payloads: mapPartitions so decoder
    * state is per-task (the Scala analog of a batched pandas UDF —
    * one batch of rows per invocation, vectorizable decode inside).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    implicit val enc: org.apache.spark.sql.Encoder[MediaFeature] =
      Encoders.product[MediaFeature]
    media.mapPartitions { rows =>
      // per-partition decoder context: one ImageIO registry scan per
      // task, not per row
      rows.map { r =>
        val (w, h) = decodeImage(r.payload).getOrElse(decodeStub(r.payload))
        var sig = 0L
        val n = math.min(r.payload.length, 64)
        var i = 0
        while (i < n) { sig = sig * 131 + (r.payload(i) & 0xff); i += 1 }
        MediaFeature(r.media_id, r.kind, r.payload.length, w, h, sig)
      }
    }
  }

  /** STUB resize: stands in for an image resize. Deterministic byte-
    * stride downsample to the target byte budget — shape and size
    * behavior of a real resize (output smaller, derived from input),
    * content fake. Swap for a real scaler with the same signature.
    */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (payload.length <= targetBytes) payload
    else {
      val out = new Array[Byte](targetBytes)
      val stride = payload.length.toDouble / targetBytes
      var i = 0
      while (i < targetBytes) {
        out(i) = payload((i * stride).toInt)
        i += 1
      }
      out
    }
  }

  /** Resize pass over a media table: per-partition batch processing,
    * payloads replaced by their resized form plus the size metadata a
    * downstream pipeline filters on.
    */
  def resizeAll(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    implicit val enc: org.apache.spark.sql.Encoder[MediaRow] =
      Encoders.product[MediaRow]
    media.mapPartitions { rows =>
      rows.map(r => r.copy(payload = resizeStub(r.payload, targetBytes)))
    }
  }

  /** Synthesizes a media table from documents (text bytes as payload) —
    * the container has no real media, but the pipeline is the real one.
    */
  def mediaFromDocuments(t: Tables): Dataset[MediaRow] = {
    import t.spark.implicits._
    implicit val enc: org.apache.spark.sql.Encoder[MediaRow] =
      Encoders.product[MediaRow]
    t.documents
      .select($"doc_id".as("media_id"), $"source".as("kind"),
        $"text".cast(BinaryType).as("payload"))
      .as[MediaRow]
  }

  /** Oracle-checkable slice of the plumbing: typed metadata computed
    * from the binary payload with engine-portable functions (octet
    * length, content digest, header hex prefix).
    */
  def binaryMeta(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.documents.select(
      $"doc_id",
      octet_length($"text").as("n_bytes"),
      md5($"text".cast(BinaryType)).as("payload_md5"),
      substring(hex($"text".cast(BinaryType)), 1, 16).as("header_hex"))
  }

  /** Frame-sampling plumbing (the video-style access pattern): the
    * payload is cut into fixed 64-byte frames and every 4th frame is
    * kept, one output row per sampled frame with a content digest.
    * Frame count is capped at 8192 (512 KB of payload), matching the
    * oracle's range(0, 8192) — a per-row work bound.
    * Runs on the hex projection so the same expression is exact in
    * DuckDB (which can't substring BLOBs).
    */
  def frameSample(t: Tables): DataFrame = {
    import t.spark.implicits._
    val frameHex = 128 // 64 bytes
    t.widen(t.documents)
      .select($"doc_id", hex($"text".cast(BinaryType)).as("hx"))
      .select($"doc_id", explode(expr(
        // frame count by integer arithmetic: (len + frameHex-1) div frameHex.
        // Empty payloads must yield an empty array — sequence(0, -1)
        // auto-reverses to [0, -1] in Spark and would emit a phantom frame.
        s"if(length(hx) = 0, array(), " +
          s"transform(sequence(0, int(least((length(hx) + ${frameHex - 1}) div $frameHex, 8192)) - 1), " +
          s"i -> named_struct('frame_idx', i, 'frame', substring(hx, i * $frameHex + 1, $frameHex))))"
      )).as("f"))
      .select($"doc_id", $"f.frame_idx".as("frame_idx"),
        md5($"f.frame".cast(BinaryType)).as("frame_md5"))
      .filter($"frame_idx" % 4 === 0)
  }

  /** The one target-size constant shared by `resizeMeta`'s Scala
    * default AND `resizeMetaSql` (interpolated below) — the two sides
    * cannot silently diverge on the budget.
    */
  val ResizeTargetBytes: Int = 64

  /** Oracle-checkable resize pass: the REAL `resizeStub` byte-stride
    * downsample (the one `resizeAll` applies) run per-partition over
    * the media table, emitting size metadata plus a digest of the
    * resized payload. The DuckDB oracle reconstructs the exact same
    * stride selection with substr/string_agg and must match md5 for
    * md5: this pins the resize CODE PATH, not just its metadata.
    *
    * ASCII ASSUMPTION: the oracle indexes by CHARACTER (substr) while
    * resizeStub strides over BYTES. The two agree only because the
    * synthesized payloads are ASCII document text (byte i == char
    * i+1 — the same equivalence frameSample's hex projection relies
    * on). Non-ASCII payloads would diverge; the oracle comparison is
    * only valid against `mediaFromDocuments` on the ASCII testdata.
    * `resizeMetaSql` is generated for targetBytes == ResizeTargetBytes
    * only — call sites passing another value get no oracle.
    */
  def resizeMeta(t: Tables, targetBytes: Int = ResizeTargetBytes): DataFrame = {
    import t.spark.implicits._
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Long, Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.BINARY)
    val media = mediaFromDocuments(t)
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = resizeStub(r.payload, targetBytes)
        (r.media_id, r.payload.length.toLong, out.length.toLong, out)
      }
    }.toDF("media_id", "n_bytes_in", "n_bytes_out", "resized")
      .select($"media_id", $"n_bytes_in", $"n_bytes_out",
        md5($"resized").as("resized_md5"))
  }

  val resizeMetaSql: String = {
    val tb = ResizeTargetBytes // single source of truth with resizeMeta's default
    s"""WITH d AS (SELECT doc_id AS media_id, text,
       | CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n FROM documents),
       |small AS (SELECT media_id, n, n AS n_out, md5(text) AS resized_md5
       | FROM d WHERE n <= $tb),
       |big AS (
       | SELECT media_id, n, CAST($tb AS BIGINT) AS n_out,
       |  md5(string_agg(substr(text,
       |   CAST(trunc(i.range * (CAST(n AS DOUBLE) / $tb)) AS INT) + 1, 1),
       |   '' ORDER BY i.range)) AS resized_md5
       | FROM d JOIN range(0, $tb) i ON n > $tb GROUP BY media_id, n)
       |SELECT media_id, n AS n_bytes_in, n_out AS n_bytes_out, resized_md5 FROM small
       |UNION ALL
       |SELECT media_id, n, n_out, resized_md5 FROM big""".stripMargin.replace("\n", " ")
  }

  val frameSampleSql: String =
    """SELECT doc_id, frame_idx, md5(substr(hx, frame_idx * 128 + 1, 128)) AS frame_md5
      |FROM (
      | SELECT doc_id, hex(CAST(text AS BLOB)) AS hx, CAST(r.range AS INT) AS frame_idx
      | FROM (SELECT doc_id, text FROM documents) d
      | JOIN range(0, 8192) r ON r.range < (length(hex(CAST(d.text AS BLOB))) + 127) // 128)
      |WHERE frame_idx % 4 = 0""".stripMargin.replace("\n", " ")

  val binaryMetaSql: String =
    """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
      | md5(text) AS payload_md5,
      | substr(hex(CAST(text AS BLOB)), 1, 16) AS header_hex
      |FROM documents""".stripMargin.replace("\n", " ")
}
