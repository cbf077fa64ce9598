package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, QueryModule, Tables}

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, batch-decoded per partition.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB ([[Multimodal.stubDecode]]) — but
  * the Spark-side shape is real: schema, per-partition batching
  * (`mapPartitions`, the Scala analog of `mapInPandas`), partition
  * sizing, and the downstream feature schema are all what a real
  * decoder plugs into.
  *
  * Scale: decode is narrow (no shuffle); a real deployment tunes
  * `spark.sql.files.maxPartitionBytes` so one partition's payloads fit
  * in executor memory, which is the only constraint at 100 TB.
  */
object Multimodal {

  /** Feature record produced by the (stub) decoder. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      checksum: Long)

  /** STUB decode kernel: a real implementation would decode the codec
    * header and pixel data here. This fake derives deterministic
    * "dimensions" and a checksum from the payload bytes so the
    * pipeline shape is testable end-to-end. */
  def stubDecode(docId: Long, payload: Array[Byte]): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum = (sum * 31 + (payload(i) & 0xff)) % 1000000007L; i += 1 }
    MediaFeatures(
      doc_id = docId,
      n_bytes = payload.length.toLong,
      format = if (payload.nonEmpty && (payload(0) & 0xff) < 0x80) "fake/rgb8" else "fake/rgb16",
      width = (sum % 640).toInt + 1,
      height = ((sum / 640) % 480).toInt + 1,
      checksum = sum)
  }

  /** A really-decoded image: format tag, dimensions, and the row-major
    * 0–255 luma grid (BT.601 integer weights — exact, so every
    * downstream statistic is replayable). */
  final case class DecodedImage(
      format: String, width: Int, height: Int, luma: Array[Int])

  /** REAL pure-JVM decode of the uncompressed formats a codec-less
    * container can still parse byte-exactly — the second
    * [[MediaFeatures]] mode behind the same seam as [[stubDecode]]:
    *
    *   - PPM `P6` (binary): `P6 <w> <h> <maxval≤255>` header with
    *     `#` comments, one whitespace, then w·h RGB triplets;
    *   - BMP `BM`: BITMAPINFOHEADER, 24-bit uncompressed, BGR pixel
    *     order, rows padded to 4 bytes, bottom-up (positive height)
    *     or top-down (negative height).
    *
    * Luma is the exact integer BT.601 mix (299·R + 587·G + 114·B)
    * div 1000, so two engines (or a spec's planted fixture) agree
    * bit-for-bit. Returns None on anything that isn't a well-formed
    * image of these formats — callers fall back to the stub, keeping
    * the pipeline total. */
  def decodeImage(payload: Array[Byte]): Option[DecodedImage] =
    try {
      if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6')
        decodePpm(payload)
      else if (payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M')
        decodeBmp(payload)
      else None
    } catch { case _: RuntimeException => None }

  private def luma(r: Int, g: Int, b: Int): Int =
    (299 * r + 587 * g + 114 * b) / 1000

  private def decodePpm(p: Array[Byte]): Option[DecodedImage] = {
    var i = 2 // past "P6"
    def skipWs(): Unit = {
      var in = true
      while (in && i < p.length) {
        val c = p(i) & 0xff
        if (c == '#') { while (i < p.length && p(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else in = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = v * 10 + (p(i) - '0'); i += 1; any = true
        if (v > (1 << 24)) return -1
      }
      if (any) v else -1
    }
    val w = int(); val h = int(); val maxv = int()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    i += 1 // exactly ONE whitespace byte separates header from data
    if (i + w * h * 3 > p.length) return None
    val out = new Array[Int](w * h)
    var j = 0
    while (j < w * h) {
      val o = i + j * 3
      out(j) = luma(p(o) & 0xff, p(o + 1) & 0xff, p(o + 2) & 0xff)
      j += 1
    }
    Some(DecodedImage("image/ppm", w, h, out))
  }

  private def decodeBmp(p: Array[Byte]): Option[DecodedImage] = {
    def le32(o: Int): Int =
      (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
        ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    val dataOff = le32(10)
    val hdrSize = le32(14)
    val w = le32(18)
    val hRaw = le32(22)
    val bits = le16(28)
    val compression = le32(30)
    if (hdrSize < 40 || bits != 24 || compression != 0) return None
    if (w <= 0 || hRaw == 0 || w > (1 << 24)) return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (dataOff < 54 || dataOff.toLong + rowSize.toLong * h > p.length)
      return None
    val out = new Array[Int](w * h)
    var row = 0
    while (row < h) {
      // bottom-up storage: file row 0 is the IMAGE's last row
      val imgRow = if (topDown) row else h - 1 - row
      val base = dataOff + row * rowSize
      var x = 0
      while (x < w) {
        val o = base + x * 3 // BGR order
        out(imgRow * w + x) =
          luma(p(o + 2) & 0xff, p(o + 1) & 0xff, p(o) & 0xff)
        x += 1
      }
      row += 1
    }
    Some(DecodedImage("image/bmp", w, h, out))
  }

  /** Average-hash of a decoded image: block-average the luma grid to
    * 8×8 (exact integer sums — each cell averages its own pixel
    * block), then bit k = cell k ≥ the 64-cell mean. The REAL-pixel
    * twin of q_phash_neardup's text aHash: same 64-bit shape, same
    * 5-block pigeonhole admissibility (Hamming ≤ 4 pairs always share
    * a block), so the planted-perturbation recovery spec runs the
    * production blocking against genuinely decoded images. Images
    * smaller than 8×8 hash their clamped cell map (cells then share
    * pixels) — still deterministic. */
  def aHash64(img: DecodedImage): Long = {
    val cells = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < img.height) {
      val cy = math.min(y * 8 / img.height, 7)
      var x = 0
      while (x < img.width) {
        val cx = math.min(x * 8 / img.width, 7)
        cells(cy * 8 + cx) += img.luma(y * img.width + x)
        counts(cy * 8 + cx) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    var totalSum = 0L
    var totalCnt = 0L
    while (i < 64) {
      if (counts(i) > 0) { cells(i) = cells(i) / counts(i) }
      totalSum += cells(i); totalCnt += 1
      i += 1
    }
    // cell mean vs grid mean in cross-multiplied integers (no doubles)
    var fp = 0L
    i = 0
    while (i < 64) {
      if (cells(i) * totalCnt >= totalSum) fp |= 1L << i
      i += 1
    }
    fp
  }

  /** Decode through the REAL parser with stub fallback — the total
    * function [[extractFeatures]] uses in real mode: a payload that
    * parses as PPM/BMP reports its true format/dimensions and a
    * checksum over the decoded LUMA (the polynomial scheme shared
    * with the stub, so downstream consumers see one checksum
    * contract); anything else degrades to the stub's byte-derived
    * features. */
  def realDecode(docId: Long, payload: Array[Byte]): MediaFeatures =
    decodeImage(payload) match {
      case Some(img) =>
        var sum = 0L
        var i = 0
        while (i < img.luma.length) {
          sum = (sum * 31 + img.luma(i)) % 1000000007L; i += 1
        }
        MediaFeatures(docId, payload.length.toLong, img.format,
          img.width, img.height, sum)
      case None => stubDecode(docId, payload)
    }

  /** documents.text re-cast as an opaque binary payload column — the
    * stand-in for real image/audio bytes in the test corpus. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Batch feature extraction: one decoder instantiation per partition,
    * rows processed in a tight loop (the mapInPandas batch shape).
    * `real = true` routes payloads through [[realDecode]] — genuine
    * PPM/BMP parsing with stub fallback; the default stays the stub so
    * the oracle-replayed query contract is unchanged. */
  def extractFeatures(media: DataFrame, real: Boolean = false): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val kernel: (Long, Array[Byte]) => MediaFeatures =
      if (real) realDecode else stubDecode
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (codec contexts etc.)
        rows.map { case (id, payload) => kernel(id, payload) }
      }
      .toDF()
  }

  final val FrameBytes = 64

  /** Frame sampling: treat the payload as a sequence of fixed-size
    * frames and keep every `everyN`-th — the explode + byte-slice shape
    * of real video frame extraction (a real decoder replaces the
    * `substring` slice with a codec seek). Narrow: no shuffle; output
    * rows are (doc_id, frame_idx, frame payload).
    */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame = {
    val nFrames = ceil(octet_length(col("payload")) / lit(FrameBytes.toDouble)).cast("long")
    media
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0L), greatest(nFrames - 1, lit(0L)), lit(everyN.toLong)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        substring(col("payload"), (col("frame_idx") * FrameBytes + 1).cast("int"),
          lit(FrameBytes)).as("frame"))
  }

  /** Resize stub: keep every `factor`-th byte of the payload (a real
    * implementation swaps in a pixel-space scaler; the plumbing —
    * binary in, smaller binary + updated metadata out, all narrow —
    * is identical). Runs as a per-partition batch like the decoder. */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    // validate at call time: a bad factor would otherwise surface as
    // an opaque arithmetic error deep inside an executor task
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val out = new Array[Byte]((payload.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = payload(i * factor); i += 1 }
          (id, out, payload.length.toLong, out.length.toLong)
        }
      }
      .toDF("doc_id", "payload", "orig_bytes", "resized_bytes")
  }
}

object MultimodalQueries extends QueryModule {

  override def defs: Seq[(String, QueryDef)] = Seq(

    // ---- Binary-column plumbing is oracle-checkable: byte length and
    // content hash of the payload survive the cast on both engines.
    "q_multimodal_meta" -> QueryDef(
      fn = (spark, dir) => Multimodal.asMedia(Tables(spark, dir, "documents"))
        .select(
          col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("payload_md5"))
        .orderBy("doc_id"),
      oracle = Some("""
        |SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Stubbed decode + feature extraction (mapPartitions batch
    // shape). The STUB checksum is a polynomial byte hash
    // (acc*31 + byte mod 1e9+7) over an ASCII payload, so DuckDB
    // replays the whole decode with a list_reduce over code points —
    // full hash check, no kernel-frame export needed. (A real codec
    // kernel would be spec-covered instead; the oracle verifies the
    // mapPartitions plumbing delivers every byte, in order, exactly
    // once per row.)
    "q_multimodal_features" -> QueryDef(
      fn = (spark, dir) => Multimodal
        .extractFeatures(Multimodal.asMedia(Tables(spark, dir, "documents")))
        .orderBy("doc_id"),
      oracle = Some("""
        |WITH cs AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    CASE WHEN length(text) > 0 AND ord(substr(text, 1, 1)) < 128
        |         THEN 'fake/rgb8' ELSE 'fake/rgb16' END AS format,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(1, length(text) + 1),
        |          i -> CAST(ord(substr(text, i, 1)) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum
        |  FROM documents)
        |SELECT doc_id, n_bytes, format,
        |  CAST(checksum % 640 + 1 AS INT) AS width,
        |  CAST((checksum // 640) % 480 + 1 AS INT) AS height,
        |  checksum
        |FROM cs ORDER BY doc_id""".stripMargin)),

    // ---- Frame sampling: every 3rd 64-byte frame, checkable via byte
    // length + hash of each sampled frame (documents are ASCII, so the
    // DuckDB string substr slices the same bytes).
    "q_multimodal_frames" -> QueryDef(
      fn = (spark, dir) => Multimodal
        .sampleFrames(Multimodal.asMedia(Tables(spark, dir, "documents")), everyN = 3)
        .select(col("doc_id"), col("frame_idx"),
          octet_length(col("frame")).cast("long").as("frame_bytes"),
          md5(col("frame")).as("frame_md5"))
        .orderBy("doc_id", "frame_idx"),
      oracle = Some("""
        |WITH f AS (
        |  SELECT doc_id,
        |    unnest(range(0, greatest(CAST(ceil(length(text) / 64.0) AS BIGINT), 1), 3)) AS frame_idx,
        |    text
        |  FROM documents)
        |SELECT doc_id, frame_idx,
        |  CAST(length(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64)) AS BIGINT) AS frame_bytes,
        |  md5(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64)) AS frame_md5
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin))
  )
}
