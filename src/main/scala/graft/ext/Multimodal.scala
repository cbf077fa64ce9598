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

  /** documents.text re-cast as an opaque binary payload column — the
    * stand-in for real image/audio bytes in the test corpus. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Batch feature extraction: one decoder instantiation per partition,
    * rows processed in a tight loop (the mapInPandas batch shape). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (codec contexts etc.)
        rows.map { case (id, payload) => stubDecode(id, payload) }
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
