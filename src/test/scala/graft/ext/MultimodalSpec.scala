package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("stubDecode is deterministic and sizes come from the payload") {
    val a = Multimodal.stubDecode(1L, "hello world".getBytes)
    val b = Multimodal.stubDecode(1L, "hello world".getBytes)
    assert(a === b)
    assert(a.n_bytes === 11L)
    assert(a.width >= 1 && a.width <= 640)
    assert(a.height >= 1 && a.height <= 480)
  }

  test("extractFeatures: mapPartitions pipeline yields one feature row per doc") {
    val docs = Seq((1L, "payload one"), (2L, "payload two longer"))
      .toDF("doc_id", "text")
    val features = Multimodal.extractFeatures(Multimodal.asMedia(docs))
    val rows = features.orderBy("doc_id")
      .as[Multimodal.MediaFeatures].collect()
    assert(rows.length === 2)
    assert(rows(0).doc_id === 1L && rows(0).n_bytes === 11L)
    assert(rows(1).doc_id === 2L && rows(1).n_bytes === 18L)
    // schema is the typed feature record
    assert(features.columns.toSeq ===
      Seq("doc_id", "n_bytes", "format", "width", "height", "checksum"))
  }

  test("sampleFrames: every Nth fixed-size frame, last frame may be short") {
    val docs = Seq((1L, "x" * 200)).toDF("doc_id", "text") // 200B -> 4 frames (64,64,64,8)
    val frames = Multimodal.sampleFrames(Multimodal.asMedia(docs), everyN = 1)
      .orderBy("frame_idx")
      .select(col("frame_idx"), octet_length(col("frame")).as("n"))
      .as[(Long, Int)].collect().toSeq
    assert(frames === Seq((0L, 64), (1L, 64), (2L, 64), (3L, 8)))
    val sampled = Multimodal.sampleFrames(Multimodal.asMedia(docs), everyN = 3)
      .select("frame_idx").as[Long].collect().toSeq.sorted
    assert(sampled === Seq(0L, 3L))
  }

  test("resize keeps every factor-th byte and reports both sizes") {
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
    val out = Multimodal.resize(Multimodal.asMedia(docs), factor = 3)
      .select("payload", "orig_bytes", "resized_bytes")
      .as[(Array[Byte], Long, Long)].head()
    assert(new String(out._1) === "adgj")
    assert(out._2 === 10L && out._3 === 4L)
  }
}
