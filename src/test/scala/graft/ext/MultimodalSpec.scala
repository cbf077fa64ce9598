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
}
