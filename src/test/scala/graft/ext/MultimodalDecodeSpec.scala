package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ext/Multimodal real decode mode — genuine PPM/BMP parsing behind the
  * same seam as the oracle-replayable stub: byte-exact round trips for
  * both formats (incl. BMP row padding + bottom-up/top-down rows and
  * PPM header comments), total-function fallback, and the headline
  * claim: planted REAL-IMAGE perturbations are recovered through the
  * SAME 5-block pigeonhole blocking q_phash_neardup ships, end to end
  * through the Spark pipeline (payload → realDecode → aHash64 →
  * banded equi-join).
  */
class MultimodalDecodeSpec extends SparkSpec {
  import Multimodal._

  // ---- pure-JVM encoders for the fixtures ----------------------------

  private def ppm(w: Int, h: Int, rgb: Array[Byte],
      comment: Boolean = false): Array[Byte] = {
    require(rgb.length == w * h * 3)
    val hdr =
      if (comment) s"P6\n# a header comment\n$w $h\n255\n"
      else s"P6 $w $h 255\n"
    hdr.getBytes("US-ASCII") ++ rgb
  }

  private def bmp(w: Int, h: Int, rgb: Array[Byte],
      topDown: Boolean = false): Array[Byte] = {
    require(rgb.length == w * h * 3)
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54) // reserved, pixel-data offset
    buf.putInt(40).putInt(w).putInt(if (topDown) -h else h)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var fileRow = 0
    while (fileRow < h) {
      val imgRow = if (topDown) fileRow else h - 1 - fileRow
      var x = 0
      while (x < w) {
        val o = (imgRow * w + x) * 3
        buf.put(rgb(o + 2)).put(rgb(o + 1)).put(rgb(o)) // BGR
        x += 1
      }
      var pad = w * 3
      while (pad < rowSize) { buf.put(0.toByte); pad += 1 }
      fileRow += 1
    }
    buf.array()
  }

  private def expectedLuma(rgb: Array[Byte]): Array[Int] =
    rgb.grouped(3).map { t =>
      (299 * (t(0) & 0xff) + 587 * (t(1) & 0xff) + 114 * (t(2) & 0xff)) / 1000
    }.toArray

  /** Deterministic pixel noise (xorshift — no Random). */
  private def pixels(w: Int, h: Int, seed: Long): Array[Byte] = {
    var x = seed | 1L
    Array.fill(w * h * 3) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (x & 0xff).toByte
    }
  }

  test("PPM P6 round-trip, with and without header comments") {
    val rgb = pixels(5, 4, 7L)
    for (c <- Seq(false, true)) {
      val got = decodeImage(ppm(5, 4, rgb, comment = c))
      assert(got.isDefined, s"comment=$c")
      assert(got.get.format === "image/ppm")
      assert(got.get.width === 5 && got.get.height === 4)
      assert(got.get.luma.toSeq === expectedLuma(rgb).toSeq)
    }
  }

  test("BMP 24-bit round-trip: bottom-up AND top-down, padded rows (w=3)") {
    val rgb = pixels(3, 5, 11L) // rowSize 12 = 9 data + 3 pad bytes
    for (td <- Seq(false, true)) {
      val got = decodeImage(bmp(3, 5, rgb, topDown = td))
      assert(got.isDefined, s"topDown=$td")
      assert(got.get.format === "image/bmp")
      assert(got.get.width === 3 && got.get.height === 5)
      assert(got.get.luma.toSeq === expectedLuma(rgb).toSeq,
        s"topDown=$td row order/padding")
    }
  }

  test("both encodings of the same pixels decode to the same luma grid") {
    val rgb = pixels(8, 8, 23L)
    assert(decodeImage(ppm(8, 8, rgb)).get.luma.toSeq ===
      decodeImage(bmp(8, 8, rgb)).get.luma.toSeq)
  }

  test("realDecode is total: non-images fall back to the stub") {
    val junk = Seq(
      Array.empty[Byte],
      "plain text document".getBytes("US-ASCII"),
      "P6 junkheader".getBytes("US-ASCII"),
      Array[Byte]('B', 'M', 1, 2, 3), // truncated BMP
      ppm(4, 4, pixels(4, 4, 3L)).dropRight(5)) // truncated pixel data
    junk.zipWithIndex.foreach { case (p, i) =>
      assert(realDecode(i.toLong, p) === stubDecode(i.toLong, p),
        s"junk #$i must degrade to the stub")
    }
    // and a real image does NOT: true dims, true format
    val img = realDecode(9L, ppm(6, 3, pixels(6, 3, 5L)))
    assert(img.format === "image/ppm")
    assert(img.width === 6 && img.height === 3)
  }

  test("planted real-image perturbations recovered via pigeonhole blocking") {
    // corpus: 40 base images (32x24), every 4th planted with a clone
    // whose pixels are nudged inside ONE aHash cell — a genuine
    // near-duplicate. Recovery runs the production shape end to end:
    // Spark mapPartitions realDecode+aHash, 13-bit 5-block pigeonhole
    // explode, band equi-join, Hamming <= 4 confirm — the
    // q_phash_neardup operator over genuinely decoded images.
    val w = 32; val h = 24
    val base = (0 until 40).map { i =>
      val rgb = pixels(w, h, 101L + i * 17)
      (i.toLong, if (i % 2 == 0) ppm(w, h, rgb) else bmp(w, h, rgb))
    }
    val clones = (0 until 40 by 4).map { i =>
      val rgb = pixels(w, h, 101L + i * 17).clone()
      // nudge a 2x2 pixel patch by +8 luma-ish — sub-cell perturbation
      for (dy <- 0 until 2; dx <- 0 until 2; c <- 0 until 3) {
        val o = ((dy + 4) * w + (dx + 4)) * 3 + c
        rgb(o) = math.min((rgb(o) & 0xff) + 8, 255).toByte
      }
      (1000L + i, if (i % 2 == 0) ppm(w, h, rgb) else bmp(w, h, rgb))
    }
    val spark2 = spark
    import spark2.implicits._
    val fps = (base ++ clones).toDF("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        // .get: a fixture payload failing to decode must blow the test
        (id, aHash64(decodeImage(p).get))
      })
      .toDF("doc_id", "fp")
    // production pigeonhole: 5 blocks of 13/13/13/13/12 bits — any
    // pair at Hamming <= 4 must agree on >= 1 whole block
    val exploded = fps.select(col("doc_id"), col("fp"),
      posexplode(array((0 until 5).map { j =>
        val lo = 13 * j
        val width = if (j == 4) 12 else 13
        shiftright(col("fp"), lo)
          .bitwiseAND(lit((1L << width) - 1))
      }: _*)).as(Seq("block_idx", "block_val")))
    val got = exploded.as("x").join(exploded.as("y"),
        col("x.block_idx") === col("y.block_idx") &&
          col("x.block_val") === col("y.block_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        col("x.fp").as("fa"), col("y.fp").as("fb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long"))
      .filter(col("hamming") <= 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute-force truth over the collected fingerprints
    val all = fps.as[(Long, Long)].collect()
    val truth = (for {
      (ia, fa) <- all; (ib, fb) <- all
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 4
    } yield (ia, ib)).toSet
    assert(got === truth, "pigeonhole blocking must be lossless at H<=4")
    // and the PLANTED pairs are recovered: every planted pair inside
    // the Hamming budget IS found (losslessness on the positives), and
    // the fixture keeps nearly all of them inside it — a sub-cell
    // nudge can flip grid-mean-borderline cells elsewhere (intrinsic
    // to aHash), so one stray planted pair past H=4 is tolerated, not
    // a miss of the blocking
    val planted = (0 until 40 by 4).map(i => (i.toLong, 1000L + i)).toSet
    assert((planted intersect truth) === (planted intersect got),
      "every in-budget planted pair must be recovered")
    assert((planted intersect got).size >= 8,
      s"fixture degenerated: only ${(planted intersect got).size}/10 " +
        "planted pairs inside the Hamming budget")
  }
}
