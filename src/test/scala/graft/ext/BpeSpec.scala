package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The window-relational BPE rounds must agree with the textbook
  * imperative algorithm (greedy left-to-right non-overlapping merge,
  * most-frequent pair first, ties by (left, right)).
  */
class BpeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_bpe_train == imperative reference on the real corpus") {
    import graft.SparkEntry
    val got = SparkEntry.queries("q_bpe_train")(spark, sf)
      .collect()
      .map(r => (r.getAs[Int]("it"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count")))
      .toSeq

    // imperative reference over the same documents
    var words: Seq[Array[String]] = Tables(spark, sf, "documents")
      .select("text").collect().toSeq
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .map(_.map(_.toString).toArray)
    val want = (1 to 3).map { it =>
      val counts = mutable.Map.empty[(String, String), Long]
      for (w <- words; i <- 0 until w.length - 1)
        counts((w(i), w(i + 1))) = counts.getOrElse((w(i), w(i + 1)), 0L) + 1
      val ((a, b), c) = counts.toSeq
        .sortBy { case ((l, r), n) => (-n, l, r) }.head
      words = words.map { w =>
        val out = mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < w.length) {
          if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
            out += a + b; i += 2
          } else { out += w(i); i += 1 }
        }
        out.toArray
      }
      (it, a, b, a + b, c)
    }
    assert(got === want)
  }

  test("train-once memo: encode reuses training; dir switch releases streams") {
    graft.ops.BuildOnce.clearAll()
    val run = graft.SparkEntry.queries("q_bpe_train")
    val enc = graft.SparkEntry.queries("q_bpe_encode")
    // train + encode materializes every cached round stream (the final
    // stream's RDD only materializes when encode first reads it)
    run(spark, sf).collect()
    enc(spark, sf).collect()
    val afterFirst = spark.sparkContext.getPersistentRDDs.size
    // same dir again: fully memoized — no new cached streams appear
    enc(spark, sf).collect()
    run(spark, sf).collect()
    assert(spark.sparkContext.getPersistentRDDs.size == afterFirst,
      "repeat train/encode on one dir re-trained instead of reusing the memo")
    // switching dirs swap-releases the previous dir's streams: the
    // cached-RDD population stays bounded at one live generation set
    run(spark, "/root/testdata/sf0.01").collect()
    assert(spark.sparkContext.getPersistentRDDs.size <= afterFirst,
      s"dir switch leaked round streams: ${spark.sparkContext.getPersistentRDDs.size}")
    graft.ops.BuildOnce.clearAll()
  }

  test("a merge application leaves no occurrence of the merged pair") {
    // the greedy pass must be EXHAUSTIVE: after merging (a,b), the
    // stream may contain new pairs involving "ab" but never (a,b)
    // itself — the invariant that distinguishes a full left-to-right
    // pass from a partial one
    import graft.SparkEntry
    val merges = SparkEntry.queries("q_bpe_train")(spark, sf).collect()
    assert(merges.length === 3)
    // recheck via the imperative reference state after round 1
    val (a, b) = (merges(0).getAs[String]("left_sym"),
      merges(0).getAs[String]("right_sym"))
    var words: Seq[Array[String]] = Tables(spark, sf, "documents")
      .select("text").collect().toSeq
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .map(_.map(_.toString).toArray)
    words = words.map { w =>
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
          out += a + b; i += 2
        } else { out += w(i); i += 1 }
      }
      out.toArray
    }
    assert(!words.exists(w =>
      (0 until w.length - 1).exists(i => w(i) == a && w(i + 1) == b)))
  }
}
