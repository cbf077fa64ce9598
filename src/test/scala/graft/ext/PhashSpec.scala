package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Behavior of the perceptual-hash (aHash) near-dup operator:
  * planted same-length perturbations are recovered, and the 5-block
  * pigeonhole candidate generation is LOSSLESS versus the quadratic
  * all-pairs join at the Hamming ≤ 4 threshold (any pair differing in
  * ≤4 bits has ≥1 of 5 blocks identical — verified empirically here,
  * proven by pigeonhole generally).
  */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("planted 2-char perturbations are recovered at high rate") {
    val pairs = SparkEntry.queries("q_phash_neardup")(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val planted = pairs.count { case (a, b) => b == a + 2000000 }
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 5 === 0).count()
    info(s"planted recall: $planted/$expected " +
      s"(misses = mean-borderline bits pushed past Hamming 4)")
    // a 2-char change moves <=2 pixels directly; the remaining risk is
    // mean-shift flips of borderline pixels — a perceptual hash is
    // SUPPOSED to tolerate this imperfectly, but most must survive
    assert(planted >= expected * 8 / 10, s"$planted of $expected")
  }

  test("pigeonhole blocking finds exactly the all-pairs result set") {
    val blocked = SparkEntry.queries("q_phash_neardup")(spark, sf)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    // quadratic reference: same fingerprints, unblocked join — only
    // viable at test scale, which is the point of the blocked plan
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = docs.unionByName(docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 2000000).as("doc_id"),
        concat(substring(col("text"), 1, 10), lit("zz"),
          expr("substring(text, 13)")).as("text")))
    val pix = transform(sequence(lit(0), lit(63)),
      i => ascii(rpad(col("text"), 64, " ").substr(i + 1, lit(1))))
    def bitAt(i: Int) = when(
      element_at(col("p"), i + 1) * 64 >= col("ps"), 1L).otherwise(0L)
    val fps = planted
      .withColumn("p", pix)
      .withColumn("ps", aggregate(col("p"), lit(0), (acc, x) => acc + x))
      .select(col("doc_id"),
        (0 to 31).map(i => bitAt(i) * lit(1L << i)).reduceLeft(_ + _).as("lo"),
        (32 to 63).map(i => bitAt(i) * lit(1L << (i - 32))).reduceLeft(_ + _).as("hi"))
    val all = fps.as("x").join(fps.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        (bit_count(col("x.lo").bitwiseXOR(col("y.lo"))) +
          bit_count(col("x.hi").bitwiseXOR(col("y.hi")))).cast("long").as("hamming"))
      .filter(col("hamming") <= 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(blocked === all)
  }
}
