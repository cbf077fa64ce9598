package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DedupFunctions.paragraphDedup on a handcrafted corpus where every
  * duplicate class has a known right answer: intra-doc duplicates,
  * cross-doc duplicates, global boilerplate, whitespace/case
  * normalization, and the all-paragraphs-dropped document.
  */
class ParagraphDedupSpec extends SparkSpec {

  test("first occurrence wins at paragraph grain") {
    import spark.implicits._
    val corpus = Seq(
      // doc 1: unique para + boilerplate + its own para AGAIN (intra-doc dup)
      (1L, "alpha body one\n\nBOILER PLATE\n\nalpha body one"),
      // doc 2: boilerplate (dup of doc1 pos1 after trim+lower) + unique
      (2L, "  boiler plate\n\nbeta body two"),
      // doc 3: nothing but already-seen paragraphs → rebuilt text empty
      (3L, "alpha body one\n\nboiler plate"),
      // doc 4: unique only
      (4L, "delta body four")
    ).toDF("doc_id", "text")
    val out = DedupFunctions.paragraphDedup(corpus)
      .orderBy("doc_id").collect()

    def row(i: Int) = (out(i).getLong(0), out(i).getLong(1),
      out(i).getLong(2), out(i).getString(3))
    def md5Of(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

    // doc 1 keeps pos 0+1, drops its own repeat at pos 2
    assert(row(0) === ((1L, 3L, 2L,
      md5Of("alpha body one\n\nBOILER PLATE"))))
    // doc 2: "  boiler plate" normalizes (trim+lower) to doc1's
    // BOILER PLATE → dropped; only the unique paragraph survives
    assert(row(1) === ((2L, 2L, 1L, md5Of("beta body two"))))
    // doc 3 loses everything — kept text is the empty string
    assert(row(2) === ((3L, 2L, 0L, md5Of(""))))
    // doc 4 untouched
    assert(row(3) === ((4L, 1L, 1L, md5Of("delta body four"))))

    // global invariant: every distinct normalized paragraph hash is
    // kept exactly once corpus-wide
    val totalKept = out.map(_.getLong(2)).sum
    val distinctParas = corpus
      .select(explode(split(col("text"), "\n\n")).as("p"))
      .select(lower(trim(col("p"))).as("np")).distinct().count()
    assert(totalKept === distinctParas)
  }
}
