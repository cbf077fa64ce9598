package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._
  import TextFunctions._

  private def one[T](text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): T =
    Seq(text).toDF("text").select(c(col("text"))).collect()(0).get(0).asInstanceOf[T]

  test("bpeish token count: letter runs, digit runs, single punct") {
    // "hello world42!" -> [hello, world, 42, !]  => wait: "world42" splits
    assert(one[Long]("hello world42!", bpeishCount) === 4L)
    assert(one[Long]("a,b", bpeishCount) === 3L)
  }

  test("punct ratio counts non-alphanumeric non-space chars") {
    assert(one[Double]("ab,.", punctRatio) === 0.5)
    assert(one[Double]("abcd", punctRatio) === 0.0)
  }

  test("stopword ratio over whitespace tokens") {
    val r = Seq("the fox and the dog").toDF("text")
      .select(stopwordRatio(wsTokens(col("text")))).as[Double].head()
    assert(r === 3.0 / 5.0) // the, and, the
  }

  test("langId: stopword profiles pick the right language") {
    val cases = Seq(
      "the cat is on the mat and the dog" -> "en",
      "el perro y la casa de los gatos se fue" -> "es",
      "le chat et les chiens est un une des" -> "fr",
      "der hund und die katze ist von den mit ein" -> "de",
      "这是中文文本" -> "zh")
    cases.foreach { case (text, expected) =>
      val got = Seq(text).toDF("text")
        .select(langId(col("text"), wsTokens(col("text")))).as[String].head()
      assert(got === expected, s"text: $text")
    }
  }

  test("quality score is bounded and monotone in reasonable signals") {
    val hi = Seq("the quick brown fox jumps over the lazy dog and runs to the hills " * 8)
      .toDF("text")
      .select(qualityScore(col("text"), wsTokens(col("text")))).as[Double].head()
    val lo = Seq("!!! ??? *** ### $$$ %%%")
      .toDF("text")
      .select(qualityScore(col("text"), wsTokens(col("text")))).as[Double].head()
    assert(hi > 0.8 && hi <= 1.0 + 1e-9)
    assert(lo < 0.5)
  }
}
