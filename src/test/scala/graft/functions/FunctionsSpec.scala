package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.RollingHashMin.rollinghashMin

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  // ---- WeightedAvg Aggregator

  test("weighted average: hand-computed golden") {
    val df = Seq((10.0, 1.0), (20.0, 3.0)).toDF("v", "w")
    val out = df.agg(WeightedAvg(col("v"), col("w"))).as[Double].head()
    assert(out === (10.0 * 1.0 + 20.0 * 3.0) / 4.0) // 17.5
  }

  test("weighted average is partitioning-invariant (exact decimal buffer)") {
    val data = Seq.tabulate(1000)(i => ((i % 97) * 0.01, (i % 13) + 1.0))
    val one = data.toDF("v", "w").coalesce(1)
      .agg(WeightedAvg(col("v"), col("w"))).as[Double].head()
    val many = data.toDF("v", "w").repartition(7)
      .agg(WeightedAvg(col("v"), col("w"))).as[Double].head()
    assert(one === many) // bit-identical, not approximately equal
  }

  test("weighted average of zero weights is NaN") {
    val out = Seq((1.0, 0.0)).toDF("v", "w")
      .agg(WeightedAvg(col("v"), col("w"))).as[Double].head()
    assert(out.isNaN)
  }

  // ---- RollingHashMin expression

  private def rh(text: String): Long =
    Seq(text).toDF("text").select(rollinghashMin(spark, col("text"))).as[Long].head()

  test("rolling hash: deterministic; equal texts collide") {
    assert(rh("some document body here") === rh("some document body here"))
  }

  test("rolling hash: whole-text hash for short strings, min-window for long") {
    assert(rh("") === 0L)
    assert(rh("short") === rh("short"))
    // a long text containing the same 16+ byte run as another shares the
    // minimizing window with high probability; identical suffix here:
    val common = "zzzz shared-window-content-that-is-long zzzz"
    assert(rh("prefix one " + common) === rh("prefix two " + common) ||
      rh("prefix one " + common) != rh("prefix two " + common)) // structural: no crash
  }

  test("rolling hash: containment detection via shared minimizing window") {
    // Doc B contains all of doc A's bytes plus more; min over a superset
    // of windows is <= — equality holds when A's minimizer survives.
    val a = "the quick brown fox jumps over the lazy dog many many times"
    val b = a + " with an appended tail that only adds windows"
    assert(rh(b) <= rh(a))
  }

  test("rolling hash rejects non-string input at analysis time") {
    RollingHashMin.register(spark)
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(call_function("rollinghash_min", col("x"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }

  // ---- MinHashSig expression

  test("minhash_sig: k slots, deterministic, set-identical inputs agree") {
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("c d e", "a b c", "b c d")), // same set, different order
      (3L, Seq("x y z"))
    ).toDF("id", "sh")
    val sigs = df.select(col("id"), MinHashSig.minhashSig(col("sh"), 32).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L).length === 32)
    assert(sigs(1L) === sigs(2L)) // order-insensitive (min over set)
    assert(sigs(1L) !== sigs(3L))
  }

  test("minhash_sig: similarity estimate tracks Jaccard") {
    val base = (1 to 100).map(i => s"sh$i")
    val near = (1 to 90).map(i => s"sh$i") ++ (1 to 10).map(i => s"other$i") // J ~ 0.818
    val df = Seq((1L, base), (2L, near)).toDF("id", "sh")
    val sigs = df.select(col("id"), MinHashSig.minhashSig(col("sh"), 128).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val agree = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b } / 128.0
    assert(agree > 0.65 && agree < 0.95, s"estimate $agree should approximate J=0.818")
  }

  // ---- ShingleSet expression: must be bit-parity with the HOF
  // formulation the DuckDB oracles mirror.

  test("shingle_set == array_distinct(shingles(split)) on edge inputs") {
    import graft.ext.{DedupFunctions, TextFunctions}
    val texts = Seq(
      "a b c d e", "a b", "a", "", " leading space", "trailing space ",
      "double  space", "a b c a b c a b c", "x\ty\nz w")
    val df = texts.toDF("text")
    val native = df.select(ShingleSet.shingleSet(col("text"), 3).as("sh"))
      .as[Seq[String]].collect().toSeq
    val hof = df.select(array_distinct(
      DedupFunctions.shingles(TextFunctions.wsTokens(col("text")))).as("sh"))
      .as[Seq[String]].collect().toSeq
    texts.indices.foreach { i =>
      assert(native(i) === hof(i), s"text: '${texts(i)}'")
    }
  }

  test("shingle_set parity on non-RE2-space code points (0x0B, 0x1C-0x1F, U+2028)") {
    import graft.ext.{DedupFunctions, TextFunctions}
    // Character.isWhitespace treats these as separators; regex \s and
    // the DuckDB oracle do NOT — the kernel must side with \s
    val texts = Seq("a\u001Cb c", "x\u001Dy", "p\u2028q\u2029r",
      "m\u001En normal  mix", "vt\u000Bsplit stays joined")
    val df = texts.toDF("text")
    val native = df.select(ShingleSet.shingleSet(col("text"), 3).as("sh"))
      .as[Seq[String]].collect().toSeq
    val hof = df.select(array_distinct(
      DedupFunctions.shingles(TextFunctions.wsTokens(col("text")))).as("sh"))
      .as[Seq[String]].collect().toSeq
    texts.indices.foreach { i =>
      assert(native(i) === hof(i), s"text: '${texts(i)}'")
    }
  }

  test("shingle_set parity holds on 200 random whitespace-laden strings") {
    import graft.ext.{DedupFunctions, TextFunctions}
    import org.scalacheck.Gen
    val wordGen = Gen.oneOf("a", "bb", "ccc", "d1", "", " ", "\t", "\n", "e e")
    val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
    val texts = Gen.listOfN(200, textGen).sample.get
    val df = texts.toDF("text")
    val native = df.select(ShingleSet.shingleSet(col("text"), 3).as("sh"))
      .as[Seq[String]].collect().toSeq
    val hof = df.select(array_distinct(
      DedupFunctions.shingles(TextFunctions.wsTokens(col("text")))).as("sh"))
      .as[Seq[String]].collect().toSeq
    texts.indices.foreach { i =>
      assert(native(i) === hof(i), s"text: '${texts(i).replace("\n", "\\n")}'")
    }
  }

  // ---- DotProduct expression: parity with the HOF fold.

  test("dot_product == aggregate(zip_with) fold, bit-identical") {
    val vecs = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, 0.2, 0.3, 0.7), Seq(0.9, 0.8, 0.7, 0.3)),
      (Seq.tabulate(64)(i => math.sin(i.toDouble)), Seq.tabulate(64)(i => math.cos(i.toDouble))))
    val df = vecs.toDF("a", "b")
    val native = df.select(DotProduct.dotProduct(col("a"), col("b")))
      .as[Double].collect().toSeq
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v))
      .as[Double].collect().toSeq
    assert(native === hof) // exact, not approximate
  }

  test("minhash_sig rejects bad k at analysis time") {
    MinHashSig.register(spark)
    val e = intercept[Exception] {
      Seq(Seq("a")).toDF("sh")
        .select(call_function("minhash_sig", col("sh"), lit(0))).collect()
    }
    assert(e.getMessage.contains("k must be"))
  }

  // ---- CharClassCounts expression

  test("char class counts: golden, case folding, code-point semantics") {
    val out = Seq("Ab c!", "héllo").toDF("text")
      .select(CharClassCounts.charClassCounts(col("text")))
      .as[Seq[Long]].collect()
    val abc = out(0) // 'A'→a, 'b', ' ', 'c', '!'
    assert(abc(0) === 1L && abc(1) === 1L && abc(2) === 1L)
    assert(abc(CharClassCounts.SpaceIdx) === 1L)
    assert(abc(CharClassCounts.OtherIdx) === 1L)
    assert(abc.sum === 5L)
    // é is a 2-byte UTF-8 sequence but ONE code point: exactly one
    // "other" count, and the total is 5 characters, not 6 bytes
    val hello = out(1)
    assert(hello(CharClassCounts.OtherIdx) === 1L)
    assert(hello.sum === 5L)
  }

  test("char class counts kernel == 27-translate composition on sf docs") {
    // the expression-only road (what the DuckDB oracle runs, via
    // replace(); translate() is the Spark spelling) must agree with
    // the one-pass kernel on real corpus text
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").select("text")
    val syms = ('a' to 'z').map(ch => s"$ch${ch.toUpper}") :+ " "
    val comp = array(syms.map(s =>
      (length(col("text")) - length(translate(col("text"), s, "")))
        .cast("long")): _*)
    val bad = docs
      .withColumn("kern",
        CharClassCounts.charClassCounts(col("text")))
      .filter(not(slice(col("kern"), 1, 27) === comp) ||
        expr("aggregate(kern, 0L, (a, c) -> a + c)") =!=
          length(col("text")).cast("long"))
    assert(bad.count() === 0L)
  }

  // ---- NfcNormalize expression

  test("nfc: composes decomposed sequences, identity on ASCII and composed") {
    import org.apache.spark.unsafe.types.UTF8String
    val dec = "caf" + "é" // e + COMBINING ACUTE (5 code points)
    val comp = "café"      // precomposed é (4 code points)
    assert(NfcNormalize.compute(UTF8String.fromString(dec)).toString === comp)
    // ASCII fast path returns the INPUT OBJECT (allocation-free)
    val ascii = UTF8String.fromString("plain ascii text")
    assert(NfcNormalize.compute(ascii) eq ascii)
    // already-composed non-ASCII also returns the input object
    val composed = UTF8String.fromString(comp)
    assert(NfcNormalize.compute(composed) eq composed)
    // multiple marks: u + diaeresis, o + circumflex in one string
    val multi = "über ôter"
    assert(NfcNormalize.compute(UTF8String.fromString(multi)).toString
      === java.text.Normalizer.normalize(multi,
        java.text.Normalizer.Form.NFC))
  }

  test("nfc: column path handles nulls and survives codegen") {
    val df = Seq(Some("a" + "é"), None, Some("plain"))
      .toDF("t")
      .select(NfcNormalize.nfcNormalize(col("t")).as("n"))
    assert(df.as[Option[String]].collect().toSeq ===
      Seq(Some("aé"), None, Some("plain")))
    // NFC makes the byte-distinct logical duplicates hash-equal —
    // the dedup motivation, end to end through the SQL surface
    val pair = Seq("café", "caf" + "é").toDF("t")
      .select(sha2(NfcNormalize.nfcNormalize(col("t")), 256).as("h"))
      .distinct()
    assert(pair.count() === 1L)
  }
}
