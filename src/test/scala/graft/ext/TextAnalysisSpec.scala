package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._
  import TextFunctions._

  private def one[T](text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): T =
    Seq(text).toDF("text").select(c(col("text"))).collect()(0).get(0).asInstanceOf[T]

  test("repetition filter: planted looping doc flagged, healthy corpus mostly not") {
    val res = graft.SparkEntry.queries("q_repetition_filter")(
      spark, "/root/testdata/sf0.001")
      .select("doc_id", "rep_frac", "repetitive")
      .as[(Long, Double, Long)].collect()
    val planted = res.find(_._1 === 9999999L).get
    assert(planted._3 === 1L && planted._2 > 0.9, planted)
    // the synthetic corpus is drawn from a small vocabulary, so some
    // organic repetition exists — but the filter must not flag the
    // majority of ordinary docs
    val flagged = res.count(_._3 == 1L)
    assert(flagged < res.length / 2, s"$flagged of ${res.length} flagged")
  }

  test("curation quality rules plan as narrow scans (no join, no aggregate)") {
    for (q <- Seq("q_repetition_filter", "q_pii_scrub")) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString()
      // per-doc rules must never co-group or join documents — the only
      // exchange in the plan is the output ordering's range partition
      assert(!plan.contains("Join"), s"$q:\n$plan")
      assert(!plan.contains("Aggregate"), s"$q:\n$plan")
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges <= 2, s"$q: $exchanges exchanges\n$plan")
    }
  }

  test("PII scrub: planted email and digit runs redacted, counts audited") {
    val res = graft.SparkEntry.queries("q_pii_scrub")(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") >= 9999991L)
      .select("doc_id", "scrubbed", "n_emails", "n_numbers")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(res(0) === ((9999991L,
      "contact <EMAIL> or call <NUMBER> today", 1L, 1L)))
    assert(res(1) === ((9999992L,
      "ticket 1234 is fine but card <NUMBER> is not", 0L, 1L)))
  }

  test("adjacentPairs: shifted-slice zip yields ordered pairs; short docs empty") {
    def pairsOf(toks: Seq[String]): Seq[String] =
      Seq(toks).toDF("t")
        .select(adjacentPairs(col("t")).as("p"))
        .as[Seq[String]].head()
    assert(pairsOf(Seq("a", "b", "c")) === Seq("a b", "b c"))
    assert(pairsOf(Seq("a", "a", "a")) === Seq("a a", "a a")) // multiset, not set
    assert(pairsOf(Seq("solo")) === Seq.empty)
    assert(pairsOf(Seq.empty) === Seq.empty)
  }

  test("tokenizer pairs: top-20 corpus pair counts, deterministic tie-break") {
    val res = graft.SparkEntry.queries("q_tokenizer_pairs")(
      spark, "/root/testdata/sf0.001")
      .as[(String, Long)].collect()
    assert(res.length === 20)
    // descending count, pair text breaking ties ascending
    res.sliding(2).foreach { case Array((pa, ca), (pb, cb)) =>
      assert(ca > cb || (ca == cb && pa < pb), s"($pa,$ca) before ($pb,$cb)")
    }
    assert(res.forall(_._2 >= 1))
  }

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

  test("chunkDocs covers every token with the configured overlap") {
    def doc(n: Int) = Seq((1L, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    def chunks(n: Int, window: Int, stride: Int) =
      TextFunctions.chunkDocs(doc(n), window, stride)
        .orderBy("chunk_idx")
        .select("chunk_text", "n_chunk_tokens")
        .as[(String, Long)].collect().toSeq

    // shorter than one window -> exactly one partial chunk
    assert(chunks(7, 50, 40) === Seq(((1 to 7).map(i => s"t$i").mkString(" "), 7L)))
    // exactly one window -> one full chunk
    assert(chunks(50, 50, 40).map(_._2) === Seq(50L))
    // 90 tokens, window 50 stride 40: chunks at 0 and 40 (last is full)
    assert(chunks(90, 50, 40).map(_._2) === Seq(50L, 50L))
    // 91 tokens: a third chunk catches the tail beyond 80
    val c91 = chunks(91, 50, 40)
    assert(c91.map(_._2) === Seq(50L, 50L, 11L))
    // overlap: chunk 1 starts at token 41 (stride 40), not 51
    assert(c91(1)._1.startsWith("t41 "))
    // every token appears in at least one chunk
    val covered = c91.flatMap(_._1.split(" ")).toSet
    assert(covered === (1 to 91).map(i => s"t$i").toSet)
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

  /** BM25 ratio-idf form vs Robertson's log form: per-term document
    * ordering is provably identical (idf is a constant within a
    * term — any positive constant gives the same tfnorm ordering);
    * multi-term rankings can diverge because the SUM weights rare
    * terms more in ratio form. Both claims measured here. */
  test("bm25: single-term ranking identical under ratio idf and log idf") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"),
        filter(wsTokens(col("text")), t => t =!= "").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
      .withColumn("tf",
        size(filter(col("toks"), x => x === lit("dup"))).cast("long"))
      .drop("toks")
    val stats = docs.agg(count(lit(1)).as("n"), sum("dl").as("t"),
      sum(when(col("tf") > 0, 1L).otherwise(0L)).as("df"))
    val scored = docs.crossJoin(broadcast(stats))
      .withColumn("tfnorm", (col("tf") * col("t") * 22).cast("double") /
        (col("tf") * col("t") * 10 + col("t") * 3 + col("dl") * col("n") * 9)
          .cast("double"))
      .withColumn("idf_ratio",
        (col("n") * 2 - col("df") * 2 + 1).cast("double") /
          (col("df") * 2 + 1).cast("double"))
      .withColumn("s_ratio", col("idf_ratio") * col("tfnorm"))
      .withColumn("s_log", log(col("idf_ratio")) * col("tfnorm"))
      .filter(col("tf") > 0)
    def top(c: String) = scored
      .orderBy(col(c).desc, col("doc_id")).limit(10)
      .select("doc_id").as[Long].collect().toSeq
    assert(top("s_ratio") === top("s_log"))
  }

  test("bm25: multi-term top-10 substantially agrees with log-idf BM25") {
    val sf = "/root/testdata/sf0.001"
    val terms = TextQueries.bm25Terms
    val base0 = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"),
        filter(wsTokens(col("text")), t => t =!= "").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val base = terms.zipWithIndex.foldLeft(base0) { case (d, (t, i)) =>
      d.withColumn(s"tf$i",
        size(filter(col("toks"), x => x === lit(t))).cast("long"))
    }.drop("toks")
    val stats = base.agg(count(lit(1)).as("n"), sum("dl").as("t") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*)
    def score(i: Int, logIdf: Boolean) = {
      val ratio = (col("n") * 2 - col(s"df$i") * 2 + 1).cast("double") /
        (col(s"df$i") * 2 + 1).cast("double")
      val idf = if (logIdf) log(ratio) else ratio
      idf * ((col(s"tf$i") * col("t") * 22).cast("double") /
        (col(s"tf$i") * col("t") * 10 + col("t") * 3 + col("dl") * col("n") * 9)
          .cast("double"))
    }
    val scored = base.crossJoin(broadcast(stats))
      .withColumn("s_ratio", terms.indices.map(score(_, logIdf = false)).reduceLeft(_ + _))
      .withColumn("s_log", terms.indices.map(score(_, logIdf = true)).reduceLeft(_ + _))
      .filter(col("s_ratio") > 0)
    def top(c: String) = scored
      .orderBy(col(c).desc, col("doc_id")).limit(10)
      .select("doc_id").as[Long].collect().toSet
    val overlap = top("s_ratio").intersect(top("s_log")).size
    info(s"ratio-idf vs log-idf top-10 overlap: $overlap/10")
    assert(overlap >= 6, s"overlap $overlap")
  }

  test("quality classifier scores replay bit-for-bit in plain Scala") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_quality_classifier")(spark, sf)
      .select("doc_id", "score", "kept")
      .as[(Long, Long, Long)].collect().toSeq

    // independent single-threaded replication of the hashed linear
    // model: JDK MessageDigest md5, same 3-hex-digit bucket, same
    // multiplicative weight — scores are exact integers so equality
    // is bitwise, no tolerance
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(tok: String): Long = {
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 3)
      java.lang.Long.parseLong(hex, 16) * 2654435761L % 1000003L - 501501L
    }
    val want = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .map { case (id, text) =>
        val score = text.split("[ \t\n\f\r]+").filter(_.nonEmpty)
          .map(weight).sum
        (id, score, if (score > 0) 1L else 0L)
      }
      .sortBy(_._1)
    assert(got === want)
  }

  test("q_lm_surprisal replays bit-for-bit from an imperative bigram LM") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_lm_surprisal")(spark, sf)
      .select("doc_id", "n_bigrams", "sum_bits", "avg_centibits")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    // single-threaded reference: whitespace bigrams, corpus LM counts,
    // surprisal = bitlen(head_total) − bitlen(cnt); all-integer, so
    // equality is exact (the double mul/div in avg_centibits is the
    // one shared rounding, replayed identically here)
    def toks(t: String) = t.split("[ \t\n\f\r]+").filter(_.nonEmpty)
    def bitlen(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val bigrams = docs.flatMap { case (id, t) =>
      val a = toks(t)
      if (a.length < 2) Array.empty[(Long, (String, String))]
      else a.zip(a.tail).map(p => (id, p))
    }
    val cnt = bigrams.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val headTot = cnt.toSeq.groupBy(_._1._1)
      .map { case (h, m) => h -> m.map(_._2).sum }
    val want = bigrams.groupBy(_._1).map { case (id, xs) =>
      val s = xs.map { case (_, p) =>
        (bitlen(headTot(p._1)) - bitlen(cnt(p))).toLong }.sum
      val n = xs.length.toLong
      id -> (n, s, math.floor(s * 100.0 / n + 0.5).toLong)
    }
    assert(got.keySet === want.keySet)
    want.foreach { case (id, v) => assert(got(id) === v, s"doc $id") }
    // non-degenerate: the filter separates docs (rare continuations
    // score high, formulaic text low)
    val avgs = want.values.map(_._3).toSeq
    assert(avgs.max > avgs.min, "surprisal is constant across docs")
    info(s"avg_centibits span: ${avgs.min}..${avgs.max}")
  }

  test("q_feature_hashing replays bit-for-bit in plain Scala") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_feature_hashing")(spark, sf)
      .select("doc_id", "bucket", "n_tokens", "feat")
      .as[(Long, Long, Long, Long)].collect().toSeq

    // independent replication: JDK md5, bucket = first-3-hex-digits
    // mod 64, sign = 4th hex digit parity
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash4(tok: String): (Long, Long) = {
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      val hv = java.lang.Long.parseLong(hex.substring(0, 3), 16)
      val sp = java.lang.Long.parseLong(hex.substring(3, 4), 16) % 2
      (hv % 64, if (sp == 0) 1L else -1L)
    }
    val want = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .flatMap { case (id, text) =>
        text.split("[ \t\n\f\r]+").filter(_.nonEmpty)
          .map(hash4).map { case (b, s) => ((id, b), s) }
      }
      .groupBy(_._1).toSeq
      .map { case ((id, b), xs) =>
        (id, b, xs.length.toLong, xs.map(_._2).sum) }
      .sortBy(t => (t._1, t._2))
    assert(got === want)
    // signed hashing actually cancels somewhere (collisions of
    // opposite sign exist) — otherwise feat === n_tokens everywhere
    // and the sign bit is dead code
    assert(got.exists(r => r._4.abs != r._3), "no signed cancellation")
  }

  test("q_roc_auc matches an imperative midrank rank-sum AUC") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_roc_auc")(spark, sf)
      .select("n_pos", "n_neg", "auc_bp", "auc")
      .as[(Long, Long, Long, Double)].collect()(0)

    // labels exactly as the query derives them: heuristic quality
    // >= 0.5 (both published queries are oracle-hash-matched, so
    // composing them pins the same bits the query sees)
    val scores = graft.SparkEntry.queries("q_quality_classifier")(spark, sf)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    val labels = graft.SparkEntry.queries("q_text_quality")(spark, sf)
      .select("doc_id", "quality").as[(Long, Double)].collect()
      .map { case (id, q) => id -> (if (q >= 0.5) 1L else 0L) }.toMap

    // midrank rank-sum: sorted by score, a tie group occupying ranks
    // i+1..i+cnt contributes pos·(2i+cnt+1) to 2·R⁺
    val byScore = scores.toSeq.map { case (id, s) => (s, labels(id)) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, xs) => (xs.length.toLong, xs.map(_._2).sum) }
    var before = 0L
    var r2 = BigInt(0)
    byScore.foreach { case (cnt, pos) =>
      r2 += BigInt(pos) * (2 * before + cnt + 1)
      before += cnt
    }
    val nPos = BigInt(byScore.map(_._2).sum)
    val nNeg = BigInt(before) - nPos
    val num = (r2 - nPos * (nPos + 1)) * 10000
    val den = 2 * nPos * nNeg
    assert(got._1 === nPos.toLong)
    assert(got._2 === nNeg.toLong)
    assert(got._3 === (num / den).toLong)
    assert(got._4 === (r2 - nPos * (nPos + 1)).toDouble / den.toDouble)
    // non-degenerate: both classes present and the model is better
    // than coin-flip on this corpus (AUC strictly above 0.5 means the
    // rank-sum machinery isn't collapsing to the trivial value)
    assert(nPos > 0 && nNeg > 0, s"degenerate corpus: $nPos/$nNeg")
    info(s"auc_bp = ${got._3}")
  }
}
