package graft.ext

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}

/** Byte-pair-encoding vocabulary training as a RELATIONAL fixed point:
  * K greedy merge rounds over the corpus, each round expressed
  * entirely in window functions — no per-row fold, no UDF — so the
  * DuckDB oracle replays the identical recurrence as unrolled CTEs
  * and the merge table hash-matches cross-engine.
  *
  * Trains on the (word, count) VOCABULARY, the way production BPE
  * trainers do: a pair's corpus frequency is the wcnt-weighted sum of
  * its in-word occurrences, so the merge table is PROVABLY identical
  * to training on the raw token stream (BpeSpec pins this against an
  * imperative raw-stream reference) while the iterated data shrinks
  * from corpus-size to vocabulary-size — by Heaps' law sublinear in
  * corpus size, which is what makes 100 TB BPE training cheap: one
  * corpus-wide word count shuffle up front, then rounds over a frame
  * that fits anywhere.
  *
  * The interesting part is the greedy left-to-right merge APPLICATION
  * without sequential string processing:
  *   1. `hit` marks positions starting a pair occurrence
  *      (sym=a AND lead(sym)=b within the word).
  *   2. Adjacent (chained) hits can only occur when a = b (a run of
  *      the same symbol): greedy consumes every OTHER hit of a
  *      consecutive-hit run. Runs are grouped gaps-and-islands style
  *      (pos - row_number over hits), and a hit is `active` iff its
  *      offset in the run is even — exactly BPE's left-to-right
  *      non-overlapping semantics, derived relationally.
  *   3. Active positions emit the merged symbol; their successors
  *      drop (lag(active)); positions renumber for the next round.
  *
  * Scale shape: the word-count aggregation is the only corpus-sized
  * pass; rounds are windowed over the word key (uniform, fine
  * grained). Rounds are sequential BY DEFINITION (merge r+1 counts
  * pairs created by merge r); per-round streams persist with
  * swap-release bounding (one live generation set across
  * invocations). The argmax pair is a 1-row broadcast (sketch-class
  * driver state, same family as the k-means centroids).
  */
object BpeQueries extends QueryModule {

  private val ROUNDS = 3

  /** Train-once cache: training is deterministic in the dataset dir,
    * and BOTH q_bpe_train and q_bpe_encode need it — without the memo
    * each Verify/bench session would run the multi-round window
    * pipeline (the dominant cost) twice per dir. One live dir at a
    * time: switching dirs swap-releases the previous dir's persisted
    * round streams (the Dedup.lastSigs bounding invariant). */
  private val lastTrained = new AtomicReference[
    (String, Seq[DataFrame], (Seq[DataFrame], DataFrame))]()
  graft.ops.BuildOnce.registerClearHook { () =>
    Option(lastTrained.getAndSet(null)).foreach(_._2.foreach(_.unpersist()))
  }

  /** Run (or reuse) the ROUNDS-round training loop: returns (per-round
    * merge frames, final symbol stream). The final stream is the
    * trained tokenizer APPLIED to the vocabulary — each word's
    * remaining positions are its BPE tokens. */
  private def trained(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[DataFrame], DataFrame) = {
    val cached = lastTrained.get()
    if (cached != null && cached._1 == dir) return cached._3
    val wWord = Window.partitionBy("word").orderBy("pos")

    // NOT widened, deliberately (r10): the word-count pass feeds a
    // vocabulary-bounded (Heaps-law) round stream whose windowed
    // rounds are small by design — a measured A/B showed both the
    // widen and an explicit stream repartition REGRESSING the bench
    // (0.95 → 1.45 s at sf0.1): per-stage scheduling overhead on the
    // tiny per-round frames exceeds the serial work they replace.
    val vocab = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
    val s0 = vocab
      .select(col("word"), col("wcnt"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("wcnt"), col("pos"),
        expr("substring(word, pos, 1)").as("sym"))

    var stream = s0.persist()
    val streams = Seq.newBuilder[DataFrame]
    streams += stream
    val merges = (1 to ROUNDS).map { it =>
      val merge = stream
        .withColumn("ra", lead(col("sym"), 1).over(wWord))
        .filter(col("ra").isNotNull)
        .groupBy(col("sym").as("la"), col("ra"))
        .agg(sum(col("wcnt")).as("cnt"))
        .orderBy(col("cnt").desc, col("la"), col("ra"))
        .limit(1)
      val hits = stream.crossJoin(broadcast(merge))
        .withColumn("hit", col("sym") === col("la") &&
          lead(col("sym"), 1).over(wWord) === col("ra"))
      val runs = hits.withColumn("grp", col("pos") - row_number().over(
        Window.partitionBy(col("word"), col("hit")).orderBy("pos")))
      val act = runs.withColumn("active", when(col("hit"),
        (col("pos") - min(col("pos")).over(
          Window.partitionBy(col("word"), col("grp"), col("hit")))) % 2
          === 0)
        .otherwise(lit(false)))
      stream = act
        .withColumn("dropd",
          coalesce(lag(col("active"), 1).over(wWord), lit(false)))
        .filter(!col("dropd"))
        .select(col("word"), col("wcnt"),
          row_number().over(wWord).as("pos"),
          when(col("active"), concat(col("la"), col("ra")))
            .otherwise(col("sym")).as("sym"))
        .persist()
      streams += stream
      merge.select(lit(it).as("it"), col("la").as("left_sym"),
        col("ra").as("right_sym"),
        concat(col("la"), col("ra")).as("merged"),
        col("cnt").as("pair_count"))
    }
    val result = (merges, stream)
    Option(lastTrained.getAndSet((dir, streams.result(), result)))
      .foreach(_._2.foreach(_.unpersist()))
    result
  }

  override def defs: Seq[(String, QueryDef)] = Seq(
    "q_bpe_train" -> QueryDef(
      fn = (spark, dir) =>
        trained(spark, dir)._1.reduce(_.unionByName(_)).orderBy("it"),
      oracle = Some(bpeOracle(ROUNDS)),
      bench = true),

    // ---- Tokenizer APPLICATION: encode the corpus with the trained
    // merge table. The vocabulary trick carries over — each distinct
    // word is encoded ONCE (the final training stream IS the encoded
    // vocabulary; its per-word position count is the word's BPE token
    // count), then a vocab-sized code-length table joins back onto the
    // corpus word stream. At 100 TB the encode table is Heaps-law
    // small and broadcast-joins onto the corpus — tokenizing is one
    // narrow pass, not a per-document string fold.
    "q_bpe_encode" -> QueryDef(
      fn = (spark, dir) => {
        val wlen = trained(spark, dir)._2
          .groupBy("word").agg(count(lit(1)).as("wlen"))
        Tables(spark, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .filter(length(col("word")) > 0)
          .join(broadcast(wlen), "word")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"), sum(col("wlen")).as("n_bpe_tokens"))
          .orderBy("doc_id")
      },
      oracle = Some(bpeEncodeOracle(ROUNDS)))
  )

  /** The oracle is GENERATED from the same round template the Spark
    * side implements, so the two can't drift: round i's CTEs are the
    * literal SQL transcription of the window pipeline above. */
  private def bpeOracle(rounds: Int): String = {
    val outs = (0 until rounds).map { i =>
      s"o$i AS (SELECT ${i + 1} AS it, la AS left_sym, ra AS right_sym," +
        s" la || ra AS merged, cnt AS pair_count FROM m$i)"
    }
    bpeBase(rounds) + "," + outs.mkString(",") +
      "\nSELECT * FROM (" +
      (0 until rounds).map(i => s"SELECT * FROM o$i").mkString(" UNION ALL ") +
      ") ORDER BY it"
  }

  /** Encode oracle: the shared round chain to `s<rounds>` (the encoded
    * vocabulary), then per-word code lengths joined back onto the
    * corpus word stream — the literal SQL twin of q_bpe_encode. */
  private def bpeEncodeOracle(rounds: Int): String =
    bpeBase(rounds) + s""",
      |enc AS (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS wlen FROM s$rounds
      |  GROUP BY word),
      |docw AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |  FROM documents)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
      |  CAST(SUM(wlen) AS BIGINT) AS n_bpe_tokens
      |FROM docw JOIN enc USING (word)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Base + the `rounds` unrolled round CTEs (`s0` .. `s<rounds>`). */
  private def bpeBase(rounds: Int): String = {
    val base = """
      |WITH raw AS (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      |vocab AS (
      |  SELECT word, COUNT(*) AS wcnt FROM raw WHERE length(word) > 0
      |  GROUP BY word),
      |s0 AS (
      |  SELECT word, wcnt, p.pos, substr(word, CAST(p.pos AS INTEGER), 1) AS sym
      |  FROM vocab,
      |       LATERAL (SELECT unnest(range(1, length(word)+1)) AS pos) p)""".stripMargin
    def round(i: Int): String = s"""
      |p$i AS (
      |  SELECT sym AS la, LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS ra,
      |         wcnt
      |  FROM s$i),
      |m$i AS (
      |  SELECT la, ra, CAST(SUM(wcnt) AS BIGINT) AS cnt FROM p$i
      |  WHERE ra IS NOT NULL
      |  GROUP BY la, ra ORDER BY cnt DESC, la, ra LIMIT 1),
      |x$i AS (
      |  SELECT t.word, t.wcnt, t.pos, t.sym, m.la, m.ra, m.cnt,
      |    (t.sym = m.la AND LEAD(t.sym) OVER (PARTITION BY t.word ORDER BY t.pos) = m.ra) AS hit
      |  FROM s$i t CROSS JOIN m$i m),
      |r$i AS (
      |  SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY word, hit ORDER BY pos) AS grp
      |  FROM x$i),
      |a$i AS (
      |  SELECT *, CASE WHEN hit
      |    THEN (pos - MIN(pos) OVER (PARTITION BY word, grp, hit)) % 2 = 0
      |    ELSE FALSE END AS active
      |  FROM r$i),
      |k$i AS (
      |  SELECT *, COALESCE(LAG(active) OVER (PARTITION BY word ORDER BY pos), FALSE) AS dropd
      |  FROM a$i),
      |s${i + 1} AS (
      |  SELECT word, wcnt,
      |    ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos,
      |    CASE WHEN active THEN la || ra ELSE sym END AS sym
      |  FROM k$i WHERE NOT dropd)""".stripMargin
    base + (0 until rounds).map("," + round(_)).mkString
  }
}
