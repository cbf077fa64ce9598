package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}

/** Deduplication operators for training-data pipelines.
  *
  * Scale design (100 TB posture):
  *  - exact/normalized dedup: hash-groupBy — one shuffle on the content
  *    hash, map-side partial aggregation, no data skew (hashes are
  *    uniform);
  *  - n-gram Jaccard: pair generation is blocked (language + length
  *    band) so the join is an equi-join on the block key, never a full
  *    cross product;
  *  - MinHash+LSH: signature computation is narrow; candidate
  *    generation is an equi-join on (band, bandHash) — the classic
  *    shuffle-bounded LSH shape. Only candidates pay the exact-verify
  *    cost.
  */
object DedupFunctions {

  /** Where hash-kernel outputs (minhash signatures, simhash
    * fingerprints) are exported so the DuckDB oracle — which has no
    * xxhash64 — can re-derive the candidate-join/verify stages from
    * the same kernel output (the kernels themselves are spec-covered).
    * The oracle runs next to the Spark driver, so a local path works.
    *
    * [[graft.Verify]] points this at a SIBLING of its output dir (the
    * property is read before any oracle SQL is constructed, so the
    * embedded read_parquet paths follow): exports are keyed to the
    * verify run that produced them — with a shared fixed path, a
    * Verify at one scale would silently overwrite the exports a
    * concurrent/later oracle check at another scale still needs — but
    * live OUTSIDE the output dir itself, which the driver's checker
    * enumerates as the query surface. */
  val oracleExportDir: String =
    sys.props.getOrElse("graft.oracle.exportDir",
      s"${System.getProperty("java.io.tmpdir")}/graft_oracle")

  /** Export only under the correctness harness ([[graft.Verify]] sets
    * the property) — the bench run measures query time, not oracle
    * bookkeeping. */
  def exportOracleFrames: Boolean =
    sys.props.get("graft.oracle.export").contains("true")

  /** Case/punctuation/whitespace normalization — THE canonical text
    * key for normalized dedup. One definition shared by the batch
    * query (`q_dedup_normalized`), the curation score
    * ([[graft.ext.PipelineOps.curationScore]]) and the streaming
    * ingest; the oracle SQL strings necessarily duplicate it
    * (`trim(regexp_replace(regexp_replace(lower(text),
    * '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))`) — keep them in sync. */
  def normText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Token 3-gram shingles over whitespace tokens. */
  def shingles(tokens: Column): Column =
    transform(
      sequence(lit(0), greatest(size(tokens) - 3, lit(0))),
      i => concat_ws(" ", slice(tokens, i + 1, lit(3))))

  /** Native one-pass tokenize+shingle+distinct ([[graft.functions.ShingleSet]]);
    * same result as `array_distinct(shingles(wsTokens(text)))` without
    * materializing the token array through interpreted HOFs. */
  def distinctShingles(text: Column): Column =
    graft.functions.ShingleSet.shingleSet(text, 3)

  /** Exact Jaccard similarity of two string sets (int ratio => exact
    * double on both engines). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b))

  /** MinHash signature: k permutations of a single xxhash64 per
    * shingle, via the native [[graft.functions.MinHashSig]] expression
    * (the nested-higher-order-function formulation re-hashed every
    * shingle k times, interpreted — 30x slower at sf0.1). */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    graft.functions.MinHashSig.minhashSig(shingleSet, k)

  /** LSH band hashes: split the signature into `bands` bands of
    * `rows` slots, hash each band. Equal band hash => candidate pair. */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => xxhash64(j, slice(sig, j * rows + 1, lit(rows))))

  /** Blocked candidate pairs for exact near-dup verification over a
    * docs frame of (doc_id, lang, n_chars, sh).
    *
    * The equi-join key is (lang, 60-char length bucket), NOT bare lang:
    * lang alone has cardinality ~5, so within one language the join is
    * all-pairs — a full quadratic shuffle on a 5-value skewed key at
    * 100 TB. With the length bucket in the key, per-key occupancy is
    * bounded by the docs in a 60-char band of one language.
    *
    * Side A explodes to its own ±1 buckets: any pair within 60 chars of
    * each other differs by at most one bucket, so exactly ONE of the
    * three exploded buckets equals B's bucket — each qualifying pair is
    * produced exactly once, no post-join dedup needed (the pair order
    * `id_a < id_b` is independent of which doc is longer, which is why
    * the one-sided own+next trick from the directional range join
    * doesn't apply here).
    */
  def bandedPairs(docs: DataFrame): DataFrame = {
    val bucket = floor(col("n_chars") / 60).cast("long")
    val a = docs.select(col("doc_id").as("id_a"), col("lang"),
      col("n_chars").as("nc_a"), col("sh").as("sh_a"),
      explode(array(bucket - 1, bucket, bucket + 1)).as("bkt"))
    val b = docs.select(col("doc_id").as("id_b"), col("lang"),
      col("n_chars").as("nc_b"), col("sh").as("sh_b"), bucket.as("bkt"))
    a.join(b, Seq("lang", "bkt"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("nc_a") - col("nc_b")) <= 60)
  }

  /** documents ∪ perturbed near-duplicate copies (planted, deterministic):
    * copy of every 5th doc with the first whitespace token dropped.
    * Gives the dedup operators true positives to find at any SF. */
  def withPlantedNearDups(docs: DataFrame): DataFrame = {
    // NOT widened, deliberately (r10): a measured A/B showed the
    // parallelism-floor repartition REGRESSING q_neardup_minhash
    // (0.58 → 0.77 s at sf0.1) — the corpus is referenced by BOTH
    // union branches, so the widen exchange + extra stages outweigh
    // the (already sub-second) serial minhash kernel at fixture
    // scale. At 100 TB the scan splits on its own.
    val perturbed = docs
      .filter(col("doc_id") % 5 === 0)
      .select(
        (col("doc_id") + 1000000).as("doc_id"),
        // explicit RE2-safe classes (Java \S/\s differ on 0x0B)
        regexp_replace(col("text"), "^[^ \\t\\n\\f\\r]+[ \\t\\n\\f\\r]+", "").as("text"),
        col("lang"), col("source"), col("n_chars"))
    docs.unionByName(perturbed)
  }

  private[ext] val lastSigs =
    graft.ops.BuildOnce.swapRef()

  /** q_ngram_novelty's per-doc shingle-set frame (swap-released,
    * bounded at one copy across invocations — the lastSigs pattern). */
  private[ext] val lastNoveltyGrams =
    graft.ops.BuildOnce.swapRef()

  /** q_passage_scrub's positioned-gram frame cache — bounded at one
    * copy across invocations (the lastSigs pattern). */
  private[ext] val lastGrams =
    graft.ops.BuildOnce.swapRef()

  /** Paragraph-grain dedup (CCNet granularity): drop every duplicate
    * OCCURRENCE of a paragraph across the whole corpus — keeping the
    * globally-first occurrence by (doc_id, position) — and rebuild
    * each document from its surviving paragraphs. This is the one
    * curation grain between doc-level near-dup and token-window
    * ExactSubstr: boilerplate paragraphs (headers, footers, licence
    * blocks) vanish corpus-wide while the documents that carried them
    * survive.
    *
    * Input: (doc_id, text) with paragraphs separated by blank lines.
    * Output: (doc_id, n_paras, n_kept, cleaned_md5) — counts plus the
    * md5 of the text rebuilt from kept paragraphs in original order
    * (the q_passage_scrub convention: hash-checkable without shipping
    * documents).
    *
    * Scale shape: ONE content-hash exchange picks each paragraph's
    * global first occurrence (min of the integer (doc_id·128 + pos)
    * encoding — pos < 128 is the paragraphs-per-doc bound the caller
    * guarantees; the encoding is what the DuckDB oracle replays
    * exactly), one equi-join back, one per-doc reassembly groupBy
    * whose collect_list is bounded by paragraphs-per-doc. No pair
    * joins anywhere; document text never shuffles except inside its
    * own doc_id group.
    */
  def paragraphDedup(corpus: DataFrame): DataFrame = {
    val paras = corpus.select(col("doc_id"),
      posexplode(split(col("text"), "\n\n")).as(Seq("pos", "p")))
    val hashed = paras
      .withColumn("h", md5(lower(trim(col("p"))).cast("binary")))
      .withColumn("ord", col("doc_id") * 128 + col("pos"))
    val win = hashed.groupBy("h").agg(min(col("ord")).as("w"))
    val kept = hashed.join(win, Seq("h")).filter(col("ord") === col("w"))
    val rebuilt = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws("\n\n",
          transform(array_sort(collect_list(struct(col("pos"), col("p")))),
            x => x("p"))).as("txt"))
    paras.groupBy("doc_id").agg(count(lit(1)).as("n_paras"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        md5(coalesce(col("txt"), lit("")).cast("binary")).as("cleaned_md5"))
  }

  /** DuckDB CTE mirroring [[withPlantedNearDups]]. */
  val plantedCte: String =
    """WITH docs AS (
      |  SELECT doc_id, text, lang, source, n_chars FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |         regexp_replace(text, '^[^ \t\n\f\r]+[ \t\n\f\r]+', '') AS text,
      |         lang, source, n_chars
      |  FROM documents WHERE doc_id % 5 = 0
      |)""".stripMargin
}

object DedupQueries extends QueryModule {
  import DedupFunctions._

  /** Oracle CTE chain replaying the MinHash pipeline from the exported
    * kernel frames — shingles from text, candidate banding, the Broder
    * signature-agreement pre-filter (`pref` is the surviving pair set).
    * Shared verbatim by `q_neardup_minhash` (which appends the exact
    * Jaccard verify as its result) and `q_dedup_agreement` (which
    * wraps the same verified pairs as one side of the audit) — the two
    * oracles can never drift apart. Expects the `docs` CTE
    * ([[DedupFunctions.plantedCte]]) in scope. */
  private def minhashOracleCtes: String = s"""tok AS (
    |  SELECT doc_id, string_split_regex(text, '\\s+') AS tokens
    |  FROM docs),
    |sh AS (
    |  SELECT doc_id,
    |    list_distinct(list_transform(
    |      generate_series(0, greatest(len(tokens) - 3, 0)),
    |      i -> array_to_string(tokens[i+1:i+3], ' '))) AS sh
    |  FROM tok),
    |sigs AS (
    |  SELECT * FROM read_parquet('$oracleExportDir/minhash_sigs/*.parquet')),
    |bands AS (
    |  SELECT * FROM read_parquet('$oracleExportDir/minhash_bands/*.parquet')),
    |cand AS (
    |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
    |  FROM bands x JOIN bands y
    |    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
    |   AND x.doc_id < y.doc_id),
    |pref AS (
    |  SELECT c.id_a, c.id_b FROM cand c
    |  JOIN sigs sa ON sa.doc_id = c.id_a
    |  JOIN sigs sb ON sb.doc_id = c.id_b
    |  WHERE list_sum(list_transform(generate_series(1, 64),
    |          i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 64.0
    |        >= 0.4)""".stripMargin

  override def defs: Seq[(String, QueryDef)] = Seq(

    // ---- Exact dedup: hash-groupBy on the full content. The input is
    // documents ∪ documents so there are real duplicates to collapse;
    // output is the retained (minimal doc_id) row per distinct text.
    "q_dedup_exact" -> QueryDef(
      fn = (spark, dir) => {
        val docs = Tables(spark, dir, "documents")
        docs.unionByName(docs)
          .groupBy(md5(col("text").cast("binary")).as("content_hash"))
          .agg(min(col("doc_id")).as("keeper_doc_id"),
            count(lit(1)).as("n_copies"))
          .orderBy("keeper_doc_id")
      },
      oracle = Some("""
        |SELECT md5(text) AS content_hash,
        |       MIN(doc_id) AS keeper_doc_id,
        |       COUNT(*) AS n_copies
        |FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
        |GROUP BY md5(text) ORDER BY keeper_doc_id""".stripMargin),
      bench = true),

    // ---- Normalized dedup: case/punctuation/whitespace-insensitive.
    "q_dedup_normalized" -> QueryDef(
      fn = (spark, dir) => {
        val docs = Tables(spark, dir, "documents")
        val norm = normText(col("text"))
        docs.unionByName(docs.select(col("doc_id") + 500000 as "doc_id",
            upper(col("text")).as("text"), col("lang"), col("source"), col("n_chars")))
          .groupBy(md5(norm.cast("binary")).as("content_hash"))
          .agg(min(col("doc_id")).as("keeper_doc_id"),
            count(lit(1)).as("n_copies"))
          .orderBy("keeper_doc_id")
      },
      oracle = Some("""
        |SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS content_hash,
        |       MIN(doc_id) AS keeper_doc_id,
        |       COUNT(*) AS n_copies
        |FROM (SELECT * FROM documents
        |      UNION ALL
        |      SELECT doc_id + 500000, upper(text), lang, source, n_chars FROM documents)
        |GROUP BY 1 ORDER BY keeper_doc_id""".stripMargin)),

    // ---- Cross-SOURCE duplication matrix: for every source pair,
    // how many distinct normalized contents they SHARE — the
    // curation tool that tells you which feeds mirror each other
    // before you pay to ingest both. Scale shape: one distinct pass
    // + one exchange on the content hash; the per-hash source set is
    // ≤|sources| (registry-bounded), so pair expansion is a bounded
    // flatMap — the corpus is never self-joined. The oracle replays
    // it AS the self-join (the quadratic formulation the engine
    // avoids), so the hash match doubles as the equivalence proof.
    "q_source_overlap" -> QueryDef(
      fn = (spark, dir) => {
        val raw = Tables(spark, dir, "documents")
        // the synthetic corpus has no natural cross-source dups — a
        // mirror feed (same texts, 'mirror_'-prefixed source) plants
        // them, so every (s, mirror_s) pair must surface with s's
        // full distinct-content count
        val docs = raw.unionByName(raw
          .withColumn("source", concat(lit("mirror_"), col("source")))
          .withColumn("doc_id", col("doc_id") + 1000000L))
        docs.select(md5(normText(col("text")).cast("binary")).as("ch"),
            col("source"))
          .distinct()
          .groupBy("ch")
          .agg(sort_array(collect_set(col("source"))).as("ss"))
          .select(explode(expr(
            "flatten(transform(ss, (a, i) -> " +
              "transform(slice(ss, i + 2, size(ss)), b -> struct(a, b))))"))
            .as("p"))
          .groupBy(col("p.a").as("src_a"), col("p.b").as("src_b"))
          .agg(count(lit(1)).as("n_shared"))
          .orderBy("src_a", "src_b")
      },
      oracle = Some("""
        |WITH corpus AS (
        |  SELECT source, text FROM documents
        |  UNION ALL
        |  SELECT 'mirror_' || source, text FROM documents),
        |k AS (
        |  SELECT DISTINCT
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS ch,
        |    source
        |  FROM corpus)
        |SELECT k1.source AS src_a, k2.source AS src_b,
        |       COUNT(*) AS n_shared
        |FROM k k1 JOIN k k2 ON k1.ch = k2.ch AND k1.source < k2.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- SOFT dedup (frequency-damped duplicate keeping): instead
    // of keep-one-drop-rest, keep isqrt(n) copies of an n-duplicated
    // document — the sqrt-damping used when duplication frequency
    // carries signal (a page mirrored 10k times is probably
    // boilerplate, but one repeated 4 times may be legitimately
    // popular; hard dedup erases that weight, raw keeping lets spam
    // dominate). Winners are the isqrt(n) smallest md5(doc_id)
    // tickets per normalized-content hash — content-keyed and
    // hash-ordered, so the draw is partitioning- and snapshot-stable.
    // floor(sqrt(n)) is exact for any realistic group size (IEEE
    // sqrt is correctly rounded; the first liar is beyond 2^52).
    // Scale shape: two same-spec window passes (count + row_number)
    // in ONE content-hash exchange, then a source rollup; the kept
    // SET rides the output as the bit_xor id checksum.
    "q_soft_dedup" -> QueryDef(
      fn = (spark, dir) => {
        val docs = Tables(spark, dir, "documents")
        def cp(c: Long, p: org.apache.spark.sql.Column) =
          docs.filter(p).select((col("doc_id") + c * 1000000L).as("doc_id"),
            col("text"), col("source"), col("n_chars"))
        val corpus = cp(0, lit(true))
          .unionByName(cp(1, lit(true)))
          .unionByName(cp(2, col("doc_id") % 2 === 0))
          .unionByName(cp(3, col("doc_id") % 4 === 0))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("ch"))
        val keyed = corpus.select(col("source"), col("n_chars"),
          col("doc_id"),
          md5(normText(col("text")).cast("binary")).as("ch"),
          md5(col("doc_id").cast("string")).as("tk"))
        val kept = col("rn") <= floor(sqrt(col("n")))
        keyed
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("rn", row_number().over(
            w.orderBy(col("tk"), col("doc_id"))))
          .groupBy("source")
          .agg(count(lit(1)).as("n_total"),
            count(when(kept, lit(1))).as("n_kept"),
            sum(when(kept, col("n_chars"))).cast("long").as("chars_kept"),
            expr("bit_xor(CASE WHEN rn <= CAST(floor(sqrt(n)) AS BIGINT)" +
              " THEN CAST(conv(substr(tk, 1, 15), 16, 10) AS BIGINT) END)")
              .as("ids_xor60"))
          .orderBy("source")
      },
      oracle = Some("""
        |WITH corpus AS (
        |  SELECT doc_id, text, source, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, source, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, text, source, n_chars FROM documents
        |  WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, text, source, n_chars FROM documents
        |  WHERE doc_id % 4 = 0),
        |keyed AS (
        |  SELECT source, n_chars, doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS ch,
        |    md5(CAST(doc_id AS VARCHAR)) AS tk
        |  FROM corpus),
        |w AS (
        |  SELECT source, n_chars, tk,
        |    ROW_NUMBER() OVER (PARTITION BY ch ORDER BY tk, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY ch) AS n
        |  FROM keyed)
        |SELECT source, COUNT(*) AS n_total,
        |  COUNT(*) FILTER (rn <= CAST(FLOOR(SQRT(n)) AS BIGINT)) AS n_kept,
        |  CAST(SUM(n_chars) FILTER (rn <= CAST(FLOOR(SQRT(n)) AS BIGINT))
        |    AS BIGINT) AS chars_kept,
        |  bit_xor(CASE WHEN rn <= CAST(FLOOR(SQRT(n)) AS BIGINT)
        |    THEN CAST('0x' || substr(tk, 1, 15) AS BIGINT) END) AS ids_xor60
        |FROM w GROUP BY source ORDER BY source""".stripMargin)),

    // ---- Cross-snapshot incremental dedup (batch): admit only the
    // incoming docs whose normalized content hash is absent from the
    // previous snapshot — the batch twin of
    // [[graft.streaming.IncrementalNearDup]]'s exact-hash admission.
    // The fixture splits `documents` into a previous snapshot (doc_id
    // ending 0-6) and an incoming one (ending 5-9, so 5-6 overlap),
    // plus case-mangled re-crawls of ending-0/1 docs that only the
    // NORMALIZED hash catches.
    //
    // Scale shape: one shuffle anti-join on uniform md5 keys. At 100 TB
    // the previous-snapshot ledger is (hash, doc_id) only — never the
    // text — and can be bucketed on the hash ([[graft.ops.Bucketing]])
    // so re-crawls join ledger partitions in place, shuffle-free.
    "q_snapshot_delta" -> QueryDef(
      fn = (spark, dir) => {
        val docs = Tables(spark, dir, "documents")
        val prev = docs.filter(col("doc_id") % 10 < 7)
        val incoming = docs.filter(col("doc_id") % 10 >= 5)
          .unionByName(docs.filter(col("doc_id") % 10 < 2)
            .select((col("doc_id") + 700000).as("doc_id"),
              upper(col("text")).as("text"),
              col("lang"), col("source"), col("n_chars")))
        val hash = md5(normText(col("text")).cast("binary"))
        val ledger = prev.select(hash.as("content_hash"))
        incoming.select(col("doc_id"), hash.as("content_hash"))
          .join(ledger, Seq("content_hash"), "left_anti")
          .orderBy("doc_id")
      },
      oracle = Some("""
        |WITH prev AS (
        |  SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS content_hash
        |  FROM documents WHERE doc_id % 10 < 7),
        |incoming AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 5
        |  UNION ALL
        |  SELECT doc_id + 700000, upper(text) FROM documents WHERE doc_id % 10 < 2)
        |SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS content_hash
        |FROM incoming
        |WHERE md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))
        |  NOT IN (SELECT content_hash FROM prev)
        |ORDER BY doc_id""".stripMargin)),

    // ---- Bloom-prefiltered snapshot dedup: same admission contract as
    // q_snapshot_delta (admit docs whose normalized hash is absent from
    // the previous snapshot), but the ledger is first collapsed into a
    // bloom sketch ([[graft.functions.BloomSketch]] — Spark's own
    // runtime-filter expressions) probed by a NARROW filter. Bloom
    // misses are definitely-new (no false negatives) and skip the join
    // entirely; only bloom-positives pay the exact anti-join confirm.
    //
    // Scale shape: the fixture's crawl has ~20% overlap with the
    // ledger, so ~80% of the incoming corpus never enters a shuffle —
    // the bloom turns the anti-join from corpus-sized to
    // overlap-sized. The sketch is one 128 KiB plan literal (size fixed
    // by nBits, NOT by ledger row count); building it is one partial
    // agg whose single binary row is sketch metadata on the driver,
    // same budget as the MisraGries/VectorIndex reads. Result is
    // IDENTICAL to the plain anti-join (no false negatives; false
    // positives removed by the exact confirm) — the oracle below is
    // the plain NOT IN, and BloomDeltaSpec asserts frame parity.
    "q_bloom_delta" -> QueryDef(
      fn = (spark, dir) => {
        val docs = Tables(spark, dir, "documents")
        val prev = docs.filter(col("doc_id") % 10 < 3)
        val incoming = docs.filter(col("doc_id") % 10 >= 1)
          .unionByName(docs.filter(col("doc_id") % 10 === 1)
            .select((col("doc_id") + 600000).as("doc_id"),
              upper(col("text")).as("text"),
              col("lang"), col("source"), col("n_chars")))
        val hash = md5(normText(col("text")).cast("binary"))
        val ledger = prev.select(hash.as("content_hash"))
        val bloom = ledger
          .agg(graft.functions.BloomSketch.bloomAgg(
            xxhash64(col("content_hash")), 100000L, 1L << 20).as("bf"))
          .head().getAs[Array[Byte]](0)
        val keyed = incoming.select(col("doc_id"), hash.as("content_hash"))
          .withColumn("__maybe_seen", graft.functions.BloomSketch
            .mightContain(lit(bloom), xxhash64(col("content_hash"))))
        val definitelyNew = keyed.filter(!col("__maybe_seen"))
          .select("doc_id", "content_hash")
        val confirmedNew = keyed.filter(col("__maybe_seen"))
          .select("doc_id", "content_hash")
          .join(ledger, Seq("content_hash"), "left_anti")
          .select("doc_id", "content_hash")
        definitelyNew.unionByName(confirmedNew).orderBy("doc_id")
      },
      oracle = Some("""
        |WITH prev AS (
        |  SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS content_hash
        |  FROM documents WHERE doc_id % 10 < 3),
        |incoming AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 1
        |  UNION ALL
        |  SELECT doc_id + 600000, upper(text) FROM documents WHERE doc_id % 10 = 1)
        |SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS content_hash
        |FROM incoming
        |WHERE md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))
        |  NOT IN (SELECT content_hash FROM prev)
        |ORDER BY doc_id""".stripMargin)),

    // ---- Cross-document repeated-passage detection (the ExactSubstr
    // dedup rule from "Deduplicating Training Data Makes Language
    // Models Better", token-window form): per document, the fraction
    // of its distinct 8-token windows that ALSO occur in some other
    // document; docs past 50% are flagged as substantially duplicated
    // passages. Complements whole-doc near-dup (Jaccard/MinHash/
    // SimHash), which misses a copied paragraph inside an otherwise
    // novel page. Planted re-crawls (every 7th doc under a fresh id
    // with a unique lead-in token) guarantee true positives whose
    // interior windows survive the prefix edit.
    //
    // Scale shape: one narrow distinct-window kernel pass (ShingleSet),
    // then two shuffles keyed on the window — shared-window detection
    // as min(doc_id) != max(doc_id) (NO count-distinct expansion) and
    // the per-doc tally as a semi-join + groupBy on doc_id. At 100 TB
    // the window string never needs to travel: swap `g` for
    // xxhash64(g) so both shuffles move fixed 8-byte keys (kept as the
    // string here so the DuckDB oracle replays it verbatim).
    "q_repeated_passages" -> QueryDef(
      fn = (spark, dir) => {
        val n = 8
        val docs = Tables(spark, dir, "documents")
        val planted = docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 800000).as("doc_id"),
            concat(lit("mirror"), col("doc_id").cast("string"), lit(" "),
              col("text")).as("text"))
        val corpus = docs.select(col("doc_id"), col("text"))
          .unionByName(planted)
        val windows = corpus.select(col("doc_id"),
          graft.functions.ShingleSet.shingleSet(col("text"), n).as("ws"))
        val grams = windows.select(col("doc_id"), explode(col("ws")).as("g"))
        val shared = grams.groupBy("g")
          .agg(min("doc_id").as("__mn"), max("doc_id").as("__mx"))
          .filter(col("__mn") =!= col("__mx"))
          .select("g")
        val perDoc = grams.join(shared, Seq("g"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        windows
          .select(col("doc_id"), size(col("ws")).cast("long").as("n_windows"))
          .join(perDoc, Seq("doc_id"), "left")
          .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
          .withColumn("shared_frac",
            col("n_shared").cast("double") / col("n_windows").cast("double"))
          .withColumn("flagged", (col("shared_frac") > 0.5).cast("long"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        |WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 800000 AS doc_id,
        |         'mirror' || CAST(doc_id AS VARCHAR) || ' ' || text AS text
        |  FROM documents WHERE doc_id % 7 = 0),
        |tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM corpus),
        |w AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(0, greatest(len(toks) - 8, 0)),
        |    i -> array_to_string(toks[i+1:i+8], ' '))) AS ws
        |  FROM tok),
        |g AS (SELECT doc_id, unnest(ws) AS g FROM w),
        |shared AS (
        |  SELECT g FROM g GROUP BY g HAVING MIN(doc_id) <> MAX(doc_id)),
        |cnt AS (
        |  SELECT doc_id, COUNT(*) AS n_shared FROM g
        |  WHERE g IN (SELECT g FROM shared) GROUP BY doc_id)
        |SELECT w.doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_windows,
        |  CAST(COALESCE(cnt.n_shared, 0) AS BIGINT) AS n_shared,
        |  CAST(COALESCE(cnt.n_shared, 0) AS DOUBLE) / len(ws) AS shared_frac,
        |  CAST(CAST(COALESCE(cnt.n_shared, 0) AS DOUBLE) / len(ws) > 0.5
        |    AS BIGINT) AS flagged
        |FROM w LEFT JOIN cnt USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // ---- Admission-order NOVELTY: for each document, the fraction
    // of its distinct 8-token windows whose FIRST corpus occurrence
    // (min doc_id — ids are the arrival order here) is the document
    // itself. This is the incremental-crawl curation rule "keep the
    // earliest copy, measure what a late arrival actually adds" —
    // complementary to q_repeated_passages (symmetric sharing) and to
    // the near-dup family (whole-doc similarity): a doc stitched from
    // five old documents is ~0% novel yet pairs with none of them.
    // Scale shape: grams shuffle ONCE keyed on the window (xxhash64
    // of it at 100 TB — string kept so the oracle replays verbatim);
    // the min(doc_id) aggregation is partial (map-side combine), its
    // winners re-aggregate as bare longs (no join back on the wide
    // gram key), and the per-doc left join is the only other
    // shuffle. Nothing is ever pairwise.
    "q_ngram_novelty" -> QueryDef(
      fn = (spark, dir) => {
        val n = 8
        val docs = Tables(spark, dir, "documents")
        // replays of EARLIER docs arriving late in the admission
        // order: every window first occurred at the source doc, so
        // the planted copies measure ~0 novelty (true redundancy).
        // The +900000 offset assumes doc_id < 900000 (driver testdata
        // tops out at 50k ids at sf1 — 18× headroom; same fixed-offset
        // convention as q_repeated_passages' +800000 and plantedEmb's
        // +1000000); a corpus past that bound must derive the offset
        // from max(doc_id)+1 or planted ids would collide with real
        // ones and corrupt the min(doc_id) arrival semantics.
        val planted = docs.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 900000).as("doc_id"), col("text"))
        val corpus = docs.select(col("doc_id"), col("text"))
          .unionByName(planted)
        // the shingle-set frame feeds the per-doc totals AND the
        // exploded gram stream — persist it so the corpus text is
        // scanned/shingled ONCE (lastSigs swap-release: the previous
        // invocation's copy is freed, cache stays bounded)
        val windows = graft.ops.BuildOnce.swapPersist(lastNoveltyGrams,
          corpus.select(col("doc_id"),
            graft.functions.ShingleSet.shingleSet(col("text"), n).as("ws")))
        val grams = windows.select(col("doc_id"), explode(col("ws")).as("g"))
        // each gram appears at most once per doc (ws is a set), so a
        // doc's novel-gram count is exactly the number of grams whose
        // min(doc_id) IS that doc — count the first-occurrence
        // aggregate by its winner instead of joining the full gram
        // stream back on the wide 8-word string key. One wide shuffle
        // (groupBy g, map-side combined) instead of two, and the
        // second shuffle carries only (first_doc) longs.
        val novel = grams.groupBy("g").agg(min("doc_id").as("first_doc"))
          .groupBy(col("first_doc").as("doc_id"))
          .agg(count(lit(1)).as("n_novel"))
        // every doc yields >= 1 window (ShingleSet emits one partial
        // shingle for short texts) but may own no first occurrences —
        // left join + coalesce mirrors the oracle's LEFT JOIN cnt
        windows.select(col("doc_id"),
            size(col("ws")).cast("long").as("n_windows"))
          .join(novel, Seq("doc_id"), "left")
          .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
          .withColumn("novelty_frac",
            col("n_novel").cast("double") / col("n_windows").cast("double"))
          .withColumn("redundant", (col("novelty_frac") < 0.1).cast("long"))
          .select("doc_id", "n_windows", "n_novel", "novelty_frac",
            "redundant")
          .orderBy("doc_id")
      },
      oracle = Some("""
        |WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 900000 AS doc_id, text
        |  FROM documents WHERE doc_id % 9 = 0),
        |tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM corpus),
        |w AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(0, greatest(len(toks) - 8, 0)),
        |    i -> array_to_string(toks[i+1:i+8], ' '))) AS ws
        |  FROM tok),
        |g AS (SELECT doc_id, unnest(ws) AS g FROM w),
        |fst AS (SELECT g, MIN(doc_id) AS first_doc FROM g GROUP BY g),
        |cnt AS (
        |  SELECT g.doc_id,
        |    SUM(CASE WHEN g.doc_id = fst.first_doc THEN 1 ELSE 0 END) AS n_novel
        |  FROM g JOIN fst USING (g) GROUP BY g.doc_id)
        |SELECT w.doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_windows,
        |  CAST(COALESCE(cnt.n_novel, 0) AS BIGINT) AS n_novel,
        |  CAST(COALESCE(cnt.n_novel, 0) AS DOUBLE) / len(ws) AS novelty_frac,
        |  CAST(CAST(COALESCE(cnt.n_novel, 0) AS DOUBLE) / len(ws) < 0.1
        |    AS BIGINT) AS redundant
        |FROM w LEFT JOIN cnt USING (doc_id) ORDER BY doc_id""".stripMargin),
      bench = true), // all-corpus shingle + gram shuffle — cost tracked

    // ---- n-gram Jaccard near-dup detection, blocked by (language,
    // length band) — see [[DedupFunctions.bandedPairs]] for why the
    // band is part of the equi-join KEY, not a post-join filter.
    "q_neardup_jaccard" -> QueryDef(
      fn = (spark, dir) => {
        val docs = withPlantedNearDups(Tables(spark, dir, "documents"))
          .select(col("doc_id"), col("lang"), col("n_chars"),
            distinctShingles(col("text")).as("sh"))
        bandedPairs(docs)
          .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
          .filter(col("jaccard") >= 0.6)
          .select("id_a", "id_b", "jaccard")
          .orderBy("id_a", "id_b")
      },
      oracle = Some(plantedCte + """,
        |tok AS (
        |  SELECT doc_id, lang, n_chars,
        |         string_split_regex(text, '\s+') AS tokens
        |  FROM docs),
        |sh AS (
        |  SELECT doc_id, lang, n_chars,
        |    list_distinct(list_transform(
        |      generate_series(0, greatest(len(tokens) - 3, 0)),
        |      i -> array_to_string(tokens[i+1:i+3], ' '))) AS sh
        |  FROM tok)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        |FROM sh a JOIN sh b
        |  ON a.lang = b.lang AND a.doc_id < b.doc_id
        | AND abs(a.n_chars - b.n_chars) <= 60
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin)),

    // ---- Shingle-CONTAINMENT near-dup: directed pairs where ≥ 90% of
    // A's shingles appear in B — the quote/subset duplication that
    // Jaccard (and its length-band blocking) structurally misses: a
    // short doc embedded in a long one has Jaccard ≈ |A|/|B| and a
    // length gap the band key excludes, yet containment 1.0. Planted
    // concatenations (doc d ++ doc d+1) are guaranteed positives.
    //
    // Blocking is PREFIX FILTERING (the AllPairs/PPJoin family): under
    // any global total order on shingles, containment(A in B) ≥ t
    // forces B to share one of A's first ⌊(1-t)·|A|⌋+1 shingles — so
    // the candidate join is an inverted-list EQUI-JOIN on shingle with
    // the A side pruned to that prefix. Ordering rarest-first makes
    // hot shingles land at prefix ENDS: the head of every prefix is a
    // rare token, so no shingle fans out quadratically at 100 TB (the
    // skew lives on the B side, bounded by the A-prefix's rarity).
    // The ORACLE is the brute-force all-directed-pairs join — the
    // driver's hash gate doubles as the blocking losslessness proof
    // (the q_entity_resolution pattern).
    "q_containment_neardup" -> QueryDef(
      fn = (spark, dir) => {
        val base = Tables(spark, dir, "documents")
          .filter(col("doc_id") < 200).select(col("doc_id"), col("text"))
        val nxt = base.select((col("doc_id") - 1).as("doc_id"),
          col("text").as("text2"))
        val planted = base.filter(col("doc_id") % 10 === 0)
          .join(nxt, "doc_id")
          .select((col("doc_id") + 2000000).as("doc_id"),
            concat(col("text"), lit(" "), col("text2")).as("text"))
        val corpus = base.unionByName(planted)
        val sh = corpus
          .select(col("doc_id"), distinctShingles(col("text")).as("sh"))
          .filter(size(col("sh")) > 0)
        val tokens = sh.select(col("doc_id"), explode(col("sh")).as("g"))
        val freq = tokens.groupBy("g").agg(count(lit(1)).as("df"))
        // rarest-first total order (df, g); prefix = ⌊0.1·|A|⌋+1
        val ordered = tokens.join(freq, "g")
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("doc_id").orderBy(col("df"), col("g"))))
        val prefix = ordered
          .join(sh.select(col("doc_id"), size(col("sh")).as("sz")), "doc_id")
          .filter(col("rn") <=
            floor(lit(0.1) * col("sz")).cast("long") + 1)
        val cand = prefix.select(col("doc_id").as("id_a"), col("g"))
          .join(tokens.select(col("doc_id").as("id_b"), col("g")), "g")
          .filter(col("id_a") =!= col("id_b"))
          .select("id_a", "id_b").distinct()
        cand
          .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")),
            "id_a")
          .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
            "id_b")
          .withColumn("containment",
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
              / size(col("sh_a")))
          .filter(col("containment") >= 0.9)
          .select("id_a", "id_b", "containment")
          .orderBy("id_a", "id_b")
      },
      oracle = Some("""
        |WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |planted AS (
        |  SELECT a.doc_id + 2000000 AS doc_id, a.text || ' ' || b.text AS text
        |  FROM base a JOIN base b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 10 = 0),
        |corpus AS (
        |  SELECT * FROM base UNION ALL SELECT * FROM planted),
        |tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tokens
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      generate_series(0, greatest(len(tokens) - 3, 0)),
        |      i -> array_to_string(tokens[i+1:i+3], ' '))) AS sh
        |  FROM tok),
        |shn AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh)
        |    AS containment
        |FROM shn a JOIN shn b ON a.doc_id != b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh)
        |  >= 0.9
        |ORDER BY id_a, id_b""".stripMargin)),

    // ---- MinHash + LSH near-dup candidates, exact-verified.
    "q_neardup_minhash" -> QueryDef(
      fn = (spark, dir) => {
        val k = 64; val bands = 16; val rows = 4
        // Production LSH shape, stage by stage:
        //  1. ONE narrow pass computes each doc's signature (native
        //     shingle + minhash kernels); persisted — it's the compact
        //     (id, 64xlong) frame every later stage keys off.
        //  2. Candidates = equi-join on (band, bandHash) over ids only.
        //  3. Cheap pre-filter: signature agreement (the Broder
        //     estimator, fixed-width compare) >= 0.4 — kills the bulk
        //     of low-similarity band collisions before any string set
        //     is materialized.
        //  4. Exact Jaccard verification ONLY for survivors, shingling
        //     just those docs.
        val docs = withPlantedNearDups(Tables(spark, dir, "documents"))
          .select(col("doc_id"), col("text"))
        // the returned plan reads sigs several times (band self-join +
        // two pre-filter lookups), so it must stay cached through the
        // caller's execution; the PREVIOUS invocation's copy is
        // released (bounded at one — see BuildOnce.swapPersist)
        val sigs = graft.ops.BuildOnce.swapPersist(lastSigs, docs
          .select(col("doc_id"),
            minhashSignature(distinctShingles(col("text")), k).as("sig")))
        val exploded = sigs.select(col("doc_id"),
          posexplode(bandHashes(col("sig"), bands, rows))
            .as(Seq("band_idx", "band_hash")))
        // export the kernel outputs so the DuckDB oracle can re-derive
        // stages 2-4 (band join, Broder pre-filter, exact verify) from
        // the same signatures/band hashes — see oracleExportDir
        if (exportOracleFrames) {
          sigs.coalesce(1).write.mode("overwrite")
            .parquet(s"$oracleExportDir/minhash_sigs")
          exploded.coalesce(1).write.mode("overwrite")
            .parquet(s"$oracleExportDir/minhash_bands")
        }
        val cand = exploded.as("x").join(exploded.as("y"),
            col("x.band_idx") === col("y.band_idx") &&
              col("x.band_hash") === col("y.band_hash") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
          .distinct()
        val prefiltered = cand
          .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
          .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
          .filter(graft.functions.SigAgreement.sigAgreement(col("sig_a"), col("sig_b")) >= 0.4)
          .select("id_a", "id_b")
        prefiltered
          .join(docs.select(col("doc_id").as("id_a"),
            distinctShingles(col("text")).as("sh_a")), "id_a")
          .join(docs.select(col("doc_id").as("id_b"),
            distinctShingles(col("text")).as("sh_b")), "id_b")
          .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
          .filter(col("jaccard") >= 0.6)
          .select("id_a", "id_b", "jaccard")
          .orderBy("id_a", "id_b")
      },
      // Full-pipeline oracle: DuckDB replays candidate banding, the
      // Broder signature-agreement pre-filter (>= 0.4), and the exact
      // Jaccard verify (>= 0.6) from the exported kernel frames. The
      // shingle sets are recomputed from text (same construction the
      // q_neardup_jaccard oracle hash-matches with).
      oracle = Some(plantedCte + s""",
        |$minhashOracleCtes
        |SELECT p.id_a, p.id_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        |FROM pref p
        |JOIN sh a ON a.doc_id = p.id_a
        |JOIN sh b ON b.doc_id = p.id_b
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin),
      bench = true),

    // ---- LSH quality evaluation IN-ENGINE: precision/recall of raw
    // band-collision candidates against the exact banded-Jaccard
    // truth set (q_neardup_jaccard's definition) — "measure, don't
    // guess" as a first-class hash-checked query, the text twin of
    // q_cluster_purity. All counts are exact BIGINTs from equi-joins
    // (truth ⋈ cand, two anti-joins); precision/recall are one IEEE
    // division each, so an LSH quality METRIC hash-matches the
    // oracle. The oracle replays candidates from the exported band
    // frame and the truth from text. At 100 TB this is the
    // recall-regression monitor a production dedup pipeline runs per
    // corpus snapshot — pair frames never carry documents, only ids.
    "q_lsh_eval" -> QueryDef(
      fn = (spark, dir) => {
        val k = 64; val bands = 16; val rows = 4
        val docsFull = withPlantedNearDups(Tables(spark, dir, "documents"))
        val blocked = docsFull.select(col("doc_id"), col("lang"),
          col("n_chars"), distinctShingles(col("text")).as("sh"))
        val truth = bandedPairs(blocked)
          .filter(jaccard(col("sh_a"), col("sh_b")) >= 0.6)
          .select("id_a", "id_b")
        // identical sig plan to q_neardup_minhash => CacheManager
        // shares the cached frame through the same lastSigs slot
        val sigs = graft.ops.BuildOnce.swapPersist(lastSigs, docsFull
          .select(col("doc_id"),
            minhashSignature(distinctShingles(col("text")), k).as("sig")))
        val exploded = sigs.select(col("doc_id"),
          posexplode(bandHashes(col("sig"), bands, rows))
            .as(Seq("band_idx", "band_hash")))
        if (exportOracleFrames) {
          exploded.coalesce(1).write.mode("overwrite")
            .parquet(s"$oracleExportDir/lsh_eval_bands")
        }
        val cand = exploded.as("x").join(exploded.as("y"),
            col("x.band_idx") === col("y.band_idx") &&
              col("x.band_hash") === col("y.band_hash") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
          .distinct()
        truth.select(col("id_a"), col("id_b"), lit(1).as("t"))
          .join(cand.select(col("id_a"), col("id_b"), lit(1).as("c")),
            Seq("id_a", "id_b"), "full_outer")
          .agg(
            count(when(col("t") === 1 && col("c") === 1, 1)).as("tp"),
            count(when(col("t").isNull, 1)).as("fp"),
            count(when(col("c").isNull, 1)).as("fn"))
          .withColumn("precision",
            col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .withColumn("recall",
            col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
      },
      oracle = Some(plantedCte + s""",
        |tok AS (
        |  SELECT doc_id, lang, n_chars,
        |         string_split_regex(text, '\\s+') AS tokens
        |  FROM docs),
        |sh AS (
        |  SELECT doc_id, lang, n_chars,
        |    list_distinct(list_transform(
        |      generate_series(0, greatest(len(tokens) - 3, 0)),
        |      i -> array_to_string(tokens[i+1:i+3], ' '))) AS sh
        |  FROM tok),
        |truth AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b
        |    ON a.lang = b.lang AND a.doc_id < b.doc_id
        |   AND abs(a.n_chars - b.n_chars) <= 60
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6),
        |bnd AS (
        |  SELECT * FROM read_parquet('$oracleExportDir/lsh_eval_bands/*.parquet')),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM bnd x JOIN bnd y
        |    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
        |   AND x.doc_id < y.doc_id),
        |cnt AS (SELECT
        |  (SELECT COUNT(*) FROM truth t JOIN cand c
        |     ON t.id_a = c.id_a AND t.id_b = c.id_b) AS tp,
        |  (SELECT COUNT(*) FROM cand c WHERE NOT EXISTS (
        |     SELECT 1 FROM truth t
        |     WHERE t.id_a = c.id_a AND t.id_b = c.id_b)) AS fp,
        |  (SELECT COUNT(*) FROM truth t WHERE NOT EXISTS (
        |     SELECT 1 FROM cand c
        |     WHERE t.id_a = c.id_a AND t.id_b = c.id_b)) AS fn)
        |SELECT tp, fp, fn,
        |  CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
        |  CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall
        |FROM cnt""".stripMargin)),

    // ---- CROSS-METHOD DEDUP AGREEMENT AUDIT: how much do the MinHash
    // (token-set Jaccard >= 0.6) and SimHash (Hamming <= 8) detectors
    // agree on the SAME planted corpus? One exact-count row:
    // per-method pair counts, the intersection/union, each method's
    // exclusive pairs, and the pair-set Jaccard agreement in basis
    // points (pure BIGINT arithmetic). This is the question a curation
    // team asks when choosing/stacking detectors — "does the cheaper
    // fingerprint find the same duplicates?" — answered in-engine, on
    // ids only. Scale shape: both legs are the already-blocked
    // operators (band / pigeonhole equi-joins); the audit overlays one
    // equi-join and one union-distinct on id-pair frames, then
    // single-row aggregates combined by broadcast — documents never
    // move. The oracle replays BOTH pipelines from their exported
    // kernel frames and must land on identical counts.
    "q_dedup_agreement" -> QueryDef(
      fn = (spark, dir) => {
        val mh = graft.SparkEntry.queries("q_neardup_minhash")(spark, dir)
          .select(col("id_a"), col("id_b"), lit(1).as("m"))
        val sm = graft.SparkEntry.queries("q_neardup_simhash")(spark, dir)
          .select(col("id_a"), col("id_b"), lit(1).as("s"))
        // ONE pass per detector: both pair sets are distinct by
        // construction, so a full-outer join on the pair key with
        // presence flags yields every count from a single aggregate
        // (the q_lsh_eval shape) — referencing mh/sm from separate
        // count subtrees would re-execute each pipeline per consumer
        // (Spark does not dedup common subplans)
        mh.join(sm, Seq("id_a", "id_b"), "full_outer")
          .agg(
            count(col("m")).as("minhash_pairs"),
            count(col("s")).as("simhash_pairs"),
            count(when(col("m") === 1 && col("s") === 1, 1))
              .as("both_pairs"),
            count(lit(1)).as("union_pairs"))
          .select(col("minhash_pairs"), col("simhash_pairs"),
            col("both_pairs"),
            (col("minhash_pairs") - col("both_pairs")).as("minhash_only"),
            (col("simhash_pairs") - col("both_pairs")).as("simhash_only"),
            expr("both_pairs * 10000 div union_pairs").as("agreement_bp"))
      },
      oracle = Some(plantedCte + s""",
        |$minhashOracleCtes,
        |mh AS (
        |  SELECT p.id_a, p.id_b
        |  FROM pref p
        |  JOIN sh a ON a.doc_id = p.id_a
        |  JOIN sh b ON b.doc_id = p.id_b
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6),
        |fp AS (
        |  SELECT * FROM read_parquet('$oracleExportDir/simhash_fp/*.parquet')),
        |sm AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM fp a JOIN fp b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.fp, b.fp)) <= ${FingerprintQueries.hammingMax}),
        |cnt AS (SELECT
        |  (SELECT COUNT(*) FROM mh) AS minhash_pairs,
        |  (SELECT COUNT(*) FROM sm) AS simhash_pairs,
        |  (SELECT COUNT(*) FROM mh m JOIN sm s
        |     ON m.id_a = s.id_a AND m.id_b = s.id_b) AS both_pairs,
        |  (SELECT COUNT(*) FROM
        |     (SELECT id_a, id_b FROM mh UNION SELECT id_a, id_b FROM sm))
        |    AS union_pairs)
        |SELECT minhash_pairs, simhash_pairs, both_pairs,
        |  minhash_pairs - both_pairs AS minhash_only,
        |  simhash_pairs - both_pairs AS simhash_only,
        |  both_pairs * 10000 // union_pairs AS agreement_bp
        |FROM cnt""".stripMargin)),

    // ---- Passage SCRUB — the removal write-path of the ExactSubstr
    // rule (q_repeated_passages DETECTS; this emits cleaned docs):
    // drop every token covered by an 8-token window that also occurs
    // in another document. Positioned grams (doc, win_start, gram)
    // shuffle once keyed on the gram (xxhash64(g) at 100 TB — the
    // string is kept for the oracle); sharing is the same min≠max
    // aggregation (never a pair join); flagged window starts come
    // back per doc as a BOUNDED int set, and the token mask is one
    // narrow indexed array-filter — the document text itself never
    // shuffles. Output is (counts, md5 of the cleaned text) so the
    // frame stays hash-checkable without shipping documents.
    "q_passage_scrub" -> QueryDef(
      fn = (spark, dir) => {
        val n = 8
        val docs = Tables(spark, dir, "documents")
        val planted = docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 800000).as("doc_id"),
            concat(lit("mirror"), col("doc_id").cast("string"), lit(" "),
              col("text")).as("text"))
        val corpus = docs.select(col("doc_id"), col("text"))
          .unionByName(planted)
        val tok = corpus.select(col("doc_id"),
          filter(TextFunctions.wsTokens(col("text")), t => t =!= "").as("toks"))
        // persisted: the positioned-gram explosion is the expensive
        // frame and feeds BOTH the sharing aggregation and the
        // flagged-starts semi-join — unpersisted it would compute
        // twice (and tokenization three times). Previous invocation's
        // copy released (lastSigs pattern, bounded at one)
        val grams = graft.ops.BuildOnce.swapPersist(DedupFunctions.lastGrams,
          tok.select(col("doc_id"), col("toks"),
            explode(when(size(col("toks")) >= n,
                sequence(lit(0), size(col("toks")) - n))
              .otherwise(array().cast("array<int>"))).as("p"))
          .select(col("doc_id"), col("p"),
            concat_ws(" ", slice(col("toks"), col("p") + 1, lit(n))).as("g")))
        val shared = grams.groupBy("g")
          .agg(min("doc_id").as("__mn"), max("doc_id").as("__mx"))
          .filter(col("__mn") =!= col("__mx"))
          .select("g")
        val starts = grams.join(shared, Seq("g"), "left_semi")
          .groupBy("doc_id").agg(collect_set(col("p")).as("ss"))
        tok.join(starts, Seq("doc_id"), "left")
          .withColumn("ss", coalesce(col("ss"), array().cast("array<int>")))
          .withColumn("kept", filter(col("toks"),
            (x, i) => !exists(col("ss"), w => i >= w && i <= w + (n - 1))))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens"),
            size(col("kept")).cast("long").as("n_kept"),
            md5(concat_ws(" ", col("kept")).cast("binary")).as("cleaned_md5"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        |WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 800000 AS doc_id,
        |         'mirror' || CAST(doc_id AS VARCHAR) || ' ' || text AS text
        |  FROM documents WHERE doc_id % 7 = 0),
        |tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
        |  FROM corpus),
        |g AS (
        |  SELECT doc_id, p, array_to_string(toks[p+1:p+8], ' ') AS g
        |  FROM (SELECT doc_id, toks,
        |          unnest(CASE WHEN len(toks) >= 8
        |                 THEN generate_series(0, len(toks) - 8)
        |                 ELSE [] END) AS p
        |        FROM tok)),
        |shared AS (SELECT g FROM g GROUP BY g HAVING MIN(doc_id) <> MAX(doc_id)),
        |starts AS (
        |  SELECT doc_id, list(DISTINCT p) AS ss FROM g
        |  WHERE g IN (SELECT g FROM shared) GROUP BY doc_id),
        |clean AS (
        |  SELECT t.doc_id, t.toks,
        |    list_filter(t.toks, (x, i) ->
        |      len(list_filter(COALESCE(s.ss, []),
        |          w -> (i-1) >= w AND (i-1) <= w + 7)) = 0) AS kept
        |  FROM tok t LEFT JOIN starts s USING (doc_id))
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  md5(COALESCE(array_to_string(kept, ' '), '')) AS cleaned_md5
        |FROM clean ORDER BY doc_id""".stripMargin)),

    // ---- Paragraph-grain dedup (CCNet granularity;
    // DedupFunctions.paragraphDedup): dedup the PARAGRAPH, keep the
    // doc — the curation grain between doc-level near-dup and
    // token-window ExactSubstr. The corpus plants all three duplicate
    // classes deterministically: each doc = its own text ⊕ its
    // decade-leader's text ⊕ a constant footer, so leaders carry an
    // INTRA-doc duplicate (own text twice), members carry a CROSS-doc
    // duplicate (the leader paragraph), and the footer is global
    // boilerplate that must survive exactly once corpus-wide. First
    // occurrence by (doc_id, position) wins — the integer
    // doc_id·128+pos encoding is replayed verbatim by the oracle.
    // Scale shape: one content-hash exchange + one equi-join back +
    // one per-doc reassembly; no pair joins (see the kernel scaladoc).
    "q_paragraph_dedup" -> QueryDef(
      fn = (spark, dir) => {
        val docs = Tables(spark, dir, "documents")
          .select(col("doc_id"), col("text"))
        val corpus = docs
          .withColumn("lid", col("doc_id") - pmod(col("doc_id"), lit(10L)))
          .join(docs.select(col("doc_id").as("lid"),
            col("text").as("ltext")), "lid")
          .select(col("doc_id"),
            concat(col("text"), lit("\n\n"), col("ltext"), lit("\n\n"),
              lit("(c) graft corpus 2026")).as("text"))
        paragraphDedup(corpus).orderBy("doc_id")
      },
      bench = true,
      oracle = Some("""
        |WITH corpus AS (
        |  SELECT d.doc_id,
        |    d.text || chr(10) || chr(10) || l.text || chr(10) || chr(10)
        |      || '(c) graft corpus 2026' AS text
        |  FROM documents d
        |  JOIN documents l ON l.doc_id = d.doc_id - d.doc_id % 10),
        |paras AS (
        |  SELECT doc_id,
        |    unnest(generate_series(1, len(ps))) - 1 AS pos,
        |    unnest(ps) AS p
        |  FROM (SELECT doc_id,
        |          string_split(text, chr(10) || chr(10)) AS ps
        |        FROM corpus)),
        |hashed AS (
        |  SELECT doc_id, pos, p, md5(lower(trim(p))) AS h,
        |         doc_id * 128 + pos AS ord
        |  FROM paras),
        |win AS (SELECT h, MIN(ord) AS w FROM hashed GROUP BY h),
        |kept AS (
        |  SELECT doc_id, pos, p FROM hashed
        |  JOIN win ON hashed.h = win.h AND hashed.ord = win.w),
        |rebuilt AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |    string_agg(p, chr(10) || chr(10) ORDER BY pos) AS txt
        |  FROM kept GROUP BY doc_id),
        |np AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras
        |  FROM paras GROUP BY doc_id)
        |SELECT np.doc_id, np.n_paras,
        |  COALESCE(r.n_kept, 0) AS n_kept,
        |  md5(COALESCE(r.txt, '')) AS cleaned_md5
        |FROM np LEFT JOIN rebuilt r USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    // ---- Snapshot reconciliation (anti-entropy table diff): ONE
    // co-partitioned full-outer equi-join on the key, comparing
    // narrow per-row content hashes — the standard added / removed /
    // changed / unchanged audit between two corpus snapshots. The
    // synthetic previous snapshot follows the q_snapshot_delta
    // convention: ids %10∈{8,9} exist only in current (added),
    // ghost rows id+900000 only in previous (removed), %10==3 text
    // perturbed (changed). At 100 TB this is exactly one shuffle of
    // (key, 16-byte hash) pairs per side — the text itself never
    // moves — and 4 aggregate rows out.
    "q_reconcile" -> QueryDef(
      fn = (spark, dir) => {
        val docs = Tables(spark, dir, "documents")
        val prev = docs.filter(col("doc_id") % 10 < 8)
          .select(col("doc_id"),
            when(col("doc_id") % 10 === 3, upper(col("text")))
              .otherwise(col("text")).as("text"))
          .unionByName(docs.filter(col("doc_id") % 10 === 8)
            .select((col("doc_id") + 900000).as("doc_id"), col("text")))
        val l = prev.select(col("doc_id"),
          md5(col("text").cast("binary")).as("h_prev"))
        val r = docs.select(col("doc_id"),
          md5(col("text").cast("binary")).as("h_curr"))
        l.join(r, Seq("doc_id"), "full_outer")
          .withColumn("status",
            when(col("h_prev").isNull, "added")
              .when(col("h_curr").isNull, "removed")
              .when(col("h_prev") =!= col("h_curr"), "changed")
              .otherwise("unchanged"))
          .groupBy("status").agg(count(lit(1)).as("n"))
          .orderBy("status")
      },
      oracle = Some("""
        |WITH prev AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 3 THEN upper(text) ELSE text END AS text
        |  FROM documents WHERE doc_id % 10 < 8
        |  UNION ALL
        |  SELECT doc_id + 900000, text FROM documents WHERE doc_id % 10 = 8),
        |l AS (SELECT doc_id, md5(text) AS h_prev FROM prev),
        |r AS (SELECT doc_id, md5(text) AS h_curr FROM documents)
        |SELECT CASE WHEN h_prev IS NULL THEN 'added'
        |            WHEN h_curr IS NULL THEN 'removed'
        |            WHEN h_prev != h_curr THEN 'changed'
        |            ELSE 'unchanged' END AS status,
        |       COUNT(*) AS n
        |FROM l FULL OUTER JOIN r USING (doc_id)
        |GROUP BY 1 ORDER BY status""".stripMargin))
  )
}
