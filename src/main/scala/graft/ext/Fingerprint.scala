package graft.ext

import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.SimHash.simhash64

/** Document fingerprinting via the custom [[graft.functions.SimHash]]
  * Catalyst expression, plus SimHash-based near-dup detection
  * (Hamming distance on 64-bit fingerprints via built-in
  * `bit_count(a ^ b)`).
  *
  * Near-dup candidate generation is the pigeonhole construction: the
  * 64-bit fingerprint is split into 9 blocks (8+8x7 bits). Any pair
  * within Hamming distance 8 differs in at most 8 blocks, so at least
  * one block value is IDENTICAL — candidates are an equi-join on
  * (block_idx, block_value), never an all-pairs scan. Per-key join
  * occupancy is bounded by docs sharing one 7-8 bit block value, and
  * the exact Hamming check runs only on candidates. Identical result
  * set to the quadratic join, 100 TB-safe plan.
  *
  * Oracle strategy: xxhash64 isn't available in DuckDB, so the
  * fingerprint KERNEL can't be recomputed there — instead the query
  * exports its fingerprint frame to parquet and the oracle re-derives
  * the near-dup JOIN from those fingerprints with `bit_count(xor())`
  * over `read_parquet`. The kernel itself is covered by SimHashSpec;
  * the blocking + join + threshold logic is oracle-checked.
  */
object FingerprintQueries extends QueryModule {
  import DedupFunctions.withPlantedNearDups

  import DedupFunctions.oracleExportDir

  // shared with q_dedup_agreement (Dedup.scala) so the cross-method
  // audit and the simhash operator can never disagree on the radius
  private[ext] val hammingMax = 8

  /** q_neardup_simhash's fingerprint frame — read twice by the
    * pigeonhole self-join, so persisted; swap-released so exactly one
    * copy stays live across invocations (the Dedup.lastSigs bound). */
  private val lastSimhashFp = graft.ops.BuildOnce.swapRef()

  /** The 9 pigeonhole blocks of a 64-bit fingerprint column:
    * rows of (block_idx, block_val). */
  private def blocks(fp: org.apache.spark.sql.Column) = {
    val specs = (0 to 8).map { j =>
      if (j == 0) (56, 255L) else (56 - 7 * j, 127L)
    }
    array(specs.map { case (shift, mask) =>
      shiftright(fp, shift).bitwiseAND(lit(mask))
    }: _*)
  }

  /** q_phash_neardup's fingerprint frame — (doc_id, f_lo, f_hi, blks):
    * the aHash of the planted corpus as two 32-bit halves plus the 5
    * pigeonhole blocks (13/13/13/13/12 bits). Extracted so the
    * blocking frontier spec (PhashFrontierSpec) measures recall/cost
    * from the exact production fingerprints — same construction, no
    * drift. */
  private[graft] def phashFps(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val planted = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(substring(col("text"), 1, 10), lit("zz"),
            expr("substring(text, 13)")).as("text")))
    val pix = transform(sequence(lit(0), lit(63)),
      i => ascii(rpad(col("text"), 64, " ").substr(i + 1, lit(1))))
    def bitAt(i: Int) = when(
      element_at(col("p"), i + 1) * 64 >= col("ps"), 1L).otherwise(0L)
    def bitSum(lo: Int, hi: Int, shiftBase: Int) =
      (lo to hi).map(i => bitAt(i) * lit(1L << (i - shiftBase)))
        .reduceLeft(_ + _)
    planted
      .withColumn("p", pix)
      .withColumn("ps", aggregate(col("p"), lit(0), (acc, x) => acc + x))
      .select(col("doc_id"),
        bitSum(0, 31, 0).as("f_lo"), bitSum(32, 63, 32).as("f_hi"),
        array((0 until 5).map { j =>
          val lo = 13 * j; val hi = math.min(lo + 12, 63)
          bitSum(lo, hi, lo)
        }: _*).as("blks"))
  }

  override def defs: Seq[(String, QueryDef)] = Seq(

    // ---- Per-document 64-bit SimHash fingerprint (custom Expression;
    // xxhash64-based — the KERNEL is not SQL-expressible, so the
    // fingerprint frame is exported (the q_neardup_simhash precedent)
    // and DuckDB hash-verifies everything DOWNSTREAM of it: the
    // set-bit count and the per-language lag-window Hamming profile
    // (partitioned by the bounded lang key — never a global window).
    "q_doc_fingerprint" -> QueryDef(
      fn = (spark, dir) => {
        val fp = Tables(spark, dir, "documents")
          .select(col("doc_id"), col("lang"),
            simhash64(spark, TextFunctions.wsTokens(col("text"))).as("simhash"))
        if (DedupFunctions.exportOracleFrames) {
          fp.coalesce(1).write.mode("overwrite")
            .parquet(s"$oracleExportDir/doc_fp")
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy("doc_id")
        fp.withColumn("n_bits", bit_count(col("simhash")).cast("long"))
          .withColumn("ham_prev",
            bit_count(col("simhash").bitwiseXOR(lag(col("simhash"), 1).over(w)))
              .cast("long"))
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        |WITH fp AS (
        |  SELECT * FROM read_parquet('$oracleExportDir/doc_fp/*.parquet'))
        |SELECT doc_id, lang, simhash,
        |  CAST(bit_count(simhash) AS BIGINT) AS n_bits,
        |  CAST(bit_count(xor(simhash,
        |    lag(simhash) OVER (PARTITION BY lang ORDER BY doc_id))) AS BIGINT)
        |    AS ham_prev
        |FROM fp ORDER BY doc_id""".stripMargin)),

    // ---- SimHash near-dup: planted near-identical copies land within
    // a small Hamming distance of their source. Candidates via the
    // 9-block pigeonhole equi-join (see class doc); the fingerprint
    // frame is exported so DuckDB can verify the join end-to-end.
    "q_neardup_simhash" -> QueryDef(
      fn = (spark, dir) => {
        val docs = graft.ops.BuildOnce.swapPersist(lastSimhashFp,
          withPlantedNearDups(Tables(spark, dir, "documents"))
            .select(col("doc_id"), col("lang"),
              simhash64(spark, TextFunctions.wsTokens(col("text"))).as("fp")))
        if (DedupFunctions.exportOracleFrames) {
          docs.coalesce(1).write.mode("overwrite")
            .parquet(s"$oracleExportDir/simhash_fp")
        }
        val exploded = docs.select(col("doc_id"), col("lang"), col("fp"),
          posexplode(blocks(col("fp"))).as(Seq("block_idx", "block_val")))
        val cand = exploded.as("x").join(exploded.as("y"),
            col("x.block_idx") === col("y.block_idx") &&
              col("x.block_val") === col("y.block_val") &&
              col("x.lang") === col("y.lang") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
            col("x.fp").as("fp_a"), col("y.fp").as("fp_b"))
          .distinct()
        cand
          .withColumn("hamming",
            bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
          .filter(col("hamming") <= hammingMax)
          .select("id_a", "id_b", "hamming")
          .orderBy("id_a", "id_b")
      },
      oracle = Some(s"""
        |WITH fp AS (
        |  SELECT * FROM read_parquet('$oracleExportDir/simhash_fp/*.parquet'))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= $hammingMax
        |ORDER BY id_a, id_b""".stripMargin)),

    // ---- Perceptual-hash (aHash) near-dup over MULTIMODAL payloads:
    // the image-dedup member of the near-dup family. The 64
    // "grayscale pixels" are the stub decoder's view of the payload
    // (byte values of the 64-byte thumbnail window — a real decoder
    // swaps in downsampled pixel luma); bit i = pixel_i above the
    // thumbnail mean, compared EXACTLY as pix*64 >= sum so no
    // division enters the kernel. The fingerprint lives as two 32-bit
    // halves (a single 64-bit value would need bit 63 = 2^63 — the
    // BIGINT sign bit). Candidates via the same pigeonhole trick as
    // SimHash: 5 blocks of 13/12 bits — Hamming ≤ 4 implies ≥1
    // identical block — so candidate generation is an equi-join on
    // (block_idx, block_val), never all-pairs. Planted positives:
    // same-length 2-char perturbations (≤2 pixels move, plus any
    // mean-borderline flips). Unlike SimHash's xxhash kernel, EVERY
    // stage here is ascii/integer arithmetic — the oracle replays the
    // whole operator, no kernel-frame export.
    "q_phash_neardup" -> QueryDef(
      fn = (spark, dir) => {
        val exploded = phashFps(spark, dir)
          .select(col("doc_id"), col("f_lo"), col("f_hi"),
          posexplode(col("blks")).as(Seq("block_idx", "block_val")))
        exploded.as("x").join(exploded.as("y"),
            col("x.block_idx") === col("y.block_idx") &&
              col("x.block_val") === col("y.block_val") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
            col("x.f_lo").as("lo_a"), col("x.f_hi").as("hi_a"),
            col("y.f_lo").as("lo_b"), col("y.f_hi").as("hi_b"))
          .distinct()
          .withColumn("hamming",
            (bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
              bit_count(col("hi_a").bitwiseXOR(col("hi_b")))).cast("long"))
          .filter(col("hamming") <= 4)
          .select("id_a", "id_b", "hamming")
          .orderBy("id_a", "id_b")
      },
      oracle = Some {
        def bitSumSql(lo: Int, hi: Int, shiftBase: Int) =
          (lo to hi).map(i => s"b[${i + 1}]*${1L << (i - shiftBase)}")
            .mkString(" + ")
        val blockRows = (0 until 5).map { j =>
          val lo = 13 * j; val hi = math.min(lo + 12, 63)
          s"SELECT doc_id, f_lo, f_hi, $j AS block_idx, ${bitSumSql(lo, hi, lo)} AS block_val FROM bits"
        }.mkString("\n        |  UNION ALL\n        |  ")
        s"""WITH planted AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    substr(text, 1, 10) || 'zz' || substr(text, 13)
        |  FROM documents WHERE doc_id % 5 = 0),
        |pix AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 64),
        |      i -> ascii(substr(rpad(text, 64, ' '), i + 1, 1))) AS p
        |  FROM planted),
        |bits0 AS (
        |  SELECT doc_id,
        |    list_transform(p, x -> CASE WHEN x * 64 >= ps THEN 1 ELSE 0 END) AS b
        |  FROM (SELECT doc_id, p, list_sum(p) AS ps FROM pix)),
        |bits AS (
        |  SELECT doc_id, b,
        |    ${bitSumSql2("f_lo", 0, 31)},
        |    ${bitSumSql2("f_hi", 32, 63)}
        |  FROM bits0),
        |blk AS (
        |  $blockRows),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
        |    x.f_lo AS lo_a, x.f_hi AS hi_a, y.f_lo AS lo_b, y.f_hi AS hi_b
        |  FROM blk x JOIN blk y
        |    ON x.block_idx = y.block_idx AND x.block_val = y.block_val
        |   AND x.doc_id < y.doc_id)
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b)) AS BIGINT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b)) <= 4
        |ORDER BY id_a, id_b""".stripMargin
      })
  )

  /** SQL half-fingerprint: Σ bits[i]·2^(i-base) aliased `name` —
    * the bits CTE exposes `b` (0/1 list); DuckDB lists are 1-based. */
  private def bitSumSql2(name: String, lo: Int, hi: Int): String =
    (lo to hi).map(i => s"b[${i + 1}]*${1L << (i - lo)}")
      .mkString("", " + ", s" AS $name")
}
