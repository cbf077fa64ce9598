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

  private val hammingMax = 8

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

  override def defs: Seq[(String, QueryDef)] = Seq(

    // ---- Per-document 64-bit SimHash fingerprint (custom Expression;
    // xxhash64-based, deterministic but not SQL-expressible => rows-only).
    "q_doc_fingerprint" -> QueryDef(
      fn = (spark, dir) => Tables(spark, dir, "documents")
        .select(col("doc_id"),
          simhash64(spark, TextFunctions.wsTokens(col("text"))).as("simhash"))
        .orderBy("doc_id"),
      oracle = None),

    // ---- SimHash near-dup: planted near-identical copies land within
    // a small Hamming distance of their source. Candidates via the
    // 9-block pigeonhole equi-join (see class doc); the fingerprint
    // frame is exported so DuckDB can verify the join end-to-end.
    "q_neardup_simhash" -> QueryDef(
      fn = (spark, dir) => {
        val docs = withPlantedNearDups(Tables(spark, dir, "documents"))
          .select(col("doc_id"), col("lang"),
            simhash64(spark, TextFunctions.wsTokens(col("text"))).as("fp"))
          .persist()
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
        |ORDER BY id_a, id_b""".stripMargin))
  )
}
