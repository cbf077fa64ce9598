package graft.ext

import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.SimHash.simhash64

/** Document fingerprinting via the custom [[graft.functions.SimHash]]
  * Catalyst expression, plus SimHash-based near-dup detection
  * (Hamming distance on 64-bit fingerprints via built-in
  * `bit_count(a ^ b)`).
  *
  * Scale: the fingerprint is one long per document (narrow, codegen'd);
  * candidate pairing at 100 TB buckets fingerprints by their high-order
  * bytes (4 rotations => any pair within Hamming distance 3 shares at
  * least one bucket) instead of the demo's blocked self-join.
  */
object FingerprintQueries extends QueryModule {
  import DedupFunctions.withPlantedNearDups

  override def defs: Seq[(String, QueryDef)] = Seq(

    // ---- Per-document 64-bit SimHash fingerprint (custom Expression;
    // xxhash64-based, deterministic but not SQL-expressible => rows-only).
    "q_doc_fingerprint" -> QueryDef(
      fn = (spark, dir) => Tables(spark, dir, "documents")
        .select(col("doc_id"),
          simhash64(spark, split(col("text"), "\\s+")).as("simhash"))
        .orderBy("doc_id"),
      oracle = None),

    // ---- SimHash near-dup: planted near-identical copies land within
    // a small Hamming distance of their source.
    "q_neardup_simhash" -> QueryDef(
      fn = (spark, dir) => {
        val docs = withPlantedNearDups(Tables(spark, dir, "documents"))
          .select(col("doc_id"), col("lang"),
            simhash64(spark, split(col("text"), "\\s+")).as("fp"))
        val a = docs.select(col("doc_id").as("id_a"), col("lang").as("lang_a"),
          col("fp").as("fp_a"))
        val b = docs.select(col("doc_id").as("id_b"), col("lang").as("lang_b"),
          col("fp").as("fp_b"))
        a.join(b, col("lang_a") === col("lang_b") && col("id_a") < col("id_b"))
          .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
          .filter(col("hamming") <= 8)
          .select("id_a", "id_b", "hamming")
          .orderBy("id_a", "id_b")
      },
      oracle = None)
  )
}
