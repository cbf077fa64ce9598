package graft.ext

import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}

/** Blocked entity resolution (record linkage): match dirty strings to
  * a canonical catalog under an edit-distance bound WITHOUT an
  * all-pairs comparison.
  *
  * The scale problem: a naive fuzzy match is |dirty| x |catalog|
  * levenshtein calls — a cross join that no cluster survives at
  * 100 TB. The fix is the same blocking discipline every near-dup
  * operator in this tree uses (Dedup band joins, Fingerprint
  * pigeonhole blocks, Similarity sign-buckets): derive equi-join keys
  * such that every true match provably co-occupies at least one key,
  * then verify only within blocks.
  *
  * Blocking key here: (anchor-kind, anchor-char, catalog-length).
  * A single edit (insert / delete / substitute) cannot change BOTH the
  * first and the last character of a string of length >= 2, so any
  * pair at levenshtein distance <= 1 shares its first char or its last
  * char, and lengths differ by at most 1. Each catalog name emits its
  * two anchors with its own length; each dirty string emits its two
  * anchors x the three admissible catalog lengths. The verify step is
  * then a pure equi-join + per-pair distance check — candidates are
  * bounded by block co-occupancy, never |A| x |B|. (For natural keys
  * with longer strings the anchor generalizes to q-gram prefixes /
  * suffixes; the proof shape — an edit budget pigeonholed over
  * disjoint anchors — is identical to Fingerprint's Hamming blocks.)
  *
  * The DuckDB oracle deliberately computes ground truth BRUTE-FORCE
  * (cross join, no blocking), so the driver's hash gate doubles as a
  * losslessness proof of the blocking scheme on real data — the same
  * evidence style as SimilaritySpec's all-pairs parity assert.
  */
object LinkageQueries extends QueryModule {

  override def defs: Seq[(String, QueryDef)] = Seq(

    // ---- Fuzzy-match a deterministic "typo feed" (delete the
    // (p_partkey mod len)-th char of each part name — the dirty side
    // a linkage job would ingest) against the distinct name catalog.
    "q_entity_resolution" -> QueryDef(
      fn = (spark, dir) => {
        val parts = Tables(spark, dir, "part")
        val dirty = parts.select(col("p_partkey"),
          expr("concat(" +
            "substring(p_name, 1, cast(p_partkey % length(p_name) as int)), " +
            "substring(p_name, cast(p_partkey % length(p_name) as int) + 2))")
            .as("dirty"))
        val cat = parts.select(col("p_name")).distinct()
        val catKeys = cat.select(col("p_name"), explode(array(
            struct(lit("F").as("kind"), substring(col("p_name"), 1, 1).as("ch")),
            struct(lit("L").as("kind"), substring(col("p_name"), -1, 1).as("ch"))))
            .as("k"))
          .select(col("p_name"), col("k.kind").as("kind"), col("k.ch").as("ch"),
            length(col("p_name")).as("clen"))
        val anchors = for (k <- Seq("F", "L"); d <- Seq(-1, 0, 1)) yield {
          val ch = if (k == "F") substring(col("dirty"), 1, 1)
                   else substring(col("dirty"), -1, 1)
          struct(lit(k).as("kind"), ch.as("ch"),
            (length(col("dirty")) + d).as("clen"))
        }
        val dirtyKeys = dirty
          .select(col("p_partkey"), col("dirty"), explode(array(anchors: _*)).as("k"))
          .select(col("p_partkey"), col("dirty"),
            col("k.kind").as("kind"), col("k.ch").as("ch"), col("k.clen").as("clen"))
        // a pair can co-occupy both its F and L blocks — dedup before
        // the (comparatively) expensive distance verify
        val cand = dirtyKeys.join(catKeys, Seq("kind", "ch", "clen"))
          .select("p_partkey", "dirty", "p_name").distinct()
        cand
          .filter(levenshtein(col("dirty"), col("p_name")) <= 1)
          .select(col("p_partkey"), col("dirty").as("dirty_name"),
            col("p_name").as("matched_name"),
            levenshtein(col("dirty"), col("p_name")).cast("long").as("dist"))
          .orderBy("p_partkey", "matched_name")
      },
      oracle = Some("""
        |WITH cat AS (SELECT DISTINCT p_name FROM part),
        |d AS (SELECT p_partkey,
        |        substr(p_name, 1, CAST(p_partkey % length(p_name) AS INTEGER))
        |          || substr(p_name, CAST(p_partkey % length(p_name) AS INTEGER) + 2) AS dirty
        |      FROM part)
        |SELECT d.p_partkey, d.dirty AS dirty_name, cat.p_name AS matched_name,
        |       CAST(levenshtein(d.dirty, cat.p_name) AS BIGINT) AS dist
        |FROM d, cat
        |WHERE levenshtein(d.dirty, cat.p_name) <= 1
        |ORDER BY p_partkey, matched_name""".stripMargin))
  )
}
