package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The blocked fuzzy matcher must be LOSSLESS vs brute force (the
  * DuckDB oracle already proves this cross-engine; this spec proves it
  * in-plan and measures how much work the blocking saves).
  */
class LinkageSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_entity_resolution: blocked result == brute-force all-pairs") {
    import graft.SparkEntry
    val blocked = SparkEntry.queries("q_entity_resolution")(spark, sf)
      .collect().map(_.toString).sorted

    val parts = Tables(spark, sf, "part")
    val dirty = parts.select(col("p_partkey"),
      expr("concat(" +
        "substring(p_name, 1, cast(p_partkey % length(p_name) as int)), " +
        "substring(p_name, cast(p_partkey % length(p_name) as int) + 2))")
        .as("dirty"))
    val cat = parts.select(col("p_name")).distinct()
    val brute = dirty.crossJoin(cat)
      .filter(levenshtein(col("dirty"), col("p_name")) <= 1)
      .select(col("p_partkey"), col("dirty").as("dirty_name"),
        col("p_name").as("matched_name"),
        levenshtein(col("dirty"), col("p_name")).cast("long").as("dist"))
      .collect().map(_.toString).sorted

    assert(blocked.nonEmpty)
    assert(blocked === brute)
  }

  test("blocking prunes the comparison space (candidates << all pairs)") {
    val parts = Tables(spark, sf, "part")
    val nDirty = parts.count()
    val nCat = parts.select("p_name").distinct().count()
    // candidate pairs = distinct (dirty row, catalog name) sharing a
    // block key — rebuilt here exactly as the query builds them
    val dirty = parts.select(col("p_partkey"),
      expr("concat(" +
        "substring(p_name, 1, cast(p_partkey % length(p_name) as int)), " +
        "substring(p_name, cast(p_partkey % length(p_name) as int) + 2))")
        .as("dirty"))
    val catKeys = parts.select(col("p_name")).distinct()
      .select(col("p_name"), explode(array(
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
    val nCand = dirty
      .select(col("p_partkey"), col("dirty"), explode(array(anchors: _*)).as("k"))
      .select(col("p_partkey"), col("dirty"),
        col("k.kind").as("kind"), col("k.ch").as("ch"), col("k.clen").as("clen"))
      .join(catKeys, Seq("kind", "ch", "clen"))
      .select("p_partkey", "dirty", "p_name").distinct().count()
    val frac = nCand.toDouble / (nDirty * nCat)
    info(f"candidates $nCand of ${nDirty * nCat} all-pairs (${frac * 100}%.1f%%)")
    assert(frac < 0.25)
  }
}
