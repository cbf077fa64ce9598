package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}
import graft.ext.DedupFunctions
import graft.functions.{RollingHashMin, WeightedAvg}

/** Queries exercising the custom function surface: the typed
  * `Aggregator` UDAF and the rolling-hash fingerprint expression.
  */
object FunctionQueries extends QueryModule {

  override def defs: Seq[(String, QueryDef)] = Seq(

    // ---- Custom UDAF: quantity-weighted average discount per flag.
    // The Aggregator accumulates exact decimals (order-independent) and
    // divides once as doubles — hash-stable under any partitioning.
    "q_weighted_avg_udaf" -> QueryDef(
      fn = (spark, dir) => Tables(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(WeightedAvg(col("l_discount"), col("l_quantity").cast("double"))
          .as("wavg_discount"))
        .orderBy("l_returnflag"),
      oracle = Some("""
        |SELECT l_returnflag,
        |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS wavg_discount
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- Rolling-hash fingerprint (native expression; winnowing-style
    // min over 16-byte windows). The KERNEL is not SQL-expressible, so
    // the fingerprint frame is exported (the q_neardup_simhash
    // precedent) and DuckDB hash-verifies the DOWNSTREAM sharing
    // aggregation: near-dup docs share fingerprints when they share
    // any 16-byte run containing the minimizing window, so the real
    // dedup use is the per-fingerprint sharer count — a groupBy on the
    // uniform 8-byte hash + a join back, both shuffle-keyed on it.
    "q_rolling_fingerprint" -> QueryDef(
      fn = (spark, dir) => {
        val fp = Tables(spark, dir, "documents")
          .select(col("doc_id"),
            RollingHashMin.rollinghashMin(spark, col("text")).as("rh_fingerprint"))
        if (DedupFunctions.exportOracleFrames) {
          fp.coalesce(1).write.mode("overwrite")
            .parquet(s"${DedupFunctions.oracleExportDir}/rolling_fp")
        }
        val shared = fp.groupBy("rh_fingerprint")
          .agg(count(lit(1)).as("n_sharers"))
        fp.join(shared, "rh_fingerprint")
          .select("doc_id", "rh_fingerprint", "n_sharers")
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        |WITH fp AS (
        |  SELECT * FROM read_parquet('${DedupFunctions.oracleExportDir}/rolling_fp/*.parquet')),
        |s AS (
        |  SELECT rh_fingerprint, COUNT(*) AS n_sharers
        |  FROM fp GROUP BY rh_fingerprint)
        |SELECT doc_id, rh_fingerprint, n_sharers
        |FROM fp JOIN s USING (rh_fingerprint) ORDER BY doc_id""".stripMargin))
  )
}
