package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}
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
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS wavg_discount
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- Rolling-hash fingerprint (native expression; winnowing-style
    // min over 16-byte windows). Not SQL-expressible => rows-only +
    // ScalaTest spec; near-dup pairs share fingerprints when they share
    // any 16-byte run containing the minimizing window.
    "q_rolling_fingerprint" -> QueryDef(
      fn = (spark, dir) => Tables(spark, dir, "documents")
        .select(col("doc_id"),
          RollingHashMin.rollinghashMin(spark, col("text")).as("rh_fingerprint"))
        .orderBy("doc_id"),
      oracle = None)
  )
}
