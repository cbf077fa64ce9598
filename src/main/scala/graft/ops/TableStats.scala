package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** ANALYZE-style table statistics, and the planning decision they
  * exist to drive: choosing the broadcast side of a join from
  * MEASURED row counts instead of hoping the cost model's file-size
  * estimate survives filters and projections.
  *
  * At 100 TB a wrong broadcast decision is an OOM (hinting the big
  * side) or a needless terabyte shuffle (hinting nothing); Spark's
  * own `spark.sql.autoBroadcastJoinThreshold` works off scan-size
  * estimates that go stale the moment a selective filter intervenes.
  * The pattern here is the warehouse-standard fix: ANALYZE once —
  * ONE conditional-aggregation pass per table, the
  * [[graft.ops.QualityChecks]] shape — persist the stats beside the
  * data, and let joins consult them.
  */
object TableStats {

  /** Column statistics in ONE pass: per column — non-null count,
    * approximate NDV (HLL++; exact would pay a shuffle per column),
    * min/max as strings (type-erased for a uniform schema). Row
    * count rides along. Output: one row per column. */
  def collect(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    // backtick-quote every dynamic name: a legal column like `user.id`
    // would otherwise parse as struct-field access and fail resolution
    // (an ANALYZE utility must take schemas as they come)
    def q(c: String) = col(s"`$c`")
    val aggs: Seq[Column] =
      count(lit(1)).as("n_rows") +:
        cols.flatMap { c =>
          Seq(count(q(c)).as(s"nn_$c"),
            approx_count_distinct(q(c)).as(s"ndv_$c"),
            min(q(c)).cast("string").as(s"min_$c"),
            max(q(c)).cast("string").as(s"max_$c"))
        }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // melt the single wide row to (column, n_rows, n_nonnull, ndv, min, max)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col("n_rows"),
        q(s"nn_$c").as("n_nonnull"), q(s"ndv_$c").as("ndv"),
        q(s"min_$c").as("min_s"), q(s"max_$c").as("max_s"))
    }
    one.select(explode(array(stacked: _*)).as("s")).select("s.*")
  }

  def write(df: DataFrame, dir: String): Unit =
    collect(df).coalesce(1).write.mode(SaveMode.Overwrite).parquet(dir)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Measured row count from a stats frame (same for every column row). */
  def rowCount(stats: DataFrame): Long =
    stats.select(max(col("n_rows"))).head().getLong(0)

  /** Equi-join with the broadcast side chosen from MEASURED stats:
    * the smaller side is hinted iff its measured row count clears
    * `maxBroadcastRows`; otherwise no hint is planted and the cost
    * model picks a shuffle join — the graceful-degradation posture
    * (a frozen hint on a growing table eventually OOMs the driver;
    * a stats-gated hint stops broadcasting when the data outgrows
    * it). Stats rows are bounded (one per column) — the `.head()`
    * reads are the documented sketch-row class. */
  def statsJoin(left: DataFrame, leftStats: DataFrame,
      right: DataFrame, rightStats: DataFrame,
      on: Seq[String], maxBroadcastRows: Long = 1000000L): DataFrame = {
    val (ln, rn) = (rowCount(leftStats), rowCount(rightStats))
    if (rn <= ln && rn <= maxBroadcastRows) left.join(broadcast(right), on)
    else if (ln < rn && ln <= maxBroadcastRows) broadcast(left).join(right, on)
    else left.join(right, on)
  }
}
