package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** JDBC deployment mode for the star warehouse — the reference's actual
  * source/sink shape (SURVEY.md §2 O-1 + O-24): it reads the station
  * seed from MySQL (`SELECT station_id, city, country_code FROM
  * W_STATION WHERE enabled = 1`, dags/utils/api.py:20) and writes the
  * five star tables through one connection (dags/utils/database.py:16-34,
  * dags/etl.py:96-123).
  *
  * Spark-first translation:
  *   - reads go through the JDBC DataSource (predicate pushdown: the
  *     `WHERE enabled = 1` filter is pushed into the remote query; an
  *     optional partition column splits the read across executors);
  *   - writes use Spark's JDBC sink, which commits each PARTITION as
  *     one transaction (batched inserts). Cross-table atomicity is
  *     impossible from a distributed writer, so — exactly like the
  *     parquet [[StarSink]] — the useful invariant is kept instead:
  *     dimensions commit BEFORE the fact table, and a one-row batch
  *     manifest table commits LAST; readers needing full consistency
  *     gate on the manifest (SURVEY.md §3.3 (a)+(c)).
  *
  * Scale posture: identical to [[StarSink]] — the keyed frame is
  * persisted once and scanned five times (narrow projections, no
  * shuffle). `maxConnections` caps writer parallelism so a 1000-task
  * stage cannot open 1000 simultaneous connections against the
  * warehouse (each partition = one connection).
  */
object JdbcStar {

  val manifestTable = "graft_batch_complete"

  /** JDBC table read (O-1 production mode). `predicates`, when given,
    * become one partition per predicate — the standard way to
    * parallelize a JDBC scan without a numeric partition column. */
  def readTable(spark: SparkSession, url: String, table: String,
      driver: String, predicates: Seq[String] = Nil): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("driver", driver)
    if (predicates.isEmpty) base.option("dbtable", table).load()
    else {
      val props = new java.util.Properties()
      props.setProperty("driver", driver)
      spark.read.jdbc(url, table, predicates.toArray, props)
    }
  }

  /** The reference's station-seed query, pushed down: only enabled
    * stations cross the wire (dags/utils/api.py:20). */
  def readEnabledStations(spark: SparkSession, url: String, driver: String): DataFrame =
    readTable(spark, url, "W_STATION", driver)
      .filter(col("enabled") === 1)
      .select("station_id", "city", "country_code")

  /** Write all five star tables + manifest over JDBC; returns per-table
    * row counts. Ordering: manifest CLEARED first, dims next (any
    * order), fact, then the manifest row LAST — see class doc. The
    * clear-first step matters: every table is written with Overwrite,
    * so without it a reader gating on "manifest row exists" could see
    * the previous batch's manifest while D_* / F_WEATHER are mid-
    * rewrite and mistake a half-overwritten star for a complete one.
    * `batchId` is stamped into the manifest so readers (and retries)
    * can tell WHICH batch completed, not just that one did. */
  def writeStar(enriched: DataFrame, url: String, driver: String,
      deterministicKeys: Boolean = true,
      maxConnections: Int = 8,
      batchId: Long = System.currentTimeMillis()): Map[String, Long] = {
    val cached = StarSchema.withKeys(enriched, deterministicKeys)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val star = StarSchema.splitKeyed(cached)
      val n = cached.count() // materializes the cache before the 5 scans

      def save(df: DataFrame, table: String): Unit =
        df.coalesce(maxConnections).write.format("jdbc")
          .option("url", url)
          .option("driver", driver)
          .option("dbtable", table)
          .option("batchsize", 1000)
          .mode(SaveMode.Overwrite)
          .save()

      val spark = enriched.sparkSession
      import spark.implicits._
      // invalidate the previous batch's completeness marker BEFORE
      // touching any star table (see scaladoc above)
      save(Seq.empty[(Long, Long, Int)].toDF("batch_id", "rows", "tables"),
        manifestTable)

      save(star.timeDim, "D_TIME")
      save(star.paramDim, "D_WEATHER_PARAMETERS")
      save(star.tempDim, "D_TEMPERATURE")
      save(star.heatIndexDim, "D_HEAT_INDEX")
      save(star.fact, "F_WEATHER")

      // manifest last: the batch is complete iff this row exists
      save(Seq((batchId, n, 5)).toDF("batch_id", "rows", "tables"), manifestTable)

      Map("F_WEATHER" -> n, "D_TIME" -> n, "D_WEATHER_PARAMETERS" -> n,
        "D_TEMPERATURE" -> n, "D_HEAT_INDEX" -> n)
    } finally cached.unpersist()
  }
}
