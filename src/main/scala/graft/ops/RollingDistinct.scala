package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling DISTINCT count over a trailing date window — the WAU/MAU
  * curve ("distinct keys active in the last W days, for every day").
  * `q_rolling_wau` is the query-surface instance.
  *
  * No engine evaluates COUNT(DISTINCT) over a sliding frame scalably:
  * the naive fan-out replicates every active day W times, and a
  * per-day correlated subquery is |days|×|rows|. The formulation
  * here is INTERVAL COVERAGE: a key covers day d iff its last active
  * day on-or-before d is within W−1 days, so per (key, active-day)
  * the covered days form [day, min(day+W−1, next_active−1)] — and
  * because the next interval starts exactly at next_active, the
  * intervals of one key are disjoint BY CONSTRUCTION. Membership
  * therefore needs no second dedup, and the interval stream is
  * O(distinct (key, day) pairs) REGARDLESS of W — a 365-day MAU
  * costs exactly what a 7-day WAU costs. Intervals become ±1
  * endpoint events, roll up per day with map-side partials, and
  * prefix-sum over the BOUNDED date dimension (the
  * q_sweepline_concurrency two-level shape — the only sequential
  * step rides a frame whose size is the calendar, not the corpus).
  *
  * Exchanges: the (key, day) distinct + the per-key lead window =
  * two corpus-sized shuffles; everything after is day-sized. The
  * spine bounds re-scan the input (one extra 1-column columnar pass)
  * DELIBERATELY: the alternative — persisting the corpus-sized pair
  * frame so both subtrees share it — trades a narrow scan for
  * cluster-wide cache residency of one row per (key, active-day),
  * the wrong trade at 100 TB. PlanAssertionsSpec pins the shape
  * (4 exchanges, keyed lead window, broadcast day frame, no
  * cartesian).
  * Integer counts end-to-end. `RollingDistinctSpec` proves the
  * construction against a brute-force model at RANDOM window
  * lengths; the q_rolling_wau oracle (a W× fan-out, an independent
  * construction) is the cross-engine disjointness proof.
  *
  * @param rows   input frame
  * @param key    entity column (who is "active")
  * @param day    DateType activity column
  * @param window trailing window length in days (W ≥ 1; day d counts
  *               keys active in [d−W+1, d])
  * @return (d: date, active: long) — one row per day of the observed
  *         [min(day), max(day)] span
  */
object RollingDistinct {

  def activeCount(rows: DataFrame, key: Column, day: Column,
      window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val pairs = rows.select(key.as("k"), day.as("day")).distinct()
    val byKey = Window.partitionBy("k").orderBy("day")
    val iv = pairs
      .withColumn("nxt", lead(col("day"), 1).over(byKey))
      .select(col("day").as("d0"),
        least(date_add(col("day"), window - 1),
          coalesce(date_sub(col("nxt"), 1),
            date_add(col("day"), window - 1))).as("d1"))
    // both endpoint events from ONE pass (sweepline precedent)
    val deltas = iv.select(explode(array(
        struct(col("d0").as("d"), lit(1L).as("delta")),
        struct(date_add(col("d1"), 1).as("d"), lit(-1L).as("delta"))))
        .as("e"))
      .select(col("e.d").as("d"), col("e.delta").as("delta"))
    val daily = deltas.groupBy("d").agg(sum("delta").as("net"))
    val spine = pairs.agg(min("day").as("dmin"), max("day").as("dmax"))
      .select(explode(expr("sequence(dmin, dmax, interval 1 day)")).as("d"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("d"), "left")
      .withColumn("net", coalesce(col("net"), lit(0L)))
      .withColumn("active", sum("net").over(w))
      .select(col("d"), col("active"))
  }
}
