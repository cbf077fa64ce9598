package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{Fs, QuantileSketch}
import graft.ops.QuantileSketch.QSketch

/** Per-GROUP incrementally-maintained quantile store — the grouped
  * twin of [[QuantileMaintenance]] and the serving loop behind the
  * 100 TB "p95 tokens per source, always fresh" monitoring query
  * (`q_group_quantiles` computes it from scratch; this store keeps it
  * maintained so serving never rescans history).
  *
  * Same algebra as the global store: each group's sketch is an exact
  * function of that group's multiset and merge is bit-exact, so
  * per-batch per-group sketches fold into the stored ones and the
  * streamed store equals the one-shot batch build over the union
  * corpus bit-for-bit — INCLUDING groups that first appear mid-stream
  * (an absent stored group merges from empty). Spec-pinned, with
  * epoch replay.
  *
  * Scale shape per batch: the batch reduces DISTRIBUTED to ≤k pairs
  * per group through [[QuantileSketch.QuantileSketchAgg]]'s
  * partial-aggregated buffers (one exchange of group × k rows); the
  * fold is a driver-side per-group merge over the collected sketches.
  * Driver state is groups × k pairs — the bounded-registry class
  * (sources, langs, shards). An UNBOUNDED group domain needs the
  * store partitioned by group hash instead; this store's contract is
  * the registry-sized one, like [[graft.ext.PipelineOps.waterfill]].
  */
object GroupQuantileMaintenance {

  /** Sentinel h for each group's meta row (real priorities ≥ 0). */
  val MetaH: Long = QuantileMaintenance.MetaH

  /** Store-level marker row's group key: keeps the stamp addressable
    * even for a ZERO-group store (an empty parquet write commits no
    * data files and could never be read back). Newline-prefixed — no
    * single-line registry key can collide with it. */
  private val StampG = "\n__stamp"

  private def writeStore(spark: SparkSession, sks: Map[String, QSketch],
      storeDir: String, stamp: String): Unit = {
    import spark.implicits._
    val rows = (StampG, MetaH, 0L, 0L) +: sks.toSeq.flatMap { case (g, sk) =>
      (g, MetaH, sk.level.toLong, sk.total) +:
        sk.canonical.map { case (h, v) => (g, h, v, 0L) }
    }
    rows.toDF("g", "h", "v", "total")
      .withColumn("last_batch", lit(stamp))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(storeDir)
  }

  /** Read the store back: per-group sketches + the idempotency stamp. */
  def readSketches(spark: SparkSession, storeDir: String,
      k: Int = QuantileSketch.DefaultK): (Map[String, QSketch], String) = {
    val rows = Fs.readStore(spark, storeDir)
      .select("g", "h", "v", "total", "last_batch").collect()
    val stamp = rows.head.getString(4)
    val byG = rows.filterNot(_.getString(0) == StampG)
      .groupBy(_.getString(0)).map { case (g, rs) =>
        val meta = rs.find(_.getLong(1) == MetaH)
          .getOrElse(sys.error(s"group $g in $storeDir has no meta row"))
        val items = rs.filter(_.getLong(1) != MetaH)
          .map(r => (r.getLong(1), r.getLong(2))).toVector
        g -> QSketch(k, meta.getLong(2).toInt, meta.getLong(3), items)
      }
    (byG, stamp)
  }

  /** Distributed batch → per-group sketches: ONE typed aggregation
    * whose partial buffers carry ≤k pairs per group, then a
    * groups-bounded collect. `rows` must be (g string, h long,
    * v long). */
  def sketchesOf(rows: DataFrame,
      k: Int = QuantileSketch.DefaultK): Map[String, QSketch] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val agg = new QuantileSketch.QuantileSketchAgg(k)
    rows.select(col("g").cast("string"), col("h").cast("long"),
        col("v").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.toColumn.name("sk"))
      .collect().toMap
  }

  /** Initial store build (empty input yields an empty store that
    * [[mergeDelta]] bootstraps group-by-group). */
  def build(rows: DataFrame, storeDir: String,
      k: Int = QuantileSketch.DefaultK, stamp: String = "__init"): Unit =
    writeStore(rows.sparkSession, sketchesOf(rows, k), storeDir, stamp)

  /** Bounded-registry ceiling for the DRIVER-side fold: at or below
    * it the per-group merge collects groups × k pairs (sources,
    * langs, shards — the store's original contract); past it the
    * fold runs DISTRIBUTED — one exchange on the group key, each
    * group rebuilt and merged in ≤2(k+1)-row bounded memory — so an
    * unbounded group domain (per-user, per-document) never turns the
    * maintenance loop into a driver collect. The measured-gate
    * pattern of [[graft.ops.TableStats.statsJoin]]: the regime is
    * chosen from counted groups, never from hope. Both regimes are
    * spec-pinned bit-equal. */
  val MaxDriverGroups: Long = 8192L

  /** The store's idempotency stamp alone — one filtered head, no
    * group-domain-sized collect (the regime gate must not pay the
    * collect it exists to avoid). */
  private def readStamp(spark: SparkSession, storeDir: String): String =
    Fs.readStore(spark, storeDir).filter(col("g") === lit(StampG))
      .select("last_batch").head().getString(0)

  /** The distributed fold as a frame of store rows (g, h, v, total):
    * stored rows ⊎ the delta's distributed per-group sketch rows,
    * one groupByKey on g, per-group imperative rebuild + the SAME
    * QSketch.merge the driver regime runs — bit-identical output by
    * construction. private[graft] so the spec can plan-assert the
    * exchange + mapGroups shape. */
  private[graft] def mergedRowsDistributed(spark: SparkSession,
      storeDir: String, delta: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val stored = Fs.readStore(spark, storeDir)
      .filter(col("g") =!= lit(StampG))
      .select(col("g"), col("h"), col("v"), col("total"),
        lit(0).as("side"))
    val agg = new QuantileSketch.QuantileSketchAgg(k)
    val fresh = delta.select(col("g").cast("string"), col("h").cast("long"),
        col("v").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.toColumn.name("sk"))
      .flatMap { case (g, sk) =>
        (g, MetaH, sk.level.toLong, sk.total, 1) +:
          sk.canonical.map { case (h, v) => (g, h, v, 0L, 1) }
      }
      .toDF("g", "h", "v", "total", "side")
    stored.union(fresh)
      .as[(String, Long, Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val rows = it.toVector
        def rebuild(side: Int): QSketch = {
          val rs = rows.filter(_._5 == side)
          if (rs.isEmpty) QSketch.empty(k)
          else {
            val meta = rs.find(_._2 == MetaH).getOrElse(
              sys.error(s"group $g side $side has no meta row"))
            QSketch(k, meta._3.toInt, meta._4,
              rs.filter(_._2 != MetaH).map(r => (r._2, r._3)))
          }
        }
        val merged = rebuild(0).merge(rebuild(1))
        ((g, MetaH, merged.level.toLong, merged.total) +:
          merged.canonical.map { case (h, v) => (g, h, v, 0L) }).iterator
      }
      .toDF("g", "h", "v", "total")
  }

  /** Fold one batch of (g, h, v) rows into the store — idempotent per
    * batchId; a group unseen so far merges from the empty sketch.
    * Regime is gated on the MEASURED group count (stored meta rows +
    * delta distinct groups — an upper bound on the union): at or
    * under `maxDriverGroups` the original driver fold runs; above it
    * the distributed fold (same rows, spec-pinned). */
  def mergeDelta(spark: SparkSession, storeDir: String, delta: DataFrame,
      batchId: String, k: Int = QuantileSketch.DefaultK,
      maxDriverGroups: Long = MaxDriverGroups): Unit = {
    require(batchId.nonEmpty && batchId != "__init", s"bad batchId $batchId")
    if (readStamp(spark, storeDir) == batchId) return
    val storedGroups = Fs.readStore(spark, storeDir)
      .filter(col("g") =!= lit(StampG) && col("h") === lit(MetaH)).count()
    val deltaGroups = delta.select(col("g")).distinct().count()
    if (storedGroups + deltaGroups <= maxDriverGroups) {
      val (stored, _) = readSketches(spark, storeDir, k)
      val fresh = sketchesOf(delta, k)
      val merged = (stored.keySet ++ fresh.keySet).map { g =>
        g -> stored.getOrElse(g, QSketch.empty(k))
          .merge(fresh.getOrElse(g, QSketch.empty(k)))
      }.toMap
      writeStore(spark, merged, storeDir, batchId)
    } else {
      import spark.implicits._
      val stampRow = Seq((StampG, MetaH, 0L, 0L))
        .toDF("g", "h", "v", "total")
      // localCheckpoint before the overwrite: the plan reads the very
      // dir it replaces (the self-overwrite hazard), and the store
      // must never be clobbered by a plan that still needs it
      val out = mergedRowsDistributed(spark, storeDir, delta, k)
        .union(stampRow)
        .withColumn("last_batch", lit(batchId))
        .localCheckpoint(true)
      out.write.mode(SaveMode.Overwrite).parquet(storeDir)
      out.unpersist()
    }
  }

  /** Serve per-group quantiles from the maintained store, shaped like
    * `q_group_quantiles`' from-scratch output: (source, lstar, n, m,
    * p50_v, p95_v). Groups with an empty sketch are omitted (no order
    * statistics to read). */
  def quantilesFrame(spark: SparkSession, storeDir: String,
      k: Int = QuantileSketch.DefaultK): DataFrame = {
    import spark.implicits._
    val (sks, _) = readSketches(spark, storeDir, k)
    sks.toSeq.sortBy(_._1).flatMap { case (g, sk) =>
      for (p50 <- sk.quantile(5000L); p95 <- sk.quantile(9500L))
        yield (g, sk.level.toLong, sk.total, sk.items.size.toLong, p50, p95)
    }.toDF("source", "lstar", "n", "m", "p50_v", "p95_v")
  }

  /** Per-group EQUI-DEPTH boundaries served from the maintained
    * store — the grouped face of
    * [[graft.ops.Histogram.sketchBoundaries]], computed as one
    * DataFrame plan over the store's own rows (every exchange is on
    * the group key over ≤groups×k-row frames; no rescan of history).
    * Same boundary rule per group: bucket b's upper bound is the
    * sketch value at position max(1, b·m div buckets) in (v, h)
    * order; lo = previous bucket's ub (null for the first). */
  def boundariesFrame(spark: SparkSession, storeDir: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets $buckets")
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val store = Fs.readStore(spark, storeDir)
      .filter(col("g") =!= StampG)
    val meta = store.filter(col("h") === MetaH)
      .select(col("g"), col("v").as("lstar"), col("total").as("n"))
    val items = store.filter(col("h") =!= MetaH)
      .select(col("g"), col("h"), col("v"))
    val m = items.groupBy("g").agg(count(lit(1)).as("m"))
    val ord = items.withColumn("pos", row_number().over(
      Window.partitionBy(col("g")).orderBy(col("v"), col("h"))).cast("long"))
    (1 to buckets).map(_.toLong).toDF("bucket")
      .crossJoin(broadcast(m))
      .withColumn("pos",
        greatest(lit(1L), expr(s"bucket * m div $buckets")))
      .join(ord.select(col("g"), col("pos"), col("v").as("ub")),
        Seq("g", "pos"))
      .withColumn("lo", lag("ub", 1).over(
        Window.partitionBy(col("g")).orderBy(col("bucket"))))
      .join(broadcast(meta), "g")
      .select(col("g").as("source"), col("bucket"), col("lo"), col("ub"),
        col("lstar"), col("n"), col("m"))
  }

  /** Maintain `storeDir` from the parquet stream at `sourceDir`;
    * `gExpr`/`vExpr`/`keyExpr` are SQL expressions over the source
    * columns producing the group, sketched value, and unique hash
    * key. */
  def start(spark: SparkSession, sourceDir: String, storeDir: String,
      gExpr: String, vExpr: String, keyExpr: String,
      k: Int = QuantileSketch.DefaultK): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(sourceDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val rows = batch.select(
          expr(gExpr).cast("string").as("g"),
          QuantileSketch.hash60(expr(keyExpr).cast("string")).as("h"),
          expr(vExpr).cast("long").as("v"))
        mergeDelta(batch.sparkSession, storeDir, rows, s"b$id", k)
      }
      .option("checkpointLocation", s"$storeDir-__checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
