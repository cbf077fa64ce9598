package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import DecayedFeatures._

/** Streaming EMA maintenance vs its batch twin `q_ema_decay`: replay
  * the sf-data events in ts-ordered batch files and assert the
  * maintained state is bit-identical to the batch query's ordered fold
  * — including when the stream is killed between batches and restarted
  * from its checkpoint (state-store recovery must not perturb the IEEE
  * chain).
  */
class DecayedFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** The events split into `parts` ts-ordered chunks (chunk k's events
    * all precede chunk k+1's under the fold's total order). */
  private def tsChunks(parts: Int): Seq[Seq[(Long, Long, Double, java.sql.Timestamp)]] = {
    val ev = graft.Tables(spark, sf, "events")
      .select("event_id", "user_id", "value", "ts")
      .orderBy("ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getTimestamp(3)))
      .toSeq
    val per = math.ceil(ev.length / parts.toDouble).toInt
    ev.grouped(per).toSeq
  }

  /** Write chunks [from, until) as one parquet file each into `dir`. */
  private def writeBatches(dir: String,
      chunks: Seq[Seq[(Long, Long, Double, java.sql.Timestamp)]],
      from: Int, until: Int): Unit =
    (from until until).foreach { i =>
      chunks(i).toDF("event_id", "user_id", "value", "ts")
        .coalesce(1).write.parquet(f"$dir/batch_$i%02d")
      Thread.sleep(5) // distinct mtimes: file-stream ingests in order
    }

  /** The sink dir accumulates one updated row per (user, batch); the
    * current feature is the row with the highest n per user. */
  private def currentState(outDir: String): Map[Long, (Long, Double)] =
    spark.read.parquet(outDir).groupBy("user_id")
      .agg(max(struct(col("n_events"), col("ema"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.ema"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  private def batchReference: Map[Long, (Long, Double)] =
    SparkEntry.queries("q_ema_decay")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  test("streamed EMA equals the batch ordered fold bit-for-bit") {
    // flat dir: glob the batch subdirs' files as one file-stream
    val dir = Files.createTempDirectory("decayed_src").toString
    writeBatches(dir, tsChunks(4), 0, 4)
    val ck = Files.createTempDirectory("decayed_ck").toString
    val out = Files.createTempDirectory("decayed_out").toString + "/ema"
    DecayedFeatures.run(spark, s"$dir/batch_*", ck, out)
      .awaitTermination(120000)

    val streamed = currentState(out)
    val ref = batchReference
    assert(streamed.keySet === ref.keySet)
    ref.foreach { case (u, (n, ema)) =>
      assert(streamed(u)._1 === n, s"user $u count")
      assert(java.lang.Double.doubleToLongBits(streamed(u)._2) ===
        java.lang.Double.doubleToLongBits(ema), s"user $u ema")
    }
  }

  test("restart from checkpoint continues the identical fold") {
    val dir = Files.createTempDirectory("decayed_src2").toString
    val chunks = tsChunks(6)
    // phase 1: only the first 3 batch files exist yet (the glob must
    // stay IDENTICAL across restarts — Spark rejects a changed source)
    writeBatches(dir, chunks, 0, 3)
    val ck = Files.createTempDirectory("decayed_ck2").toString
    val out = Files.createTempDirectory("decayed_out2").toString + "/ema"
    DecayedFeatures.run(spark, s"$dir/batch_*", ck, out)
      .awaitTermination(120000)
    // phase 2: the remaining files land, the query RESTARTS from its
    // checkpoint — the file log already holds batches 0-2, so only 3-5
    // replay, folding onto the recovered state-store state
    writeBatches(dir, chunks, 3, 6)
    DecayedFeatures.run(spark, s"$dir/batch_*", ck, out)
      .awaitTermination(120000)

    val merged = currentState(out)
    val ref = batchReference
    assert(merged.keySet === ref.keySet)
    ref.foreach { case (u, (n, ema)) =>
      assert(merged(u)._1 === n, s"user $u count")
      assert(java.lang.Double.doubleToLongBits(merged(u)._2) ===
        java.lang.Double.doubleToLongBits(ema), s"user $u ema")
    }
  }
}
