package graft.ops

import java.io.File

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** JoinView incremental maintenance: delta algebra == one-shot join,
  * retries and crash schedules converge, and state scans prune to the
  * delta's buckets.
  */
class JoinViewSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def freshView(): String = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_jv_spec").toString
    val orders = Tables(spark, sf, "orders")
    val line = Tables(spark, sf, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    JoinView.applyDelta(spark, base, "o_orderkey",
      orders.filter(col("o_orderkey") % 2 === 0),
      line.filter(col("l_linenumber") % 2 === 1), "b1")
    JoinView.applyDelta(spark, base, "o_orderkey",
      orders.filter(col("o_orderkey") % 2 === 1),
      line.filter(col("l_linenumber") % 2 === 0), "b2")
    base
  }

  private def snapshot(base: String): Seq[String] =
    JoinView.read(spark, base)
      .select("o_orderkey", "l_linenumber", "o_custkey", "l_quantity")
      .collect().map(_.toString).sorted.toSeq

  test("incremental build == one-shot join (all three delta terms live)") {
    val base = freshView()
    val got = snapshot(base)
    val want = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "l_linenumber", "o_custkey", "l_quantity")
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got === want)
    Fs.deleteRecursively(new File(base))
  }

  test("shuffle-regime deltas (maxBroadcast=0) build the identical view") {
    // the measured broadcast gate must change only the exchange
    // strategy, never the rows — force the shuffle regime end to end
    val base = java.nio.file.Files
      .createTempDirectory("graft_jv_shuffle").toString
    val orders = Tables(spark, sf, "orders")
    val line = Tables(spark, sf, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    JoinView.applyDelta(spark, base, "o_orderkey",
      orders.filter(col("o_orderkey") % 2 === 0),
      line.filter(col("l_linenumber") % 2 === 1), "b1", maxBroadcast = 0L)
    JoinView.applyDelta(spark, base, "o_orderkey",
      orders.filter(col("o_orderkey") % 2 === 1),
      line.filter(col("l_linenumber") % 2 === 0), "b2", maxBroadcast = 0L)
    val broadcastBuilt = freshView()
    assert(snapshot(base) === snapshot(broadcastBuilt))
    Fs.deleteRecursively(new File(base))
    Fs.deleteRecursively(new File(broadcastBuilt))
  }

  test("replaying an applied batch is a no-op; crash schedules converge") {
    val base = freshView()
    val before = snapshot(base)
    val orders = Tables(spark, sf, "orders")
    val line = Tables(spark, sf, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val dA2 = orders.filter(col("o_orderkey") % 2 === 1)
    val dB2 = line.filter(col("l_linenumber") % 2 === 0)

    // plain replay of the already-applied b2
    JoinView.applyDelta(spark, base, "o_orderkey", dA2, dB2, "b2")
    assert(snapshot(base) === before)

    // crash schedule: b2's stateA write "lost" (view + stateB landed)
    // — the retry must regenerate it and leave the view unchanged
    new File(s"$base/stateA").listFiles().foreach { kb =>
      Option(kb.listFiles()).getOrElse(Array.empty[File])
        .filter(_.getName == "batch_id=b2").foreach(Fs.deleteRecursively)
    }
    JoinView.applyDelta(spark, base, "o_orderkey", dA2, dB2, "b2")
    assert(snapshot(base) === before)

    // crash schedule: b2's VIEW write lost but state landed — the
    // retry must rebuild the view partition from pre-b2 state (the
    // batch_id exclusion is what makes the recompute see B_old
    // without b2's own state rows)
    new File(s"$base/view").listFiles().foreach { kb =>
      Option(kb.listFiles()).getOrElse(Array.empty[File])
        .filter(_.getName == "batch_id=b2").foreach(Fs.deleteRecursively)
    }
    JoinView.applyDelta(spark, base, "o_orderkey", dA2, dB2, "b2")
    assert(snapshot(base) === before)

    // an EMPTY delta is a structural no-op
    JoinView.applyDelta(spark, base, "o_orderkey",
      orders.limit(0), line.limit(0), "b3")
    assert(snapshot(base) === before)
    Fs.deleteRecursively(new File(base))
  }

  test("a file stream maintains the view via foreachBatch deltas") {
    // the streaming IVM story Spark doesn't give you for materialized
    // join views: static orders seeded as batch s-1, lineitem files
    // arriving one per micro-batch, each folded with the epoch id as
    // the batch id (exactly-once by the same overwrite/exclusion
    // argument as the batch path)
    val base = java.nio.file.Files
      .createTempDirectory("graft_jv_stream").toString
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_jv_src").toString
    val orders = Tables(spark, sf, "orders")
    val line = Tables(spark, sf, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    JoinView.applyDelta(spark, base, "o_orderkey",
      orders, line.limit(0), "s-1")
    line.filter(col("l_linenumber") % 2 === 1)
      .coalesce(1).write.parquet(s"$srcDir/f1")
    line.filter(col("l_linenumber") % 2 === 0)
      .coalesce(1).write.parquet(s"$srcDir/f2")
    val schema = spark.read.parquet(s"$srcDir/f1").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/*")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // inside foreachBatch the batch belongs to the streaming
        // clone session — pass THAT session (the IncrementalNearDup
        // registration caveat, same root cause)
        val emptyOrders = batch.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), orders.schema)
        JoinView.applyDelta(batch.sparkSession, base, "o_orderkey",
          emptyOrders, batch, s"s$id")
        ()
      }
      .option("checkpointLocation", s"$base-__ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = snapshot(base)
    val want = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "l_linenumber", "o_custkey", "l_quantity")
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got === want)
    Fs.deleteRecursively(new File(base))
    Fs.deleteRecursively(new File(srcDir))
  }

  test("state reads partition-prune to the delta's buckets") {
    val base = freshView()
    val probe = JoinView.readState(spark, s"$base/stateA", Seq(0, 3), "bX")
    val scans = fileScans(probe.select("o_orderkey"))
    assert(scans.nonEmpty)
    val (_, filters, nParts) = scans.head
    assert(filters.contains("kb"))
    // 2 buckets x (b1, b2) partitions at most — never the full layout
    assert(nParts >= 1 && nParts <= 4)
    Fs.deleteRecursively(new File(base))
  }
}
