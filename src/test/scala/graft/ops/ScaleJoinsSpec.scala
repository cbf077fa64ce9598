package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain join result on a skewed key distribution") {
    // 10k rows of one hot key + a uniform tail (the skew shape)
    val left = (Seq.tabulate(10000)(i => (1L, i.toLong)) ++
      Seq.tabulate(500)(i => ((i % 50 + 2).toLong, (10000 + i).toLong)))
      .toDF("k", "row_id")
    val right = (1L to 51L).map(k => (k, s"dim_$k")).toDF("k", "payload")

    val plain = left.join(right, "k")
    val salted = ScaleJoins.saltedJoin(left, right, "k", "row_id", salts = 8)

    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedJoin spreads a hot key across salt buckets") {
    val left = Seq.tabulate(1000)(i => (1L, i.toLong)).toDF("k", "row_id")
    val buckets = left
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8)).cast("int"))
      .groupBy("__salt").count().collect()
    assert(buckets.length === 8) // every bucket gets a share
    assert(buckets.map(_.getLong(1)).max < 1000 * 0.3) // no bucket dominates
  }

  test("adaptiveSaltedJoin salts only the sketch-detected hot keys") {
    // one hot key (10k rows, ~95% share) + a uniform tail
    val left = (Seq.tabulate(10000)(i => (1L, i.toLong)) ++
      Seq.tabulate(500)(i => ((i % 50 + 2).toLong, (10000 + i).toLong)))
      .toDF("k", "row_id")
    val right = (1L to 51L).map(k => (k, s"dim_$k")).toDF("k", "payload")

    val plain = left.join(right, "k")
    val adaptive = ScaleJoins.adaptiveSaltedJoin(
      left, right, "k", "row_id", salts = 8, denom = 16)

    // result parity with the plain join
    assert(adaptive.count() === plain.count())
    assert(adaptive.except(plain).isEmpty && plain.except(adaptive).isEmpty)

    // the sketch's thresholded detection finds EXACTLY the hot key:
    // the 50 cold keys (each ~0.1% of rows) must NOT be salted even
    // though all 51 keys survive in the sketch's counter set (k=64 >
    // distinct keys, so nothing is ever evicted)
    assert(ScaleJoins.hotKeys(left, "k", denom = 16, k = 64) === Set("1"))
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf — the session default
    // (spark-warehouse/, gitignored) is used; tables are dropped after
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

    val orders = (1L to 1000L).map(i => (i % 100, i, i * 1.5)).toDF("cust", "ord", "amt")
    val customer = (0L until 100L).map(i => (i, s"c$i")).toDF("cust", "name")
    orders.write.bucketBy(8, "cust").sortBy("cust").saveAsTable("b_orders")
    customer.write.bucketBy(8, "cust").saveAsTable("b_customer")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_customer"), "cust")
      val plan = joined.queryExecution.executedPlan.toString()
      // co-located bucketed join: sort-merge with NO ShuffleExchange
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("bloomReducedJoin == plain join, with the might_contain filter below the join") {
    // fact: 10k rows over 1000 keys; dim: 20 of those keys — the
    // selective-dim shape where the reduction pays. The fact goes
    // through parquet: over a LocalRelation, Catalyst constant-folds
    // the (foldable-bloom) filter away at optimization time and the
    // plan assert below would see nothing.
    val factDir = java.nio.file.Files.createTempDirectory("bloom_fact").toString
    (0L until 10000L).map(i => (i % 1000, i)).toDF("fk", "row_id")
      .write.mode("overwrite").parquet(factDir)
    val fact = spark.read.parquet(factDir)
    val dim = (0L until 1000L by 50).map(k => (k, s"d$k")).toDF("dk", "name")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = fact.join(dim, col("fk") === col("dk"))
      val reduced = ScaleJoins.bloomReducedJoin(fact, dim, "fk", "dk",
        nItems = 1L << 10, nBits = 1L << 14)
      assert(reduced.count() === plain.count())
      assert(reduced.except(plain).isEmpty && plain.except(reduced).isEmpty)

      // the pre-filter sits in the executed plan (below the join) …
      reduced.collect()
      assert(execNodes(reduced).exists(
        _.toString.contains("might_contain")), reduced.queryExecution.executedPlan)
      // … and it actually reduces: probe the same predicate directly.
      // 20/1000 true keys at these sketch sizes keeps well under half.
      val blob = dim.agg(graft.functions.BloomSketch
        .bloomAgg(xxhash64(col("dk")), 1L << 10, 1L << 14)).head().getAs[Array[Byte]](0)
      val kept = fact.filter(graft.functions.BloomSketch
        .mightContain(lit(blob), xxhash64(col("fk")))).count()
      assert(kept >= plain.count() && kept < 5000, s"pre-filter kept $kept")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("bloomReducedJoin against an empty dim returns empty") {
    val fact = (0L until 100L).map(i => (i, i)).toDF("fk", "row_id")
    val dim = Seq.empty[(Long, String)].toDF("dk", "name")
    assert(ScaleJoins.bloomReducedJoin(fact, dim, "fk", "dk").count() === 0L)
  }

  test("bloomReducedJoin with int-vs-bigint keys loses no rows; disjoint types fail loudly") {
    // int fact key, bigint dim key: hashing each side in its own type
    // would make every bloom probe a false negative and the 'identical
    // to the plain join' contract silently break — the integral pair
    // must widen to one hash representation
    val fact = (0 until 1000).map(i => (i % 100, i)).toDF("fk", "row_id")
    val dim = (0L until 100L by 10).map(k => (k, s"d$k")).toDF("dk", "name")
    assert(fact.schema("fk").dataType !== dim.schema("dk").dataType)
    val plain = fact.join(dim, col("fk") === col("dk"))
    val reduced = ScaleJoins.bloomReducedJoin(fact, dim, "fk", "dk")
    assert(reduced.count() === plain.count() && plain.count() === 100L)
    assert(reduced.except(plain).isEmpty && plain.except(reduced).isEmpty)

    // non-integral mismatch (string vs bigint) cannot widen losslessly
    val sdim = Seq(("5", "x")).toDF("dk", "name")
    intercept[IllegalArgumentException] {
      ScaleJoins.bloomReducedJoin(fact, sdim, "fk", "dk")
    }
  }
}
