package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * All math is done in DOUBLE with a strict left-to-right fold so the
  * DuckDB oracle (`list_inner_product` over `DOUBLE[]`) reproduces the
  * result bit-for-bit.
  *
  * Scale design: brute-force top-k is the correctness baseline — a
  * broadcast of the (small) query set against a partitioned scan of the
  * corpus: no shuffle of the corpus, partial top-k per partition via
  * window ranking. The near-dup variant blocks pairs by label (an
  * equi-join key) rather than a full cross product. An LSH-bucketed
  * variant (random hyperplanes => band equi-join, same shape as
  * MinHash-LSH in [[DedupFunctions]]) is the 100 TB path.
  */
object VectorFunctions {

  /** array<float> -> array<double> (all similarity math in double). */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Sequential-fold dot product — native expression
    * ([[graft.functions.DotProduct]]): identical multiply-add chain to
    * the `aggregate(zip_with(...))` HOF and DuckDB's
    * `list_inner_product`, one JIT'd loop instead of interpreted
    * lambdas (the hot kernel of every similarity operator). */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dotProduct(a, b)

  /** Cosine similarity: dot(a,b) / sqrt(dot(a,a) * dot(b,b)). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
}

object Similarity {
  /** Bucket-id XOR deltas reaching every 8-bit bucket within Hamming
    * distance 2: the identity, all single flips, all pairs (1+8+28). */
  val hamming2Deltas: Seq[Long] = {
    val singles = (0 until 8).map(j => 1L << j)
    val pairs = for (i <- 0 until 8; j <- i + 1 until 8)
      yield (1L << i) | (1L << j)
    0L +: (singles ++ pairs)
  }
}

object SimilarityQueries extends QueryModule {
  import VectorFunctions._

  /** Shared corpus frame: double vectors, zero-norm vectors excluded.
    * The exclusion is a CONTRACT, mirrored in [[embCte]]: a zero
    * vector's cosine is 0/0, which Spark's Divide maps to NULL (sorts
    * last under desc) while DuckDB's IEEE division yields NaN (sorts
    * FIRST) — the engines would rank different top-k rows. No
    * meaningful ANN query wants zero vectors anyway. */
  private def embFrame(spark: SparkSession, dir: String) =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .filter(dot(col("v"), col("v")) > 0)

  /** Shared DuckDB fragment: embeddings with double-precision vectors
    * (zero-norm excluded — see [[embFrame]]). */
  private val embCte =
    """WITH emb AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings
      |  WHERE list_inner_product(CAST(embedding AS DOUBLE[]),
      |                           CAST(embedding AS DOUBLE[])) > 0
      |)""".stripMargin

  private val cosSql =
    "list_inner_product(q.v, n.v) / sqrt(list_inner_product(q.v, q.v) * list_inner_product(n.v, n.v))"

  override def defs: Seq[(String, QueryDef)] = Seq(

    // ---- Brute-force cosine top-k: 20 query vectors against the whole
    // corpus. The query set is broadcast; the corpus is never shuffled
    // until the final (tiny) top-k aggregation.
    "q_ann_cosine_topk" -> QueryDef(
      fn = (spark, dir) => {
        val emb = embFrame(spark, dir)
        val queries = emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("v").as("q_v"))
        val w = Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("n_id"))
        broadcast(queries)
          .join(emb.select(col("vec_id").as("n_id"), col("v").as("n_v")),
            col("n_id") =!= col("q_id"))
          .withColumn("sim", cosine(col("q_v"), col("n_v")))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select("q_id", "rank", "n_id", "sim")
          .orderBy("q_id", "rank")
      },
      oracle = Some(embCte + s"""
        |SELECT q_id, rank, n_id, sim FROM (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id, $cosSql AS sim,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |                       ORDER BY $cosSql DESC, n.vec_id) AS rank
        |  FROM emb q JOIN emb n ON q.vec_id < 20 AND n.vec_id != q.vec_id)
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin),
      bench = true),

    // ---- Embedding near-dup: same-label blocked pairs above a cosine
    // threshold, with planted perturbed copies as guaranteed positives.
    "q_embedding_neardup" -> QueryDef(
      fn = (spark, dir) => {
        val emb = embFrame(spark, dir)
        val planted = emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 1000000).as("vec_id"), col("label"),
            concat(array(element_at(col("v"), 1) + lit(0.01)),
              slice(col("v"), 2, 10000)).as("v"))
        val all = emb.unionByName(planted)
        val a = all.select(col("vec_id").as("id_a"), col("label").as("label_a"),
          col("v").as("v_a"))
        val b = all.select(col("vec_id").as("id_b"), col("label").as("label_b"),
          col("v").as("v_b"))
        a.join(b, col("label_a") === col("label_b") && col("id_a") < col("id_b"))
          .withColumn("sim", cosine(col("v_a"), col("v_b")))
          .filter(col("sim") >= 0.99)
          .select(col("id_a"), col("id_b"), col("label_a").as("label"), col("sim"))
          .orderBy("id_a", "id_b")
      },
      oracle = Some(embCte + """,
        |all_emb AS (
        |  SELECT vec_id, label, v FROM emb
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id, label,
        |         [v[1] + 0.01] || v[2:] AS v
        |  FROM emb WHERE vec_id % 10 = 0)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label,
        |  list_inner_product(a.v, b.v) / sqrt(list_inner_product(a.v, a.v) * list_inner_product(b.v, b.v)) AS sim
        |FROM all_emb a JOIN all_emb b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_inner_product(a.v, b.v) / sqrt(list_inner_product(a.v, a.v) * list_inner_product(b.v, b.v)) >= 0.99
        |ORDER BY id_a, id_b""".stripMargin)),

    // ---- IVF-bucketed ANN — the 100 TB scale path. A fixed set of 16
    // "centroids" (deterministic training stub: the first 16 vectors)
    // partitions the corpus: every vector is assigned to its nearest
    // centroid ONCE (16 broadcast comparisons per row, narrow), and each
    // query probes only its nprobe=2 nearest centroid buckets — an
    // equi-join on centroid_id instead of a full scan per query. At
    // scale the corpus is written bucketed/partitioned by centroid_id,
    // so a probe is a partition-pruned read of ~nprobe/nlist of the
    // data. Exactly mirrored in SQL => hash-checkable (unlike a
    // recall-based ANN check).
    "q_ann_ivf" -> QueryDef(
      fn = (spark, dir) => {
        val emb = embFrame(spark, dir)
        val centroids = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("c_id"), col("v").as("c_v"))
        // assign: nearest centroid per corpus vector, as a max_by
        // AGGREGATION (map-side partial reduce: ~1 row per vec_id per
        // partition reaches the exchange; a window over the
        // corpus x nlist cross join would shuffle nlist copies of
        // every vector). Tie-break (c_sim desc, c_id asc) matches the
        // oracle's ROW_NUMBER via the (c_sim, -c_id) struct order.
        val assigned = emb.join(broadcast(centroids))
          .withColumn("c_sim", cosine(col("v"), col("c_v")))
          .groupBy("vec_id")
          .agg(max_by(col("c_id"),
              struct(col("c_sim"), (-col("c_id")).as("nc"))).as("bucket"),
            first(col("v")).as("n_v")) // v constant per vec_id
          .select(col("vec_id").as("n_id"), col("n_v"), col("bucket"))
        // queries probe their nprobe=2 nearest centroids
        val queries = emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("v").as("q_v"))
        val probes = queries.join(broadcast(centroids))
          .withColumn("c_sim", cosine(col("q_v"), col("c_v")))
          .withColumn("c_rank", row_number().over(
            Window.partitionBy("q_id").orderBy(col("c_sim").desc, col("c_id"))))
          .filter(col("c_rank") <= 2)
          .select(col("q_id"), col("q_v"), col("c_id").as("bucket"))
        // search only inside the probed buckets
        val wTop = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
        broadcast(probes)
          .join(assigned, "bucket")
          .filter(col("n_id") =!= col("q_id"))
          .withColumn("sim", cosine(col("q_v"), col("n_v")))
          .withColumn("rank", row_number().over(wTop).cast("long"))
          .filter(col("rank") <= 5)
          .select("q_id", "rank", "n_id", "sim")
          .orderBy("q_id", "rank")
      },
      oracle = Some(embCte + s""",
        |centroids AS (SELECT vec_id AS c_id, v AS c_v FROM emb WHERE vec_id < 16),
        |assigned AS (
        |  SELECT n_id, n_v, c_id AS bucket FROM (
        |    SELECT e.vec_id AS n_id, e.v AS n_v, c.c_id,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_inner_product(e.v, c.c_v) / sqrt(list_inner_product(e.v, e.v) * list_inner_product(c.c_v, c.c_v)) DESC, c.c_id) AS c_rank
        |    FROM emb e CROSS JOIN centroids c)
        |  WHERE c_rank = 1),
        |probes AS (
        |  SELECT q_id, q_v, c_id AS bucket FROM (
        |    SELECT q.vec_id AS q_id, q.v AS q_v, c.c_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_inner_product(q.v, c.c_v) / sqrt(list_inner_product(q.v, q.v) * list_inner_product(c.c_v, c.c_v)) DESC, c.c_id) AS c_rank
        |    FROM emb q CROSS JOIN centroids c WHERE q.vec_id < 20)
        |  WHERE c_rank <= 2)
        |SELECT q_id, rank, n_id, sim FROM (
        |  SELECT p.q_id, a.n_id,
        |    list_inner_product(p.q_v, a.n_v) / sqrt(list_inner_product(p.q_v, p.q_v) * list_inner_product(a.n_v, a.n_v)) AS sim,
        |    ROW_NUMBER() OVER (PARTITION BY p.q_id
        |      ORDER BY list_inner_product(p.q_v, a.n_v) / sqrt(list_inner_product(p.q_v, p.q_v) * list_inner_product(a.n_v, a.n_v)) DESC, a.n_id) AS rank
        |  FROM probes p JOIN assigned a ON p.bucket = a.bucket
        |  WHERE a.n_id != p.q_id)
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin),
      bench = true),

    // ---- Scalar-quantized (int8) retrieval with exact re-ranking —
    // the standard two-stage pattern for 100 TB embedding corpora:
    // store/scan 4x-smaller int8 vectors (per-vector symmetric scale =
    // max|x|/127; scales cancel in cosine so the quantized similarity
    // needs no dequantization), take top-20 candidates by quantized
    // similarity, then re-score ONLY those 20 with full-precision
    // cosine for the final top-5. The expensive exact kernel touches
    // 20 vectors per query instead of the corpus. Quantization uses
    // floor(x+0.5) (not round()) so DuckDB reproduces it bit-for-bit.
    "q_ann_sq8_rerank" -> QueryDef(
      fn = (spark, dir) => {
        val emb = embFrame(spark, dir)
        // hoist the per-vector scale OUT of the per-element lambda:
        // HOFs are interpreted with no CSE inside the lambda, so an
        // inline scale would re-scan the whole array per element —
        // O(d^2) per row. Same value, same IEEE division, O(d).
        val quantized = emb
          .withColumn("__scale",
            array_max(transform(col("v"), x => abs(x))) / lit(127.0))
          .withColumn("qv",
            transform(col("v"),
              x => floor(x / col("__scale") + lit(0.5)).cast("double")))
          .drop("__scale")
        val queries = quantized.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("v").as("q_v"),
            col("qv").as("q_qv"))
        val corpus = quantized.select(col("vec_id").as("n_id"),
          col("v").as("n_v"), col("qv").as("n_qv"))
        val wQuant = Window.partitionBy("q_id")
          .orderBy(col("qsim").desc, col("n_id"))
        val candidates = broadcast(queries)
          .join(corpus, col("n_id") =!= col("q_id"))
          .withColumn("qsim", cosine(col("q_qv"), col("n_qv")))
          .withColumn("qrank", row_number().over(wQuant))
          .filter(col("qrank") <= 20)
        val wExact = Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("n_id"))
        candidates
          .withColumn("sim", cosine(col("q_v"), col("n_v")))
          .withColumn("rank", row_number().over(wExact).cast("long"))
          .filter(col("rank") <= 5)
          .select("q_id", "rank", "n_id", "sim")
          .orderBy("q_id", "rank")
      },
      oracle = Some(embCte + s""",
        |q8 AS (
        |  SELECT vec_id, v,
        |    list_transform(v, x ->
        |      floor(x / (list_max(list_transform(v, y -> abs(y))) / 127.0) + 0.5)) AS qv
        |  FROM emb),
        |cand AS (
        |  SELECT q_id, n_id, q_v, n_v FROM (
        |    SELECT q.vec_id AS q_id, n.vec_id AS n_id, q.v AS q_v, n.v AS n_v,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_inner_product(q.qv, n.qv) / sqrt(list_inner_product(q.qv, q.qv) * list_inner_product(n.qv, n.qv)) DESC, n.vec_id) AS qrank
        |    FROM q8 q JOIN q8 n ON q.vec_id < 20 AND n.vec_id != q.vec_id)
        |  WHERE qrank <= 20)
        |SELECT q_id, rank, n_id, sim FROM (
        |  SELECT q_id, n_id,
        |    list_inner_product(q_v, n_v) / sqrt(list_inner_product(q_v, q_v) * list_inner_product(n_v, n_v)) AS sim,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY list_inner_product(q_v, n_v) / sqrt(list_inner_product(q_v, q_v) * list_inner_product(n_v, n_v)) DESC, n_id) AS rank
        |  FROM cand)
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // ---- LSH-bucketed ANN (random-hyperplane family): 8 hyperplanes
    // give a 256-bucket sign signature; neighbors are searched only
    // inside the query's bucket — an equi-join, never a scan per query.
    // The hyperplanes are DERIVED FROM THE CORPUS (differences of fixed
    // vector pairs) so both engines construct them exactly — a seeded
    // RNG would not be reproducible in SQL. Same shape as MinHash-LSH:
    // signature pass is narrow, the join key is fixed-width.
    "q_ann_lsh" -> QueryDef(
      fn = (spark, dir) => {
        val emb = embFrame(spark, dir)
        val planes = emb.filter(col("vec_id") < 16)
          .withColumn("pair", (col("vec_id") / 2).cast("long"))
          .groupBy("pair")
          .agg(min("vec_id").as("lo"), max("vec_id").as("hi"))
        val planeVecs = planes
          .join(emb.select(col("vec_id").as("lo"), col("v").as("v_lo")), "lo")
          .join(emb.select(col("vec_id").as("hi"), col("v").as("v_hi")), "hi")
          .select(col("pair"), zip_with(col("v_lo"), col("v_hi"),
            (x, y) => x - y).as("h"))
        // bucket = sum over planes of 2^j * (dot(v, h_j) >= 0)
        val signed = emb.join(broadcast(planeVecs))
          .withColumn("bit",
            when(dot(col("v"), col("h")) >= 0,
              pow(lit(2.0), col("pair").cast("double")).cast("long"))
              .otherwise(0L))
          .groupBy(col("vec_id"), col("v").as("vv"))
          .agg(sum(col("bit")).as("bucket"))
          .select(col("vec_id"), col("vv").as("v"), col("bucket"))
        // multi-probe: each query searches its own bucket AND every
        // bucket within Hamming distance 2 (<=2 sign bits flipped) —
        // a single-bucket probe on weakly-correlated vectors has
        // near-zero recall (one wrong sign of 8 hides the neighbor).
        // 37 of 256 buckets ~ 14% of the corpus per query: the
        // explicit recall/cost dial (AnnRecallSpec measures it)
        val probeDeltas = array(Similarity.hamming2Deltas.map(lit(_)): _*)
        val queries = signed.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("bucket"))
          .withColumn("__d", explode(probeDeltas))
          .withColumn("bucket", col("bucket").bitwiseXOR(col("__d")))
          .drop("__d")
        val wTop = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
        broadcast(queries)
          .join(signed.select(col("vec_id").as("n_id"), col("v").as("n_v"),
            col("bucket")), "bucket")
          .filter(col("n_id") =!= col("q_id"))
          .withColumn("sim", cosine(col("q_v"), col("n_v")))
          .withColumn("rank", row_number().over(wTop).cast("long"))
          .filter(col("rank") <= 5)
          .select("q_id", "rank", "n_id", "sim")
          .orderBy("q_id", "rank")
      },
      oracle = Some(embCte + s""",
        |planes AS (
        |  SELECT CAST(floor(vec_id / 2) AS BIGINT) AS pair,
        |         MIN(vec_id) AS lo, MAX(vec_id) AS hi
        |  FROM emb WHERE vec_id < 16 GROUP BY 1),
        |plane_vecs AS (
        |  SELECT p.pair,
        |    list_transform(range(1, len(a.v) + 1), i -> a.v[i] - b.v[i]) AS h
        |  FROM planes p
        |  JOIN emb a ON a.vec_id = p.lo
        |  JOIN emb b ON b.vec_id = p.hi),
        |signed AS (
        |  SELECT e.vec_id, ANY_VALUE(e.v) AS v,
        |    SUM(CASE WHEN list_inner_product(e.v, p.h) >= 0
        |             THEN CAST(power(2.0, p.pair) AS BIGINT) ELSE 0 END) AS bucket
        |  FROM emb e CROSS JOIN plane_vecs p
        |  GROUP BY e.vec_id),
        |probes AS (
        |  SELECT vec_id, v, xor(bucket, d.d) AS bucket
        |  FROM signed,
        |    (SELECT unnest([${graft.ext.Similarity.hamming2Deltas.mkString(",")}]) AS d) d
        |  WHERE vec_id < 20)
        |SELECT q_id, rank, n_id, sim FROM (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |    list_inner_product(q.v, n.v) / sqrt(list_inner_product(q.v, q.v) * list_inner_product(n.v, n.v)) AS sim,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_inner_product(q.v, n.v) / sqrt(list_inner_product(q.v, q.v) * list_inner_product(n.v, n.v)) DESC, n.vec_id) AS rank
        |  FROM probes q JOIN signed n ON q.bucket = n.bucket
        |  WHERE n.vec_id != q.vec_id)
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin))
  )
}
