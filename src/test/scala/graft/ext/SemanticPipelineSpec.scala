package graft.ext

import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.QueryStageExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The round-5 semantic-curation additions: bloom-prefiltered
  * decontamination, the cluster-blocked kNN graph, and SemDeDup-style
  * semantic dedup. The DuckDB oracle hash-checks each query's full
  * result; these specs pin the properties the hash can't express —
  * helper parity on an arbitrary corpus, the pre-shuffle plan shape,
  * and planted-duplicate recovery.
  */
class SemanticPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def corpusAndEval = {
    val docs = graft.Tables(spark, sf, "documents")
    val eval = docs.filter(col("doc_id") < 25)
    val corpus = docs.filter(col("doc_id") >= 25)
      .select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") < 12)
        .select((col("doc_id") + 700000).as("doc_id"),
          concat(lit("lead "), col("text")).as("text")))
    (corpus, eval)
  }

  test("decontaminateBloom is result-identical to exact decontaminate") {
    val (corpus, eval) = corpusAndEval
    val exact = TextFunctions.decontaminate(corpus, eval, n = 8)
      .as[Long].collect().sorted
    val bloomed = TextFunctions.decontaminateBloom(corpus, eval, n = 8)
      .as[Long].collect().sorted
    assert(exact.nonEmpty, "degenerate fixture: no contamination found")
    assert(bloomed === exact)
  }

  test("bloom prefilter runs map-side, below the confirming shuffle") {
    val (corpus, eval) = corpusAndEval
    val df = TextFunctions.decontaminateBloom(corpus, eval, n = 8)
    df.collect()
    val bloomFilters = execNodes(df).collect {
      case f: FilterExec if f.condition.toString.contains("might_contain") => f
    }
    assert(bloomFilters.nonEmpty, "no might_contain filter in the plan")
    // pre-shuffle pruning: the probe filter's own subtree must hold no
    // exchange — corpus shingles the bloom rejects never shuffle. AQE
    // hides finalized shuffles inside QueryStageExec LEAVES (plain
    // collect would return Nil wherever the filter sat, making the
    // assertion vacuous), so recurse through stages like execNodes.
    def shufflesBelow(n: SparkPlan): Seq[SparkPlan] = n match {
      case q: QueryStageExec => shufflesBelow(q.plan)
      case e: ShuffleExchangeLike => Seq(e)
      case other => (other.children ++ other.subqueries).flatMap(shufflesBelow)
    }
    bloomFilters.foreach { f =>
      val below = f.children.flatMap(shufflesBelow)
      assert(below.isEmpty, s"might_contain filter sits above a shuffle:\n$f")
    }
  }

  test("knn graph: <=3 neighbors per vector, contiguous ranks, sims sorted") {
    val rows = graft.SparkEntry.queries("q_knn_graph")(spark, sf)
      .select("vec_id", "rank", "n_id", "sim")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (v, _, n, s) =>
      assert(n != v, s"vector $v listed itself as a neighbor")
      assert(s >= -1.0001 && s <= 1.0001, s"cosine out of range: $s")
    }
    rows.groupBy(_._1).foreach { case (v, g) =>
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2).toSeq === (1L to g.length).toSeq,
        s"vector $v has non-contiguous ranks")
      val sims = byRank.map(_._4)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"vector $v neighbors not sorted by similarity")
      assert(g.length <= 3)
    }
  }

  test("hard negatives never share the query's label") {
    val rows = graft.SparkEntry.queries("q_hard_negatives")(spark, sf)
      .select("q_id", "q_label", "n_label")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, ql, nl) =>
      assert(nl != ql, s"query $q mined a same-label ($ql) negative")
    }
  }

  test("triangle census covers every planted twin trio") {
    val planted = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .filter(VectorFunctions.dot(col("v"), col("v")) > 0)
      .filter(col("vec_id") % 20 === 0)
      .select("vec_id").as[Long].collect()
    val tri = graft.SparkEntry.queries("q_triangle_count")(spark, sf)
      .as[(Long, Long)].collect().toMap
    // a twin trio is mutually nearest — its 3 members close a triangle
    planted.foreach { o =>
      Seq(o, o + 1000000L, o + 2000000L).foreach { id =>
        assert(tri.getOrElse(id, 0L) >= 1L,
          s"planted trio member $id is in no triangle")
      }
    }
  }

  test("bpe encode: token counts bounded by chars below, words above") {
    val enc = graft.SparkEntry.queries("q_bpe_encode")(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(enc.nonEmpty)
    val chars = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).map(_.length.toLong).sum }
      .toMap
    enc.foreach { case (id, nWords, nTok) =>
      // merges only ever shrink a word's token count, never below 1
      assert(nTok >= nWords, s"doc $id: $nTok tokens < $nWords words")
      assert(nTok <= chars(id), s"doc $id: $nTok tokens > ${chars(id)} chars")
    }
    assert(enc.exists { case (_, nWords, nTok) => nTok > nWords },
      "degenerate: no document kept any multi-token word")
  }

  test("cluster labels: lift arithmetic exact, one corpus scan, heap top-k") {
    val df = graft.SparkEntry.queries("q_cluster_labels")(spark, sf)
    val rows = df.select("bucket", "term", "cnt", "bucket_total",
        "term_total", "lift_bp")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // grand total recomputed independently: non-empty whitespace tokens
    // of every doc whose embedding survives the zero-norm contract
    val live = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .filter(VectorFunctions.dot(col("v"), col("v")) > 0)
      .select(col("vec_id").as("doc_id"))
    val grand = graft.Tables(spark, sf, "documents")
      .join(live, "doc_id")
      .select(explode(split(col("text"), "[ \\t\\n\\f\\r]+")).as("t"))
      .filter(col("t") =!= "").count()
    rows.foreach { case (b, t, cnt, btot, ttot, lift) =>
      assert(cnt >= 5, s"($b,$t) under the count floor")
      assert(cnt <= btot && cnt <= ttot, s"($b,$t) marginals inconsistent")
      assert(lift === cnt * grand * 10000L / (btot * ttot),
        s"($b,$t) lift mismatch vs grand=$grand")
    }
    // <=3 per bucket, ordered by (lift desc, cnt desc, term)
    rows.groupBy(_._1).foreach { case (b, g) =>
      assert(g.length <= 3, s"bucket $b has ${g.length} labels")
      val ord = g.map(r => (-r._6, -r._3, r._2)).toSeq
      assert(ord === ord.sorted, s"bucket $b labels out of order")
    }
    // plan: bounded-heap partial/final pair, and every documents read
    // outside the persisted (bucket, term) cache is a regression — a
    // marginal recomputed from the corpus would surface as a
    // FileSourceScan NOT hidden behind an InMemoryTableScan (execNodes
    // alone can't see this: the one legitimate scan lives inside the
    // cache's build plan, so a bare count would pass at 0 or 1 alike)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("TopKPerKeyPartial"), p)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def uncachedDocScans(
        n: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      n match {
        case a: AdaptiveSparkPlanExec => uncachedDocScans(a.executedPlan)
        case q: QueryStageExec => uncachedDocScans(q.plan)
        case _: InMemoryTableScanExec => Seq.empty // serves the cache
        case s: FileSourceScanExec
            if s.relation.location.rootPaths.mkString(",")
              .contains("documents.parquet") => Seq(s)
        case other =>
          (other.children ++ other.subqueries).flatMap(uncachedDocScans)
      }
    val cacheReads = execNodes(df).collect { case c: InMemoryTableScanExec => c }
    assert(cacheReads.nonEmpty, "the (bucket, term) frame is not cached")
    val leaks = uncachedDocScans(df.queryExecution.executedPlan)
    assert(leaks.isEmpty,
      s"${leaks.length} documents scan(s) bypass the cached count frame")
  }

  test("semantic dedup recovers every planted twin group, origin as keeper") {
    val planted = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .filter(VectorFunctions.dot(col("v"), col("v")) > 0)
      .filter(col("vec_id") % 20 === 0)
      .select("vec_id").as[Long].collect().toSet
    val clusters = graft.SparkEntry.queries("q_semantic_dedup")(spark, sf)
      .as[(Long, Long)].collect().toMap
    planted.foreach { o =>
      assert(clusters.contains(o), s"planted group of $o not recovered")
      assert(clusters(o) >= 3L,
        s"planted group of $o incomplete: size ${clusters(o)}")
    }
  }
}
