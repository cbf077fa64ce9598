package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.{BpeQueries, DedupQueries, FingerprintQueries, GraphQueries, LinkageQueries, MultimodalQueries, PipelineQueries, RetrievalQueries, SimilarityQueries, TextQueries}
import graft.pipeline.{Observations, StarSchema, WeatherEtl}
import graft.queries.{AdvancedQueries, AnalyticsQueries, EventsQueries, FunctionQueries, RelationalQueries, StorageQueries, TimeSeriesQueries, WeatherQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 has a query here; those with
  * SQL-expressible semantics also have a DuckDB oracle in [[oracleSql]].
  */
object SparkEntry {

  /** All query modules, in SURVEY.md §2 order. */
  val modules: Seq[QueryModule] = Seq(
    WeatherQueries,       // O-7..O-23, O-28: the reference ETL semantics
    RelationalQueries,    // §2.1 relational surface
    AdvancedQueries,      // as-of / range joins, pivot, grouping sets, percentiles
    AnalyticsQueries,     // gap-fill, rank family, correlated subquery, vocab
    FunctionQueries,      // custom Aggregator UDAF + rolling-hash expression
    EventsQueries,        // event-time windows (batch twins of streaming)
    DedupQueries,         // exact / normalized / jaccard / minhash-LSH
    FingerprintQueries,   // simhash custom expression
    SimilarityQueries,    // embedding cosine / ANN brute-force + IVF
    TextQueries,          // token counting / quality / language-ID
    MultimodalQueries,    // binary columns + stubbed decode
    PipelineQueries,      // dup-cluster resolution + curation pipeline
    GraphQueries,         // iterative graph ranking (fixed-point PageRank)
    LinkageQueries,       // blocked fuzzy entity resolution
    BpeQueries,           // relational BPE vocabulary training
    RetrievalQueries,     // hybrid lexical+semantic rank fusion (RRF)
    TimeSeriesQueries,    // EMA recurrence, motif mining, drift report
    StorageQueries        // zone-map pruning, delete ledger, bloom join
  )

  private lazy val allDefs: Seq[(String, QueryDef)] = {
    val defs = modules.flatMap(_.defs)
    // duplicate names silently shadow each other in the .toMap below
    // (the later module wins and the earlier query vanishes from the
    // correctness surface without any failure) — make it loud instead
    val dups = defs.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names across modules: ${dups.mkString(", ")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full reference pipeline (observations -> enrichment -> star
    * fan-out -> star join -> seasonal aggregate). */
  def entry(spark: SparkSession): DataFrame =
    allDefs.toMap.apply("q_weather_star").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (n, d) => n -> d.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (n, QueryDef(_, Some(sql), _)) => n -> sql }.toMap

  /** The headline benchmark subset (see [[Bench]]). */
  def benchQueries: Seq[String] = allDefs.collect { case (n, d) if d.bench => n }
}
