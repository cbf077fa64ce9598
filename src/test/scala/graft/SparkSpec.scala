package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session — sbt
  * forks a single test JVM, suites run sequentially).
  */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Every physical node of the EXECUTED plan, flattened. AQE hides
    * finalized stages inside QueryStageExec leaves (plain `collect`
    * misses them), so this recurses through adaptive plans, query
    * stages, and subqueries. Call only after an action materialized
    * the frame, or the adaptive plan may still be the initial one. */
  def execNodes(df: DataFrame): Seq[SparkPlan] = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan)
      case other =>
        other +: (other.children ++ other.subqueries).flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  /** All file scans in the executed plan as (rootPath,
    * partitionFilterString, partitionsRead). Materializes the frame
    * first so AQE finalizes the plan and scan metrics are populated. */
  def fileScans(df: DataFrame): Seq[(String, String, Long)] = {
    df.collect()
    execNodes(df).collect { case s: FileSourceScanExec =>
      (s.relation.location.rootPaths.mkString(","),
        s.partitionFilters.mkString(" AND "),
        s.metrics.get("numPartitions").map(_.value).getOrElse(-1L))
    }
  }
}
