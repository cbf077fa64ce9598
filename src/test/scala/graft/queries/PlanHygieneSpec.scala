package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Sweep EVERY registered query's physical plan for the one shape that
  * is never survivable at 100 TB: an unconditioned cartesian product
  * between data-sized inputs. Individual queries carry targeted plan
  * assertions in PlanAssertionsSpec; this is the blanket net that
  * catches a regression in a query nobody thought to pin (a dropped
  * join condition, a hint change flipping a broadcast nested loop into
  * CartesianProductExec).
  *
  * `q_gap_fill` is the one documented exemption: its spine × type
  * cross join multiplies two GENERATED bounded dims (hours × event
  * types), which is the correct way to build a fill grid.
  */
class PlanHygieneSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val allowedCartesian = Set("q_gap_fill")

  test("no query plans a cartesian product between data-sized inputs") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !allowedCartesian(name) =>
        // building the frame plans it; a handful of operators run a
        // bounded sketch/metadata job while constructing (documented),
        // which is fine here — we only read the final plan
        val plan = fn(spark, sf).queryExecution.executedPlan.toString()
        if (plan.contains("CartesianProduct")) Some(name) else None
      case _ => None
    }
    assert(offenders.isEmpty,
      s"cartesian product planned in: ${offenders.mkString(", ")}")
  }
}
